"""Interleaved e2e A/B: threefry vs rbg noise stream in the fused pipeline."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache
enable_persistent_cache()
import bench

B, ITERS, REPEAT = 128, 4, 5
fused_raw, gp, dprep = bench.build_fused(10)

@jax.jit
def fused_sum(gp, dp, z, rng):
    img, mask = fused_raw(gp, dp, z, rng)
    return jnp.sum(img.astype(jnp.int32)) + jnp.sum(mask.astype(jnp.int32))

zkey = jax.random.PRNGKey(0)
keys = {"threefry": jax.random.PRNGKey(7),
        "rbg": jax.random.key(7, impl="rbg")}

def launch(mode, i):
    z = jax.random.normal(jax.random.fold_in(zkey, i), (B, 512))
    return fused_sum(gp, dprep, z, jax.random.fold_in(keys[mode], 1000 + i))

for mode in keys:
    t0 = time.perf_counter()
    for i in range(2):
        int(launch(mode, i))
    print(f"# warmed {mode} in {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

rates = {m: [] for m in keys}
k = 2
for r in range(REPEAT):
    for mode in keys:
        t0 = time.perf_counter()
        sums = [launch(mode, k + i) for i in range(ITERS)]
        for s in sums:
            int(s)
        dt = time.perf_counter() - t0
        k += ITERS
        rates[mode].append(B * ITERS / dt)
        print(f"# window {r} {mode}: {rates[mode][-1]:.1f}", file=sys.stderr, flush=True)

out = {}
for m, rs in rates.items():
    v, caps = bench.median_and_captures(rs)
    out[m] = {"median": round(v, 3), "captures": caps}
print(json.dumps(out), flush=True)
