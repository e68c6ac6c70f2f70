"""Refined op-level A/B: chain ITERS dependent convs inside one jit launch
so dispatch (~26 ms) amortizes; per-conv ms = window/ITERS (minus ~0.3%).
Data dependence between iterations prevents CSE; scaling by 1+eps*i
prevents the compiler folding the chain."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache
enable_persistent_cache()

B, H, C = 128, 512, 64
ITERS = 8
dt = jnp.bfloat16
rng = np.random.default_rng(0)
kern = jnp.asarray(rng.normal(size=(3, 3, C, C)) / 24.0, dt)

def conv(x, k, groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=dt)

@partial(jax.jit, static_argnums=(2,))
def chain(x, k, groups):
    def body(i, x):
        y = conv(x, k, groups)
        return y * (0.9 + 1e-4 * i.astype(dt))
    y = jax.lax.fori_loop(0, ITERS, body, x)
    return jnp.sum(y.astype(jnp.float32))

kd2 = jnp.zeros((3, 3, 2 * C, 2 * C), dt)
kd2 = kd2.at[:, :, :C, :C].set(kern).at[:, :, C:, C:].set(kern)
kg2 = jnp.concatenate([kern, kern], axis=3)
kg4 = jnp.concatenate([kern] * 4, axis=3)
from gan_segmentation_tpu.ops.s2d_decoder import conv3x3_kernel_s2d
kl2 = conv3x3_kernel_s2d(jnp.asarray(rng.normal(size=(3, 3, 64, 64)) / 24.0, dt))

cases = {
    "base":   ((B, H, H, C), kern, 1),
    "pair2d": ((B // 2, H, H, 2 * C), kd2, 1),
    "pair2g": ((B // 2, H, H, 2 * C), kg2, 2),
    "pair4g": ((B // 4, H, H, 4 * C), kg4, 4),
    "lvl2":   ((B, H // 2, H // 2, 4 * C), kl2, 1),
}

make_x = jax.jit(lambda key, shp: 0.1 * jax.random.normal(key, shp, dt),
                 static_argnums=(1,))

for name, (shp, k, groups) in cases.items():
    x = make_x(jax.random.PRNGKey(1), shp)
    try:
        t0 = time.perf_counter()
        float(chain(x, k, groups))
        print(f"# {name}: compiled+first in {time.perf_counter()-t0:.0f}s", flush=True)
        float(chain(x, k, groups))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(x, k, groups))
            ts.append(time.perf_counter() - t0)
        ms = sorted(ts)[len(ts) // 2] * 1e3 / ITERS
        print(f"{name}: {ms:.2f} ms/conv  (windows ms: "
              f"{[round(t*1e3) for t in sorted(ts)]})", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
