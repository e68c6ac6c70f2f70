import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from bench import build_fused

B = int(os.environ.get("B", 32))
S2D = os.environ.get("S2D", "1") == "1"
NBLK = int(os.environ.get("NBLK", 2))
fused_raw, gp, dp = build_fused(10, s2d=S2D, n_block_stages=NBLK)

@jax.jit
def fused_sum(gp, dp, z, rng):
    img, mask = fused_raw(gp, dp, z, rng)
    return jnp.sum(img.astype(jnp.int32)) + jnp.sum(mask.astype(jnp.int32))

rng = jax.random.PRNGKey(0)
def launch(i):
    z = jax.random.normal(jax.random.fold_in(rng, i), (B, 512))
    return fused_sum(gp, dp, z, jax.random.fold_in(rng, 1000 + i))

for i in range(2):
    int(launch(i))
out = os.environ.get("TRACE_DIR", "/tmp/fused_trace")
with jax.profiler.trace(out):
    for i in range(2):
        int(launch(10 + i))
print("trace done ->", out, flush=True)
