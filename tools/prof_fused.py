import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from bench import build_fused

B = int(os.environ.get("B", 32))
S2D = os.environ.get("S2D", "1") == "1"
fused_raw, gp, dp, dbs = build_fused(10, s2d=S2D)

@jax.jit
def fused_sum(gp, dp, dbs, z, rng):
    img, mask = fused_raw(gp, dp, dbs, z, rng)
    return jnp.sum(img.astype(jnp.int32)) + jnp.sum(mask.astype(jnp.int32))

rng = jax.random.PRNGKey(0)
def launch(i):
    z = jax.random.normal(jax.random.fold_in(rng, i), (B, 512))
    return fused_sum(gp, dp, dbs, z, jax.random.fold_in(rng, 1000 + i))

for i in range(2):
    int(launch(i))
out = os.environ.get("TRACE_DIR", "/tmp/fused_trace")
with jax.profiler.trace(out):
    for i in range(2):
        int(launch(10 + i))
print("trace done ->", out, flush=True)
