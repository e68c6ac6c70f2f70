import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from gan_segmentation_tpu.core.config import GanConfig, SolverConfig
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.models.stylegan import init_generator
from gan_segmentation_tpu.ops.s2d_decoder import decoder_apply_s2d, class_mask_s2d
from gan_segmentation_tpu.train.generator import class_mask

B = int(os.environ.get("B", 16)); MRL = 10
dtype = jnp.bfloat16
scfg = SolverConfig(max_res_log2=MRL)
dec = decoder_from_config(scfg, compute_dtype=dtype)
feats1 = [jnp.zeros((1, 2**(i+2), 2**(i+2), c), jnp.float32) for i, c in enumerate(scfg.in_channels)]
dv = jax.jit(lambda f: dec.init(jax.random.PRNGKey(3), f, False))(feats1)
dp, dbs = dv["params"], dv["batch_stats"]

@jax.jit
def dec_std(dp, dbs, feats):
    logits = dec.apply({"params": dp, "batch_stats": dbs}, feats, False)
    return jnp.sum(class_mask(logits).astype(jnp.int32))

@jax.jit
def dec_s2d(dp, dbs, feats):
    logits = decoder_apply_s2d(dec, {"params": dp, "batch_stats": dbs}, feats)
    return jnp.sum(class_mask_s2d(logits, 2).astype(jnp.int32))

featsB = [jnp.asarray(np.random.RandomState(i).randn(B, 2**(i+2), 2**(i+2), c).astype(np.float32)).astype(jnp.bfloat16)
          for i, c in enumerate(scfg.in_channels)]

def timeit(name, fn, *args, iters=6):
    try:
        for _ in range(2):
            int(fn(*args))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        for o in outs: int(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1000:.1f} ms/iter ({B/dt:.1f} samples/s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)

timeit("decoder-s2d   ", dec_s2d, dp, dbs, featsB)
timeit("decoder-std   ", dec_std, dp, dbs, featsB)
