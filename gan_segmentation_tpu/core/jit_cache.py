"""Persistent XLA compilation cache for the CLI entrypoints.

On the remote-compile TPU in this environment every jit program costs
30-90 s to compile (Mosaic kernels ~4 min) — per PROCESS, every launch.
The reference has nothing comparable (mxnet graphs build in-process); for
this framework's CLI workflow (train, then test, then generate — three
processes compiling the same model shapes) pointing jax at an on-disk
compilation cache turns every repeat compile into a deserialization.

Enabled by every entrypoint (`apps/main.py`, `train/experiments.init_exp`,
`bench.py`); opt out with ``GAN_SEG_JIT_CACHE=0``, relocate with
``GAN_SEG_JIT_CACHE_DIR``. Backends whose executables cannot be
serialized simply skip cache writes (jax degrades with a warning, never
an error).
"""

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "gan_segmentation_tpu", "xla")


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point jax at an on-disk compilation cache. Idempotent.

    Returns the cache directory, or None when disabled
    (``GAN_SEG_JIT_CACHE=0``) or unsupported by this jax.
    """
    if os.environ.get("GAN_SEG_JIT_CACHE", "1").lower() in ("0", "off", ""):
        return None
    import jax

    cache_dir = (cache_dir or os.environ.get("GAN_SEG_JIT_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # worth persisting anything non-trivial here: compiles are remote
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # unsupported jax / unwritable dir: run live
        log.warning("persistent jit cache disabled (%s)", exc)
        return None
    return cache_dir
