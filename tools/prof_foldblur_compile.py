#!/usr/bin/env python3
"""Isolate the compile/runtime cost of the blur-fold pieces on the TPU.

The full folded pipeline blew a 1200 s compile budget where the sequential
one compiles in ~1-2 min; this probes, at one block shape, which piece is
responsible: (a) sequential k4s2 deconv + depthwise blur, (b) the composed
k6s2 deconv alone, (c) the full fold incl. strip corrections + .at updates.

Env: B (default 16), RES (default 1024 — the output res), CI/CO (default
32/16), WHICH (csv of seq,k6,fold; default all).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gan_segmentation_tpu.ops.blur import blur_3x3
from gan_segmentation_tpu.ops.conv import (compose_kernel_2d,
                                           conv_transpose2d,
                                           conv_transpose2d_blur)

B = int(os.environ.get("B", 16))
RES = int(os.environ.get("RES", 1024))
CI = int(os.environ.get("CI", 32))
CO = int(os.environ.get("CO", 16))
WHICH = os.environ.get("WHICH", "seq,k6,fold").split(",")

H = RES // 2
x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, CI), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (4, 4, CI, CO), jnp.float32)
k2d = jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 16.0
w6 = compose_kernel_2d(w, k2d).astype(jnp.bfloat16)
wb = w.astype(jnp.bfloat16)

FNS = {
    "seq": lambda x: jnp.sum(blur_3x3(
        conv_transpose2d(x, wb, stride=2, padding=1)).astype(jnp.float32)),
    "k6": lambda x: jnp.sum(
        conv_transpose2d(x, w6, stride=2, padding=2).astype(jnp.float32)),
    "fold": lambda x: jnp.sum(
        conv_transpose2d_blur(x, w).astype(jnp.float32)),
}

for name in WHICH:
    fn = jax.jit(FNS[name])
    t0 = time.perf_counter()
    v = float(fn(x))
    t_compile = time.perf_counter() - t0
    # steady state: 4 timed launches, data-dependent D2H each
    t0 = time.perf_counter()
    for i in range(4):
        float(fn(x))
    t_run = (time.perf_counter() - t0) / 4
    print(f"{name}: first_call {t_compile:.1f}s  steady {t_run*1e3:.1f}ms  "
          f"checksum {v:.3e}", flush=True)
