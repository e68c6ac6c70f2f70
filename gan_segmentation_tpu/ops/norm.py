"""Normalization primitives (statistics always in f32).

- ``pixel_norm``: `networks_stylegan.py:558-565`
  x * rsqrt(mean(x^2 over channel) + 1e-8).
- ``instance_norm``: affine-free InstanceNorm used inside AdaIN
  (`networks_stylegan.py:246-247,261`; mxnet default eps=1e-5):
  per-(N,C) spatial standardization.

Batch norm lives in the flax modules (`models/`) — under `jit` with the batch
axis sharded over the data mesh, its `jnp.mean` over the batch compiles to an
ICI all-reduce, which *is* the reference's SyncBatchNorm
(`networks_seg.py:20-21`, SURVEY §2.3).
"""

import jax.numpy as jnp
from jax import lax


def pixel_norm(x, eps: float = 1e-8, axis: int = -1):
    xf = x.astype(jnp.float32)
    denom = lax.rsqrt(jnp.mean(jnp.square(xf), axis=axis, keepdims=True) + eps)
    return (xf * denom).astype(x.dtype)


def instance_norm(x, eps: float = 1e-5):
    """(N,H,W,C): standardize each (n, c) slice over H,W. No affine.

    One-pass moments (var = E[x^2] - mean^2) so XLA emits a single fused
    read of the activation instead of the two-pass (x - mean)^2 form —
    measurably faster at 1024^2 (profiler: the two-pass reductions were
    among the top ops of the fused pipeline).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)
