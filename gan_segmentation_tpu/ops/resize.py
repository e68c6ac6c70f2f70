"""Resize ops.

- ``upsample_nearest_2x``: mxnet ``UpSampling(scale=2, sample_type='nearest')``
  (`networks_stylegan.py:308-315`, decoder `networks_seg.py:87`). Implemented
  as reshape-broadcast (fuses into neighbouring elementwise ops under XLA).
- ``bilinear_resize``: mxnet ``contrib.BilinearResize2D``
  (`deeplabv3plus.py:213-224`) which uses **align-corners** sampling
  (scale = (in-1)/(out-1)), unlike `jax.image.resize`'s half-pixel centres —
  so it is implemented here explicitly as two 1-D gather+lerp passes.
"""

import jax.numpy as jnp


def upsample_nearest_2x(x):
    """(N,H,W,C) -> (N,2H,2W,C), nearest neighbour."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def upsample_nearest(x, scale: int):
    if scale == 1:
        return x
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return x.reshape(n, scale * h, scale * w, c)


def _align_corners_1d(in_size: int, out_size: int):
    """Source coordinates + lerp weights for align-corners resampling."""
    if out_size == 1 or in_size == 1:
        idx0 = jnp.zeros((out_size,), jnp.int32)
        return idx0, idx0, jnp.zeros((out_size,), jnp.float32)
    scale = (in_size - 1) / (out_size - 1)
    src = jnp.arange(out_size, dtype=jnp.float32) * scale
    idx0 = jnp.floor(src).astype(jnp.int32)
    idx0 = jnp.clip(idx0, 0, in_size - 1)
    idx1 = jnp.clip(idx0 + 1, 0, in_size - 1)
    frac = src - idx0.astype(jnp.float32)
    return idx0, idx1, frac


def bilinear_resize(x, out_h: int, out_w: int):
    """Align-corners bilinear resize, (N,H,W,C) -> (N,out_h,out_w,C)."""
    n, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    if h != out_h:
        i0, i1, f = _align_corners_1d(h, out_h)
        f = f[None, :, None, None]
        x = x[:, i0] * (1.0 - f) + x[:, i1] * f
    if w != out_w:
        j0, j1, g = _align_corners_1d(w, out_w)
        g = g[None, None, :, None]
        x = x[:, :, j0] * (1.0 - g) + x[:, :, j1] * g
    return x.astype(orig_dtype)


def global_avg_pool(x, keepdims: bool = True):
    """mxnet ``GlobalAvgPool2D`` (ASPP pooling branch)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims).astype(x.dtype)
