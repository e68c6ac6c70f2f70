"""Separable blur used after every generator upsample.

Reference: `networks_stylegan.py:200-236` — depthwise conv with the
normalized outer product of (1,2,1): kernel [[1,2,1],[2,4,2],[1,2,1]]/16,
stride 1, pad 1.
"""

import numpy as np
import jax.numpy as jnp

from .conv import depthwise_conv2d


def blur_kernel(channels: int, filter_kernel=(1, 2, 1), dtype=jnp.float32):
    """(k, k, 1, C) depthwise HWIO kernel, sum == 1 per channel."""
    k = np.asarray(filter_kernel, np.float32)
    k2d = np.outer(k, k)
    k2d = k2d / k2d.sum()
    w = np.tile(k2d[:, :, None, None], (1, 1, 1, channels))
    return jnp.asarray(w, dtype)


def blur_3x3(x, kernel=None):
    """Apply the [1,2,1] blur. ``kernel`` may be precomputed via blur_kernel."""
    if kernel is None:
        kernel = blur_kernel(x.shape[-1], dtype=x.dtype)
    pad = (kernel.shape[0] - 1) // 2
    return depthwise_conv2d(x, kernel.astype(x.dtype), padding=pad)
