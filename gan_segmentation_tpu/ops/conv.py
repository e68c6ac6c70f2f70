"""Convolution primitives, NHWC layout, MXU-friendly.

TPU-native equivalents of the mxnet engine ops the reference leans on
(SURVEY.md §2.4): ``Convolution`` (incl. depthwise groups and dilation),
``Deconvolution`` (k4 s2 p1 "fused upscale", `networks_stylegan.py:16-17`),
and the dilated convs of the DeepLab backbone/ASPP.

Weight layout is HWIO (kh, kw, in_ch/groups, out_ch) — XLA's native TPU
layout. The mxnet checkpoint converter re-lays-out OIHW weights once at
load time (see `core/mx_params.py`).
"""

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")

_IntOrPair = Union[int, Tuple[int, int]]


def _pair(v: _IntOrPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _padding(p) -> Sequence[Tuple[int, int]]:
    if isinstance(p, str):
        return p
    if isinstance(p, int):
        return [(p, p), (p, p)]
    # ((top,bottom),(left,right)) or (ph, pw) or asymmetric (beg, end) pair
    p = tuple(p)
    if len(p) == 2 and all(isinstance(x, int) for x in p):
        return [(p[0], p[0]), (p[1], p[1])]
    return [tuple(p[0]), tuple(p[1])]


def conv2d(x, w, b=None, *, stride: _IntOrPair = 1, padding=0,
           dilation: _IntOrPair = 1, groups: int = 1):
    """2-D convolution. x: (N,H,W,C), w: (kh,kw,Cin/groups,Cout).

    Matches mxnet ``Convolution(kernel, stride, pad, dilate, num_group)``
    semantics (cross-correlation, symmetric zero padding).
    """
    out = lax.conv_general_dilated(
        x, w,
        window_strides=_pair(stride),
        padding=_padding(padding),
        rhs_dilation=_pair(dilation),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def depthwise_conv2d(x, w, b=None, *, stride: _IntOrPair = 1, padding=0,
                     dilation: _IntOrPair = 1):
    """Depthwise conv: w is (kh, kw, 1, C); one filter per input channel.

    mxnet expresses this as ``num_group == channels``
    (`networks_stylegan.py:233-234`, SeparableConv depthwise).
    """
    c = x.shape[-1]
    assert w.shape[2] == 1 and w.shape[3] == c, w.shape
    return conv2d(x, w, b, stride=stride, padding=padding,
                  dilation=dilation, groups=c)


# Note on narrow-layer conv performance: XLA's TPU conv kernel runs at
# ~1-4% of MXU peak when channel counts are far below the 128-lane width.
# XLA-level im2col/row-concat reformulations were measured SLOWER (the
# materialized 3x/9x input copies cost more HBM traffic than the bad conv
# kernel wastes in compute). The winning approach keeps the taps in VMEM —
# see `ops/pallas/small_conv.py`.


def conv_transpose2d(x, w, b=None, *, stride: int = 2, padding: int = 1):
    """Transposed conv matching mxnet ``Deconvolution(kernel=k, stride=s, pad=p)``.

    Output spatial size = in*s for the reference's k=4, s=2, p=1 case
    (`networks_stylegan.py:16-17`). Implemented as the mathematically
    equivalent input-dilated convolution: insert (s-1) zeros between input
    elements, pad by (k-1-p), convolve with the kernel.

    IMPORTANT weight convention: ``w`` is (kh, kw, Cin, Cout) **already in
    conv-equivalent orientation** — i.e. spatially flipped relative to the
    mxnet Deconvolution weight. The mxnet converter performs
    ``W[ci,co,ky,kx] -> w[kH-1-ky, kW-1-kx, ci, co]`` once at load time; for
    training-from-scratch the orientation is immaterial.
    """
    kh, kw = w.shape[0], w.shape[1]
    pad_h = kh - 1 - padding
    pad_w = kw - 1 - padding
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=[(pad_h, pad_h), (pad_w, pad_w)],
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
