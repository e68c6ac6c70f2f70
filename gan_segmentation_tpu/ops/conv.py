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
import numpy as np
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
# kernel wastes in compute). A direct Pallas kernel keeping the taps in
# VMEM also lost on this chip (archived with its measurements in
# experiments/pallas_archive/); the shipping answer is the space-to-depth
# layout reformulation in `ops/s2d_decoder.py`.


def conv_transpose2d_subpixel(x, w, b=None):
    """k4 s2 p1 transposed conv via parity decomposition (inference path).

    The lhs-dilation formulation multiplies against inserted zeros: of the
    16 kernel taps only 4 contribute to any output pixel. Decomposing by
    output parity gives four dense 2x2 convs at *input* resolution plus a
    free interleave (depth-to-space):
        y[2o+a] = sum_d x[o-1+a+d] * K_a[d],  K_0 = [w0, w2], K_1 = [w1, w3]
    (per axis; ``w`` in our conv-equivalent orientation, see
    conv_transpose2d). 4x fewer MACs than the dilated form.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (4, 4), "subpixel path is specific to k4 s2 p1"
    rows = {0: ((1, 0), (0, 2)), 1: ((0, 1), (1, 3))}
    outs = []
    for a in range(2):
        for c in range(2):
            pad_y, ky = rows[a]
            pad_x, kx = rows[c]
            sub = w[jnp.array(ky)][:, jnp.array(kx)]  # (2, 2, cin, cout)
            y = lax.conv_general_dilated(
                x, sub, (1, 1), [pad_y, pad_x],
                dimension_numbers=DIMENSION_NUMBERS,
                preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None)
            outs.append(y)
    n, h, w_size, _ = outs[0].shape
    y = jnp.stack(outs, axis=3).reshape(n, h, w_size, 2, 2, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h, 2 * w_size, cout)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def compose_kernel_2d(w, f):
    """Compose a constant 2-D filter into an HWIO kernel.

    Two chained cross-correlations collapse into one:
    ``correlate(correlate(x, w), f) == correlate(x, compose_kernel_2d(w, f))``
    with the two paddings summed per side — exact only when the
    intermediate's zero padding coincides with values that are genuinely
    zero (true for the nearest-2x upsample kernel, see
    ``upsample2x_conv2d``; NOT true for a conv output, which is why the
    [1,2,1] blur is not composed). The composed kernel is the full 2-D
    convolution  C[m] = sum_{k+j=m} w[k] * f[j],  shape
    (kh+fh-1, kw+fw-1, ci, co).
    """
    kh, kw, ci, co = w.shape
    f = jnp.asarray(f, w.dtype)
    fh, fw = f.shape
    wb = w.transpose(2, 3, 0, 1).reshape(ci * co, kh, kw, 1)
    fk = f[::-1, ::-1][:, :, None, None]  # correlate w/ flipped f == convolve
    out = lax.conv_general_dilated(
        wb, fk, (1, 1), [(fh - 1, fh - 1), (fw - 1, fw - 1)],
        dimension_numbers=DIMENSION_NUMBERS)
    out = out.reshape(ci, co, kh + fh - 1, kw + fw - 1)
    return out.transpose(2, 3, 0, 1)


_UP2 = np.ones((2, 2), np.float32)


def upsample2x_conv2d(x, w, b=None, *, padding: int = 1):
    """``conv2d(upsample_nearest_2x(x), w, padding)`` as ONE input-dilated
    conv — bit-exact up to float reassociation.

    nearest-2x == zero-insertion followed by correlation with the all-ones
    2x2 kernel at pad 1 (each side); the one-sample pad-extension of that
    upsample is identically zero on every border, so chaining the following
    conv collapses EXACTLY to a single ``lhs_dilation=2`` conv with kernel
    ``ones2 (*) w`` (full 2-D convolution) and the pads summed. Replaces the
    materialized 2x-res upsample buffer + separate conv pass in the
    generator's non-fused-upscale blocks (`networks_stylegan.py:56-73`).

    Note: composing a zero-padded *follow-up* filter (e.g. the [1,2,1] blur)
    the same way is NOT exact — the intermediate conv output is nonzero where
    its zero padding sits — so the blur stays a separate op.
    """
    k = compose_kernel_2d(w, _UP2)
    pad = 1 + padding
    out = lax.conv_general_dilated(
        x, k,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(2, 2),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


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
