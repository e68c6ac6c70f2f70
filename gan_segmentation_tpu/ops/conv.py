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


def conv_transpose2d_blur(x, w, *, filter_kernel=(1, 2, 1)):
    """``blur_3x3(conv_transpose2d(x, w, stride=2, padding=1))`` as ONE
    composed transposed conv plus a closed-form 1-pixel ring fix — exact.

    The generator applies the [1,2,1] blur directly after every fused
    upscale (`networks_stylegan.py:56-73,200-236`); both ops are linear
    with nothing between them, and at b128 the blur alone moves ~16 GB of
    HBM traffic per batch across the >=128px blocks. Naive kernel
    composition is NOT exact (`upsample2x_conv2d` note): the blur
    zero-pads the *cropped* deconv output, whose border ring is nonzero.
    But the UNCROPPED (padding=0) transposed-conv output ``D_full`` of
    size ``2H+2`` is the op's complete support — beyond it everything is
    genuinely zero — and the reference's zero-padded intermediate is
    exactly ``D_full`` with its outer frame zeroed. Hence::

        blur(crop1(D_full))  ==  crop2(deconv(x, w (*) blur, s=2, p=2))
                                 - blur(outer frame of D_full)

    The frame contribution only touches the output's own 1-pixel ring,
    and the frame rows/cols of ``D_full`` are single-kernel-row objects:
    row 0 is a 1-D transposed conv of the FIRST input row with kernel row
    ``w[3]`` (only tap row reaching it), row 2H+1 uses ``w[0]``, and the
    columns use ``w[:, 3]`` / ``w[:, 0]``; the four corners are single
    taps (``w[3,3]*x[0,0]`` etc.), double-counted by both their row and
    column strip and added back once.

    ``w``: (4, 4, Cin, Cout) in conv-equivalent orientation, as
    `conv_transpose2d`. Exact up to float reassociation (tested vs the
    sequential pair at 1e-5 in f32).
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (4, 4), "blur fold is specific to k4 s2 p1"
    kf = np.asarray(filter_kernel, np.float32)
    assert kf.shape == (3,), "3-tap separable blur only"
    # the ring repair below scales the near AND far strips by k1d[0] and
    # all four corners by k2d[0, 0] — valid only for a symmetric kernel
    # (an asymmetric one needs k1d[2] on the bottom/right strips and a
    # per-corner k2d tap); refuse rather than return silently wrong borders
    assert kf[0] == kf[2], "blur fold requires a symmetric filter_kernel"
    k2d = np.outer(kf, kf)
    k2d = k2d / k2d.sum()                       # blur normalization
    k1d = kf / kf.sum()                         # per-axis factor
    corner_w = float(k2d[0, 0])                 # blur tap at distance (1,1)

    # main term: composed 6x6 kernel (composed in f32 — it's kernel-sized),
    # output = 2H x 2W (p=2 crop)
    w6 = compose_kernel_2d(w.astype(jnp.float32),
                           jnp.asarray(k2d, jnp.float32)).astype(x.dtype)
    y = conv_transpose2d(x, w6, stride=2, padding=2)

    def strip_w(row1d, kvec, axis):
        # 1-D full-support transposed conv (stride 2, pad 0) of one input
        # row/col with a single kernel row/col -> length 2L+2
        if axis == "w":
            kern = kvec[None, :, :, :]          # (1, 4, ci, co)
            inp = row1d[:, None, :, :]          # (B, 1, L, ci)
            pad = [(0, 0), (3, 3)]
            dil = (1, 2)
        else:
            kern = kvec[:, None, :, :]
            inp = row1d[:, :, None, :]
            pad = [(3, 3), (0, 0)]
            dil = (2, 1)
        out = lax.conv_general_dilated(
            inp, kern, (1, 1), pad, lhs_dilation=dil,
            dimension_numbers=DIMENSION_NUMBERS,
            preferred_element_type=jnp.float32
            if x.dtype == jnp.float32 else None)
        return out.reshape(out.shape[0], -1, cout)  # (B, 2L+2, co)

    def corr3(strip):
        # valid correlation with the normalized 1-D blur row, scaled by the
        # perpendicular-axis tap at distance 1: weight k2d[0, :] overall
        kk = jnp.asarray(k1d * float(k1d[0]), strip.dtype)
        return (kk[0] * strip[:, :-2] + kk[1] * strip[:, 1:-1]
                + kk[2] * strip[:, 2:])

    wk = w.astype(y.dtype)
    top = corr3(strip_w(x[:, 0], wk[3], "w"))           # (B, 2W, co)
    bot = corr3(strip_w(x[:, -1], wk[0], "w"))
    lef = corr3(strip_w(x[:, :, 0], wk[:, 3], "h"))     # (B, 2H, co)
    rig = corr3(strip_w(x[:, :, -1], wk[:, 0], "h"))

    y = y.at[:, 0, :, :].add(-top)
    y = y.at[:, -1, :, :].add(-bot)
    y = y.at[:, :, 0, :].add(-lef)
    y = y.at[:, :, -1, :].add(-rig)

    # corners: subtracted by BOTH their row and column strip -> add back once
    def corner(px, kcorner):
        return jnp.einsum("bi,io->bo", px.astype(y.dtype), kcorner) * corner_w

    y = y.at[:, 0, 0, :].add(corner(x[:, 0, 0], wk[3, 3]))
    y = y.at[:, 0, -1, :].add(corner(x[:, 0, -1], wk[3, 0]))
    y = y.at[:, -1, 0, :].add(corner(x[:, -1, 0], wk[0, 3]))
    y = y.at[:, -1, -1, :].add(corner(x[:, -1, -1], wk[0, 0]))
    # no bias: blur(deconv(x)+b) != blur(deconv(x))+b at the border (the
    # blur's zero padding attenuates constants) — and the generator's
    # fused-upscale deconv is bias-free (bias rides the later Bias layer)
    return y


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
