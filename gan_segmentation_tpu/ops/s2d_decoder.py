"""Space-to-depth decoder inference path (ROADMAP 1a).

The decoder's finest stages are the generate-pipeline's hottest ops and its
worst MXU citizens: at 1024^2 the resblock convs have only 16 output
channels (`networks_seg.py:81-93` semantics, our `models/decoder.py`), so
XLA's conv emitter runs them at ~6% of achievable peak (round-1 profile:
``main_7/conv_1`` 27 ms + ``main_8`` 13 ms per batch-8 step).

This module evaluates the SAME parameters (no retraining, no conversion)
with the last resblock and the final stage computed on the half-resolution
block grid with 4x the channels, where the MXU lanes fill up. Measured on
the round-2 profile, the naive version of this trade lost its winnings to
layout copies, so the design is copy-free:

- **Channel-major s2d layout**: block channel index = fine_channel*4 +
  parity (parity = a*2 + b for fine pixel (2i+a, 2j+b)). Consequences:
  fine channel-concat == plain block channel-concat (no interleave copy),
  per-fine-channel vectors tile with ``jnp.repeat(v, 4)``, and the binary
  mask is one contiguous slice-compare.
- **No explicit space_to_depth of inputs**: a fine-grid tensor enters
  block space through a stride-2 4x4 conv whose kernel embeds the fine
  3x3 kernel at all four (a, b) offsets (``strided_parity_kernel``) — the
  relayout rides the conv instead of a 1 GB transpose copy.
- ``conv_0`` consumes ``upsample_nearest_2x(x)``; on the block grid the
  nearest-neighbor taps collapse, so it becomes one 3x3 block conv
  C_in -> 4*C_out with a scattered kernel (``upsample_conv_kernel_s2d``,
  same dense MAC count as the fine-grid conv).
- fine 3x3 convs on block-space activations become 3x3 block convs
  4*C_in -> 4*C_out (``conv3x3_kernel_s2d``); block padding 1 maps
  bijectively onto fine padding 1, so boundaries are exact.
- the resblock's 1x1 shortcut acts on the pre-upsample input; its fine
  upsample is a parity tile, folded into the kernel with
  ``jnp.repeat(w, 4, axis=3)``.
- BN (inference, folded to mul/add in f32) and LeakyReLU are per-fine-
  channel elementwise. Only the final uint8 mask (or, for parity tests,
  the logits) crosses back through one depth-to-space.

Everything is plain XLA (no Pallas): the scatter kernels are built from
the decoder's own parameters at trace time and fold into the convs.
"""

from typing import Dict, List

import jax
import jax.numpy as jnp

from .conv import conv2d

_LEAKY_SLOPE = 0.2
_BN_EPS = 1e-5

# Fine-kernel tap (ky) -> (block offset index dy in 0..2, input parity a')
# for a fine 3x3 conv evaluated on the block grid, per output parity a.
#   a=0: fine rows 2i-1, 2i, 2i+1 -> (i-1, p1), (i, p0), (i, p1)
#   a=1: fine rows 2i,  2i+1, 2i+2 -> (i, p0), (i, p1), (i+1, p0)
_ROW_S2D = {0: ((0, 0, 1), (1, 1, 0), (2, 1, 1)),
            1: ((0, 1, 0), (1, 1, 1), (2, 2, 0))}

# Same for a conv applied to nearest-2x-upsampled input: u[m] = x[m//2],
# so taps collapse onto x blocks (no input parity — input is pre-upsample).
#   a=0: x rows i-1, i, i   |   a=1: x rows i, i, i+1
_ROW_UP = {0: ((0, 0), (1, 1), (2, 1)),
           1: ((0, 1), (1, 1), (2, 2))}


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, 2H, 2W, C) -> (N, H, W, 4C), channel-major (index = c*4 + p)."""
    n, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(n, h, 2, w, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # N,H,W,C,a,b
    return x.reshape(n, h, w, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 4C) channel-major -> (N, 2H, 2W, C)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, c, 2, 2)    # N,H,W,C,a,b
    x = x.transpose(0, 1, 4, 2, 5, 3)  # N,H,a,W,b,C
    return x.reshape(n, 2 * h, 2 * w, c)


def upsample_conv_kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) fine kernel for conv(upsample2x(x)) -> (3,3,Ci,4Co)
    block kernel consuming x directly (channel-major output)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, ci, 4 * co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            p = a * 2 + b
            for ky, dy in _ROW_UP[a]:
                for kx, dx in _ROW_UP[b]:
                    out = out.at[dy, dx, :, p::4].add(w[ky, kx])
    return out


def conv3x3_kernel_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) fine kernel -> (3,3,4Ci,4Co) block kernel, channel-major
    on both sides (input already in block space)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            p = a * 2 + b
            for ky, dy, ap in _ROW_S2D[a]:
                for kx, dx, bp in _ROW_S2D[b]:
                    pin = ap * 2 + bp
                    out = out.at[dy, dx, pin::4, p::4].set(w[ky, kx])
    return out


def strided_parity_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Ci,Co) fine kernel -> (4,4,Ci,4Co) stride-2 kernel that maps a
    FINE-grid input directly to channel-major block space: the stride-2
    window at block (i,j) covers fine rows 2i-1..2i+2 (padding 1); parity
    (a,b) lives at window offset (a, b)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((4, 4, ci, 4 * co), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            p = a * 2 + b
            out = out.at[a:a + 3, b:b + 3, :, p::4].set(w)
    return out


def _tile4(v: jnp.ndarray) -> jnp.ndarray:
    """Per-fine-channel vector -> channel-major s2d vector."""
    return jnp.repeat(v, 4)


def _folded_bn(params: Dict, stats: Dict, dtype):
    """Inference BN -> (mul, add), folded in f32."""
    scale = params["scale"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    mean = stats["mean"].astype(jnp.float32)
    var = stats["var"].astype(jnp.float32)
    mul = scale * jax.lax.rsqrt(var + _BN_EPS)
    add = bias - mean * mul
    return mul.astype(dtype), add.astype(dtype)


def _lrelu(x):
    return jnp.where(x >= 0, x, _LEAKY_SLOPE * x)


def decoder_apply_s2d(dec, variables: Dict, inputs: List[jnp.ndarray],
                      fine_logits: bool = False) -> jnp.ndarray:
    """Inference-equivalent of ``dec.apply(variables, inputs, False)``.

    ``dec``: a `models.decoder.Decoder` (supplies the static config).
    Returns logits in channel-major s2d layout (N, H/2, W/2, 4*nc) — pass
    through ``class_mask_s2d`` for the mask, or set ``fine_logits=True``
    for the standard (N, H, W, nc) tensor (one depth-to-space).
    """
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    dt = dec.compute_dtype
    num_feats = len(dec.in_channels)
    sres = dec.start_res
    assert num_feats - sres >= 2, "s2d tail needs a resblock + final stage"

    def cvt(i, x, s2d):
        kern = p[f"cvt_{i}_conv"]["kernel"].astype(dt)
        bias = p[f"cvt_{i}_conv"]["bias"]
        if s2d:  # fine input -> block space through the conv itself
            kern = strided_parity_kernel(kern)
            bias = _tile4(bias)
            y = conv2d(x.astype(dt), kern, bias.astype(dt), stride=2,
                       padding=1)
        else:
            y = conv2d(x.astype(dt), kern, bias.astype(dt), padding=1)
        if dec.use_bn:
            mul, add = _folded_bn(p[f"cvt_{i}_bn"], bs[f"cvt_{i}_bn"], dt)
            if s2d:
                mul, add = _tile4(mul), _tile4(add)
            y = y * mul + add
        return _lrelu(y)

    prev = None
    # ---- standard stages (everything before the last resblock) ----
    from ..ops.resize import upsample_nearest_2x

    for i in range(sres, num_feats - 2):
        x = cvt(i, inputs[i], s2d=False)
        if i > sres:
            x = jnp.concatenate([prev, x], axis=-1)
        x = upsample_nearest_2x(x)
        blk = p[f"main_{i}"]
        y = conv2d(x, blk["conv_0"]["kernel"].astype(dt),
                   blk["conv_0"]["bias"].astype(dt), padding=1)
        if dec.use_bn:
            mul, add = _folded_bn(blk["bn_0"], bs[f"main_{i}"]["bn_0"], dt)
            y = y * mul + add
        y = _lrelu(y)
        y = conv2d(y, blk["conv_1"]["kernel"].astype(dt),
                   blk["conv_1"]["bias"].astype(dt), padding=1)
        if dec.use_bn:
            mul, add = _folded_bn(blk["bn_1"], bs[f"main_{i}"]["bn_1"], dt)
            y = y * mul + add
        y = _lrelu(y)
        sc = x
        if "shortcut" in blk:
            sc = conv2d(x, blk["shortcut"]["kernel"].astype(dt),
                        blk["shortcut"]["bias"].astype(dt), padding=0)
        prev = sc + y

    # ---- last resblock, in block space over its INPUT grid --------------
    i = num_feats - 2
    x = cvt(i, inputs[i], s2d=False)
    if i > sres:
        x = jnp.concatenate([prev, x], axis=-1)
    x = x.astype(dt)
    blk = p[f"main_{i}"]
    w0 = upsample_conv_kernel_s2d(blk["conv_0"]["kernel"].astype(dt))
    y = conv2d(x, w0, _tile4(blk["conv_0"]["bias"]).astype(dt), padding=1)
    if dec.use_bn:
        mul, add = _folded_bn(blk["bn_0"], bs[f"main_{i}"]["bn_0"], dt)
        y = y * _tile4(mul) + _tile4(add)
    y = _lrelu(y)
    w1 = conv3x3_kernel_s2d(blk["conv_1"]["kernel"].astype(dt))
    y = conv2d(y, w1, _tile4(blk["conv_1"]["bias"]).astype(dt), padding=1)
    if dec.use_bn:
        mul, add = _folded_bn(blk["bn_1"], bs[f"main_{i}"]["bn_1"], dt)
        y = y * _tile4(mul) + _tile4(add)
    y = _lrelu(y)
    # shortcut = 1x1 conv of the upsampled input; the fine nearest-upsample
    # is a parity tile, i.e. a 4x output-channel repeat of the 1x1 kernel
    if "shortcut" in blk:
        wsc = jnp.repeat(blk["shortcut"]["kernel"].astype(dt), 4, axis=3)
        sc = conv2d(x, wsc, _tile4(blk["shortcut"]["bias"]).astype(dt),
                    padding=0)
    else:
        sc = jnp.repeat(x, 4, axis=-1)
    prev_s2d = sc + y  # (N, r, r, 4*features[i+1]) over the stage-i grid

    # ---- final stage, fully in block space --------------------------------
    i = num_feats - 1
    x8 = cvt(i, inputs[i], s2d=True)
    # fine channel-concat == block channel-concat in channel-major layout
    cat = jnp.concatenate([prev_s2d, x8], axis=-1)
    wf = conv3x3_kernel_s2d(p[f"main_{i}_conv"]["kernel"].astype(dt))
    logits = conv2d(cat, wf, _tile4(p[f"main_{i}_conv"]["bias"]).astype(dt),
                    padding=1)
    if fine_logits:
        return depth_to_space(logits).astype(jnp.float32)
    return logits


def class_mask_s2d(logits_s2d: jnp.ndarray, nclass: int) -> jnp.ndarray:
    """argmax over the class axis of channel-major s2d logits -> fine uint8
    mask. For the binary case this is one contiguous slice-compare."""
    n, h, w, _ = logits_s2d.shape
    if nclass == 2:
        m = (logits_s2d[..., 4:8] > logits_s2d[..., 0:4]).astype(jnp.uint8)
    else:
        ls = logits_s2d.reshape(n, h, w, nclass, 4)
        m = jnp.argmax(ls, axis=3).astype(jnp.uint8)
    return depth_to_space(m)[..., 0]  # (n,h,w,4) channel == parity == 4*C=1
