"""Space-to-depth decoder inference path (ROADMAP 1a).

The decoder's finest stages are the generate-pipeline's hottest ops and its
worst MXU citizens: at 1024^2 the resblock convs have only 16 output
channels (`networks_seg.py:81-93` semantics, our `models/decoder.py`), so
XLA's conv emitter runs them at ~6% of achievable peak (round-1 profile:
``main_7/conv_1`` 27 ms + ``main_8`` 13 ms per batch-8 step).

This module evaluates the SAME parameters (no retraining, no conversion)
with the last ``n_block_stages`` resblocks and the final stage computed on
the half-resolution block grid with 4x the channels, where the MXU lanes
fill up. Consecutive block stages are bridged by one ``depth_to_space``
each (the only relayout copies in the path). Measured on the round-2
profile, the naive version of this trade lost its winnings to layout
copies, so the design is copy-free elsewhere:

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

Everything is plain XLA (no Pallas). The kernel scatters, bias tiling,
dtype casts, and inference-BN folding depend only on parameters, so hot
loops run them ONCE via :func:`prepare_s2d` and evaluate batches with
:func:`apply_s2d_prepared` — keeping ~40 tiny slice/update ops out of the
per-step program (measured ~0.4 ms apiece on the axon backend).
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


def _plan(dec, n_block_stages: int):
    """(num_feats, start_res, first_block): resblock stages i >= first_block
    run in block space over their input grid; earlier ones run fine."""
    num_feats = len(dec.in_channels)
    sres = dec.start_res
    assert num_feats - sres >= 2, "s2d tail needs a resblock + final stage"
    n_block = max(1, min(n_block_stages, num_feats - 1 - sres))
    return num_feats, sres, num_feats - 1 - n_block


def prepare_s2d(dec, variables: Dict, n_block_stages: int = 3) -> Dict:
    """One-time parameter folding for :func:`apply_s2d_prepared`.

    Hoists everything that depends only on parameters out of the per-batch
    step: the s2d kernel scatters (each is a ~9-op slice/update chain that
    measurably costs device time when re-traced into every step), bias
    tiling, compute-dtype casts, and inference BatchNorm — which collapses
    into the preceding conv:  bn(conv(x, k) + b) == conv(x, k*mul) +
    ((b - mean)*mul + beta)  with  mul = scale*rsqrt(var + eps).

    Returns a pytree of ready-to-run tensors; jit it once per parameter set.
    """
    p = variables["params"]
    bstats = variables.get("batch_stats", {})
    dt = dec.compute_dtype
    num_feats, sres, first_block = _plan(dec, n_block_stages)

    def folded(conv_p, bn_p, bn_s):
        k = conv_p["kernel"].astype(jnp.float32)
        b = conv_p["bias"].astype(jnp.float32)
        if bn_p is not None:
            mul, add = _folded_bn(bn_p, bn_s, jnp.float32)
            k = k * mul
            b = b * mul + add
        return k, b

    stages = {}
    for i in range(sres, num_feats - 1):
        st = {}
        st["cvt_k"], st["cvt_b"] = folded(
            p[f"cvt_{i}_conv"],
            p.get(f"cvt_{i}_bn") if dec.use_bn else None,
            bstats.get(f"cvt_{i}_bn"))
        blk = p[f"main_{i}"]
        blk_s = bstats.get(f"main_{i}", {})
        k0, b0 = folded(blk["conv_0"],
                        blk.get("bn_0") if dec.use_bn else None,
                        blk_s.get("bn_0"))
        k1, b1 = folded(blk["conv_1"],
                        blk.get("bn_1") if dec.use_bn else None,
                        blk_s.get("bn_1"))
        if i < first_block:
            st["k0"], st["b0"], st["k1"], st["b1"] = k0, b0, k1, b1
            if "shortcut" in blk:
                st["ksc"], st["bsc"] = folded(blk["shortcut"], None, None)
        else:
            # block space over the stage-i input grid (fine res = 2*grid)
            st["k0"] = upsample_conv_kernel_s2d(k0)
            st["b0"] = _tile4(b0)
            st["k1"] = conv3x3_kernel_s2d(k1)
            st["b1"] = _tile4(b1)
            if "shortcut" in blk:
                ksc, bsc = folded(blk["shortcut"], None, None)
                # shortcut = 1x1 conv of the nearest-upsampled input; the
                # fine upsample is a parity tile == 4x out-channel repeat
                st["ksc"] = jnp.repeat(ksc, 4, axis=3)
                st["bsc"] = _tile4(bsc)
        stages[str(i)] = st

    i = num_feats - 1
    st = {}
    ck, cb = folded(p[f"cvt_{i}_conv"],
                    p.get(f"cvt_{i}_bn") if dec.use_bn else None,
                    bstats.get(f"cvt_{i}_bn"))
    st["cvt_k"] = strided_parity_kernel(ck)  # fine input -> block space
    st["cvt_b"] = _tile4(cb)
    kf, bf = folded(p[f"main_{i}_conv"], None, None)
    st["kf"] = conv3x3_kernel_s2d(kf)
    st["bf"] = _tile4(bf)
    stages[str(i)] = st

    cast = lambda a: a.astype(dt)
    return {"stages": jax.tree_util.tree_map(cast, stages)}


def _conv_site(hook, stage: int, st: Dict, x, kkey: str, bkey: str, **kw):
    """Every conv in :func:`apply_s2d_prepared` routes through this seam so
    alternative executions can swap the conv WITHOUT duplicating the stage
    walk — int8 quantized inference and calibration stat collection live in
    `ops/quant.py` as hooks. ``hook(stage, st, x, kkey, bkey, **kw)``
    replaces the conv (bias included) when given."""
    if hook is not None:
        return hook(stage, st, x, kkey, bkey, **kw)
    return conv2d(x, st[kkey], st[bkey], **kw)


def apply_s2d_prepared(dec, prepared: Dict, inputs: List[jnp.ndarray],
                       n_block_stages: int = 3,
                       fine_logits: bool = False,
                       conv_hook=None) -> jnp.ndarray:
    """Inference-equivalent of ``dec.apply(variables, inputs, False)`` from
    a :func:`prepare_s2d` tree (``n_block_stages`` must match).

    The last ``n_block_stages`` resblocks run on the half-resolution block
    grid with 4x the channels (full MXU lanes); consecutive block stages are
    bridged by one ``depth_to_space`` each, and the final stage consumes the
    last resblock's block output directly. Returns logits in channel-major
    s2d layout (N, H/2, W/2, 4*nc) — ``class_mask_s2d`` for the mask, or
    ``fine_logits=True`` for the standard (N, H, W, nc) tensor.

    ``conv_hook``: optional conv replacement (see :func:`_conv_site`); the
    ``prepared`` tree must then carry whatever per-site tensors the hook
    reads (e.g. the int8 kernels + scales of `ops/quant.prepare_s2d_int8`).
    """
    dt = dec.compute_dtype
    num_feats, sres, first_block = _plan(dec, n_block_stages)
    stages = prepared["stages"]

    from ..ops.resize import upsample_nearest_2x

    def conv(stage, st, x, kkey, bkey, **kw):
        return _conv_site(conv_hook, stage, st, x, kkey, bkey, **kw)

    prev = None
    for i in range(sres, num_feats - 1):
        st = stages[str(i)]
        x = _lrelu(conv(i, st, inputs[i].astype(dt), "cvt_k", "cvt_b",
                        padding=1))
        if i > sres:
            x = jnp.concatenate([prev, x], axis=-1)
        if i < first_block:
            x = upsample_nearest_2x(x)
            y = _lrelu(conv(i, st, x, "k0", "b0", padding=1))
            y = _lrelu(conv(i, st, y, "k1", "b1", padding=1))
            sc = (conv(i, st, x, "ksc", "bsc", padding=0)
                  if "ksc" in st else x)
            prev = sc + y
        else:
            y = _lrelu(conv(i, st, x, "k0", "b0", padding=1))
            y = _lrelu(conv(i, st, y, "k1", "b1", padding=1))
            sc = (conv(i, st, x, "ksc", "bsc", padding=0)
                  if "ksc" in st else jnp.repeat(x, 4, axis=-1))
            blk = sc + y  # (N, r, r, 4*features[i+1]) over the stage-i grid
            # the next resblock needs its fine input; the final stage
            # consumes block layout directly (channel-major concat)
            prev = blk if i == num_feats - 2 else depth_to_space(blk)

    i = num_feats - 1
    st = stages[str(i)]
    x = _lrelu(conv(i, st, inputs[i].astype(dt), "cvt_k", "cvt_b",
                    stride=2, padding=1))
    cat = jnp.concatenate([prev, x], axis=-1)
    logits = conv(i, st, cat, "kf", "bf", padding=1)
    if fine_logits:
        return depth_to_space(logits).astype(jnp.float32)
    return logits


def decoder_apply_s2d(dec, variables: Dict, inputs: List[jnp.ndarray],
                      fine_logits: bool = False,
                      n_block_stages: int = 3) -> jnp.ndarray:
    """Inference-equivalent of ``dec.apply(variables, inputs, False)``.

    Convenience wrapper: prepares and applies in one trace. Hot loops should
    call :func:`prepare_s2d` once and :func:`apply_s2d_prepared` per batch
    instead, keeping the parameter folding out of the step program.
    """
    prepared = prepare_s2d(dec, variables, n_block_stages)
    return apply_s2d_prepared(dec, prepared, inputs, n_block_stages,
                              fine_logits)


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
