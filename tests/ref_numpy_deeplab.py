"""Independent pure-numpy transliteration of the DeepLab head math.

Companion to `tests/ref_numpy.py` (VERDICT r3 #2 — an oracle that shares
no code with the package so a bug baked into both an implementation and
its self-generated goldens cannot hide). This module re-derives the
DeepLabV3/V3+ HEAD forward DIRECTLY from the reference sources:

  - ASPP: 1x1 + three dilated 3x3 branches + global-pool branch +
    projection (`/root/reference/deeplabv3plus/lib/model/deeplabv3plus.py:300-335`)
  - SeparableConv with the asymmetric "same" padding and the
    depth_activation relu placement (`:338-378`)
  - skip projection (32ch 1x1) + concat order aspp-then-skip (`:200-226`)
  - aux `_FCNHead` (gluoncv semantics: inter = C/4, 3x3 -> BN -> relu ->
    dropout -> 1x1; consumed at `deeplabv3plus.py:166-171`)
  - `contrib.BilinearResize2D` align-corners sampling (`:213-224`)
  - plain DeepLabV3 head: ASPP -> 3x3 conv block -> classifier
    (`/root/reference/deeplabv3plus/lib/model/deeplabv3.py:60-77`)

Numpy only — no jax, no package imports. Layout is NHWC / HWIO (the
package's native layout; disclosed here because unlike `ref_numpy.py`
this oracle consumes flax-initialized trees rather than mxnet weight
files — the INDEPENDENCE is in the math, every op below is written from
the reference's mxnet source, not from `gan_segmentation_tpu`).
Eval-mode by contract (BN uses running stats; Dropout is identity).
"""

import numpy as np

_BN_EPS = 1e-5


# -------------------------------------------------------------------------
# primitives (NHWC, float32)
# -------------------------------------------------------------------------

def conv2d(x, w, b=None, stride=1, pad=(0, 0), dilation=1, groups=1):
    """Cross-correlation, mxnet ``F.Convolution`` semantics. x (N,H,W,C),
    w (kh,kw,Cin/groups,Cout); ``pad`` is the (begin, end) pair applied to
    BOTH spatial dims (the reference's SeparableConv computes asymmetric
    same-padding this way, `deeplabv3plus.py:372-378`)."""
    n, h, ww, c = x.shape
    kh, kw, cg, o = w.shape
    assert c == cg * groups, (c, cg, groups)
    og = o // groups
    pb, pe = pad
    xp = np.pad(x, ((0, 0), (pb, pe), (pb, pe), (0, 0)))
    ekh = kh + (kh - 1) * (dilation - 1)
    ekw = kw + (kw - 1) * (dilation - 1)
    ho = (h + pb + pe - ekh) // stride + 1
    wo = (ww + pb + pe - ekw) // stride + 1
    out = np.zeros((n, ho, wo, o), np.float32)
    for g in range(groups):
        xg = xp[..., g * cg:(g + 1) * cg]
        wg = w[..., g * og:(g + 1) * og]
        for ki in range(kh):
            for kj in range(kw):
                di, dj = ki * dilation, kj * dilation
                patch = xg[:, di:di + ho * stride:stride,
                           dj:dj + wo * stride:stride]
                out[..., g * og:(g + 1) * og] += np.einsum(
                    "nhwc,co->nhwo", patch, wg[ki, kj], optimize=True)
    if b is not None:
        out += b.reshape(1, 1, 1, -1)
    return out.astype(np.float32)


def bn_eval(x, p, s):
    """Inference BatchNorm from params p={scale,bias}, stats s={mean,var}."""
    inv = 1.0 / np.sqrt(s["var"] + _BN_EPS)
    return (x - s["mean"]) * inv * p["scale"] + p["bias"]


def relu(x):
    return np.maximum(x, 0.0)


def _align_corners_axis(x, out_size, axis):
    """mxnet ``contrib.BilinearResize2D`` align-corners sampling along one
    axis: src = i * (in-1)/(out-1) (`deeplabv3plus.py:213-224` semantics)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if out_size == 1 or in_size == 1:
        idx = np.zeros(out_size, np.int64)
        return np.take(x, idx, axis=axis)
    src = np.arange(out_size, dtype=np.float32) * ((in_size - 1) /
                                                   (out_size - 1))
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    f = (src - i0).astype(np.float32)
    shape = [1] * x.ndim
    shape[axis] = out_size
    f = f.reshape(shape)
    return (np.take(x, i0, axis=axis) * (1.0 - f)
            + np.take(x, i1, axis=axis) * f)


def bilinear_align_corners(x, out_h, out_w):
    x = _align_corners_axis(x.astype(np.float32), out_h, 1)
    return _align_corners_axis(x, out_w, 2)


def same_pad(kernel_size, dilation):
    """Asymmetric (begin, end) same padding (`deeplabv3plus.py:372-378`)."""
    eff = kernel_size + (kernel_size - 1) * (dilation - 1)
    total = eff - 1
    beg = total // 2
    return beg, total - beg


# -------------------------------------------------------------------------
# head modules (params/stats are the flax subtrees for the same module)
# -------------------------------------------------------------------------

def separable_conv(x, p, s, dilation=1, depth_activation=True):
    """`deeplabv3plus.py:338-369`: optional pre-relu, depthwise 3x3 with
    same-padding (+BN, relu if depth_activation), pointwise 1x1 (+BN,
    relu if depth_activation)."""
    if not depth_activation:
        x = relu(x)
    c = x.shape[-1]
    x = conv2d(x, p["depthwise"]["kernel"], pad=same_pad(3, dilation),
               dilation=dilation, groups=c)
    x = bn_eval(x, p["depthwise_bn"], s["depthwise_bn"])
    if depth_activation:
        x = relu(x)
    x = conv2d(x, p["pointwise"]["kernel"])
    x = bn_eval(x, p["pointwise_bn"], s["pointwise_bn"])
    if depth_activation:
        x = relu(x)
    return x


def aspp(x, p, s, rates=(12, 24, 36)):
    """`deeplabv3plus.py:300-335`: 1x1 branch, three dilated 3x3 branches
    (pad = rate), a global-pool branch broadcast back to the grid, concat
    in that order, 1x1 projection; Dropout(0.5) is eval-identity."""
    branches = [relu(bn_eval(conv2d(x, p["b0_conv"]["kernel"]),
                             p["b0_bn"], s["b0_bn"]))]
    for bi, rate in enumerate(rates, start=1):
        y = conv2d(x, p[f"b{bi}_conv"]["kernel"], pad=(rate, rate),
                   dilation=rate)
        branches.append(relu(bn_eval(y, p[f"b{bi}_bn"], s[f"b{bi}_bn"])))
    pool = np.mean(x.astype(np.float32), axis=(1, 2), keepdims=True)
    pool = relu(bn_eval(conv2d(pool, p["pool_conv"]["kernel"]),
                        p["pool_bn"], s["pool_bn"]))
    branches.append(np.broadcast_to(pool, x.shape[:3] + pool.shape[3:]))
    y = np.concatenate(branches, axis=-1)
    y = relu(bn_eval(conv2d(y, p["project_conv"]["kernel"]),
                     p["project_bn"], s["project_bn"]))
    return y


def fcn_head(x, p, s):
    """gluoncv ``_FCNHead``: inter = C/4, 3x3 pad1 (no bias) -> BN -> relu
    -> Dropout(0.1, eval-identity) -> 1x1 classifier (with bias)."""
    x = conv2d(x, p["conv0"]["kernel"], pad=(1, 1))
    x = relu(bn_eval(x, p["bn0"], s["bn0"]))
    return conv2d(x, p["conv1"]["kernel"], p["conv1"]["bias"])


def deeplab_v3plus_head(c1, c3, c4, params, stats, out_hw, aux=True):
    """`deeplabv3plus.py:200-226`: skip = 32ch 1x1+BN+relu of c1; y =
    ASPP(c4) bilinear-resized to the skip grid; concat (y, skip); two
    SeparableConv(256, depth_activation); 1x1 classifier (bias); bilinear
    to out_hw; aux = _FCNHead(c3) resized likewise."""
    p, s = params, stats
    c1p = relu(bn_eval(conv2d(c1, p["skip_project"]["conv"]["kernel"]),
                       p["skip_project"]["bn"], s["skip_project"]["bn"]))
    y = aspp(c4, p["aspp"], s["aspp"])
    y = bilinear_align_corners(y, c1p.shape[1], c1p.shape[2])
    y = np.concatenate([y, c1p], axis=-1)
    y = separable_conv(y, p["head_sep0"], s["head_sep0"])
    y = separable_conv(y, p["head_sep1"], s["head_sep1"])
    y = conv2d(y, p["head_classifier"]["kernel"],
               p["head_classifier"]["bias"])
    outs = [bilinear_align_corners(y, *out_hw)]
    if aux:
        a = fcn_head(c3, p["auxlayer"], s["auxlayer"])
        outs.append(bilinear_align_corners(a, *out_hw))
    return tuple(outs)


def deeplab_v3_head(c3, c4, params, stats, out_hw, aux=True):
    """`deeplabv3.py:60-77`: ASPP -> 3x3 conv block (pad 1, no bias, BN,
    relu, Dropout(0.1) eval-identity) -> 1x1 classifier -> bilinear;
    aux = _FCNHead(c3)."""
    p, s = params, stats
    y = aspp(c4, p["aspp"], s["aspp"])
    y = conv2d(y, p["head_conv"]["kernel"], pad=(1, 1))
    y = relu(bn_eval(y, p["head_bn"], s["head_bn"]))
    y = conv2d(y, p["head_classifier"]["kernel"],
               p["head_classifier"]["bias"])
    outs = [bilinear_align_corners(y, *out_hw)]
    if aux:
        a = fcn_head(c3, p["auxlayer"], s["auxlayer"])
        outs.append(bilinear_align_corners(a, *out_hw))
    return tuple(outs)


# -------------------------------------------------------------------------
# backbone: gluoncv resnet50_v1s deep-stem dilated (the model the
# reference wraps at `deeplabv3plus.py:92-100`; dilation rules as in the
# in-repo dilated variant `/root/reference/deeplabv3plus/lib/model/
# resnext_dilated.py:143-221`: dilated stages run stride 1 with dilation
# 2/4, the first block of a dilation-4 stage uses dilation 2, and the
# first block of a dilation-2 stage uses dilation 1)
# -------------------------------------------------------------------------

def max_pool_3x3_s2_p1(x):
    """gluoncv stem maxpool: 3x3, stride 2, pad 1 (pad value -inf)."""
    n, h, w, c = x.shape
    xp = np.full((n, h + 2, w + 2, c), -np.inf, np.float32)
    xp[:, 1:h + 1, 1:w + 1] = x
    ho, wo = (h + 2 - 3) // 2 + 1, (w + 2 - 3) // 2 + 1
    out = np.full((n, ho, wo, c), -np.inf, np.float32)
    for ki in range(3):
        for kj in range(3):
            out = np.maximum(out, xp[:, ki:ki + ho * 2:2, kj:kj + wo * 2:2])
    return out


def bottleneck_v1b(x, p, s, stride=1, dilation=1):
    """gluoncv BottleneckV1b: 1x1 -> BN -> relu, 3x3 (stride, dilation,
    pad=dilation) -> BN -> relu, 1x1 -> BN, optional 1x1-strided
    downsample on the residual, relu(sum)."""
    out = relu(bn_eval(conv2d(x, p["conv1"]["kernel"]), p["bn1"], s["bn1"]))
    out = conv2d(out, p["conv2"]["kernel"], stride=stride,
                 pad=(dilation, dilation), dilation=dilation)
    out = relu(bn_eval(out, p["bn2"], s["bn2"]))
    out = bn_eval(conv2d(out, p["conv3"]["kernel"]), p["bn3"], s["bn3"])
    if "downsample_conv" in p:
        res = conv2d(x, p["downsample_conv"]["kernel"], stride=stride)
        res = bn_eval(res, p["downsample_bn"], s["downsample_bn"])
    else:
        res = x
    return relu(out + res)


def _resnet_stage(x, p, s, idx, blocks, stride, dilation):
    first_dilation = 1 if dilation <= 2 else dilation // 2
    x = bottleneck_v1b(x, p[f"layer{idx}_block0"], s[f"layer{idx}_block0"],
                       stride=stride, dilation=first_dilation)
    for b in range(1, blocks):
        x = bottleneck_v1b(x, p[f"layer{idx}_block{b}"],
                           s[f"layer{idx}_block{b}"], dilation=dilation)
    return x


def resnet_v1s_forward(x, p, s, layers=(3, 4, 6, 3), dilated=True):
    """Deep-stem ResNet-v1s (stem 3x3 s2 -> 3x3 -> 3x3 doubling width,
    maxpool 3x3 s2 p1), four bottleneck stages; returns (c1, c3, c4)."""
    for i in range(3):
        x = conv2d(x, p[f"stem_conv{i}"]["kernel"],
                   stride=2 if i == 0 else 1, pad=(1, 1))
        x = relu(bn_eval(x, p[f"stem_bn{i}"], s[f"stem_bn{i}"]))
    x = max_pool_3x3_s2_p1(x)
    c1 = _resnet_stage(x, p, s, 1, layers[0], 1, 1)
    c2 = _resnet_stage(c1, p, s, 2, layers[1], 2, 1)
    if dilated:
        c3 = _resnet_stage(c2, p, s, 3, layers[2], 1, 2)
        c4 = _resnet_stage(c3, p, s, 4, layers[3], 1, 4)
    else:
        c3 = _resnet_stage(c2, p, s, 3, layers[2], 2, 1)
        c4 = _resnet_stage(c3, p, s, 4, layers[3], 2, 1)
    return c1, c3, c4


def deeplab_v3plus_forward(x, params, stats, out_hw=None, aux=True):
    """Full-model oracle: deep-stem dilated backbone + V3+ head."""
    out_hw = out_hw or (x.shape[1], x.shape[2])
    c1, c3, c4 = resnet_v1s_forward(x, params["backbone"],
                                    stats["backbone"])
    return deeplab_v3plus_head(c1, c3, c4, params, stats, out_hw, aux=aux)


# -------------------------------------------------------------------------
# ResNeXt dilated backbone (+SE): transliterated from the reference's
# IN-REPO source `/root/reference/deeplabv3plus/lib/model/resnext_dilated.py`
# (`Block` :60-114, stem :152-157, `_make_layer` dilation rules :196-214):
# 7x7 s2 p3 stem, grouped 3x3 bottlenecks (D = floor(channels*bw/64),
# group_width = cardinality*D), EVERY stage's first block downsampling
# (1x1, stride), dilation-2 stages starting at dilation 1 and dilation-4
# stages at 2, SE = 1x1(channels//4)+relu -> 1x1(channels*4)+sigmoid with
# BIAS on both (mxnet Conv2D default), and the last_gamma quirk: the
# final bottleneck BN zero-inits gamma when last_gamma is FALSE (:77-81)
# — a weight-init fact, invisible here because stats/params arrive
# randomized, but reproduced by the package init and tested there.
# -------------------------------------------------------------------------

def resnext_block(x, p, s, cardinality, stride=1, dilation=1,
                  use_se=False):
    out = relu(bn_eval(conv2d(x, p["conv1"]["kernel"]), p["bn1"], s["bn1"]))
    out = conv2d(out, p["conv2"]["kernel"], stride=stride,
                 pad=(dilation, dilation), dilation=dilation,
                 groups=cardinality)
    out = relu(bn_eval(out, p["bn2"], s["bn2"]))
    out = bn_eval(conv2d(out, p["conv3"]["kernel"]), p["bn3"], s["bn3"])
    if use_se:
        w = np.mean(out, axis=(1, 2), keepdims=True)
        w = relu(conv2d(w, p["se_conv1"]["kernel"], p["se_conv1"]["bias"]))
        w = conv2d(w, p["se_conv2"]["kernel"], p["se_conv2"]["bias"])
        w = 1.0 / (1.0 + np.exp(-w))
        out = out * w
    if "downsample_conv" in p:
        res = conv2d(x, p["downsample_conv"]["kernel"], stride=stride)
        res = bn_eval(res, p["downsample_bn"], s["downsample_bn"])
    else:
        res = x
    return relu(out + res)


def _resnext_stage(x, p, s, idx, blocks, stride, dilation, cardinality,
                   use_se):
    first_dilation = 2 if dilation == 4 else 1
    x = resnext_block(x, p[f"layer{idx}_block0"], s[f"layer{idx}_block0"],
                      cardinality, stride=stride, dilation=first_dilation,
                      use_se=use_se)
    for b in range(1, blocks):
        x = resnext_block(x, p[f"layer{idx}_block{b}"],
                          s[f"layer{idx}_block{b}"], cardinality,
                          dilation=dilation, use_se=use_se)
    return x


def resnext_dilated_forward(x, p, s, layers=(3, 4, 6, 3), cardinality=32,
                            use_se=False, dilated=True):
    """7x7 stem + four grouped-bottleneck stages; returns (c1, c3, c4)."""
    x = conv2d(x, p["stem_conv"]["kernel"], stride=2, pad=(3, 3))
    x = relu(bn_eval(x, p["stem_bn"], s["stem_bn"]))
    x = max_pool_3x3_s2_p1(x)
    c1 = _resnext_stage(x, p, s, 1, layers[0], 1, 1, cardinality, use_se)
    c2 = _resnext_stage(c1, p, s, 2, layers[1], 2, 1, cardinality, use_se)
    if dilated:
        c3 = _resnext_stage(c2, p, s, 3, layers[2], 1, 2, cardinality,
                            use_se)
        c4 = _resnext_stage(c3, p, s, 4, layers[3], 1, 4, cardinality,
                            use_se)
    else:
        c3 = _resnext_stage(c2, p, s, 3, layers[2], 2, 1, cardinality,
                            use_se)
        c4 = _resnext_stage(c3, p, s, 4, layers[3], 2, 1, cardinality,
                            use_se)
    return c1, c3, c4
