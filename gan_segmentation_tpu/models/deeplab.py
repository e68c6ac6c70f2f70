"""DeepLabV3 / DeepLabV3+ heads over the dilated ResNet backbone.

TPU-native re-design of `deeplabv3plus/lib/model/deeplabv3plus.py` and
`deeplabv3.py`:
- ``ASPP``: 1x1 branch + three dilated 3x3 branches (rates 12/24/36) +
  global-pool branch, projection with Dropout 0.5 (`deeplabv3plus.py:300-335`);
- ``SkipProject``: 1x1 -> 32ch BN relu on c1 (`:229-240`);
- head: two depthwise-separable convs (depth_activation) + 1x1 classifier
  (`:243-260`, `SeparableConv` `:338-378` incl. its asymmetric same-padding);
- aux ``FCNHead`` on c3 (gluoncv `_FCNHead`: 3x3 -> C/4, BN, relu,
  dropout 0.1, 1x1);
- bilinear (align-corners) resizes matching mxnet ``BilinearResize2D``.

The reference boosts head/aspp/skip/aux learning rates 10x
(`deeplabv3plus.py:172-186`); here that is expressed as an optax
``multi_transform`` label on the corresponding parameter subtrees — see
``head_param_labels``.
"""

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import bilinear_resize, global_avg_pool
from .resnet import ResNetV1s, resnet50_v1s, resnet101_v1s, resnet152_v1s

HEAD_LR_MULT = 10.0  # `deeplabv3plus.py:174,178,182,186`


def _bn(train, name, dtype=jnp.float32):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def _same_padding(kernel_size: int, dilation: int) -> Tuple[int, int]:
    """`deeplabv3plus.py:372-378` — asymmetric (beg, end) same padding."""
    eff = kernel_size + (kernel_size - 1) * (dilation - 1)
    total = eff - 1
    beg = total // 2
    return beg, total - beg


class SeparableConv(nn.Module):
    """depthwise 3x3 (+BN) + pointwise 1x1 (+BN), relu placement per
    ``depth_activation`` (`deeplabv3plus.py:338-369`)."""

    out_filters: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    depth_activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_f = x.shape[-1]
        if not self.depth_activation:
            x = nn.relu(x)
        pad = _same_padding(self.kernel_size, self.dilation)
        x = nn.Conv(in_f, (self.kernel_size, self.kernel_size),
                    strides=self.strides, padding=(pad, pad),
                    kernel_dilation=self.dilation, feature_group_count=in_f,
                    use_bias=False, dtype=self.dtype, name="depthwise")(x)
        x = _bn(train, "depthwise_bn", self.dtype)(x)
        if self.depth_activation:
            x = nn.relu(x)
        x = nn.Conv(self.out_filters, (1, 1), use_bias=False,
                    dtype=self.dtype, name="pointwise")(x)
        x = _bn(train, "pointwise_bn", self.dtype)(x)
        if self.depth_activation:
            x = nn.relu(x)
        return x


class ASPP(nn.Module):
    atrous_rates: Tuple[int, int, int] = (12, 24, 36)
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.out_channels
        dt = self.dtype
        b0 = nn.relu(_bn(train, "b0_bn", dt)(
            nn.Conv(c, (1, 1), use_bias=False, dtype=dt, name="b0_conv")(x)))
        branches = [b0]
        for bi, rate in enumerate(self.atrous_rates, start=1):
            y = nn.Conv(c, (3, 3), padding=rate, kernel_dilation=rate,
                        use_bias=False, dtype=dt, name=f"b{bi}_conv")(x)
            branches.append(nn.relu(_bn(train, f"b{bi}_bn", dt)(y)))
        # global pooling branch (`_AsppPooling`, `deeplabv3plus.py:274-297`)
        pool = global_avg_pool(x, keepdims=True)
        pool = nn.Conv(c, (1, 1), use_bias=False, dtype=dt,
                       name="pool_conv")(pool)
        pool = nn.relu(_bn(train, "pool_bn", dt)(pool))
        pool = jnp.broadcast_to(pool, x.shape[:3] + (c,))
        branches.append(pool)

        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(c, (1, 1), use_bias=False, dtype=dt,
                    name="project_conv")(y)
        y = nn.relu(_bn(train, "project_bn", dt)(y))
        y = nn.Dropout(0.5, deterministic=not train, name="project_dropout")(y)
        return y


class FCNHead(nn.Module):
    """gluoncv ``_FCNHead`` (aux head on c3)."""

    nclass: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = x.shape[-1] // 4
        x = nn.Conv(inter, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv0")(x)
        x = nn.relu(_bn(train, "bn0", self.dtype)(x))
        x = nn.Dropout(0.1, deterministic=not train, name="dropout")(x)
        return nn.Conv(self.nclass, (1, 1), dtype=self.dtype,
                       name="conv1")(x)


class SkipProject(nn.Module):
    out_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return nn.relu(_bn(train, "bn", self.dtype)(x))


_BACKBONE_LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
                    "resnet152": (3, 8, 36, 3),
                    # the reference's 'resnet50_lsun'/'resnet50_lsun2'
                    # (`deeplabv3plus.py:93-96`) are the SAME resnet50_v1s
                    # architecture loading LSUN-finetuned weights from
                    # hardcoded author-machine paths (`:8-66`); here they are
                    # the same module and the finetuned weights arrive via
                    # --backbone-weights (mxnet file, converted on load)
                    "resnet50_lsun": (3, 4, 6, 3),
                    "resnet50_lsun2": (3, 4, 6, 3)}


def _backbone(kind: str, name: str, dtype=jnp.float32) -> ResNetV1s:
    if kind not in _BACKBONE_LAYERS:
        raise ValueError(f"unknown backbone: {kind}")  # `deeplabv3plus.py:102`
    return ResNetV1s(layers=_BACKBONE_LAYERS[kind], dilated=True, dtype=dtype,
                     name=name)


class DeepLabV3Plus(nn.Module):
    """`deeplabv3plus.py:143-226`. ``__call__(x, train)`` -> (out, aux?)"""

    nclass: int
    backbone: str = "resnet50"
    aux: bool = True
    crop_size: int = 480
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 out_hw: Optional[Tuple[int, int]] = None,
                 depth=None):
        out_hw = out_hw or (x.shape[1], x.shape[2])
        if depth is not None:
            # with_depth inputs: the reference trainer forwards (image,
            # depth) tuples to the model (`lib/core/segmentation.py:104-107`,
            # depth channel prepared by `images_dir.py:37-46`); here the
            # normalized inverse-depth plane joins the RGB planes before the
            # stem so the pretrained backbone structure is preserved.
            x = jnp.concatenate([x, depth.astype(x.dtype)], axis=-1)
        dt = self.dtype
        c1, c3, c4 = _backbone(self.backbone, "backbone", dt)(x, train)
        c1p = SkipProject(32, dtype=dt, name="skip_project")(c1, train)
        y = ASPP(dtype=dt, name="aspp")(c4, train)
        y = bilinear_resize(y, c1p.shape[1], c1p.shape[2])
        y = jnp.concatenate([y, c1p], axis=-1)
        y = SeparableConv(256, depth_activation=True, dtype=dt,
                          name="head_sep0")(y, train)
        y = SeparableConv(256, depth_activation=True, dtype=dt,
                          name="head_sep1")(y, train)
        y = nn.Conv(self.nclass, (1, 1), dtype=dt, name="head_classifier")(y)
        out = bilinear_resize(y, *out_hw)
        outputs = [out]
        if self.aux:
            a = FCNHead(self.nclass, dtype=dt, name="auxlayer")(c3, train)
            outputs.append(bilinear_resize(a, *out_hw))
        return tuple(outputs)


class DeepLabV3(nn.Module):
    """`deeplabv3.py:9-77` — plain DeepLabV3 (no encoder-decoder skip)."""

    nclass: int
    backbone: str = "resnet50"
    aux: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 out_hw: Optional[Tuple[int, int]] = None):
        dt = self.dtype
        out_hw = out_hw or (x.shape[1], x.shape[2])
        _c1, c3, c4 = _backbone(self.backbone, "backbone", dt)(x, train)
        y = ASPP(dtype=dt, name="aspp")(c4, train)
        y = nn.Conv(256, (3, 3), padding=1, use_bias=False, dtype=dt,
                    name="head_conv")(y)
        y = nn.relu(_bn(train, "head_bn", dt)(y))
        y = nn.Dropout(0.1, deterministic=not train, name="head_dropout")(y)
        y = nn.Conv(self.nclass, (1, 1), dtype=dt, name="head_classifier")(y)
        out = bilinear_resize(y, *out_hw)
        outputs = [out]
        if self.aux:
            a = FCNHead(self.nclass, dtype=dt, name="auxlayer")(c3, train)
            outputs.append(bilinear_resize(a, *out_hw))
        return tuple(outputs)


def head_param_labels(params) -> dict:
    """Label tree for optax.multi_transform: 'head' subtrees get the 10x LR
    (aspp/skip_project/head_*/auxlayer), 'base' is the backbone."""
    import jax

    def label_for(path):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "backbone":
            return "base"
        return "head"

    return jax.tree_util.tree_map_with_path(lambda p, _: label_for(p), params)
