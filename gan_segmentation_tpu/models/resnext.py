"""ResNeXt backbone with dilation + optional Squeeze-and-Excitation.

TPU-native equivalent of `deeplabv3plus/lib/model/resnext_dilated.py`:
grouped-conv bottleneck Blocks (cardinality x bottleneck_width), 7x7 stem,
``dilated=True`` giving stride-8 stages (layer3 dilation 2, layer4 dilation 4
with first-block dilation 2, `resnext_dilated.py:166-177,199-214`),
``use_se`` channel attention (`:83-90,105-107`), and ``last_gamma``-style
zero-init of the final bottleneck BN gamma (`:77-81`; note the reference's
condition is inverted — it zero-inits when ``last_gamma`` is False — we
reproduce that behavior).

An alternative backbone for the DeepLab heads; exposes the same
(c1, c3, c4) taps as `resnet.ResNetV1s`.
"""

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import global_avg_pool


class ResNextBlock(nn.Module):
    channels: int
    cardinality: int = 32
    bottleneck_width: int = 4
    strides: int = 1
    downsample: bool = False
    dilation: int = 1
    use_se: bool = False
    last_gamma: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name, zero_gamma=False):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5,
                                scale_init=(nn.initializers.zeros if zero_gamma
                                            else nn.initializers.ones),
                                name=name)

        d = int(math.floor(self.channels * (self.bottleneck_width / 64)))
        group_width = self.cardinality * d

        residual = x
        y = nn.Conv(group_width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(group_width, (3, 3), strides=self.strides,
                    feature_group_count=self.cardinality,
                    kernel_dilation=self.dilation, padding=self.dilation,
                    use_bias=False, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.channels * 4, (1, 1), use_bias=False, name="conv3")(y)
        # reference quirk: gamma zero-init happens when last_gamma is False
        y = bn("bn3", zero_gamma=not self.last_gamma)(y)

        if self.use_se:
            w = global_avg_pool(y, keepdims=True)
            w = nn.relu(nn.Conv(self.channels // 4, (1, 1), name="se_conv1")(w))
            w = nn.sigmoid(nn.Conv(self.channels * 4, (1, 1), name="se_conv2")(w))
            y = y * w

        if self.downsample:
            residual = nn.Conv(self.channels * 4, (1, 1), strides=self.strides,
                               use_bias=False, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNextDilated(nn.Module):
    """Returns the (c1, c3, c4) feature taps for segmentation heads."""

    layers: Sequence[int] = (3, 4, 6, 3)
    cardinality: int = 32
    bottleneck_width: int = 4
    use_se: bool = False
    dilated: bool = True
    last_gamma: bool = False

    def _stage(self, x, idx, channels, blocks, strides, dilation, train):
        first_dilation = 2 if dilation == 4 else 1
        x = ResNextBlock(channels, self.cardinality, self.bottleneck_width,
                         strides, downsample=True, dilation=first_dilation,
                         use_se=self.use_se, last_gamma=self.last_gamma,
                         name=f"layer{idx}_block0")(x, train)
        for b in range(1, blocks):
            x = ResNextBlock(channels, self.cardinality, self.bottleneck_width,
                             1, dilation=dilation, use_se=self.use_se,
                             last_gamma=self.last_gamma,
                             name=f"layer{idx}_block{b}")(x, train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        c1 = self._stage(x, 1, 64, self.layers[0], 1, 1, train)
        c2 = self._stage(c1, 2, 128, self.layers[1], 2, 1, train)
        if self.dilated:
            c3 = self._stage(c2, 3, 256, self.layers[2], 1, 2, train)
            c4 = self._stage(c3, 4, 512, self.layers[3], 1, 4, train)
        else:
            c3 = self._stage(c2, 3, 256, self.layers[2], 2, 1, train)
            c4 = self._stage(c3, 4, 512, self.layers[3], 2, 1, train)
        return c1, c3, c4


def resnext50_32x4d(dilated=True, use_se=False):
    return ResNextDilated(layers=(3, 4, 6, 3), cardinality=32,
                          bottleneck_width=4, dilated=dilated, use_se=use_se)


def resnext101_32x4d(dilated=True, use_se=False):
    return ResNextDilated(layers=(3, 4, 23, 3), cardinality=32,
                          bottleneck_width=4, dilated=dilated, use_se=use_se)


def resnext101_64x4d(dilated=True, use_se=False):
    return ResNextDilated(layers=(3, 4, 23, 3), cardinality=64,
                          bottleneck_width=4, dilated=dilated, use_se=use_se)


def se_resnext50_32x4d(dilated=True):
    return resnext50_32x4d(dilated=dilated, use_se=True)


def se_resnext101_32x4d(dilated=True):
    return resnext101_32x4d(dilated=dilated, use_se=True)
