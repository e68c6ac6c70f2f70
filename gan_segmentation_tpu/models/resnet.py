"""ResNet-V1b/s backbone with dilation (output-stride 8).

TPU-native equivalent of the gluoncv ``resnet50_v1s`` family the reference's
DeepLab models wrap (`deeplabv3plus.py:92-100`): deep 3-conv stem
(stem_width 64 -> 64 -> 128), BottleneckV1b blocks, and the dilated variant
used for segmentation — layer3 stride 1 dilation 2, layer4 stride 1
dilation 4, with the gluoncv first-block dilation rule (dilation//2 for the
first block of a dilation-4 stage). Returns the c1/c3/c4 feature taps the
DeepLab heads consume (`deeplabv3plus.py:188-198`).

The reference loads ImageNet-pretrained weights from the gluoncv model zoo;
here pretrained weights arrive as a converted pytree checkpoint (see
`core/mx_params.py` for the mxnet reader) via ``pretrained_path``.
"""

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class BottleneckV1b(nn.Module):
    planes: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 4
    # compute dtype (params/BN stats stay f32 via param_dtype): the TPU form
    # of the reference's model.cast(dtype) (`lib/core/segmentation.py:50`)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = bn("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.strides,
                      padding=self.dilation, kernel_dilation=self.dilation,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.strides, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetV1s(nn.Module):
    """Deep-stem ResNet. ``layers`` e.g. (3,4,6,3) for resnet50."""

    layers: Sequence[int] = (3, 4, 6, 3)
    stem_width: int = 64
    dilated: bool = True
    dtype: Any = jnp.float32

    def _stage(self, x, idx, planes, blocks, strides, dilation, train):
        in_ch = x.shape[-1]
        need_ds = strides != 1 or in_ch != planes * 4
        # gluoncv first-block dilation rule: dilation 4 stages start at 2
        first_dilation = dilation if dilation in (1, 2) else dilation // 2
        x = BottleneckV1b(planes, strides, 1 if dilation <= 2 else first_dilation,
                          downsample=need_ds, dtype=self.dtype,
                          name=f"layer{idx}_block0")(x, train)
        for b in range(1, blocks):
            x = BottleneckV1b(planes, 1, dilation, dtype=self.dtype,
                              name=f"layer{idx}_block{b}")(x, train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        sw = self.stem_width
        # deep stem: 3x(conv3x3) 3->64->64->128, stride 2 on the first
        x = nn.Conv(sw, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv0")(x)
        x = nn.relu(bn("stem_bn0")(x))
        x = nn.Conv(sw, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="stem_conv1")(x)
        x = nn.relu(bn("stem_bn1")(x))
        x = nn.Conv(sw * 2, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv2")(x)
        x = nn.relu(bn("stem_bn2")(x))
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


def resnet50_v1s(dilated: bool = True) -> ResNetV1s:
    return ResNetV1s(layers=(3, 4, 6, 3), dilated=dilated)


def resnet101_v1s(dilated: bool = True) -> ResNetV1s:
    return ResNetV1s(layers=(3, 4, 23, 3), dilated=dilated)


def resnet152_v1s(dilated: bool = True) -> ResNetV1s:
    return ResNetV1s(layers=(3, 8, 36, 3), dilated=dilated)
