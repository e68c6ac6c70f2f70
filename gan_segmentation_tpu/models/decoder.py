"""Segmentation Decoder over the GAN feature pyramid.

TPU-native re-design of `networks_seg.py`:
- per-scale ``cvt_block_i``: conv3x3(in_ch->feat) + BN + LeakyReLU(0.2) +
  Dropout(0.5) (`networks_seg.py:64-79`);
- progressive fusion: nearest-upsample-2x of the running prediction, concat
  with the converted feature, ``DecoderResBlock`` (`:81-113`);
- final scale: plain conv3x3 -> num_classes logits at full resolution
  (`:89-93`);
- ``DecoderResBlock`` = 2x(conv3x3-BN-LReLU) + 1x1 shortcut when channel
  counts differ (`:7-46`).

BatchNorm: under `jit` with the batch axis sharded over the data mesh the
moment reductions are global-batch, i.e. the reference's SyncBatchNorm
(`networks_seg.py:17-21`) is the default behavior here.
"""

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.config import SolverConfig
from ..ops.resize import upsample_nearest_2x
from .layers import leaky_relu


def mx_xavier_in(magnitude: float = 2.34) -> Callable:
    """mxnet ``Xavier(factor_type='in', magnitude=2.34)`` (`seg_solver.py:38`):
    uniform(-sqrt(magnitude/fan_in), +sqrt(magnitude/fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:  # HWIO
            fan_in = shape[0] * shape[1] * shape[2]
        else:
            fan_in = shape[0]
        scale = np.sqrt(magnitude / fan_in)
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


_conv_kw = dict(kernel_init=mx_xavier_in())


class DecoderResBlock(nn.Module):
    conv_size: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        y = nn.Conv(self.conv_size, (3, 3), padding=1, name="conv_0",
                    **_conv_kw)(x)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn_0")(y)
        y = leaky_relu(y)
        y = nn.Conv(self.conv_size, (3, 3), padding=1, name="conv_1",
                    **_conv_kw)(y)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn_1")(y)
        y = leaky_relu(y)
        sc = x
        if self.conv_size != in_c:
            sc = nn.Conv(self.conv_size, (1, 1), name="shortcut", **_conv_kw)(x)
        return sc + y


class Decoder(nn.Module):
    """``__call__(features, train)`` -> logits (N, H, W, num_classes).

    ``features`` is the generator pyramid, NHWC, lowest resolution first.
    """

    features_cfg: Sequence[int]   # SolverConfig.features (len = n_scales + 1)
    in_channels: Sequence[int]    # SolverConfig.in_channels (len = n_scales)
    start_res: int = 0
    use_bn: bool = True
    use_dropout: bool = True

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        num_feats = len(self.in_channels)
        prev = None
        pred = None
        for i in range(self.start_res, num_feats):
            x = inputs[i].astype(jnp.float32)
            # cvt block
            x = nn.Conv(self.features_cfg[i], (3, 3), padding=1,
                        name=f"cvt_{i}_conv", **_conv_kw)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"cvt_{i}_bn")(x)
            x = leaky_relu(x)
            if self.use_dropout:
                x = nn.Dropout(0.5, deterministic=not train,
                               name=f"cvt_{i}_dropout")(x)

            if i > self.start_res:
                x = jnp.concatenate([prev, x], axis=-1)

            if i < num_feats - 1:
                x = upsample_nearest_2x(x)
                pred = DecoderResBlock(self.features_cfg[i + 1],
                                       use_bn=self.use_bn,
                                       name=f"main_{i}")(x, train)
            else:
                pred = nn.Conv(self.features_cfg[i + 1], (3, 3), padding=1,
                               name=f"main_{i}_conv", **_conv_kw)(x)
            prev = pred
        return pred


def decoder_from_config(cfg: SolverConfig) -> Decoder:
    return Decoder(features_cfg=tuple(cfg.features),
                   in_channels=tuple(cfg.in_channels),
                   start_res=cfg.start_res,
                   use_bn=cfg.use_bn,
                   use_dropout=cfg.use_dropout)
