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
(`networks_seg.py:17-21`) is the default behavior here. BN statistics are
always computed in f32; ``compute_dtype=bf16`` halves the HBM traffic of the
1024^2 stages on the inference path.
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


class DecoderResBlock(nn.Module):
    conv_size: int
    use_bn: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.compute_dtype

        def conv(features, kernel, name, padding=1):
            return nn.Conv(features, kernel, padding=padding, dtype=dt,
                           kernel_init=mx_xavier_in(), name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=dt, name=name)

        in_c = x.shape[-1]
        y = conv(self.conv_size, (3, 3), "conv_0")(x)
        if self.use_bn:
            y = bn("bn_0")(y)
        y = leaky_relu(y)
        y = conv(self.conv_size, (3, 3), "conv_1")(y)
        if self.use_bn:
            y = bn("bn_1")(y)
        y = leaky_relu(y)
        sc = x
        if self.conv_size != in_c:
            sc = conv(self.conv_size, (1, 1), "shortcut", padding=0)(x)
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
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        dt = self.compute_dtype
        num_feats = len(self.in_channels)
        prev = None
        pred = None
        for i in range(self.start_res, num_feats):
            x = inputs[i].astype(dt)
            x = nn.Conv(self.features_cfg[i], (3, 3), padding=1, dtype=dt,
                        kernel_init=mx_xavier_in(), name=f"cvt_{i}_conv")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=dt,
                                 name=f"cvt_{i}_bn")(x)
            x = leaky_relu(x)
            if self.use_dropout:
                x = nn.Dropout(0.5, deterministic=not train,
                               name=f"cvt_{i}_dropout")(x)

            if i > self.start_res:
                x = jnp.concatenate([prev, x], axis=-1)

            if i < num_feats - 1:
                x = upsample_nearest_2x(x)
                pred = DecoderResBlock(self.features_cfg[i + 1],
                                       use_bn=self.use_bn, compute_dtype=dt,
                                       name=f"main_{i}")(x, train)
            else:
                pred = nn.Conv(self.features_cfg[i + 1], (3, 3), padding=1,
                               dtype=dt, kernel_init=mx_xavier_in(),
                               name=f"main_{i}_conv")(x)
            prev = pred
        return pred.astype(jnp.float32)


def decoder_from_config(cfg: SolverConfig, compute_dtype=jnp.float32) -> Decoder:
    return Decoder(features_cfg=tuple(cfg.features),
                   in_channels=tuple(cfg.in_channels),
                   start_res=cfg.start_res,
                   use_bn=cfg.use_bn,
                   use_dropout=cfg.use_dropout,
                   compute_dtype=compute_dtype)
