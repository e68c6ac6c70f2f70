"""Weight-scaled layers shared by the generator (flax.linen).

TPU-native re-implementations of the reference's custom gluon blocks
(`networks_stylegan.py:200-565`): DenseW / Conv2DW / Conv2DTransposeW with
runtime wscale (``weight * gain/sqrt(fan_in) * lr_mult``), Bias, AddNoise,
AdaIN, Blur. All NHWC; weights HWIO. The wscale multiplier is applied to the
weight (a scalar-times-constant XLA folds away at inference).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.blur import blur_3x3, blur_kernel
from ..ops.conv import (_UP2, compose_kernel_2d, conv2d, conv_transpose2d,
                        conv_transpose2d_blur, depthwise_conv2d,
                        upsample2x_conv2d)
from ..ops.norm import instance_norm
from ..ops.wscale import wscale_std

# Int8 inference (ops/quant.py): the wscale convs below support
# post-training quantization through two flax variable collections —
# - apply with ``mutable=["qstats"]`` sows each conv INPUT's absmax
#   (calibration; `ops.quant.calibrate_generator`), and
# - apply with a ``quant`` collection (`ops.quant.quantize_generator`)
#   runs the conv s8xs8->s32: the input quantizes against its calibrated
#   static scale and the WEIGHT quantizes at trace time from the same
#   effective-kernel math the float path runs (per-out-channel symmetric;
#   the round/clip over the weights is negligible next to the conv and
#   keeps a single source of truth for wscale/lr_mult/up2x composition).


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


def _sow_absmax(mdl: nn.Module, x) -> None:
    if mdl.is_mutable_collection("qstats"):
        mdl.sow("qstats", "absmax", jnp.max(jnp.abs(x.astype(jnp.float32))))


def _quant_conv(mdl: nn.Module, x, k_eff, b, *, stride=1, padding=0,
                lhs_dilation=None):
    """The int8 branch shared by the wscale convs: quantize the input
    against the calibrated scale, the effective kernel at trace time, run
    s8xs8->s32, dequantize in f32, bias, cast back. The module's
    ``quant_batch_shards`` (the mesh's dp extent, threaded from GanConfig)
    sizes the im2col form policy per DEVICE, matching the decoder path's
    ``apply_s2d_int8(batch_shards=...)``."""
    from ..ops.quant import conv2d_s8_fused, quantize_weight

    inv = mdl.get_variable("quant", "inv_in")
    wq, wscale = quantize_weight(k_eff)
    return conv2d_s8_fused(
        x, inv, wq, wscale / inv,
        None if b is None else b.astype(jnp.float32),
        stride=stride, padding=padding, lhs_dilation=lhs_dilation,
        batch_shards=getattr(mdl, "quant_batch_shards", 1))


class DenseW(nn.Module):
    """`networks_stylegan.py:479-531`. Weight stored (in, out) unit-scale."""

    features: int
    use_bias: bool = True
    use_wscale: bool = True
    gain: float = float(np.sqrt(2))
    lr_mult: float = 1.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        # equalized-lr init: stored std 1/lr_mult so the runtime lr_mult
        # multiplier yields unit-variance effective weights (the reference's
        # Normal(1) init degenerates for lr_mult<1; its pretrained
        # checkpoints compensate and simply overwrite this)
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mult),
                       (in_features, self.features), jnp.float32)
        scale = self.lr_mult
        if self.use_wscale:
            scale *= wscale_std((in_features, self.features), self.gain)
        y = jnp.dot(x.astype(self.compute_dtype),
                    (w * scale).astype(self.compute_dtype),
                    preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + (b * self.lr_mult).astype(y.dtype)
        return y.astype(self.compute_dtype)


class Conv2DW(nn.Module):
    """`networks_stylegan.py:446-457` — conv with runtime wscale.

    ``up2x=True`` computes ``conv(upsample_nearest_2x(x))`` as one
    input-dilated conv (`ops.conv.upsample2x_conv2d`, exact composition) —
    same params, no materialized 2x intermediate.
    """

    features: int
    kernel_size: int = 3
    padding: int = 1
    stride: int = 1
    use_bias: bool = True
    use_wscale: bool = True
    gain: float = float(np.sqrt(2))
    lr_mult: float = 1.0
    up2x: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    # dp extent of the batch axis, for the int8 im2col form policy only
    quant_batch_shards: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, in_ch, self.features), jnp.float32)
        scale = self.lr_mult
        if self.use_wscale:
            scale *= wscale_std((k, k, in_ch, self.features), self.gain)
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) * self.lr_mult
            b = b.astype(self.compute_dtype)
        if self.up2x:
            assert self.stride == 1, "up2x composes only with stride 1"
            x = x.astype(self.compute_dtype)
            _sow_absmax(self, x)
            if self.has_variable("quant", "inv_in"):
                # same composed kernel + input-dilated form as the float
                # path below (upsample2x_conv2d), in s8
                kc = compose_kernel_2d((w * scale).astype(jnp.float32), _UP2)
                return _quant_conv(self, x, kc, b,
                                   padding=1 + self.padding, lhs_dilation=2)
            return upsample2x_conv2d(x,
                                     (w * scale).astype(self.compute_dtype),
                                     b, padding=self.padding)
        x = x.astype(self.compute_dtype)
        _sow_absmax(self, x)
        if self.has_variable("quant", "inv_in"):
            return _quant_conv(self, x, (w * scale).astype(jnp.float32), b,
                               stride=self.stride, padding=self.padding)
        return conv2d(x, (w * scale).astype(self.compute_dtype), b,
                      stride=self.stride, padding=self.padding)


class Conv2DTransposeW(nn.Module):
    """`networks_stylegan.py:460-476` — the k4 s2 p1 fused-upscale deconv.

    fan_in for wscale matches mxnet's ``kernel[0]*kernel[1]*in_channels``
    (`networks_stylegan.py:400-402` — computed from the *input* channels even
    for Deconvolution).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    use_wscale: bool = True
    gain: float = float(np.sqrt(2))
    lr_mult: float = 1.0
    compute_dtype: jnp.dtype = jnp.float32
    # dp extent of the batch axis, for the int8 im2col form policy only
    quant_batch_shards: int = 1
    # when set, this module's output INCLUDES the reference's post-upscale
    # [1,2,1] blur (`networks_stylegan.py:56-73,200-236`) — folded into the
    # deconv kernel (exact, ops/conv.conv_transpose2d_blur) on the float
    # path, applied sequentially on the int8 path (where the deconv itself
    # runs s8 and a folded 6x6 kernel would change the quant calibration)
    fold_blur: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        # stored in conv-equivalent orientation (see ops.conv.conv_transpose2d)
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, in_ch, self.features), jnp.float32)
        scale = self.lr_mult
        if self.use_wscale:
            scale *= wscale_std((k, k, in_ch, self.features), self.gain)
        b = None
        if self.use_bias:
            b = (self.param("bias", nn.initializers.zeros, (self.features,),
                            jnp.float32) * self.lr_mult).astype(self.compute_dtype)
        x = x.astype(self.compute_dtype)
        _sow_absmax(self, x)
        if self.has_variable("quant", "inv_in"):
            # conv_transpose2d's input-dilated formulation, in s8
            out = _quant_conv(self, x, (w * scale).astype(jnp.float32), b,
                              padding=self.kernel_size - 1 - self.padding,
                              lhs_dilation=self.stride)
            if self.fold_blur:
                out = blur_3x3(out)
            return out
        if self.fold_blur:
            assert b is None and (k, self.stride, self.padding) == (4, 2, 1)
            return conv_transpose2d_blur(x, w * scale)
        return conv_transpose2d(x, (w * scale).astype(self.compute_dtype), b,
                                stride=self.stride, padding=self.padding)


class Bias(nn.Module):
    """Broadcast per-channel bias (`networks_stylegan.py:534-545`)."""

    @nn.compact
    def __call__(self, x):
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                       jnp.float32)
        return x + b.astype(x.dtype)


class AddNoise(nn.Module):
    """Per-channel-scaled spatial gaussian noise (`networks_stylegan.py:267-305`).

    ``fix_noise`` caches one noise tensor per trace (the reference caches the
    first sampled batch); the pipeline runs with fix_noise=False
    (`image_generator.py:57`), i.e. fresh noise each call via the 'noise' rng.
    """

    fix_noise: bool = False

    @nn.compact
    def __call__(self, x, noise=None):
        c = x.shape[-1]
        scale = self.param("scale_factors", nn.initializers.zeros, (c,),
                           jnp.float32)
        if noise is None:
            rng = self.make_rng("noise")
            shape = (x.shape[0], x.shape[1], x.shape[2], 1)
            noise = jax.random.normal(rng, shape, jnp.float32)
        return x + (noise * scale.astype(noise.dtype)).astype(x.dtype)


class AdaIN(nn.Module):
    """Instance-norm + learned per-style affine (`networks_stylegan.py:239-264`).

    y = instance_norm(x) * (ys + 1) + yb where (ys, yb) = affine(w) split.
    The affine DenseW uses gain=1 (`:244-245`).
    """

    channels: int
    use_wscale: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w):
        y = DenseW(self.channels * 2, use_bias=True, gain=1.0,
                   use_wscale=self.use_wscale,
                   compute_dtype=self.compute_dtype, name="affine")(w)
        ys = y[:, : self.channels][:, None, None, :]
        yb = y[:, self.channels:][:, None, None, :]
        x_norm = instance_norm(x)
        return (x_norm * (ys + 1.0) + yb).astype(x.dtype)


class Blur(nn.Module):
    """[1,2,1] depthwise blur with a constant kernel (`networks_stylegan.py:200-236`)."""

    @nn.compact
    def __call__(self, x):
        k = blur_kernel(x.shape[-1], dtype=x.dtype)
        return depthwise_conv2d(x, k, padding=1)


def minibatch_std_layer(x, group_size: int):
    """`networks_stylegan.py:327-345` (discriminator-side): append a feature
    map holding the per-group mean feature stddev. NHWC."""
    n, h, w, c = x.shape
    assert n % group_size == 0, (n, group_size)
    y = x.astype(jnp.float32).reshape(group_size, n // group_size, h, w, c)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 3), keepdims=True)          # (M,1,1,1)
    y = jnp.tile(y, (group_size, h, w, 1)).astype(x.dtype)  # (N,H,W,1)
    return jnp.concatenate([x, y], axis=-1)


def normal_with_l2_norm(sigma: float = 0.01):
    """`networks_stylegan.py:548-555`: N(0, sigma) then L2-normalized."""

    def init(key, shape, dtype=jnp.float32):
        arr = sigma * jax.random.normal(key, shape, dtype)
        return arr / (jnp.linalg.norm(arr) + 1e-12)

    return init
