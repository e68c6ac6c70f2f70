"""StyleGAN (v1) generator emitting the per-resolution feature pyramid.

TPU-native re-design of `networks_stylegan.py:6-197`:
- 8-layer mapping MLP with PixelNorm front (`:128-139`), lr_mult 0.01 folded
  into the forward weight scale (`image_generator.py:42`).
- learned 4x4 constant input (`:94-96`), per-layer truncation
  ``lerp(latent_avg, w, psi_i)`` (`:158-163,180-189`).
- per-block synthesis: [upsample|deconv k4s2p1 (res>=128, `:154`)] -> blur ->
  noise -> bias -> lrelu(0.2) -> AdaIN -> conv3x3 -> noise -> bias -> lrelu ->
  AdaIN (`StyleGeneratorBlock.hybrid_forward`, `:56-73`).
- ``to_rgb`` 1x1 conv (gain=1) at the final resolution only (`:118-126`).
- returns ``(rgb, features)`` where features[i] is the block output at
  resolution 2^(i+2) (`:183-197`) — the contract the Decoder consumes.

Layout is NHWC; channels-per-resolution follow `num_features`
(`:114-116`): 512,512,512,512,256,128,64,32,16 for res 4..1024.
"""

from typing import List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import GanConfig
from ..ops.norm import pixel_norm
from .layers import AdaIN, AddNoise, Bias, Blur, Conv2DTransposeW, Conv2DW, DenseW, leaky_relu


class MappingNetwork(nn.Module):
    """z -> w. PixelNorm + 8x(DenseW(512) lrelu0.2), gain sqrt(2), lr_mult .01."""

    cfg: GanConfig
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = pixel_norm(z.astype(self.compute_dtype))
        for i in range(8):
            x = DenseW(self.cfg.latent_size, use_wscale=self.cfg.use_wscale,
                       lr_mult=self.cfg.mapping_lr_mult,
                       compute_dtype=self.compute_dtype,
                       name=f"dense_{i}")(x)
            x = leaky_relu(x)
        return x


class StyleBlock(nn.Module):
    """One synthesis block at ``res_log2`` (`networks_stylegan.py:6-73`)."""

    cfg: GanConfig
    res_log2: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w1, w2):
        cfg = self.cfg
        conv_size = cfg.num_features(self.res_log2)
        first = self.res_log2 == 2
        fused_upscale = self.res_log2 >= 7  # `networks_stylegan.py:154`

        y = x
        if not first:
            if fused_upscale:
                # fold_blur (default off — measured negative, BASELINE.md
                # "Blur-fold"): the post-upscale [1,2,1] blur rides the
                # deconv kernel (exact rewrite incl. border ring); param
                # tree identical either way (Blur is parameterless)
                y = Conv2DTransposeW(conv_size, use_wscale=cfg.use_wscale,
                                     compute_dtype=self.compute_dtype,
                                     quant_batch_shards=cfg.quant_batch_shards,
                                     fold_blur=cfg.fold_blur,
                                     name="deconv_1")(y)
                if not cfg.fold_blur:
                    y = Blur(name="blur_1")(y)
            else:
                # upsample_nearest_2x + conv3x3 composed into one
                # input-dilated conv (exact; ops/conv.upsample2x_conv2d)
                y = Conv2DW(conv_size, 3, use_bias=False,
                            use_wscale=cfg.use_wscale, up2x=True,
                            compute_dtype=self.compute_dtype,
                            quant_batch_shards=cfg.quant_batch_shards,
                            name="conv_1")(y)
                y = Blur(name="blur_1")(y)

        y = AddNoise(fix_noise=cfg.fix_noise, name="noise_1")(y)
        y = Bias(name="bias_1")(y)
        y = leaky_relu(y)
        y = AdaIN(conv_size, use_wscale=cfg.use_wscale,
                  compute_dtype=self.compute_dtype, name="adain_1")(y, w1)

        y = Conv2DW(conv_size, 3, use_bias=False, use_wscale=cfg.use_wscale,
                    compute_dtype=self.compute_dtype,
                    quant_batch_shards=cfg.quant_batch_shards,
                    name="conv_2")(y)
        y = AddNoise(fix_noise=cfg.fix_noise, name="noise_2")(y)
        y = Bias(name="bias_2")(y)
        y = leaky_relu(y)
        y = AdaIN(conv_size, use_wscale=cfg.use_wscale,
                  compute_dtype=self.compute_dtype, name="adain_2")(y, w2)
        return y


class StyleGanGenerator(nn.Module):
    """Full generator. ``__call__(z) -> (rgb, [features per resolution])``.

    rngs: requires a 'noise' rng stream when ``fix_noise`` is False.
    """

    cfg: GanConfig
    compute_dtype: jnp.dtype = jnp.float32

    def lerp(self, psi, latent_avg, w):
        # latent_avg*(1-psi) + w*psi (`networks_stylegan.py:158-163`)
        return latent_avg[None, :] * (1.0 - psi) + w * psi

    @nn.compact
    def __call__(self, z) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        cfg = self.cfg
        n = z.shape[0]
        c0 = cfg.num_features(2)

        constant = self.param(
            "constant_tensor", nn.initializers.normal(1.0),
            (1, cfg.base_scale_y, cfg.base_scale_x, c0), jnp.float32)
        latent_avg = self.param("latent_avg", nn.initializers.zeros,
                                (cfg.latent_size,), jnp.float32)
        truncation_psi = self.param("truncation_psi", nn.initializers.ones,
                                    (cfg.num_style_layers,), jnp.float32)

        w = MappingNetwork(cfg, self.compute_dtype, name="mapping")(z)
        w = w.astype(jnp.float32)

        y = jnp.broadcast_to(
            constant, (n,) + constant.shape[1:]).astype(self.compute_dtype)

        features = []
        for res in range(2, cfg.max_res_log2 + 1):
            i = 2 * (res - 2)
            w1 = self.lerp(truncation_psi[i], latent_avg, w)
            w2 = self.lerp(truncation_psi[i + 1], latent_avg, w)
            y = StyleBlock(cfg, res, self.compute_dtype,
                           name=f"block_{res}")(y, w1.astype(self.compute_dtype),
                                                w2.astype(self.compute_dtype))
            features.append(y)

        rgb = Conv2DW(cfg.channels, 1, padding=0, use_bias=True, gain=1.0,
                      use_wscale=cfg.use_wscale,
                      compute_dtype=self.compute_dtype,
                      quant_batch_shards=cfg.quant_batch_shards,
                      name=f"to_rgb_{cfg.max_res_log2}")(y)
        return rgb, features


def init_generator(cfg: GanConfig, seed: int = 0, compute_dtype=jnp.float32):
    """Random-init params (reference init='normal' std=1, `image_generator.py:62-63`)."""
    model = StyleGanGenerator(cfg, compute_dtype)
    z = jnp.zeros((1, cfg.latent_size), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(seed),
            "noise": jax.random.PRNGKey(seed + 1)}
    variables = model.init(rngs, z)
    return model, variables["params"]
