"""Full ffhq-scale (1024^2) structural validation — via jax.eval_shape, so
no 1024^2 compute happens on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_segmentation_tpu.core.config import GanConfig, SolverConfig, gan_config
from gan_segmentation_tpu.core.mx_params import convert_stylegan_params
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.models.stylegan import StyleGanGenerator

from test_mx_params import make_reference_named_params


def test_ffhq_generator_structure_and_checkpoint_compat():
    cfg = gan_config("ffhq")
    model = StyleGanGenerator(cfg)
    z = jnp.zeros((2, 512))

    shapes = jax.eval_shape(
        lambda z: model.init({"params": jax.random.PRNGKey(0),
                              "noise": jax.random.PRNGKey(1)}, z), z)
    params_shapes = jax.tree_util.tree_map(lambda s: s.shape,
                                           shapes["params"])

    # a reference-named checkpoint at full ffhq scale converts to exactly
    # this tree (the real stylegan-ffhq.params will traverse the same map)
    named = make_reference_named_params(cfg)
    converted = convert_stylegan_params(named, cfg)
    conv_shapes = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert conv_shapes == params_shapes

    # key structural facts of the 1024 model
    assert params_shapes["block_10"]["deconv_1"]["weight"] == (4, 4, 32, 16)
    assert params_shapes["block_7"]["deconv_1"]["weight"] == (4, 4, 256, 128)
    assert params_shapes["block_6"]["conv_1"]["weight"] == (3, 3, 512, 256)
    assert params_shapes["to_rgb_10"]["weight"] == (1, 1, 16, 3)
    assert params_shapes["truncation_psi"] == (18,)

    # forward output shapes at 1024 without running anything
    def fwd(params, z):
        return model.apply({"params": params}, z,
                           rngs={"noise": jax.random.PRNGKey(2)})

    out = jax.eval_shape(fwd, shapes["params"], z)
    rgb, feats = out
    assert rgb.shape == (2, 1024, 1024, 3)
    assert [f.shape[1] for f in feats] == [4, 8, 16, 32, 64, 128, 256, 512, 1024]
    assert [f.shape[-1] for f in feats] == [512, 512, 512, 512, 256, 128, 64, 32, 16]


def test_ffhq_decoder_structure():
    scfg = SolverConfig(max_res_log2=10)
    dec = decoder_from_config(scfg)
    feats = [jax.ShapeDtypeStruct((2, 2 ** (i + 2), 2 ** (i + 2), c),
                                  jnp.float32)
             for i, c in enumerate(scfg.in_channels)]
    shapes = jax.eval_shape(
        lambda f: dec.init(jax.random.PRNGKey(0), f, False), feats)
    logits = jax.eval_shape(lambda v, f: dec.apply(v, f, False), shapes, feats)
    assert logits.shape == (2, 1024, 1024, 2)
    n_params = sum(int(np.prod(s.shape)) for s in
                   jax.tree_util.tree_leaves(shapes["params"]))
    assert 6e5 < n_params < 9e6  # lightweight head, as designed
