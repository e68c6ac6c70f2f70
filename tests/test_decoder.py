"""Decoder structure tests: config truncation, fusion shapes, train mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.core.config import GanConfig, SolverConfig
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.models.stylegan import init_generator


def make_features(cfg: SolverConfig, batch=2, seed=0):
    rngs = np.random.RandomState(seed)
    feats = []
    for i, c in enumerate(cfg.in_channels):
        r = 2 ** (i + 2)
        feats.append(jnp.asarray(rngs.randn(batch, r, r, c).astype(np.float32)))
    return feats


class TestSolverConfig:
    def test_truncation_ffhq(self):
        cfg = SolverConfig(max_res_log2=10)
        # `seg_solver.py:124-128`
        assert cfg.features == [32, 32, 32, 32, 32, 32, 32, 32, 16, 2]
        assert cfg.in_channels == [512, 512, 512, 512, 256, 128, 64, 32, 16]

    def test_truncation_bedrooms(self):
        cfg = SolverConfig(max_res_log2=8)
        assert cfg.features == [32, 32, 32, 32, 32, 32, 32, 2]
        assert cfg.in_channels == [512, 512, 512, 512, 256, 128, 64]


@pytest.mark.parametrize("max_res_log2", [5, 8])
def test_decoder_output_shape(max_res_log2):
    cfg = SolverConfig(max_res_log2=max_res_log2)
    model = decoder_from_config(cfg)
    feats = make_features(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats, False)
    out = model.apply(variables, feats, False)
    res = 2 ** max_res_log2
    assert out.shape == (2, res, res, cfg.num_classes)
    assert np.isfinite(np.asarray(out)).all()


def test_decoder_train_mode_updates_batch_stats():
    cfg = SolverConfig(max_res_log2=5)
    model = decoder_from_config(cfg)
    feats = make_features(cfg)
    variables = model.init(jax.random.PRNGKey(0), feats, False)
    out, updates = model.apply(
        variables, feats, True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    assert "batch_stats" in updates
    # running stats moved away from init
    leaf = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    assert np.asarray(leaf).shape  # exists and is an array


def test_end_to_end_generator_to_decoder():
    """The generator pyramid feeds the decoder directly (fused on-device path)."""
    gcfg = GanConfig(max_res_log2=5)
    gen, gparams = init_generator(gcfg, seed=0)
    scfg = SolverConfig(max_res_log2=5)
    dec = decoder_from_config(scfg)

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
    rgb, feats = gen.apply({"params": gparams}, z,
                           rngs={"noise": jax.random.PRNGKey(1)})
    dvars = dec.init(jax.random.PRNGKey(2), feats, False)
    logits = dec.apply(dvars, feats, False)
    assert logits.shape == (2, 32, 32, 2)
    mask = jnp.argmax(logits, axis=-1)
    assert set(np.unique(np.asarray(mask))) <= {0, 1}
