"""Decoder checkpoint converter vs our flax Decoder structure."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_segmentation_tpu.core.config import SolverConfig
from gan_segmentation_tpu.core.decoder_convert import convert_decoder_params
from gan_segmentation_tpu.models.decoder import decoder_from_config


def synth_reference_decoder(cfg, seed=0):
    """Fabricate gluon creation-order names (see converter docstring)."""
    rs = np.random.RandomState(seed)
    p = {}
    conv_idx = bn_idx = 0

    def conv(cout, cin, k):
        nonlocal conv_idx
        p[f"conv{conv_idx}_weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.1
        p[f"conv{conv_idx}_bias"] = rs.randn(cout).astype(np.float32) * 0.01
        conv_idx += 1

    def bn(c):
        nonlocal bn_idx
        p[f"batchnorm{bn_idx}_gamma"] = np.ones(c, np.float32)
        p[f"batchnorm{bn_idx}_beta"] = np.zeros(c, np.float32)
        p[f"batchnorm{bn_idx}_running_mean"] = rs.randn(c).astype(np.float32) * 0.01
        p[f"batchnorm{bn_idx}_running_var"] = np.ones(c, np.float32)
        bn_idx += 1

    n = len(cfg.in_channels)
    for i in range(cfg.start_res, n):
        conv(cfg.features[i], cfg.in_channels[i], 3)
        bn(cfg.features[i])
    for i in range(cfg.start_res, n - 1):
        in_c = cfg.features[i] if i == cfg.start_res else 2 * cfg.features[i]
        conv(cfg.features[i + 1], in_c, 3)
        bn(cfg.features[i + 1])
        conv(cfg.features[i + 1], cfg.features[i + 1], 3)
        bn(cfg.features[i + 1])
        if cfg.features[i + 1] != in_c:
            conv(cfg.features[i + 1], in_c, 1)
    last_in = 2 * cfg.features[n - 1]
    conv(cfg.features[n], last_in, 3)
    return p


def test_converted_decoder_matches_and_runs():
    cfg = SolverConfig(max_res_log2=6)
    named = synth_reference_decoder(cfg)
    params, batch_stats = convert_decoder_params(named, cfg, strict=True)

    dec = decoder_from_config(cfg)
    feats = [jnp.zeros((1, 2 ** (i + 2), 2 ** (i + 2), c), jnp.float32)
             for i, c in enumerate(cfg.in_channels)]
    ref = jax.jit(lambda f: dec.init(jax.random.PRNGKey(0), f, False))(feats)

    shapes = lambda t: jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), t)
    assert shapes(params) == shapes(jax.device_get(ref["params"]))
    assert shapes(batch_stats) == shapes(jax.device_get(ref["batch_stats"]))

    logits = jax.jit(lambda v, f: dec.apply(v, f, False))(
        {"params": params, "batch_stats": batch_stats}, feats)
    assert logits.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_strict_reports_missing():
    import pytest
    cfg = SolverConfig(max_res_log2=5)
    named = synth_reference_decoder(cfg)
    del named["conv4_weight"]
    with pytest.raises(KeyError, match="conv4"):
        convert_decoder_params(named, cfg, strict=True)


def synth_reference_decoder_dotted(cfg, seed=0):
    """Fabricate the attribute-path names that the reference's
    ``SegSolver.save`` actually writes (`seg_solver.py:331-337`; mxnet 1.5
    ``save_parameters`` = ``_collect_params_with_prefix``)."""
    rs = np.random.RandomState(seed)
    p = {}

    def conv(base, cout, cin, k):
        p[f"{base}.weight"] = rs.randn(cout, cin, k, k).astype(np.float32) * 0.1
        p[f"{base}.bias"] = rs.randn(cout).astype(np.float32) * 0.01

    def bn(base, c):
        p[f"{base}.gamma"] = np.ones(c, np.float32)
        p[f"{base}.beta"] = np.zeros(c, np.float32)
        p[f"{base}.running_mean"] = rs.randn(c).astype(np.float32) * 0.01
        p[f"{base}.running_var"] = np.ones(c, np.float32)

    n = len(cfg.in_channels)
    for i in range(cfg.start_res, n):
        conv(f"cvt_block_{i}.0", cfg.features[i], cfg.in_channels[i], 3)
        bn(f"cvt_block_{i}.1", cfg.features[i])
    for i in range(cfg.start_res, n - 1):
        in_c = cfg.features[i] if i == cfg.start_res else 2 * cfg.features[i]
        base = f"main_block_{i}.1"
        conv(f"{base}.base_layers.0", cfg.features[i + 1], in_c, 3)
        bn(f"{base}.base_layers.1", cfg.features[i + 1])
        conv(f"{base}.base_layers.3", cfg.features[i + 1],
             cfg.features[i + 1], 3)
        bn(f"{base}.base_layers.4", cfg.features[i + 1])
        if cfg.features[i + 1] != in_c:
            conv(f"{base}.shortcut.0", cfg.features[i + 1], in_c, 1)
    conv(f"main_block_{n - 1}.0", cfg.features[n], 2 * cfg.features[n - 1], 3)
    return p


def test_dotted_save_parameters_format():
    """save_parameters (dotted) files — the reference's real on-disk format
    — convert to the identical tree as legacy-named files."""
    cfg = SolverConfig(max_res_log2=6)
    named = synth_reference_decoder_dotted(cfg)
    params, batch_stats = convert_decoder_params(named, cfg, strict=True)

    dec = decoder_from_config(cfg)
    feats = [jnp.zeros((1, 2 ** (i + 2), 2 ** (i + 2), c), jnp.float32)
             for i, c in enumerate(cfg.in_channels)]
    ref = jax.jit(lambda f: dec.init(jax.random.PRNGKey(0), f, False))(feats)
    shapes = lambda t: jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), t)
    assert shapes(params) == shapes(jax.device_get(ref["params"]))
    assert shapes(batch_stats) == shapes(jax.device_get(ref["batch_stats"]))
    # values land where they came from
    np.testing.assert_array_equal(
        params["cvt_4_conv"]["kernel"],
        np.transpose(named["cvt_block_4.0.weight"], (2, 3, 1, 0)))
    logits = jax.jit(lambda v, f: dec.apply(v, f, False))(
        {"params": params, "batch_stats": batch_stats}, feats)
    assert logits.shape == (1, 64, 64, 2)
