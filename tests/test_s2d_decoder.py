"""Space-to-depth decoder inference path == the flax Decoder, numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.core.config import SolverConfig
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.ops.s2d_decoder import (
    class_mask_s2d, conv3x3_kernel_s2d, decoder_apply_s2d, depth_to_space,
    space_to_depth, upsample_conv_kernel_s2d,
)
from gan_segmentation_tpu.train.generator import class_mask

pytestmark = pytest.mark.slow  # training/e2e: minutes on the 1-core host


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
    s = space_to_depth(x)
    assert s.shape == (2, 4, 4, 12)
    # channel-major layout: channel c*4 + (a*2+b) == fine pixel (2i+a, 2j+b)
    np.testing.assert_array_equal(np.asarray(s[0, 1, 2, 1 * 4 + 3]),
                                  np.asarray(x[0, 2 * 1 + 1, 2 * 2 + 1, 1]))
    np.testing.assert_array_equal(np.asarray(depth_to_space(s)),
                                  np.asarray(x))


@pytest.mark.parametrize("h", [8, 14])
def test_strided_parity_kernel_exact(h):
    """The stride-2 4x4 kernel == fine 3x3 conv followed by s2d."""
    from gan_segmentation_tpu.ops.conv import conv2d
    from gan_segmentation_tpu.ops.s2d_decoder import strided_parity_kernel

    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(2, h, h, 3), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, 5), jnp.float32)
    fine = conv2d(x, w, padding=1)
    blk = conv2d(x, strided_parity_kernel(w), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(blk),
                               np.asarray(space_to_depth(fine)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad_edge", [False, True])
def test_conv3x3_kernel_s2d_exact(pad_edge):
    """Block conv with the scattered kernel == fine 3x3 conv, incl. borders."""
    from gan_segmentation_tpu.ops.conv import conv2d

    rs = np.random.RandomState(1)
    h = 8 if pad_edge else 16
    x = jnp.asarray(rs.randn(1, h, h, 3), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 3, 5), jnp.float32)
    fine = conv2d(x, w, padding=1)
    blk = conv2d(space_to_depth(x), conv3x3_kernel_s2d(w), padding=1)
    np.testing.assert_allclose(np.asarray(depth_to_space(blk)),
                               np.asarray(fine), rtol=1e-5, atol=1e-5)


def test_upsample_conv_kernel_s2d_exact():
    from gan_segmentation_tpu.ops.conv import conv2d
    from gan_segmentation_tpu.ops.resize import upsample_nearest_2x

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 6, 6, 4), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 4, 3), jnp.float32)
    fine = conv2d(upsample_nearest_2x(x), w, padding=1)
    blk = conv2d(x, upsample_conv_kernel_s2d(w), padding=1)
    np.testing.assert_allclose(np.asarray(depth_to_space(blk)),
                               np.asarray(fine), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("max_res_log2,n_block", [(5, 1), (5, 2), (6, 2),
                                                  (6, 3), (6, 16)])
def test_decoder_apply_s2d_matches_flax(max_res_log2, n_block):
    """All block-stage depths (16 clamps to every-resblock-in-block-space)."""
    cfg = SolverConfig(max_res_log2=max_res_log2)
    dec = decoder_from_config(cfg)  # f32 compute
    rs = np.random.RandomState(3)
    feats = [jnp.asarray(rs.randn(2, 2 ** (i + 2), 2 ** (i + 2), c), jnp.float32)
             for i, c in enumerate(cfg.in_channels)]
    v = jax.jit(lambda f: dec.init(jax.random.PRNGKey(0), f, False))(feats)
    # non-trivial BN stats so the folding is actually exercised
    v = jax.device_get(v)
    v["batch_stats"] = jax.tree_util.tree_map(
        lambda a: np.abs(rs.randn(*np.shape(a))).astype(np.float32) + 0.5,
        v["batch_stats"])

    ref = jax.jit(lambda v, f: dec.apply(v, f, False))(v, feats)
    got = jax.jit(lambda v, f: decoder_apply_s2d(
        dec, v, f, fine_logits=True, n_block_stages=n_block))(v, feats)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # s2d mask == fine mask
    logits_s2d = jax.jit(lambda v, f: decoder_apply_s2d(
        dec, v, f, n_block_stages=n_block))(v, feats)
    m_fine = np.asarray(class_mask(ref))
    m_s2d = np.asarray(class_mask_s2d(logits_s2d, cfg.num_classes))
    np.testing.assert_array_equal(m_s2d, m_fine)


def test_prepare_apply_split_matches_wrapper():
    """prepare_s2d + apply_s2d_prepared == the one-shot wrapper, and the
    prepared tree is a plain pytree (jittable as an argument)."""
    from gan_segmentation_tpu.ops.s2d_decoder import (apply_s2d_prepared,
                                                      prepare_s2d)

    cfg = SolverConfig(max_res_log2=5)
    dec = decoder_from_config(cfg)
    rs = np.random.RandomState(7)
    feats = [jnp.asarray(rs.randn(1, 2 ** (i + 2), 2 ** (i + 2), c), jnp.float32)
             for i, c in enumerate(cfg.in_channels)]
    v = jax.jit(lambda f: dec.init(jax.random.PRNGKey(1), f, False))(feats)

    prep = jax.jit(lambda v: prepare_s2d(dec, v, 2))(v)
    got = jax.jit(lambda p, f: apply_s2d_prepared(dec, p, f, 2,
                                                  fine_logits=True))(prep, feats)
    ref = jax.jit(lambda v, f: decoder_apply_s2d(
        dec, v, f, fine_logits=True, n_block_stages=2))(v, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_decoder_apply_s2d_bf16_close():
    """bf16 compute path stays within half-precision tolerance of f32."""
    cfg = SolverConfig(max_res_log2=5)
    dec32 = decoder_from_config(cfg)
    dec16 = decoder_from_config(cfg, compute_dtype=jnp.bfloat16)
    rs = np.random.RandomState(4)
    feats = [jnp.asarray(rs.randn(1, 2 ** (i + 2), 2 ** (i + 2), c), jnp.float32)
             for i, c in enumerate(cfg.in_channels)]
    v = jax.jit(lambda f: dec32.init(jax.random.PRNGKey(0), f, False))(feats)
    ref = jax.jit(lambda v, f: dec32.apply(v, f, False))(v, feats)
    got = jax.jit(lambda v, f: decoder_apply_s2d(dec16, v, f,
                                                 fine_logits=True))(v, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.1, atol=0.15)
