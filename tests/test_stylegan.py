"""Generator structure tests: channel table, resolutions, feature pyramid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.core.config import GanConfig, gan_config
from gan_segmentation_tpu.models.stylegan import StyleGanGenerator, init_generator


class TestChannelTable:
    def test_ffhq_channels(self):
        cfg = gan_config("ffhq")
        # SURVEY §2.1 row 2 (`networks_stylegan.py:114-116`)
        assert cfg.feature_channels == [512, 512, 512, 512, 256, 128, 64, 32, 16]
        assert cfg.resolutions == [4, 8, 16, 32, 64, 128, 256, 512, 1024]
        assert cfg.num_style_layers == 18

    def test_cars_bedrooms(self):
        assert gan_config("cars").max_res_log2 == 9
        assert gan_config("bedrooms").max_res_log2 == 8
        assert gan_config("bedrooms").feature_channels == [512] * 4 + [256, 128, 64]


@pytest.mark.parametrize("max_res_log2", [5, 8])
def test_generator_shapes(max_res_log2):
    cfg = GanConfig(max_res_log2=max_res_log2)
    model, params = init_generator(cfg, seed=0)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    rgb, feats = model.apply({"params": params}, z,
                             rngs={"noise": jax.random.PRNGKey(2)})
    res = 2 ** max_res_log2
    assert rgb.shape == (2, res, res, 3)
    assert len(feats) == max_res_log2 - 1
    for i, f in enumerate(feats):
        r = 2 ** (i + 2)
        assert f.shape == (2, r, r, cfg.num_features(i + 2)), (i, f.shape)


def test_truncation_psi_zero_collapses_styles():
    """psi=0 -> every style w_i == latent_avg -> output independent of z."""
    cfg = GanConfig(max_res_log2=4, fix_noise=False)
    model, params = init_generator(cfg, seed=0)
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["truncation_psi"] = jnp.zeros_like(params["truncation_psi"])
    noise_rng = jax.random.PRNGKey(7)
    z1 = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    z2 = jax.random.normal(jax.random.PRNGKey(2), (1, 512))
    rgb1, _ = model.apply({"params": params}, z1, rngs={"noise": noise_rng})
    rgb2, _ = model.apply({"params": params}, z2, rngs={"noise": noise_rng})
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2),
                               rtol=1e-4, atol=1e-5)


def test_noise_rng_changes_output():
    cfg = GanConfig(max_res_log2=4)
    model, params = init_generator(cfg, seed=0)
    # noise scale_factors init to 0 (`networks_stylegan.py:279-281`), so fresh
    # init is noise-free; crank them up to observe the injection.
    params = jax.tree_util.tree_map(lambda x: x, params)
    for blk in ("block_2", "block_3", "block_4"):
        for nz in ("noise_1", "noise_2"):
            params[blk][nz]["scale_factors"] = (
                jnp.ones_like(params[blk][nz]["scale_factors"]))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    r1, _ = model.apply({"params": params}, z, rngs={"noise": jax.random.PRNGKey(1)})
    r2, _ = model.apply({"params": params}, z, rngs={"noise": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
    # noise-free at zero scale (reference init state)
    for blk in ("block_2", "block_3", "block_4"):
        for nz in ("noise_1", "noise_2"):
            params[blk][nz]["scale_factors"] = (
                jnp.zeros_like(params[blk][nz]["scale_factors"]))
    r3, _ = model.apply({"params": params}, z, rngs={"noise": jax.random.PRNGKey(1)})
    r4, _ = model.apply({"params": params}, z, rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(r3), np.asarray(r4), atol=1e-6)


def test_param_structure_has_deconv_at_high_res():
    """fused upscale kicks in at res_log2 >= 7 (`networks_stylegan.py:154`)."""
    cfg = GanConfig(max_res_log2=8)
    _, params = init_generator(cfg, seed=0)
    assert "deconv_1" in params["block_7"]
    assert "deconv_1" in params["block_8"]
    assert "conv_1" in params["block_6"]
    assert "conv_1" not in params["block_2"]  # first block has no conv0
    # deconv weight is (4,4,in,out)
    assert params["block_7"]["deconv_1"]["weight"].shape == (4, 4, 256, 128)


def test_jit_generator():
    cfg = GanConfig(max_res_log2=5)
    model, params = init_generator(cfg, seed=0)

    @jax.jit
    def fwd(params, z, rng):
        return model.apply({"params": params}, z, rngs={"noise": rng})

    z = jax.random.normal(jax.random.PRNGKey(0), (4, 512))
    rgb, feats = fwd(params, z, jax.random.PRNGKey(3))
    assert rgb.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(rgb)).all()


def test_minibatch_std_layer_matches_numpy_reference():
    """`networks_stylegan.py:327-345`: the appended channel holds, for each
    sample n, the mean-over-(C,H,W) group stddev of its group column
    m = n % M (mxnet's row-major (G, M, ...) reshape assigns sample
    n = g*M + m to column m; the [M,1,1,1] -> tile-by-G replication maps
    value m back to every n with n % M == m)."""
    from gan_segmentation_tpu.models.layers import minibatch_std_layer

    rng = np.random.RandomState(7)
    n, h, w, c, g = 6, 4, 4, 3, 2
    x = rng.randn(n, h, w, c).astype(np.float32)

    out = np.asarray(minibatch_std_layer(jnp.asarray(x), group_size=g))
    assert out.shape == (n, h, w, c + 1)
    np.testing.assert_array_equal(out[..., :c], x)

    m = n // g
    grouped = x.reshape(g, m, h, w, c)              # sample n -> (n//m, n%m)
    std = np.sqrt(grouped.var(axis=0) + 1e-8)       # (M,H,W,C)
    expected = std.mean(axis=(1, 2, 3))             # (M,)
    for i in range(n):
        np.testing.assert_allclose(out[i, ..., c], expected[i % m],
                                   rtol=1e-6, atol=1e-6)

    # the extra channel is constant over (H, W) and identical within a
    # group column
    assert np.allclose(out[0, ..., c], out[m, ..., c])
