"""Pallas small-conv kernel vs reference conv, interpreter mode (CPU).

The kernel is an ARCHIVED negative result (lost to XLA's conv emitter on
this chip; see experiments/pallas_archive/README.md) — the test keeps the
archive honest without shipping the kernel in the package."""

import functools
import sys
from os.path import dirname, join

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, join(dirname(__file__), "..", "experiments",
                        "pallas_archive"))

import small_conv
from gan_segmentation_tpu.ops.conv import conv2d


@pytest.fixture
def interp(monkeypatch):
    """Run the kernel through the pallas interpreter (no TPU needed)."""
    orig = small_conv.pl.pallas_call
    monkeypatch.setattr(small_conv.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    # bypass the jit wrapper so the monkeypatched pallas_call is picked up
    return small_conv.conv3x3_small.__wrapped__


@pytest.mark.parametrize("cin,cout,h", [(16, 16, 32), (64, 16, 16), (8, 4, 8)])
def test_matches_conv2d(interp, cin, cout, h, rng):
    x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(cout).astype(np.float32))
    got = interp(x, w, b, tile_h=8)
    want = conv2d(x, w, b, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_epilogues(interp, rng):
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
    base = np.asarray(conv2d(x, w, padding=1))
    got_relu = np.asarray(interp(x, w, tile_h=8, relu=True))
    np.testing.assert_allclose(got_relu, np.maximum(base, 0), rtol=1e-4,
                               atol=1e-5)
    got_leaky = np.asarray(interp(x, w, tile_h=8, leaky=0.2))
    np.testing.assert_allclose(got_leaky, np.where(base >= 0, base, 0.2 * base),
                               rtol=1e-4, atol=1e-5)


def test_tile_divisibility_assert(interp, rng):
    x = jnp.zeros((1, 12, 12, 8))
    w = jnp.zeros((3, 3, 8, 8))
    with pytest.raises(AssertionError):
        interp(x, w, tile_h=8)


class TestConvINStats:
    """Fused conv+noise+bias+lrelu+IN-stats kernel (archived: measured ~2x
    slower than the XLA composition in device time on this chip, see
    experiments/pallas_archive/README.md) vs the unfused reference
    composition, interpreter mode."""

    @pytest.fixture
    def interp_stats(self, monkeypatch):
        import conv_in_stats as m
        orig = m.pl.pallas_call
        monkeypatch.setattr(m.pl, "pallas_call",
                            functools.partial(orig, interpret=True))
        return m.conv3x3_noise_bias_lrelu_instats.__wrapped__

    @pytest.mark.parametrize("cin,cout,h,n", [(16, 16, 32, 2), (8, 4, 16, 1),
                                              (64, 32, 16, 2)])
    def test_matches_unfused(self, interp_stats, cin, cout, h, n, rng):
        x = jnp.asarray(rng.randn(n, h, h, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
        noise = jnp.asarray(rng.randn(n, h, h).astype(np.float32))
        nscale = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

        y, mean, var = interp_stats(x, w, noise, nscale, bias, tile_h=8)

        ref = np.asarray(conv2d(x, w, padding=1))
        ref = ref + np.asarray(noise)[..., None] * np.asarray(nscale)
        ref = ref + np.asarray(bias)
        ref = np.where(ref >= 0, ref, 0.2 * ref)
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mean), ref.mean(axis=(1, 2)),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var), ref.var(axis=(1, 2)),
                                   rtol=1e-3, atol=1e-5)

    def test_stats_enable_exact_adain(self, interp_stats, rng):
        """The returned stats normalize exactly like ops.norm.instance_norm
        on the fused output (the downstream AdaIN consumer contract)."""
        from gan_segmentation_tpu.ops.norm import instance_norm
        x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1)
        noise = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32))
        nscale = jnp.zeros((8,), jnp.float32)
        bias = jnp.zeros((8,), jnp.float32)
        y, mean, var = interp_stats(x, w, noise, nscale, bias, tile_h=8)
        eps = 1e-8
        got = (np.asarray(y) - np.asarray(mean)[:, None, None, :]) \
            / np.sqrt(np.asarray(var)[:, None, None, :] + eps)
        want = np.asarray(instance_norm(y, eps=eps))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
