"""Pallas small-conv kernel vs reference conv, interpreter mode (CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.ops.conv import conv2d
from gan_segmentation_tpu.ops.pallas import small_conv


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
