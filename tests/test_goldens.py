"""Golden regression: fixed-seed generator + decoder outputs must not drift.

Regenerate with ``python tools/make_goldens.py`` ONLY for intentional
numerics changes (note it in the commit message).
"""

from os.path import dirname, isfile, join

import jax
import numpy as np
import pytest

from gan_segmentation_tpu.core.config import GanConfig, SolverConfig
from gan_segmentation_tpu.models.decoder import decoder_from_config
from gan_segmentation_tpu.models.stylegan import init_generator

GOLDEN = join(dirname(__file__), "goldens.npz")


@pytest.fixture(scope="module")
def produced():
    cfg = GanConfig(max_res_log2=4)
    model, params = init_generator(cfg, seed=0)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    rgb, feats = jax.jit(
        lambda p, z, r: model.apply({"params": p}, z, rngs={"noise": r})
    )(params, z, jax.random.PRNGKey(2))
    scfg = SolverConfig(max_res_log2=4)
    dec = decoder_from_config(scfg)
    dvars = jax.jit(lambda f: dec.init(jax.random.PRNGKey(3), f, False))(feats)
    logits = jax.jit(lambda v, f: dec.apply(v, f, False))(dvars, feats)
    return np.asarray(rgb), [np.asarray(f) for f in feats], np.asarray(logits)


@pytest.mark.skipif(not isfile(GOLDEN), reason="goldens.npz not generated")
def test_against_goldens(produced):
    rgb, feats, logits = produced
    g = np.load(GOLDEN)
    # atol 5e-5: the composed upsample+conv (ops/conv.upsample2x_conv2d) is
    # an exact algebraic rewrite but reassociates the summation order
    np.testing.assert_allclose(rgb, g["rgb"], rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(logits, g["logits"], rtol=1e-4, atol=1e-4)
    for i, f in enumerate(feats):
        np.testing.assert_allclose(f[:, :4, :4, :8], g[f"feat{i}_crop"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(f.mean(axis=(1, 2)), g[f"feat{i}_mean"],
                                   rtol=1e-3, atol=1e-4)
