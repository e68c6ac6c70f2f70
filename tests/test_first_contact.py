"""`tools/first_contact.py` — the mechanized converter first-contact
protocol (PARITY.md checklist) must run all five stages on synthetic files
of ALL FOUR converters (the same fixtures the converter unit tests use), so
that first contact with a real reference checkpoint is one command."""

import sys
from os.path import dirname, join

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, join(dirname(__file__), "..", "tools"))

import first_contact
from test_mx_params import make_reference_named_params, write_mx_file

pytestmark = pytest.mark.slow  # training/e2e: minutes on the 1-core host


@pytest.fixture(scope="module")
def fixtures_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("fixtures"))


def _run(path, fixtures_dir, **kw):
    rec = first_contact.run(str(path), fixtures_dir=fixtures_dir, **kw)
    assert rec["golden"], rec
    for name, (mean, std) in rec["golden"].items():
        assert np.isfinite(mean) and np.isfinite(std), (name, mean, std)
    return rec


def test_stylegan_file(tmp_path, fixtures_dir):
    from gan_segmentation_tpu.core.config import GanConfig
    named = make_reference_named_params(GanConfig(max_res_log2=5))
    path = tmp_path / "stylegan-test.params"
    write_mx_file(path, list(named.values()), list(named.keys()))
    rec = _run(path, fixtures_dir)
    assert rec["kind"] == "stylegan"
    assert (tmp_path / "stylegan-test.params").exists()
    import os
    assert "stylegan-test.golden.json" in os.listdir(fixtures_dir)


def test_backbone_file(tmp_path, fixtures_dir):
    from test_backbone_convert import synth_gluoncv_resnet50
    named = synth_gluoncv_resnet50()
    path = tmp_path / "resnet50_v1s.params"
    write_mx_file(path, list(named.values()), list(named.keys()))
    rec = _run(path, fixtures_dir)
    assert rec["kind"] == "backbone"


def test_decoder_file(tmp_path, fixtures_dir):
    from gan_segmentation_tpu.core.config import SolverConfig
    from test_decoder_convert import synth_reference_decoder
    named = synth_reference_decoder(SolverConfig(max_res_log2=5))
    path = tmp_path / "checkpoint_last.params"
    write_mx_file(path, list(named.values()), list(named.keys()))
    # resolution is inferred by trying strict loads; also works pinned
    rec = _run(path, fixtures_dir, max_res_log2=5)
    assert rec["kind"] == "decoder"
    rec2 = _run(path, fixtures_dir)
    assert rec2["kind"] == "decoder"


def test_deeplab_file(tmp_path, fixtures_dir):
    from gan_segmentation_tpu.models.deeplab import DeepLabV3Plus
    from test_deeplab_convert import synth_reference_deeplab
    model = DeepLabV3Plus(nclass=2, aux=True, crop_size=32)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x, False))(dummy)
    named = synth_reference_deeplab(v["params"], v["batch_stats"])
    # the synthesizer randomizes every leaf at unit variance; for a FINITE
    # golden forward through ~50 conv layers the weights must be scaled
    # (unit-variance kernels multiply activation variance by fan-in per
    # layer -> f32 overflow) and running_var must be positive. Real
    # checkpoints satisfy both by construction.
    for k in named:
        if k.endswith("running_var"):
            named[k] = np.abs(named[k]) + 0.5
        elif k.endswith(".weight") and named[k].ndim == 4:
            named[k] = named[k] * 0.05
    path = tmp_path / "deeplab_run.params"
    write_mx_file(path, list(named.values()), list(named.keys()))
    rec = _run(path, fixtures_dir)
    assert rec["kind"] == "deeplab"


def test_wrong_kind_fails_loudly(tmp_path, fixtures_dir):
    """A mismatched converter must raise, not silently half-load."""
    from test_backbone_convert import synth_gluoncv_resnet50
    named = synth_gluoncv_resnet50()
    path = tmp_path / "resnet50_v1s.params"
    write_mx_file(path, list(named.values()), list(named.keys()))
    with pytest.raises((SystemExit, Exception)):
        first_contact.run(str(path), kind="decoder",
                          fixtures_dir=fixtures_dir)
