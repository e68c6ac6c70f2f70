"""The example scripts stay runnable end to end (tiny scale, CPU-pinned).

These are the repo's executable documentation (README "quick start"); each
drives a real multi-stage pipeline — annotations -> decoder training ->
generate -> deeplab (full_pipeline_demo), and train -> export bundle ->
serve through the native writer (serving_demo).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # several minutes each on the 1-core host

REPO = Path(__file__).resolve().parents[1]


def _run_example(name, argv, timeout=1500):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, str(REPO / "examples" / name), "--cpu"] + argv,
        capture_output=True, text=True, timeout=timeout, env=env)


def test_full_pipeline_demo(tmp_path):
    r = _run_example("full_pipeline_demo.py", [
        "--workdir", str(tmp_path), "--max-res-log2", "5",
        "--n-annotations", "6", "--n-generate", "8",
        "--decoder-epochs", "2", "--deeplab-epochs", "1",
        "--deeplab-epoch-len", "8"])
    assert r.returncode == 0, r.stderr[-3000:]
    gen = list((tmp_path / "dataset" / "train_generated").glob("img_*.jpg"))
    assert len(gen) == 8, (len(gen), r.stdout[-1500:])


def test_serving_demo(tmp_path):
    r = _run_example("serving_demo.py", [
        "--workdir", str(tmp_path), "--max-res-log2", "5",
        "--n-annotations", "6", "--n-serve", "8", "--batch", "4",
        "--decoder-epochs", "2"])
    assert r.returncode == 0, r.stderr[-3000:]
    served = list((tmp_path / "served").glob("img_*.jpg"))
    masks = list((tmp_path / "served").glob("mask_*.png"))
    assert len(served) == 8 and len(masks) == 8, r.stdout[-1500:]
    assert (tmp_path / "generate.bundle" / "module.stablehlo").exists()
