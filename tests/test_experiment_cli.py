"""End-to-end drive of the experiment CLI entrypoints
(`experiments/rgb_segmentation/01_.../main.py` ≡ reference `01/main.py`):
train creates runs/train_<ts> with checkpoints + logs + a run.py copy, and
test auto-selects the newest checkpoint and prints both metric blocks.
Exercises the uint8-feed path (`transform=None` + device normalization) as
the experiments now configure it.
"""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from test_deeplab import make_rgb_dataset

pytestmark = pytest.mark.slow  # training/e2e: minutes on the 1-core host

REPO = Path(__file__).resolve().parents[1]
EXP = REPO / "experiments" / "rgb_segmentation" / \
    "01_hair_deeplabv3_ffhq_pretrain_gan"


def _run(argv, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return subprocess.run([sys.executable, str(EXP / "main.py")] + argv,
                          cwd=str(cwd), env=env, capture_output=True,
                          text=True, timeout=1200)


def test_experiment_train_then_test(tmp_path):
    make_rgb_dataset(tmp_path, "train_generated", 4, size=64)
    make_rgb_dataset(tmp_path, "val", 2, size=64)

    runs_before = set((EXP / "runs").glob("*")) if (EXP / "runs").exists() \
        else set()
    try:
        r = _run(["train", "--input-path", str(tmp_path),
                  "--batch-size", "2", "--test-batch-size", "2",
                  "--crop-size", "32", "--base-size", "48",
                  "--epochs", "1", "--epoch-len", "4",
                  "--scale-factor", "1.0"], cwd=tmp_path)
        assert r.returncode == 0, r.stderr[-3000:]
        new_runs = set((EXP / "runs").glob("*")) - runs_before
        assert len(new_runs) == 1, new_runs
        run_dir = new_runs.pop()
        assert (run_dir / "run.py").exists()
        ckpts = list((run_dir / "checkpoints").glob("*.params"))
        assert ckpts, list(run_dir.rglob("*"))

        r = _run(["test", str(run_dir), "--input-path", str(tmp_path),
                  "--crop-size", "32", "--base-size", "48",
                  "--scale-factor", "1.0"], cwd=tmp_path)
        assert r.returncode == 0, r.stderr[-3000:]
        logs = sorted((run_dir / "logs").glob("test_log_*.txt"))
        assert logs
        text = logs[-1].read_text()
        assert "mean-iou" in text and "accuracy" in text, text[-2000:]
    finally:
        for d in (set((EXP / "runs").glob("*")) - runs_before):
            shutil.rmtree(d, ignore_errors=True)
