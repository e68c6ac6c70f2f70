#!/usr/bin/env python3
"""Decoder (SegSolver) end-to-end fit time: scanned epochs vs per-step.

Runs the reference training protocol shape (`seg_solver.py:95-107`:
small annotated collection, small batch, 24 epochs) twice on fabricated
annotations — once with the whole-epoch `lax.scan` program
(`SolverConfig.scan_epochs`, the default) and once dispatching the cached
step per batch — and reports wall time for the full fit plus steady-state
epoch time (epochs after the first, which carries the XLA compile).

On this environment each dispatch costs ~26 ms of host-device roundtrip;
the reference protocol is ~480 dispatches, so the scanned fit removes
~12 s of pure roundtrip from a sub-minute training run.

Env: SAMPLES (default 20), EPOCHS (24), BATCH (1), RES_LOG2 (8),
CPU=1 to force the host backend (for smoke runs). Prints one JSON line
per mode.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLES = int(os.environ.get("SAMPLES", 20))
EPOCHS = int(os.environ.get("EPOCHS", 24))
BATCH = int(os.environ.get("BATCH", 1))
RES_LOG2 = int(os.environ.get("RES_LOG2", 8))

if os.environ.get("CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from util_fixtures import make_annotation_dir  # noqa: E402

from gan_segmentation_tpu.core.config import SolverConfig  # noqa: E402
from gan_segmentation_tpu.train.solver import SegSolver  # noqa: E402


def run(scan: bool, data_dir: str, ckpt_root: str):
    cfg = SolverConfig(max_res_log2=RES_LOG2)
    cfg.train_epochs = EPOCHS
    cfg.train_batch_size = BATCH
    cfg.scan_epochs = scan
    ckpt = os.path.join(ckpt_root, "scan" if scan else "step")
    os.makedirs(ckpt, exist_ok=True)
    epoch_times = []

    t0 = time.time()
    solver = SegSolver(RES_LOG2, data_dir, ckpt, cfg=cfg, keep_weights=True,
                       seed=0)

    # time epochs from the outside via the epoch_end_callback hook
    last = [time.time()]

    def tick():
        now = time.time()
        epoch_times.append(now - last[0])
        last[0] = now

    solver.fit(epoch_end_callback=tick)
    total = time.time() - t0
    steady = sorted(epoch_times[1:])[len(epoch_times[1:]) // 2] \
        if len(epoch_times) > 1 else epoch_times[0]
    print(json.dumps({
        "mode": "scan_epochs" if scan else "per_step",
        "samples": SAMPLES, "epochs": EPOCHS, "batch": BATCH,
        "res": 2 ** RES_LOG2,
        "fit_total_s": round(total, 2),
        "first_epoch_s": round(epoch_times[0], 2),
        "steady_epoch_s": round(steady, 3),
        "dispatches_per_epoch": 1 if scan else max(
            1, SAMPLES // BATCH),
    }), flush=True)
    return total


def main():
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        data = os.path.join(tmp, "data")
        os.makedirs(data)
        make_annotation_dir(data, n_samples=SAMPLES, max_res_log2=RES_LOG2,
                            seed=0)
        run(True, data, tmp)
        run(False, data, tmp)


if __name__ == "__main__":
    main()
