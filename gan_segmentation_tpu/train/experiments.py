"""Experiment management (`deeplabv3plus/lib/utils/{cmd_args,exps_utils}.py`).

``init_exp`` creates ``runs/train_<timestamp>/{logs,checkpoints}``, copies the
launching script, attaches a file log handler, resolves the device context
from the kvstore/gpus flags (mapped onto the TPU data mesh), and for
``test`` mode auto-selects the newest ``*.params`` under the run dir
(`exps_utils.py:58-61`).
"""

import argparse
import inspect
import os
import shutil
import sys
from datetime import datetime
from pathlib import Path

import jax

from ..core.mesh import kvstore_to_mesh
from ..utils.log import add_file_handler, logger


def get_common_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["train", "test"])
    parser.add_argument("--workers", type=int, default=4, metavar="N",
                        help="Dataloader threads")
    parser.add_argument("--no-cuda", action="store_true", default=False,
                        help="force host-CPU jax")
    parser.add_argument("--ngpus", type=int, default=None,
                        help="number of devices (default: all local)")
    parser.add_argument("--gpus", type=str, default="", required=False)
    parser.add_argument("--kvstore", type=str, default="device",
                        help="accepted for reference CLI compat; maps to the "
                             "device mesh ('local' => single device)")
    parser.add_argument("--dtype", type=str, default="float32")
    parser.add_argument("--batch-size", type=int, default=8)
    return parser


def get_train_arguments():
    parser = get_common_arguments()
    parser.add_argument("--start-epoch", type=int, default=0)
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--test-batch-size", type=int, default=8)
    parser.add_argument("--no-exp", action="store_true", default=False)
    # not in the reference CLI: continue a preempted run IN PLACE — reuse
    # its runs/train_* dir (resume bundle, checkpoints, logs) instead of
    # creating a fresh one, so the trainer's step-granular `try_resume`
    # finds the bundle a SIGTERM left behind
    parser.add_argument("--resume", type=str, default=None, metavar="RUN_DIR",
                        help="continue a preempted training run in this "
                             "existing runs/train_* directory")
    return parser


def get_test_arguments():
    parser = get_common_arguments()
    parser.add_argument("run_path", type=str)
    parser.add_argument("--vizualization", action="store_true", default=False)
    # not in the reference CLI: images per fused multi-scale-eval program
    # (`SegmentationTester.test` buckets same-shape images and pads ragged
    # tails). 2 is the measured best on this chip (4.4 img/s vs 4.1 at 1 —
    # BASELINE.md "fused multi-scale eval"); re-tune on new silicon.
    parser.add_argument("--test-batch-size", type=int, default=2)
    return parser


def init_exp(run_file_path, add_exp_args, argv=None):
    argv = sys.argv[1:] if argv is None else argv
    parser = (get_train_arguments() if "train" in argv
              else get_test_arguments())
    parser = add_exp_args(parser)
    args = parser.parse_args(argv)
    stdout_log_path = None

    if args.mode == "train" and getattr(args, "resume", None):
        # continue a preempted run in place: same checkpoints dir (where
        # the SIGTERM handler left resume_bundle.msgpack), same logs
        run_path = Path(args.resume)
        if not (run_path / "checkpoints").is_dir():
            # a ValueError, never an assert (stripped under -O): a typo'd
            # path must not silently start a fresh run in a new directory
            raise ValueError(
                f"--resume expects an existing run dir, got {run_path}")
        args.logs_path = run_path / "logs"
        args.run_path = run_path
        args.checkpoints_path = run_path / "checkpoints"
        args.logs_path.mkdir(parents=True, exist_ok=True)
        stdout_log_path = args.logs_path / "train_log.txt"
    elif args.mode == "train":
        run_file_path = Path(run_file_path)
        exp_path = run_file_path.parent
        run_name = args.mode + datetime.today().strftime("_%Y-%m-%d_%H-%M-%S")
        run_path = exp_path / "runs" / run_name
        args.logs_path = run_path / "logs"
        args.run_path = run_path
        args.checkpoints_path = run_path / "checkpoints"
        if not args.no_exp:
            assert not run_path.exists()
            run_path.mkdir(parents=True)
            shutil.copy(str(run_file_path), str(run_path / "run.py"))
            args.checkpoints_path.mkdir(parents=True, exist_ok=True)
            args.logs_path.mkdir(parents=True, exist_ok=True)
            stdout_log_path = args.logs_path / "train_log.txt"
    else:
        run_path = Path(args.run_path)
        args.logs_path = run_path / "logs"
        current_date = datetime.today().strftime("%Y-%m-%d_%H-%M-%S")
        args.logs_path.mkdir(parents=True, exist_ok=True)
        stdout_log_path = args.logs_path / f"test_log_{current_date}.txt"
        if args.vizualization:
            viz = args.logs_path / f"viz_{current_date}"
            viz.mkdir(exist_ok=True)
            args.viz_path = viz
        run_weights = sorted(run_path.rglob("*.params"), key=lambda x: x.stem)
        assert run_weights, "Can't find model weights"
        args.weights = str(run_weights[-1])

    if stdout_log_path is not None:
        add_file_handler(stdout_log_path)

    from ..core.jit_cache import enable_persistent_cache
    enable_persistent_cache()  # train->test->resume runs reuse programs

    # device context resolution (`exps_utils.py:70-83`) -> TPU mesh.
    # Honor an explicit JAX_PLATFORMS env request through the config API:
    # environments may force-register a default backend at import time
    # (e.g. the axon sitecustomize stomps the env var), and a CLI launched
    # with JAX_PLATFORMS=cpu must actually get CPU.
    env_platform = os.environ.get("JAX_PLATFORMS")
    if env_platform and jax.config.jax_platforms != env_platform:
        try:
            jax.config.update("jax_platforms", env_platform)
        except RuntimeError:  # backend already initialized; keep going
            pass
    if args.no_cuda:
        logger.info("Using CPU")
        args.kvstore = "local"
    devices = jax.devices()
    if args.gpus:
        ids = [int(i) for i in args.gpus.split(",")]
    elif args.ngpus is not None:
        ids = list(range(min(args.ngpus, len(devices))))
    else:
        ids = list(range(len(devices)))
    args.mesh = kvstore_to_mesh(args.kvstore, ids)
    args.ngpus = args.mesh.size
    args.syncbn = True  # global-batch BN is inherent on the mesh
    logger.info("Number of devices: %d", args.ngpus)
    logger.info("%s", args)

    return args
