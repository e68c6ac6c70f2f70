"""Config merger, profiling helpers, solver LR schedules."""

import numpy as np
import pytest

from gan_segmentation_tpu.core.config import SolverConfig
from gan_segmentation_tpu.core.yaml_config import AttrDict, cfg, load_config
from gan_segmentation_tpu.utils.profiling import Speedometer, trace


class TestYamlConfig:
    def test_merge_semantics(self, tmp_path):
        cfg.clear()
        cfg["training"] = AttrDict({"lr": 0.1, "epochs": 10})
        p = tmp_path / "c.yml"
        p.write_text("training:\n  lr: 0.01\nnew_key: 5\nnested:\n  a: 1\n")
        out = load_config(str(p))
        assert out.training.lr == 0.01
        assert out.training.epochs == 10  # merged, not replaced
        assert out.new_key == 5
        assert out.nested.a == 1


class TestSpeedometer:
    def test_rates(self):
        sp = Speedometer(display_every=2, n_chips=2)
        assert sp.update(4) is None
        rate = sp.update(4)
        assert rate is not None and rate > 0  # 2*4 samples / dt / 2 chips

    def test_trace_noop(self, tmp_path):
        with trace(str(tmp_path), enabled=False):
            pass  # must not raise


class TestSolverSchedules:
    def _solver_lr(self, scheduler, **extra):
        from gan_segmentation_tpu.train.solver import SegSolver
        cfg = SolverConfig(max_res_log2=5)
        cfg.scheduler = scheduler
        for k, v in extra.items():
            setattr(cfg, k, v)
        solver = SegSolver.__new__(SegSolver)
        solver.cfg = cfg
        return solver._make_lr(iters_per_epoch=10)

    def test_none(self):
        assert self._solver_lr(None) == 1e-4

    def test_cos(self):
        lr = self._solver_lr("cos")
        np.testing.assert_allclose(float(lr(0)), 1e-5, rtol=1e-4)   # base/10
        np.testing.assert_allclose(float(lr(10)), 1e-4, rtol=1e-4)  # peak
        assert float(lr(240)) <= 1.01e-6                            # base/1000

    def test_steps(self):
        lr = self._solver_lr("steps", epochs_steps=[1, 2])
        np.testing.assert_allclose(float(lr(5)), 1e-4, rtol=1e-4)
        np.testing.assert_allclose(float(lr(15)), 1e-5, rtol=1e-4)  # x factor_d


class TestGenerateSpatialGuard:
    def test_multihost_plus_spatial_refused(self, monkeypatch):
        """--spatial with multiple processes must fail fast: a process-
        spanning (data, space) mesh would desync generate's per-process
        SPMD dispatch and pull non-addressable arrays (apps/main.py)."""
        import jax
        import pytest

        from gan_segmentation_tpu.apps.main import run_generate

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        with pytest.raises(SystemExit, match="single-process"):
            run_generate(object(), spatial=2)  # guard fires before cfg use


class TestInitExpResume:
    """`init_exp --resume RUN_DIR` (preemption continuation, not in the
    reference CLI): reuse an existing runs/train_* dir so the trainer's
    step-granular `try_resume` finds the bundle the SIGTERM handler left."""

    @staticmethod
    def _add_args(parser):
        parser.add_argument("--input-path", type=str, default=None)
        return parser

    def test_resume_reuses_run_dir(self, tmp_path):
        from gan_segmentation_tpu.train.experiments import init_exp

        run_file = tmp_path / "main.py"
        run_file.write_text("# run file\n")
        run_dir = tmp_path / "runs" / "train_x"
        (run_dir / "checkpoints").mkdir(parents=True)

        args = init_exp(str(run_file), self._add_args,
                        argv=["train", "--resume", str(run_dir)])
        assert args.run_path == run_dir
        assert args.checkpoints_path == run_dir / "checkpoints"
        assert (run_dir / "logs").is_dir()
        # no NEW run dir was created next to the run file
        assert sorted(p.name for p in (tmp_path / "runs").iterdir()) \
            == ["train_x"]

    def test_resume_requires_existing_run_dir(self, tmp_path):
        import pytest

        from gan_segmentation_tpu.train.experiments import init_exp

        run_file = tmp_path / "main.py"
        run_file.write_text("# run file\n")
        with pytest.raises(ValueError, match="existing run dir"):
            init_exp(str(run_file), self._add_args,
                     argv=["train", "--resume", str(tmp_path / "missing")])


@pytest.mark.slow  # spawns two fresh python+jax subprocesses
class TestPersistentJitCache:
    """`core.jit_cache.enable_persistent_cache`: CLI entrypoints point jax
    at an on-disk compilation cache so repeat runs (train -> test ->
    generate are separate processes) deserialize instead of recompiling."""

    def test_cache_populates_and_second_process_hits(self, tmp_path):
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        prog = (
            "import os, sys, time\n"
            "sys.path.insert(0, %r)\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "jax.config.update("
            "'jax_persistent_cache_min_compile_time_secs', 0.0)\n"
            "from gan_segmentation_tpu.core.jit_cache import "
            "enable_persistent_cache\n"
            "d = enable_persistent_cache(%r)\n"
            "assert d is not None\n"
            "jax.config.update("
            "'jax_persistent_cache_min_compile_time_secs', 0.0)\n"
            "import jax.numpy as jnp\n"
            "t0 = time.time()\n"
            "jax.jit(lambda x: (x @ x.T).sum())("
            "jnp.ones((384, 384))).block_until_ready()\n"
            "print('ELAPSED', time.time() - t0)\n"
        ) % (repo, str(tmp_path / "cache"))
        r1 = subprocess.run([sys.executable, "-c", prog],
                            capture_output=True, text=True, timeout=300)
        assert r1.returncode == 0, r1.stderr[-2000:]
        entries = list((tmp_path / "cache").iterdir())
        assert entries, "no cache entries written"

        r2 = subprocess.run([sys.executable, "-c", prog],
                            capture_output=True, text=True, timeout=300)
        assert r2.returncode == 0, r2.stderr[-2000:]
        # the second process must not have ADDED entries (pure hits)
        assert len(list((tmp_path / "cache").iterdir())) == len(entries)

    def test_kill_switch(self, tmp_path, monkeypatch):
        from gan_segmentation_tpu.core.jit_cache import (
            enable_persistent_cache)

        monkeypatch.setenv("GAN_SEG_JIT_CACHE", "0")
        assert enable_persistent_cache(str(tmp_path / "nope")) is None
        assert not (tmp_path / "nope").exists()
