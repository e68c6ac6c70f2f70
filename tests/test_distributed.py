"""Multi-host helpers on the virtual mesh (single process)."""

import numpy as np

from gan_segmentation_tpu.core.distributed import make_global_batch
from gan_segmentation_tpu.core.mesh import make_mesh


def test_make_global_batch_single_process():
    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = make_global_batch(mesh, {"x": x})["x"]
    assert arr.shape == (16, 3)  # process_count == 1 -> global == local
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == mesh.size


def test_solver_bf16_dtype(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from util_fixtures import make_annotation_dir
    from gan_segmentation_tpu.core.config import SolverConfig
    from gan_segmentation_tpu.train.solver import SegSolver
    import jax.numpy as jnp

    make_annotation_dir(tmp_path, n_samples=2, max_res_log2=5, seed=0)
    cfg = SolverConfig(max_res_log2=5)
    cfg.dtype = "bf16"
    cfg.train_epochs = 1
    solver = SegSolver(5, str(tmp_path), str(tmp_path / "ck"), cfg=cfg)
    assert solver.model.compute_dtype == jnp.bfloat16
    solver.fit()
    assert solver.is_trained
