"""Multi-host helpers on the virtual mesh (single process)."""

import numpy as np
import pytest

from gan_segmentation_tpu.core.distributed import make_global_batch
from gan_segmentation_tpu.core.mesh import make_mesh


def test_make_global_batch_single_process():
    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = make_global_batch(mesh, {"x": x})["x"]
    assert arr.shape == (16, 3)  # process_count == 1 -> global == local
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == mesh.size


@pytest.mark.slow
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


def test_batch_iter_process_sharding():
    """Each process's batches are disjoint slices of one global permutation
    covering exactly the global batches (multi-host data story)."""
    from gan_segmentation_tpu.train.deeplab_trainer import batch_iter

    class DS:
        def __len__(self):
            return 19

        def __getitem__(self, i):
            return (np.full((2, 2, 3), i, np.float32),
                    np.full((2, 2), i, np.int32))

    ds = DS()
    b, pc = 3, 2

    def ids_for(pid):
        out = []
        for imgs, masks, _ in batch_iter(ds, b, shuffle=True, seed=5,
                                         prefetch=1, process_index=pid,
                                         process_count=pc):
            assert imgs.shape == (b, 2, 2, 3)
            out.extend(int(v) for v in masks[:, 0, 0])
        return out

    a, c = ids_for(0), ids_for(1)
    # 19 samples, global batch 6 -> 3 global steps -> 9 per process
    assert len(a) == len(c) == 9
    assert not set(a) & set(c)
    ref = np.arange(19)
    np.random.RandomState(5).shuffle(ref)
    # interleaved union reconstructs the single-process order prefix
    merged = []
    for s in range(3):
        merged.extend(a[s * b:(s + 1) * b])
        merged.extend(c[s * b:(s + 1) * b])
    np.testing.assert_array_equal(merged, ref[:18])


def test_spatial_mesh_helper():
    """`spatial_mesh` (the `--spatial N` CLI helper): None for N<=1, the
    (ndev/N data, N space) mesh otherwise, ValueError when N doesn't divide
    the device count."""
    import jax

    from gan_segmentation_tpu.core.mesh import spatial_mesh

    assert spatial_mesh(0) is None
    assert spatial_mesh(1) is None
    ndev = len(jax.devices())
    assert ndev == 8  # conftest provisions the virtual 8-device mesh
    m = spatial_mesh(4)
    assert m.axis_names == ("data", "space")
    assert m.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        spatial_mesh(3)


def test_spatial_mesh_dp():
    """`spatial_mesh(dp=...)` (the `--dp D` CLI flag): explicit data-axis
    extent, 0 = all remaining devices, composes with spatial, ValueError
    past the device count, and a process-local mesh is recognized."""
    from gan_segmentation_tpu.core.mesh import is_local_mesh, spatial_mesh

    m = spatial_mesh(1, dp=8)  # pure data parallelism
    assert m.devices.shape == (8, 1)
    assert spatial_mesh(0, dp=0).devices.shape == (8, 1)  # 0 = all
    assert spatial_mesh(1, dp=4).devices.shape == (4, 1)  # subset is fine
    assert spatial_mesh(2, dp=3).devices.shape == (3, 2)  # no divisibility
    assert spatial_mesh(1, dp=1) is None  # explicit single device
    with pytest.raises(ValueError):
        spatial_mesh(2, dp=5)  # 10 > 8 devices
    with pytest.raises(ValueError):
        spatial_mesh(1, dp=-1)
    # single process: every mesh is local (the multi-host distinction is
    # exercised by tests/test_multiprocess.py)
    assert is_local_mesh(m)


def test_local_data_count():
    """Single process owns every data-axis position: the full device count
    on a 1-D mesh, only the distinct data ROWS on a (data, space) mesh
    (each row's shard is replicated over `space`)."""
    from gan_segmentation_tpu.core.mesh import (
        local_data_count, make_mesh, make_mesh_2d)

    assert local_data_count(make_mesh()) == 8
    assert local_data_count(make_mesh_2d(2, 4)) == 2
    assert local_data_count(make_mesh_2d(4, 2)) == 4
