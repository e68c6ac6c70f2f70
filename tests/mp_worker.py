"""Worker process for the REAL two-process `jax.distributed` test.

Launched twice by `tests/test_multiprocess.py` (process_id 0 and 1), each
with 4 virtual CPU devices, forming one 8-device global mesh over gloo
collectives. Each process loads its own disjoint slice of every global
batch from disk (`SegSolver.fit` multi-host path), the train step runs
SPMD over the process-spanning mesh, and process 0 dumps the final params
for the parent to compare against a single-process 8-device run.

This generalizes the reference's single-host kvstore gradient aggregation
(`deeplabv3plus/lib/core/segmentation.py:74-76`) to multi-host.

Usage: python mp_worker.py <port> <process_id> <data_dir> <out_dir>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from gan_segmentation_tpu.core.jit_cache import enable_persistent_cache
enable_persistent_cache()  # share the suite's on-disk compile cache


def main():
    port, pid, data_dir, out_dir = sys.argv[1:5]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from gan_segmentation_tpu.core.distributed import initialize, is_primary

    active = initialize(f"localhost:{port}", num_processes=2,
                        process_id=int(pid))
    assert active, "jax.distributed did not come up multi-process"
    assert jax.process_count() == 2
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    from gan_segmentation_tpu.core.config import SolverConfig
    from gan_segmentation_tpu.train.solver import SegSolver

    cfg = SolverConfig(max_res_log2=5)
    cfg.train_epochs = 2
    cfg.train_batch_size = 8  # GLOBAL batch; 4 per process
    cfg.device_cache = False  # host-feed path: per-process disjoint slices
    # SGD so the comparison tests the gradients (incl. the cross-process
    # all-reduce) directly: Adam's g/sqrt(v) amplifies gloo-vs-XLA
    # reduction-order noise on near-zero grads into sign flips
    cfg.optimizer = "sgd"
    cfg.momentum = 0.9
    solver = SegSolver(5, data_dir, os.path.join(out_dir, "ckpt"),
                       cfg=cfg, keep_weights=True, seed=7)
    solver.fit()
    assert not solver.cache_active

    # second fit: the HBM-resident device cache under multi-host — every
    # process uploads the full collection replicated over the global mesh
    # and each step gathers its batch ON DEVICE from identical global
    # indices. No per-process divisibility constraint: global batch 3 over
    # 2 processes is impossible for the host-feed path (3 % 2 != 0) but
    # trains fine cached (this is how the reference's batch-1 protocol,
    # `seg_solver.py:95-107`, runs multi-host).
    cfg_c = SolverConfig(max_res_log2=5)
    cfg_c.train_epochs = 2
    cfg_c.train_batch_size = 3
    cfg_c.device_cache = True
    cfg_c.optimizer = "sgd"
    cfg_c.momentum = 0.9
    solver_c = SegSolver(5, data_dir, os.path.join(out_dir, "ckpt_c"),
                         cfg=cfg_c, keep_weights=True, seed=7)
    solver_c.fit()
    assert solver_c.cache_active, "device cache did not engage multi-host"

    # Per-process LOCAL-mesh data-parallel generation (`generate --dp`
    # under multi-host): each process shards its own batch over its own 4
    # local devices — `is_local_mesh` must route `replicate`/`shard_batch`
    # down the single-controller path (the process-spanning global-array
    # assembly would corrupt per-process-private data), and the pairs must
    # equal this process's unmeshed run.
    import numpy as np

    from gan_segmentation_tpu.core.mesh import is_local_mesh, spatial_mesh
    from gan_segmentation_tpu.train.generator import (FusedPipeline,
                                                      ImageGenerator)

    local_mesh = spatial_mesh(1, dp=0, devices=jax.local_devices())
    assert local_mesh.devices.shape == (4, 1)
    assert is_local_mesh(local_mesh)

    def pairs(mesh):
        gen = ImageGenerator(gan="bedrooms", batch_size=4, dtype="fp32",
                             max_res_log2=5, gan_dir="/nonexistent",
                             seed=int(pid))
        return list(FusedPipeline(gen, solver, inference_dtype=None,
                                  mesh=mesh).generate_pairs(4))

    for (ia, ma), (ib, mb) in zip(pairs(None), pairs(local_mesh)):
        assert np.mean(np.abs(ia.astype(int) - ib.astype(int)) > 1) < 1e-3
        assert np.mean(ma != mb) < 1e-3

    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("fit-done")

    if is_primary():
        from flax import serialization
        with open(os.path.join(out_dir, "params.msgpack"), "wb") as fp:
            fp.write(serialization.msgpack_serialize(
                jax.device_get(solver.params)))
        with open(os.path.join(out_dir, "params_cached.msgpack"), "wb") as fp:
            fp.write(serialization.msgpack_serialize(
                jax.device_get(solver_c.params)))
    multihost_utils.sync_global_devices("dump-done")
    jax.distributed.shutdown()
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
