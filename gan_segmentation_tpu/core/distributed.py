"""Multi-host bootstrap.

The reference is single-host (SURVEY §2.3: no MPI/Gloo/UCX). On TPU pods,
multi-host is one call away: every train step in this framework is plain
``jit`` over a `Mesh`, so once `jax.distributed` is initialized and the
mesh is built over `jax.devices()` (all hosts' devices), the same code runs
data-parallel across hosts — XLA routes gradient/BN reductions over ICI
within a slice and DCN across slices.

Usage on each host of a pod slice (env-driven, e.g. GKE/TPU-VM):

    from gan_segmentation_tpu.core.distributed import initialize
    initialize()                  # no-op on single host
    mesh = make_mesh()            # now spans every host's chips

Per-host data sharding: feed each process its own batch shard and construct
global arrays with `make_global_batch`.
"""

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed; returns True if multi-host is active.

    With no args, relies on the TPU environment auto-detection; silently
    stays single-host when no cluster is configured.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception:
        return False
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should perform host-side writes
    (checkpoints, TensorBoard, image dumps)."""
    return jax.process_index() == 0


def local_shard(arr) -> np.ndarray:
    """Pull this process's rows of a batch-sharded global array to host.

    Shards are de-duplicated by global batch offset (on a 2-D (data, space)
    mesh each batch row's shard is replicated over ``space``, so several
    local devices hold the same rows) and re-ordered, so the result lines
    up with the slice `batch_iter(process_index=...)` fed on this process.
    """
    uniq = {}
    for s in arr.addressable_shards:
        uniq.setdefault(s.index[0].start or 0, s)
    return np.concatenate(
        [np.asarray(uniq[k].data) for k in sorted(uniq)], axis=0)


def any_flag(flag: bool) -> bool:
    """Cross-process OR of a host-side bool (no-op single-process).

    A COLLECTIVE: every process must call it at the same point (e.g. the
    same step index). Used to agree on a preemption stop — processes
    observe SIGTERM at different times (or only the preempted VM sees it
    at all), and a process stopping unilaterally would leave the others
    hung in the next SPMD step's gradient all-reduce.
    """
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    return bool(multihost_utils.process_allgather(
        np.asarray(bool(flag))).any())


def allreduce_sum(tree):
    """Sum numpy counters across processes (no-op single-process).

    Used to merge per-process metric accumulators (e.g.
    `SegmentationMetric.total_inter/union/correct/label`) after a
    process-sharded validation pass.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def red(x):
        g = multihost_utils.process_allgather(np.asarray(x))
        return g.sum(axis=0)

    return jax.tree_util.tree_map(red, tree)


def make_global_batch(mesh, per_host_batch):
    """Assemble a global, data-sharded array from this host's shard.

    ``per_host_batch``: numpy array whose leading dim is this process's
    share of the global batch. Returns a jax.Array spanning all hosts.
    Alias of `core.mesh.shard_batch`'s multi-host path (one implementation,
    correct on 1-D and 2-D (data, space) meshes alike).
    """
    from .mesh import shard_batch
    return shard_batch(mesh, per_host_batch)
