"""Device mesh + sharding helpers.

The reference's only parallelism is single-host data parallelism: manual
``split_and_load`` across GPUs plus NCCL KVStore gradient aggregation
(`seg_solver.py:389-421`, `lib/core/segmentation.py:99-114`) and
SyncBatchNorm. On TPU all of that is one concept: a `Mesh` with a ``data``
axis. Arrays whose leading (batch) dim is sharded over that axis are
processed data-parallel; global reductions inside `jit` (loss means, batch
norm statistics) compile to ICI all-reduces automatically, which subsumes
both the KVStore all-reduce and SyncBatchNorm.

The reference's ``--kvstore {nccl,device,local}`` flag (`cmd_args.py:20-21`)
is accepted for CLI compatibility and mapped onto mesh construction here.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(data: int, space: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A ``(data, space)`` mesh: batch parallelism x spatial (image-height)
    parallelism.

    The reference has no model parallelism of any kind (SURVEY §5.7) — this
    is the TPU-native extension it couldn't express: NHWC activations with
    H sharded over ``space`` let one 1024² image span several chips, with
    XLA's SPMD partitioner inserting the conv halo exchanges and turning
    instance/batch-norm spatial reductions into ICI all-reduces
    automatically. ``space`` should map to the mesh's minor (fastest-ICI)
    axis, which this layout does.
    """
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= data * space, (len(devices), data, space)
    arr = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def kvstore_to_mesh(kvstore: str = "nccl", device_ids: Optional[Sequence[int]] = None) -> Mesh:
    """Map the reference kvstore flag to a mesh.

    'nccl' / 'device'  -> all (or selected) accelerator devices
    'local'            -> first device only (reference forces 'local' on CPU,
                          `exps_utils.py:72`)
    """
    devices = jax.devices()
    if device_ids:
        devices = [devices[i] for i in device_ids if i < len(devices)]
    if kvstore == "local":
        devices = devices[:1]
    return make_mesh(devices)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _local_mesh_devices(mesh: Mesh):
    return [d for d in mesh.devices.flat
            if d.process_index == jax.process_index()]


def shard_batch(mesh: Mesh, tree):
    """Place every array in ``tree`` with its batch axis sharded over ``data``.

    Arrays whose leading dim does not divide the mesh size (e.g. the
    reference's batch_size=1 decoder training, `seg_solver.py:107`) are
    replicated instead — jit then runs them replicated, which is correct,
    just not parallel.

    Multi-host (``jax.process_count() > 1``): each process passes its own
    **local shard** (leading dim = global batch / process_count, e.g. the
    slice `batch_iter(process_index=...)` yields) and a global jax.Array
    spanning all hosts is assembled; the leading dim must divide the local
    device count (no replicated fallback — per-process data differs, so
    silent replication would be wrong).
    """
    if jax.process_count() > 1:
        local = _local_mesh_devices(mesh)

        def put_global(x):
            x = np.asarray(x)
            if x.ndim < 1 or x.shape[0] % len(local) != 0:
                raise ValueError(
                    f"multi-host shard_batch: local batch {x.shape} must "
                    f"divide the {len(local)} local devices")
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            per_dev = np.split(x, len(local), axis=0)
            arrays = [jax.device_put(s, d) for s, d in zip(per_dev, local)]
            return jax.make_array_from_single_device_arrays(
                global_shape, data_sharding(mesh, x.ndim), arrays)

        return jax.tree_util.tree_map(put_global, tree)

    # batch divisibility is against the ``data`` axis extent (on a 2-D
    # (data, space) mesh only that axis carries the batch)
    n = mesh.shape[DATA_AXIS] if DATA_AXIS in mesh.axis_names else mesh.size

    def put(x):
        if np.ndim(x) >= 1 and np.shape(x)[0] % n == 0:
            return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate every array over the mesh.

    Multi-host: every process must pass the SAME values (e.g. params built
    from the same seed); the replicated global array is assembled from each
    process's local copies.
    """
    if jax.process_count() > 1:
        local = _local_mesh_devices(mesh)
        sharding = replicated_sharding(mesh)

        def put_global(x):
            x = np.asarray(x)
            arrays = [jax.device_put(x, d) for d in local]
            return jax.make_array_from_single_device_arrays(
                x.shape, sharding, arrays)

        return jax.tree_util.tree_map(put_global, tree)

    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def spatial_spec(ndim: int) -> P:
    """PartitionSpec for an NHWC activation on a 2-D mesh: N over ``data``,
    H over ``space``, W/C replicated."""
    assert ndim >= 2, ndim
    return P(DATA_AXIS, SPACE_AXIS, *([None] * (ndim - 2)))


def constrain_spatial(tree, mesh: Optional[Mesh] = None):
    """``with_sharding_constraint`` every NHWC array in ``tree`` to the
    (data, space) layout. XLA propagates the constraint into the
    producing/consuming convs and emits halo exchanges where 3x3 windows
    cross the H split. Pass the 2-D mesh explicitly (traced constants work
    fine); with ``mesh=None`` a bare PartitionSpec is used, which requires
    an enclosing mesh context."""

    def put(x):
        spec = spatial_spec(np.ndim(x))
        s = spec if mesh is None else NamedSharding(mesh, spec)
        return jax.lax.with_sharding_constraint(x, s)

    return jax.tree_util.tree_map(put, tree)
