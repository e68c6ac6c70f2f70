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


def is_local_mesh(mesh: Mesh) -> bool:
    """True when every device of ``mesh`` belongs to THIS process.

    Under multi-host, a process-local mesh (e.g. `generate --dp` over
    `jax.local_devices()`) is driven single-controller: each process runs
    its own independent SPMD program over its own chips, so the
    cross-process global-array assembly in `shard_batch`/`replicate` must
    NOT apply — the plain `device_put` path is the correct one."""
    pi = jax.process_index()
    return all(d.process_index == pi for d in mesh.devices.flat)


def local_data_count(mesh: Mesh) -> int:
    """How many ``data``-axis positions of ``mesh`` this process owns (= the
    number of distinct batch shards its local devices carry). On a 1-D mesh
    this is simply the local device count; on a (data, space) mesh each
    data row is replicated over ``space``, so whole rows count once."""
    pi = jax.process_index()
    dev = mesh.devices
    if dev.ndim == 1:
        return sum(d.process_index == pi for d in dev)
    return sum(any(d.process_index == pi for d in row) for row in dev)


def shard_batch(mesh: Mesh, tree):
    """Place every array in ``tree`` with its batch axis sharded over ``data``.

    Arrays whose leading dim does not divide the mesh size (e.g. the
    reference's batch_size=1 decoder training, `seg_solver.py:107`) are
    replicated instead — jit then runs them replicated, which is correct,
    just not parallel.

    Multi-host (``jax.process_count() > 1``): each process passes its own
    **local shard** (leading dim = global batch / process_count, e.g. the
    slice `batch_iter(process_index=...)` yields) and a global jax.Array
    spanning all hosts is assembled via `make_array_from_callback` — which
    is layout-correct on a 2-D (data, space) mesh too (each data row's
    shard replicated over its ``space`` devices). The leading dim must
    divide this process's data-axis row count (no replicated fallback —
    per-process data differs, so silent replication would be wrong), and
    processes must tile the data axis contiguously in process-index order
    (the default `jax.devices()` mesh layout).

    A PROCESS-LOCAL mesh (`is_local_mesh`) is exempt from all of the
    above even under multi-host: it is driven single-controller with this
    process's own data (per-process independent generation), so the plain
    `device_put` path applies.
    """
    if jax.process_count() > 1 and not is_local_mesh(mesh):
        rows = local_data_count(mesh)

        def put_global(x):
            x = np.asarray(x)
            if x.ndim < 1 or rows == 0 or x.shape[0] % rows != 0:
                raise ValueError(
                    f"multi-host shard_batch: local batch {x.shape} must "
                    f"divide this process's {rows} data-axis rows")
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            offset = jax.process_index() * x.shape[0]
            sharding = data_sharding(mesh, x.ndim)

            def cb(index):
                r = index[0]
                start = (r.start or 0) - offset
                stop = (global_shape[0] if r.stop is None else r.stop) - offset
                if start < 0 or stop > x.shape[0]:
                    # a ValueError, never an assert: stripped under -O this
                    # would fall through to a negative slice that silently
                    # WRAPS to the end of the local batch — corrupt data,
                    # not an error
                    raise ValueError(
                        "shard rows outside this process's batch slice — "
                        "the mesh's data axis is not process-contiguous")
                return x[(slice(start, stop),) + tuple(index[1:])]

            return jax.make_array_from_callback(global_shape, sharding, cb)

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
    process's local copies. A process-local mesh (`is_local_mesh`) instead
    takes the plain single-controller path — its values are private to this
    process by construction.
    """
    if jax.process_count() > 1 and not is_local_mesh(mesh):
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


def spatial_mesh(spatial: int, dp: Optional[int] = None,
                 devices: Optional[Sequence] = None):
    """CLI helper for ``--spatial N`` / ``--dp D`` on the generate paths.

    Returns the generation mesh, or None for the plain single-device path:

    - ``spatial<=1, dp in (None, 1)``: None (one device, no mesh).
    - ``spatial>1, dp=None``: the ``(ndev/N data, N space)`` mesh over ALL
      devices (the original ``--spatial`` contract); raises ValueError
      unless N divides the device count.
    - ``dp>=1`` explicit: a ``(dp, spatial)`` mesh over the first
      ``dp*spatial`` devices — ``dp`` batch groups run data-parallel,
      each image H-sharded over ``spatial`` chips. ``dp=0`` means "all
      remaining": ``ndev//spatial`` rows (so ``--dp 0`` alone = pure data
      parallelism over every device). Raises ValueError when
      ``dp*spatial`` exceeds the device count.

    Shared by `main.py generate --spatial/--dp` and `bench.py`.
    """
    if devices is None:
        devices = jax.devices()
    if spatial <= 1 and (dp is None or dp == 1):
        return None
    if dp is None:
        if len(devices) % spatial:
            raise ValueError(f"--spatial {spatial} must divide the device "
                             f"count ({len(devices)})")
        dp = len(devices) // spatial
    elif dp == 0:
        dp = len(devices) // max(1, spatial)
    spatial = max(1, spatial)
    if dp == 1 and spatial == 1:
        return None  # e.g. --dp 0 on a single-device host
    if dp < 1 or dp * spatial > len(devices):
        raise ValueError(
            f"--dp {dp} x --spatial {spatial} needs {dp * spatial} devices, "
            f"but only {len(devices)} are available")
    return make_mesh_2d(dp, spatial, devices)


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
