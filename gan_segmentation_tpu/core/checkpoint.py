"""Checkpoint I/O.

Default format everywhere is a single flax-msgpack file named ``*.params``
(mirroring the reference's one-file mxnet checkpoints,
`seg_solver.py:331-337`). For large/multi-host training this module also
offers orbax-backed directory checkpoints (async-capable, shard-aware) —
the TPU-native upgrade path (SURVEY §5.4).
"""

from os.path import isdir, isfile
from typing import Any, Optional

import jax
from flax import serialization


def save_msgpack(path: str, tree: Any):
    with open(path, "wb") as fp:
        fp.write(serialization.msgpack_serialize(jax.device_get(tree)))


def load_msgpack(path: str, template: Optional[Any] = None):
    with open(path, "rb") as fp:
        restored = serialization.msgpack_restore(fp.read())
    if template is not None:
        restored = serialization.from_state_dict(
            jax.device_get(template), restored)
    return restored


def save_orbax(path: str, tree: Any):
    """Directory checkpoint via orbax (atomic, multi-host aware)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(tree), force=True)


def load_orbax(path: str, template: Optional[Any] = None):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, jax.device_get(template))
        return ckptr.restore(path)


def save_checkpoint(path: str, tree: Any, use_orbax: bool = False):
    if use_orbax:
        save_orbax(path, tree)
    else:
        save_msgpack(path, tree)


def load_checkpoint(path: str, template: Optional[Any] = None):
    """Auto-detect: orbax directory vs msgpack file vs mxnet binary."""
    if isdir(path):
        return load_orbax(path, template)
    from .mx_params import is_mx_params_file
    if is_mx_params_file(path):
        from .mx_params import load_mx_ndarray_file
        return load_mx_ndarray_file(path)
    return load_msgpack(path, template)
