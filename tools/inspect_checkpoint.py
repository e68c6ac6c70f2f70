#!/usr/bin/env python3
"""Inspect a checkpoint file: our flax-msgpack `.params` or an mxnet
NDArray-list file (auto-detected). Prints name, shape, dtype per entry.

    python tools/inspect_checkpoint.py path/to/checkpoint.params
"""

import sys
from os.path import dirname, join

sys.path.insert(0, join(dirname(__file__), ".."))

import numpy as np


def flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten(v, f"{prefix}{k}/" if prefix or True else k)
    else:
        yield prefix.rstrip("/"), np.asarray(tree)


def main(path):
    from gan_segmentation_tpu.core.mx_params import (
        is_mx_params_file, load_mx_ndarray_file,
    )

    if is_mx_params_file(path):
        print(f"{path}: mxnet NDArray-list format")
        entries = load_mx_ndarray_file(path).items()
    else:
        from flax import serialization
        with open(path, "rb") as fp:
            tree = serialization.msgpack_restore(fp.read())
        print(f"{path}: flax msgpack pytree")
        entries = flatten(tree)

    total = 0
    for name, arr in entries:
        n = int(np.prod(arr.shape)) if arr.shape else 1
        total += n
        print(f"{name:<60} {str(tuple(arr.shape)):<24} {arr.dtype}")
    print(f"{'total':<60} {total}")


if __name__ == "__main__":
    main(sys.argv[1])
