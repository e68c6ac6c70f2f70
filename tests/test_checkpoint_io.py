"""Checkpoint I/O: msgpack/orbax roundtrips, auto-detection, reader edges."""

import struct

import jax.numpy as jnp
import numpy as np
import pytest

from gan_segmentation_tpu.core.checkpoint import (
    load_checkpoint, load_msgpack, save_checkpoint, save_msgpack,
)
from gan_segmentation_tpu.core.mx_params import load_mx_ndarray_file


def tree():
    return {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                       "b": jnp.zeros(3)},
            "batch_stats": {"bn": {"mean": jnp.ones(3)}}}


class TestMsgpack:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "ck.params"
        save_msgpack(str(p), tree())
        restored = load_msgpack(str(p), tree())
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.arange(6).reshape(2, 3))

    def test_autodetect(self, tmp_path):
        p = tmp_path / "ck.params"
        save_checkpoint(str(p), tree())
        restored = load_checkpoint(str(p), tree())
        assert "batch_stats" in restored


class TestOrbax:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "orbax_ck"
        save_checkpoint(str(p), tree(), use_orbax=True)
        restored = load_checkpoint(str(p), tree())
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["w"]), np.arange(6).reshape(2, 3))
        np.testing.assert_array_equal(
            np.asarray(restored["batch_stats"]["bn"]["mean"]), np.ones(3))


class TestMxReaderEdges:
    def test_v3_magic(self, tmp_path):
        out = bytearray()
        out += struct.pack("<QQQ", 0x112, 0, 1)
        out += struct.pack("<I", 0xF993FACA)  # V3
        out += struct.pack("<i", 0)
        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        out += struct.pack("<I", 2) + struct.pack("<qq", 3, 4)
        out += struct.pack("<iii", 1, 0, 0)
        out += arr.tobytes()
        out += struct.pack("<Q", 1) + struct.pack("<Q", 3) + b"arr"
        p = tmp_path / "v3.params"
        p.write_bytes(bytes(out))
        loaded = load_mx_ndarray_file(str(p))
        np.testing.assert_array_equal(loaded["arr"], arr)

    def test_truncated_raises(self, tmp_path):
        p = tmp_path / "bad.params"
        p.write_bytes(struct.pack("<QQQ", 0x112, 0, 1) + b"\x00" * 4)
        with pytest.raises(Exception):
            load_mx_ndarray_file(str(p))

    def test_wrong_magic_raises(self, tmp_path):
        p = tmp_path / "notmx.params"
        p.write_bytes(b"\x01\x02\x03\x04\x05\x06\x07\x08rest")
        with pytest.raises(ValueError):
            load_mx_ndarray_file(str(p))
