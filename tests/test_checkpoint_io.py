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


class TestAtomicCheckpointWrites:
    """A crash/preemption DURING a checkpoint write must never tear the
    file auto-resume loads next: writers emit to `<name>.tmp` and
    `os.replace` into place. Fault-injected by making the serialized
    payload unwritable (TypeError inside fp.write, i.e. after open)."""

    class _Boom:
        pass  # not bytes-like: fp.write raises mid-"write"

    def test_deeplab_checkpoint_file(self, tmp_path, monkeypatch):
        from flax import serialization

        from gan_segmentation_tpu.train import deeplab_trainer as dt

        path = tmp_path / "last_checkpoint.params"
        params = {"w": np.ones((2,), np.float32)}
        dt.save_checkpoint_file(str(path), params, {})
        good = path.read_bytes()

        monkeypatch.setattr(serialization, "msgpack_serialize",
                            lambda d: self._Boom())
        with pytest.raises(TypeError):
            dt.save_checkpoint_file(str(path), params, {})
        assert path.read_bytes() == good  # original intact, not truncated

    def test_solver_save(self, tmp_path, monkeypatch):
        from flax import serialization

        from gan_segmentation_tpu.core.config import SolverConfig
        from gan_segmentation_tpu.train.solver import SegSolver

        s = SegSolver(5, str(tmp_path / "none"), str(tmp_path / "ck"),
                      cfg=SolverConfig(max_res_log2=5), keep_weights=True)
        s.save()
        path = tmp_path / "ck" / "checkpoint_last.params"
        good = path.read_bytes()

        monkeypatch.setattr(serialization, "msgpack_serialize",
                            lambda d: self._Boom())
        with pytest.raises(TypeError):
            s.save()
        assert path.read_bytes() == good

    def test_leftover_tmp_not_picked_up_by_resume(self, tmp_path):
        """A .tmp orphan from a crash mid-write must not be selected by the
        extension-filtered checkpoint listing."""
        from gan_segmentation_tpu.utils.io import list_files_with_ext

        (tmp_path / "checkpoint_last.params").write_bytes(b"ok")
        (tmp_path / "checkpoint_last.params.tmp").write_bytes(b"torn")
        files = list_files_with_ext(str(tmp_path), [".params", ".msgpack"])
        assert [f for f in files if f.endswith(".tmp")] == []
