"""Native IO runtime tests (ctypes bindings + Python fallback)."""

import os

import numpy as np
import pytest

from smoothed_particle_hydrodynamics_tpu.utils import native


def test_async_writer(tmp_path):
    w = native.AsyncFileWriter()
    p = str(tmp_path / "log.txt")
    w.write(p, "a", append=False)
    for _ in range(100):
        w.write(p, "b")
    w.flush()
    data = open(p).read()
    assert data == "a" + "b" * 100
    w.close()


def test_snapshot_roundtrip_and_crc(tmp_path):
    p = str(tmp_path / ("snap.sphs" if native.have_native() else "snap.npz"))
    arrays = {"pos": np.random.rand(64, 3).astype(np.float32),
              "count": np.arange(64, dtype=np.int32)}
    native.write_snapshot(p, arrays)
    assert native.verify_snapshot(p)
    if native.have_native():
        # corrupt one byte -> CRC must fail
        with open(p, "r+b") as f:
            f.seek(20)
            f.write(b"\xff")
        assert not native.verify_snapshot(p)


def test_python_fallback_writer(tmp_path, monkeypatch):
    monkeypatch.setattr(native, "_LIB", False)
    w = native.AsyncFileWriter()
    p = str(tmp_path / "log.txt")
    w.write(p, "xy", append=False)
    w.flush()
    assert open(p).read() == "xy"
    assert w.stats()["native"] is False
