"""Native runtime library vs the pure-numpy fallbacks (bit-identical)."""

import subprocess

import numpy as np
import pytest

from decentralized_ekf_mhe_tpu import native
from decentralized_ekf_mhe_tpu.io import logger as log_io


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        subprocess.check_call(["sh", "native/build.sh"])
        native._TRIED = False  # re-probe
    assert native.available(), "native library must build on this image"


def test_latest_index_matches_numpy():
    rng = np.random.default_rng(0)
    stream = np.sort(rng.uniform(0, 10, 500))
    samples = rng.uniform(-1, 11, 300)
    ref = np.clip(np.searchsorted(stream, samples, side="right") - 1, 0, 499)
    np.testing.assert_array_equal(native.latest_index(stream, samples), ref)


def test_upper_bound_sync_matches_numpy():
    rng = np.random.default_rng(1)
    ticks = np.sort(rng.uniform(0, 5, 100))
    stamps = rng.uniform(-1, 6, 50)
    ref = np.searchsorted(ticks, stamps, side="right") - 1
    np.testing.assert_array_equal(native.upper_bound_sync(ticks, stamps), ref)


def test_gather_rows():
    rng = np.random.default_rng(2)
    src = rng.standard_normal((20, 7))
    idx = rng.integers(0, 20, 31)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_native_logger_cross_compat(tmp_path):
    """Native-written log reads back via BOTH readers, and matches a
    python-written log byte-for-byte."""
    rng = np.random.default_rng(3)
    poses = rng.standard_normal((6, 3))
    ticks = np.arange(6.0)[:, None]

    nl = native.NativeLogger("nat", str(tmp_path))
    nl.add_channel("pose", "VectorXd", 3)
    nl.add_channel("tick", "int")
    for k in range(6):
        nl.log_tick({"pose": poses[k], "tick": ticks[k]})
    nl.close()

    pl = log_io.DataLogger("py", str(tmp_path))
    pl.add_channel("pose", "VectorXd", 3)
    pl.add_channel("tick", "int")
    for k in range(6):
        pl.log_tick({"pose": poses[k], "tick": ticks[k]})
    pl.close()

    raw_n = open(tmp_path / "nat_Data", "rb").read()
    raw_p = open(tmp_path / "py_Data", "rb").read()
    assert raw_n == raw_p
    assert open(tmp_path / "nat_Name.csv").read() == open(tmp_path / "py_Name.csv").read()

    out_py = log_io.read_log(str(tmp_path / "nat"))
    out_nat = native.read_log(str(tmp_path / "py"))
    np.testing.assert_allclose(out_py["pose"], poses, atol=0)
    np.testing.assert_allclose(out_nat["pose"], poses, atol=0)
    np.testing.assert_allclose(out_nat["tick"][:, 0], np.arange(6), atol=0)


def test_native_logger_sequence(tmp_path):
    nl = native.NativeLogger("seq", str(tmp_path))
    nl.add_channel("x", "VectorXd", 2)
    nl.add_channel("f", "VectorXf", 2)
    xs = np.arange(8.0).reshape(4, 2)
    nl.log_sequence({"x": xs, "f": xs * 0.5})
    nl.close()
    out = log_io.read_log(str(tmp_path / "seq"))
    np.testing.assert_allclose(out["x"], xs, atol=0)
    np.testing.assert_allclose(out["f"], xs * 0.5, atol=1e-7)


def test_block_feeder():
    src = np.arange(30.0).reshape(10, 3)
    fd = native.BlockFeeder(src, block=4)
    b1, n1 = fd.next()
    np.testing.assert_array_equal(b1, src[0:4])
    assert n1 == 4
    b2, n2 = fd.next()
    np.testing.assert_array_equal(b2, src[4:8])
    b3, n3 = fd.next()
    assert n3 == 2
    np.testing.assert_array_equal(b3[:2], src[8:10])
    np.testing.assert_array_equal(b3[2:], 0.0)  # static-shape zero padding
    b4, n4 = fd.next()  # wraps
    np.testing.assert_array_equal(b4, src[0:4])
