"""Async telemetry recorder (native C++ + Python fallback).

Covers: roundtrip integrity, drop-not-block overflow semantics, concurrent
producers, throughput floor, the flight-log schema, and TrajectoryData
interop.  Role model: reference SaveMixin (control/base.py:48-114), rebuilt
off the hot path (SURVEY §5.4/§6).
"""

import threading

import numpy as np
import pytest

from aircraft_tpu.native import telemetry as tel


BACKENDS = ["python"] + (["native"] if tel.native_available() else [])


def _make(path, rec_floats, capacity, backend):
    return tel.TelemetryRecorder(
        path, rec_floats, capacity=capacity, force_python=(backend == "python")
    )


@pytest.mark.parametrize("backend", BACKENDS)
def test_roundtrip(tmp_path, backend):
    path = tmp_path / f"log_{backend}.bin"
    recs = np.arange(200 * 6, dtype=np.float64).reshape(200, 6)
    with _make(path, 6, 1024, backend) as r:
        assert r.backend == backend
        n = r.push(recs[:100])
        n += r.push(recs[100:])
        assert n == 200
        r.flush()
        written, dropped = r.stats()
        assert written == 200 and dropped == 0
    out = tel.read_log(path)
    np.testing.assert_array_equal(out, recs)


@pytest.mark.parametrize("backend", BACKENDS)
def test_single_record_and_reopen(tmp_path, backend):
    path = tmp_path / "one.bin"
    with _make(path, 3, 16, backend) as r:
        r.push(np.array([1.0, 2.0, 3.0]))
        r.flush()
    out = tel.read_log(path)
    np.testing.assert_array_equal(out, [[1.0, 2.0, 3.0]])


@pytest.mark.parametrize("backend", BACKENDS)
def test_overflow_drops_never_blocks(tmp_path, backend):
    # capacity 8 records; a 64-record burst must return immediately with
    # drops counted — producers are never backpressured.
    path = tmp_path / "drop.bin"
    with _make(path, 2, 8, backend) as r:
        total = 0
        for _ in range(8):
            total += r.push(np.ones((8, 2)))
        r.flush()
        written, dropped = r.stats()
        assert written == total
        assert written + dropped == 64
        assert written >= 8  # at least one burst landed
    assert len(tel.read_log(path)) == written


@pytest.mark.parametrize("backend", BACKENDS)
def test_concurrent_producers(tmp_path, backend):
    path = tmp_path / "mt.bin"
    n_threads, per = 8, 500
    with _make(path, 4, 1 << 15, backend) as r:
        def work(tid):
            recs = np.full((per, 4), float(tid))
            for i in range(per):
                r.push(recs[i])

        ts = [threading.Thread(target=work, args=(t,)) for t in range(n_threads)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        r.flush()
        written, dropped = r.stats()
        assert written + dropped == n_threads * per
        assert dropped == 0  # capacity sized to hold everything
    out = tel.read_log(path)
    assert len(out) == n_threads * per
    # each thread's records intact (rows are all-tid)
    assert np.all(out == out[:, :1])
    counts = np.bincount(out[:, 0].astype(int), minlength=n_threads)
    assert np.all(counts == per)


@pytest.mark.skipif(not tel.native_available(), reason="no native toolchain")
def test_native_throughput_floor(tmp_path):
    # 200k 25-float records (~40 MB) must push in well under a second of
    # producer time — the whole point is that the control loop never waits.
    import time

    path = tmp_path / "tp.bin"
    recs = np.random.default_rng(0).normal(size=(2000, 25))
    with tel.TelemetryRecorder(path, 25, capacity=1 << 18) as r:
        t0 = time.perf_counter()
        for _ in range(100):
            r.push(recs)
        t_push = time.perf_counter() - t0
        r.flush()
        written, dropped = r.stats()
    assert written + dropped == 200_000
    rate = written / max(t_push, 1e-9)
    assert rate > 1e5, f"push rate {rate:.0f} rec/s"


def test_flight_log_schema(tmp_path):
    path = tmp_path / "flight.bin"
    states = np.random.default_rng(1).normal(size=(20, 13))
    controls = np.random.default_rng(2).normal(size=(20, 7))
    s = np.linspace(0, 0.1, 20)
    with tel.TelemetryRecorder(path, tel.FLIGHT_REC_FLOATS, 1024) as r:
        r.push(tel.flight_records(0, states, controls, s, 1.5, 0.01))
        r.push(tel.flight_records(1, states, controls, s + 0.1, 1.2, 0.0))
        r.flush()
    arr = tel.read_log(path)
    assert arr.shape == (40, tel.FLIGHT_REC_FLOATS)
    assert np.all(arr[:20, 0] == 0) and np.all(arr[20:, 0] == 1)
    np.testing.assert_allclose(arr[:20, 2:15], states)
    np.testing.assert_allclose(arr[:20, 15:22], controls)
    np.testing.assert_allclose(arr[20:, 22], s + 0.1)

    traj = tel.flight_log_to_trajectory(path)
    assert traj.state.shape == (40, 13)
    assert traj.control.shape == (40, 7)
    np.testing.assert_allclose(traj.lam[:20], s, atol=1e-6)


def test_read_rejects_non_log(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"not a log at all....")
    with pytest.raises(ValueError):
        tel.read_log(p)
