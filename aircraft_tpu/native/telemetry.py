"""Async telemetry recorder: ctypes binding over the native C++ runtime
(`telemetry.cpp`) with a pure-Python fallback writing the identical format.

Role of the reference's SaveMixin/logging (reference
src/aircraft/control/base.py:48-114,508-541), redesigned so observability
never blocks the control loop: ``push`` copies into a bounded ring and
returns; a background thread owns the disk.  A full ring DROPS records
(counted) instead of stalling the producer — the reference's synchronous
plotting callback cost 411 s of a 423 s solve (SURVEY.md §6) and this is
the structural fix.

Binary format (shared by both backends):
  8 bytes magic ``ATPTLOG1`` | uint32 version | uint32 rec_floats |
  written * rec_floats float64, little-endian.
"""

from __future__ import annotations

import ctypes
import os
import queue
import struct
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(os.path.dirname(os.path.abspath(__file__)))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False

_MAGIC = b"ATPTLOG1"
_VERSION = 1


def _build() -> Optional[ctypes.CDLL]:
    so = _DIR / "libtelemetry.so"
    src = _DIR / "telemetry.cpp"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", str(so), str(src), "-lpthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(so))
    dp = ctypes.POINTER(ctypes.c_double)
    lp = ctypes.POINTER(ctypes.c_long)
    lib.tel_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_long]
    lib.tel_open.restype = ctypes.c_void_p
    lib.tel_push.argtypes = [ctypes.c_void_p, dp, ctypes.c_long]
    lib.tel_push.restype = ctypes.c_long
    lib.tel_flush.argtypes = [ctypes.c_void_p]
    lib.tel_flush.restype = None
    lib.tel_stats.argtypes = [ctypes.c_void_p, lp, lp]
    lib.tel_stats.restype = None
    lib.tel_close.argtypes = [ctypes.c_void_p]
    lib.tel_close.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _BUILD_FAILED:
            try:
                _LIB = _build()
            except Exception:
                _BUILD_FAILED = True
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


class _PyBackend:
    """Fallback: same drop-not-block semantics via a bounded queue and a
    writer thread; identical on-disk format."""

    def __init__(self, path: str, rec_floats: int, capacity: int):
        self.rec_floats = rec_floats
        self._f = open(path, "wb")
        self._f.write(_MAGIC + struct.pack("<II", _VERSION, rec_floats))
        self._q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(capacity)
        self.written = 0
        self.dropped = 0
        self._drained = threading.Event()
        self._drained.set()
        self._t = threading.Thread(target=self._loop, daemon=True)
        self._t.start()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                break
            item.astype("<f8", copy=False).tofile(self._f)
            self.written += len(item)
            if self._q.empty():
                self._drained.set()

    def push(self, recs: np.ndarray) -> int:
        try:
            self._drained.clear()
            self._q.put_nowait(recs)
            return len(recs)
        except queue.Full:
            self.dropped += len(recs)
            if self._q.empty():
                self._drained.set()
            return 0

    def flush(self):
        self._drained.wait()
        self._f.flush()

    def stats(self) -> Tuple[int, int]:
        return self.written, self.dropped

    def close(self):
        self._q.put(None)
        self._t.join()
        self._f.close()


class TelemetryRecorder:
    """Async fixed-width float64 record log.

    ``rec_floats`` doubles per record; ``capacity`` records buffered in
    memory.  ``push`` never blocks on disk; overflow records are dropped and
    counted (``stats()``).  Use as a context manager or call ``close()``.
    """

    def __init__(self, path, rec_floats: int, capacity: int = 1 << 16,
                 force_python: bool = False):
        self.path = str(path)
        self.rec_floats = int(rec_floats)
        lib = None if force_python else _get_lib()
        self._lib = lib
        self._py: Optional[_PyBackend] = None
        self._h = None
        if lib is not None:
            h = lib.tel_open(self.path.encode(), self.rec_floats,
                             int(capacity))
            if h:
                self._h = ctypes.c_void_p(h)
        if self._h is None:
            self._lib = None
            self._py = _PyBackend(self.path, self.rec_floats, int(capacity))

    @property
    def backend(self) -> str:
        return "native" if self._lib is not None else "python"

    def push(self, recs) -> int:
        """Append (n, rec_floats) or (rec_floats,) records; returns the
        number accepted (rest dropped)."""
        arr = np.ascontiguousarray(recs, dtype=np.float64).reshape(
            -1, self.rec_floats
        )
        if self._lib is not None:
            return int(self._lib.tel_push(
                self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                len(arr),
            ))
        return self._py.push(arr)

    def flush(self):
        """Block until everything accepted so far is on disk."""
        if self._lib is not None:
            self._lib.tel_flush(self._h)
        else:
            self._py.flush()

    def stats(self) -> Tuple[int, int]:
        """(records written to disk or in flight, records dropped)."""
        if self._lib is not None:
            w = ctypes.c_long(0)
            d = ctypes.c_long(0)
            self._lib.tel_stats(self._h, ctypes.byref(w), ctypes.byref(d))
            return w.value, d.value
        return self._py.stats()

    def close(self):
        if self._lib is not None:
            if self._h is not None:
                self._lib.tel_close(self._h)
                self._h = None
        elif self._py is not None:
            self._py.close()
            self._py = None
        self._lib = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_log(path) -> np.ndarray:
    """Read a telemetry log back as a (n, rec_floats) float64 array."""
    with open(path, "rb") as f:
        head = f.read(16)
        if len(head) < 16 or head[:8] != _MAGIC:
            raise ValueError(f"not a telemetry log: {path}")
        version, rec_floats = struct.unpack("<II", head[8:16])
        if version != _VERSION:
            raise ValueError(f"unsupported telemetry version {version}")
        data = np.fromfile(f, dtype="<f8")
    n = len(data) // rec_floats
    return data[: n * rec_floats].reshape(n, rec_floats)


# ---------------------------------------------------------------------------
# MPC flight-log schema: one record per committed node.
#   [window, k, state(13), control(7), progress, cost, violation] -> 25
# ---------------------------------------------------------------------------

FLIGHT_REC_FLOATS = 25


def flight_records(window: int, states: np.ndarray, controls: np.ndarray,
                   progress, cost: float, violation: float) -> np.ndarray:
    """Pack one committed MPC window into flight-log records.

    ``states`` (c, 13), ``controls`` (c, 7), ``progress`` scalar or (c,).
    """
    c = len(controls)
    out = np.empty((c, FLIGHT_REC_FLOATS), dtype=np.float64)
    out[:, 0] = float(window)
    out[:, 1] = np.arange(c)
    out[:, 2:15] = states[:c]
    out[:, 15:22] = controls
    out[:, 22] = progress
    out[:, 23] = float(cost)
    out[:, 24] = float(violation)
    return out


def flight_log_to_trajectory(path):
    """Load a flight log into a TrajectoryData (utils.py) for plotting."""
    from aircraft_tpu.utils import TrajectoryData

    arr = read_log(path)
    if arr.shape[1] != FLIGHT_REC_FLOATS:
        raise ValueError(
            f"expected {FLIGHT_REC_FLOATS} floats/record, got {arr.shape[1]}"
        )
    return TrajectoryData(
        state=arr[:, 2:15].astype(np.float32),
        control=arr[:, 15:22].astype(np.float32),
        lam=arr[:, 22].astype(np.float32),
    )
