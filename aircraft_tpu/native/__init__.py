"""Native (C++) host-side engines with ctypes bindings.

Builds lazily with g++ on first use (cached .so next to the source); every
entry point has a pure-Python fallback so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(os.path.dirname(os.path.abspath(__file__)))
_LOCK = threading.Lock()
_LIBS: dict = {}
_FAILED: set = set()


def build_native_lib(stem: str, configure) -> Optional[ctypes.CDLL]:
    """Lazily g++-build ``native/<stem>.cpp`` into ``lib<stem>.so``, load it,
    and run ``configure(lib)`` to declare argtypes.  Cached per stem; a
    build/load failure is remembered and returns None (callers fall back to
    pure Python).  Shared by every native engine in this package."""
    with _LOCK:
        if stem in _LIBS:
            return _LIBS[stem]
        if stem in _FAILED:
            return None
        try:
            so = _DIR / f"lib{stem}.so"
            src = _DIR / f"{stem}.cpp"
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", str(so), str(src), "-lpthread"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(so))
            configure(lib)
            _LIBS[stem] = lib
            return lib
        except Exception:
            _FAILED.add(stem)
            return None


def _configure_dubins(lib) -> None:
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.dubins_shortest_batch.argtypes = [dp, dp, dp, dp, ctypes.c_int, dp, u8p]
    lib.dubins_shortest_batch.restype = None
    lib.dubins_sample_batch.argtypes = [dp, dp, dp, ctypes.c_int, ctypes.c_int, dp]
    lib.dubins_sample_batch.restype = None


def _get_lib() -> Optional[ctypes.CDLL]:
    return build_native_lib("dubins", _configure_dubins)


def native_available() -> bool:
    return _get_lib() is not None


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def shortest_batch(
    qis: np.ndarray,
    qfs: np.ndarray,
    rhos: np.ndarray,
    min_lengths: Optional[np.ndarray] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch shortest Dubins paths.

    Args: qis/qfs (B, 3) float64, rhos (B,), optional min_lengths (B,).
    Returns (paths (B, 5): [word, t, p, q, length], ok (B,) bool).
    Falls back to the pure-Python planner when the native lib is missing.
    """
    qis = np.ascontiguousarray(qis, dtype=np.float64)
    qfs = np.ascontiguousarray(qfs, dtype=np.float64)
    rhos = np.ascontiguousarray(rhos, dtype=np.float64)
    B = qis.shape[0]
    out = np.zeros((B, 5), dtype=np.float64)
    ok = np.zeros(B, dtype=np.uint8)

    lib = _get_lib()
    if lib is not None:
        ml = (
            np.ascontiguousarray(min_lengths, dtype=np.float64)
            if min_lengths is not None
            else None
        )
        lib.dubins_shortest_batch(
            _as_c(qis), _as_c(qfs), _as_c(rhos),
            _as_c(ml) if ml is not None else None,
            B, _as_c(out), ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out, ok.astype(bool)

    # fallback
    from aircraft_tpu.dubins.dubins2d import WORDS, shortest_path

    for b in range(B):
        p = shortest_path(
            qis[b], qfs[b], float(rhos[b]),
            None if min_lengths is None else float(min_lengths[b]),
        )
        if p is not None:
            out[b] = [WORDS.index(p.word), *p.params, p.length]
            ok[b] = 1
    return out, ok.astype(bool)


def sample_batch(
    qis: np.ndarray, rhos: np.ndarray, paths: np.ndarray, n: int
) -> np.ndarray:
    """Sample each path at n uniform arc lengths -> (B, n, 3)."""
    qis = np.ascontiguousarray(qis, dtype=np.float64)
    rhos = np.ascontiguousarray(rhos, dtype=np.float64)
    paths = np.ascontiguousarray(paths, dtype=np.float64)
    B = qis.shape[0]
    out = np.zeros((B, n, 3), dtype=np.float64)

    lib = _get_lib()
    if lib is not None:
        lib.dubins_sample_batch(_as_c(qis), _as_c(rhos), _as_c(paths), B, n, _as_c(out))
        return out

    from aircraft_tpu.dubins.dubins2d import WORDS, DubinsPath

    for b in range(B):
        word = WORDS[int(paths[b, 0])]
        p = DubinsPath(
            qi=qis[b], qf=np.zeros(3), rho=float(rhos[b]),
            word=word, params=paths[b, 1:4],
        )
        out[b] = p.sample_many(n)
    return out


__all__ = ["native_available", "shortest_batch", "sample_batch"]
