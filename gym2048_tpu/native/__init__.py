"""ctypes bindings for the native engine/CSV library.

The shared library is built lazily from the bundled C++ source with g++
(cached beside the source); everything degrades gracefully to the Python
paths when no compiler is available — ``available()`` reports which.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "engine2048.cpp"
_LIB = Path(__file__).parent / "lib2048.so"
_lib: ctypes.CDLL | None = None
_build_error: str | None = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
    except (OSError, subprocess.CalledProcessError) as e:
        _build_error = str(e)
        return None

    lib.engine_init.restype = ctypes.c_int64
    lib.engine_shift_row.restype = ctypes.c_int64
    lib.engine_shift_row.argtypes = [
        np.ctypeslib.ndpointer(np.int8, flags="C"),
        np.ctypeslib.ndpointer(np.int8, flags="C"),
    ]
    lib.engine_move_batch.restype = None
    lib.engine_move_batch.argtypes = [
        np.ctypeslib.ndpointer(np.int8, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int8, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
    ]
    lib.csv_count_rows.restype = ctypes.c_int64
    lib.csv_count_rows.argtypes = [ctypes.c_char_p]
    lib.csv_read.restype = ctypes.c_int64
    lib.csv_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
    ]
    lib.csv_write.restype = ctypes.c_int64
    lib.csv_write.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.float64, flags="C"),
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ctypes.c_void_p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ------------------------------------------------------------------ engine
def shift_row(row_exp: np.ndarray) -> tuple[np.ndarray, int]:
    lib = get_lib()
    assert lib is not None
    row = np.ascontiguousarray(row_exp, dtype=np.int8)
    out = np.zeros(4, np.int8)
    score = lib.engine_shift_row(row, out)
    return out, int(score)


def move_batch(
    boards_exp: np.ndarray, actions: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply per-board actions. Returns (moved, scores, legal)."""
    lib = get_lib()
    assert lib is not None
    boards = np.ascontiguousarray(
        boards_exp.reshape(-1, 16), dtype=np.int8)
    acts = np.ascontiguousarray(actions, dtype=np.int32).reshape(-1)
    n = boards.shape[0]
    assert acts.shape[0] == n
    out = np.zeros_like(boards)
    scores = np.zeros(n, np.int32)
    legal = np.zeros(n, np.uint8)
    lib.engine_move_batch(boards, acts, n, out, scores, legal)
    return out.reshape(boards_exp.shape), scores, legal.astype(bool)


# --------------------------------------------------------------------- CSV
def csv_read(path: str):
    """Read the 35/36-col schema. Returns (boards, actions, rewards,
    next_boards, dones) or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.csv_count_rows(str(path).encode())
    if n < 0:
        raise FileNotFoundError(path)
    boards = np.zeros((n, 16), np.int32)
    actions = np.zeros(n, np.int32)
    rewards = np.zeros(n, np.float64)
    next_boards = np.zeros((n, 16), np.int32)
    dones = np.zeros(n, np.uint8)
    got = lib.csv_read(
        str(path).encode(), n, boards, actions, rewards, next_boards, dones)
    if got < 0:
        raise ValueError(f"malformed CSV: {path}")
    return (
        boards[:got].reshape(-1, 4, 4),
        actions[:got],
        rewards[:got],
        next_boards[:got].reshape(-1, 4, 4),
        dones[:got].astype(bool),
    )


def csv_write(
    path: str, header: str, boards, actions, rewards, next_boards, dones,
    returns=None,
) -> int:
    lib = get_lib()
    assert lib is not None
    boards = np.ascontiguousarray(boards.reshape(-1, 16), np.int32)
    n = boards.shape[0]
    acts = np.ascontiguousarray(actions, np.int32).reshape(-1)
    rews = np.ascontiguousarray(rewards, np.float64).reshape(-1)
    nxt = np.ascontiguousarray(next_boards.reshape(-1, 16), np.int32)
    dn = np.ascontiguousarray(dones, np.uint8).reshape(-1)
    if returns is not None:
        returns = np.ascontiguousarray(returns, np.float64).reshape(-1)
        ret_ptr = returns.ctypes.data_as(ctypes.c_void_p)
    else:
        ret_ptr = None
    return int(lib.csv_write(
        str(path).encode(), header.encode(), n, boards, acts, rews, nxt,
        dn, ret_ptr,
    ))
