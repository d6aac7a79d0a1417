"""ctypes wrapper for the C reference scorer (csrc/swref.c).

Compiles the shared library on first use (cached next to the source).
This is the "reference C path" oracle named by BASELINE.json config 1.
"""

from __future__ import annotations

import ctypes
import threading
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc" / "swref.c"
_LIB = _CSRC.with_name("libswref.so")
_lock = threading.Lock()
_dll = None


def _load() -> ctypes.CDLL:
    from swimm_tpu._cc import load_or_build
    global _dll
    with _lock:
        if _dll is None:
            dll = load_or_build(_CSRC, _LIB)
            dll.swref_score.restype = ctypes.c_int32
            dll.swref_score.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
            ]
            dll.swref_score_many.restype = None
            dll.swref_score_many.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            _dll = dll
    return _dll


def _u8(a: np.ndarray):
    return np.ascontiguousarray(a, dtype=np.uint8)


def sw_score(query: np.ndarray, db: np.ndarray, submat: np.ndarray,
             gap_open: int, gap_extend: int) -> int:
    dll = _load()
    q = _u8(query)
    d = _u8(db)
    sub = np.ascontiguousarray(submat, dtype=np.int32)
    asize = sub.shape[0]
    res = dll.swref_score(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(q),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(d),
        sub.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), asize,
        int(gap_open), int(gap_extend))
    if res < 0:
        raise MemoryError("swref_score allocation failure")
    return int(res)


def sw_score_many(query: np.ndarray, db_seqs, submat: np.ndarray,
                  gap_open: int, gap_extend: int) -> np.ndarray:
    dll = _load()
    q = _u8(query)
    seqs = [_u8(s) for s in db_seqs]
    lens = np.array([len(s) for s in seqs], dtype=np.int32)
    offs = np.zeros(len(seqs), dtype=np.int64)
    if len(seqs) > 1:
        offs[1:] = np.cumsum(lens[:-1], dtype=np.int64)
    blob = np.concatenate(seqs) if seqs else np.zeros(0, dtype=np.uint8)
    blob = _u8(blob)
    sub = np.ascontiguousarray(submat, dtype=np.int32)
    out = np.zeros(len(seqs), dtype=np.int32)
    dll.swref_score_many(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(q),
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(seqs),
        sub.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), sub.shape[0],
        int(gap_open), int(gap_extend),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if (out < 0).any():
        raise MemoryError("swref_score_many allocation failure")
    return out.astype(np.int64)
