"""ctypes bindings for the native data layer (csrc/swpack.c).

Reference parity: C2 (FASTA parse/encode) and the packing hot loop of C3
are C in the reference engine; here they are C too, with the Python
implementations (fasta.py / db.py) as behavioral reference and fallback.
The residue-encoding LUT is passed from alphabet.py so the native and
Python encoders cannot disagree.
"""

from __future__ import annotations

import ctypes
import threading
from pathlib import Path

import numpy as np

from swimm_tpu.alphabet import ALPHABET, _ENCODE_LUT

_CSRC = Path(__file__).resolve().parents[1] / "csrc" / "swpack.c"
_LIB = _CSRC.with_name("libswpack.so")
_lock = threading.Lock()
_dll = None


class _FastaData(ctypes.Structure):
    _fields_ = [
        ("codes", ctypes.POINTER(ctypes.c_uint8)),
        ("total_residues", ctypes.c_int64),
        ("lengths", ctypes.POINTER(ctypes.c_int32)),
        ("n_seqs", ctypes.c_int64),
        ("tit_offs", ctypes.POINTER(ctypes.c_int64)),
        # POINTER(c_char), not c_char_p: attribute access on c_char_p does
        # an unbounded strlen; we read exactly titles_len bytes instead
        ("titles", ctypes.POINTER(ctypes.c_char)),
        ("titles_len", ctypes.c_int64),
    ]


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL:
    from swimm_tpu._cc import load_or_build
    global _dll
    with _lock:
        if _dll is None:
            dll = load_or_build(_CSRC, _LIB)
            dll.swpack_parse_fasta.restype = ctypes.c_int
            dll.swpack_parse_fasta.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(_FastaData)]
            dll.swpack_free.restype = None
            dll.swpack_free.argtypes = [ctypes.POINTER(_FastaData)]
            dll.swpack_fill_chunk.restype = None
            dll.swpack_fill_chunk.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int8,
                ctypes.POINTER(ctypes.c_int8), ctypes.c_int64]
            _dll = dll
    return _dll


def _lut_bytes() -> np.ndarray:
    # clamp the Python LUT's -1 (unknown) to X, matching alphabet.encode
    lut = _ENCODE_LUT.copy()
    lut[lut < 0] = ALPHABET.index("X")
    return np.ascontiguousarray(lut.astype(np.uint8))


def parse_fasta(path) -> tuple[np.ndarray, np.ndarray, np.ndarray, list]:
    """Parse a FASTA file natively.

    Returns (codes_blob uint8, offsets int64 per seq, lengths int32,
    titles list[str]).
    """
    dll = _load()
    lut = _lut_bytes()
    data = _FastaData()
    rc = dll.swpack_parse_fasta(
        str(path).encode(), lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(data))
    if rc != 0:
        raise ValueError(f"swpack_parse_fasta failed rc={rc} for {path}")
    try:
        n = int(data.n_seqs)
        if n == 0:
            return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                    np.zeros(0, np.int32), [])
        if data.total_residues:
            codes = np.ctypeslib.as_array(
                data.codes, shape=(data.total_residues,)).copy()
        else:
            codes = np.zeros(0, np.uint8)   # all-empty sequences: NULL blob
        lengths = np.ctypeslib.as_array(data.lengths, shape=(n,)).copy()
        toffs = np.ctypeslib.as_array(data.tit_offs, shape=(n + 1,)).copy()
        tblob = ctypes.string_at(data.titles, data.titles_len)
        titles = [tblob[toffs[i]:toffs[i + 1]].decode("utf-8", "replace")
                  .rstrip("\n") for i in range(n)]
    finally:
        dll.swpack_free(ctypes.byref(data))
    offsets = np.zeros(n, dtype=np.int64)
    if n > 1:
        offsets[1:] = np.cumsum(lengths[:-1], dtype=np.int64)
    return codes, offsets, lengths, titles


def fill_chunk(codes_blob: np.ndarray, offsets: np.ndarray,
               lengths: np.ndarray, order: np.ndarray,
               L: int, V: int, pad: int) -> np.ndarray:
    """Pack len(order) sequences into an (nb, L, V) int8 chunk natively."""
    dll = _load()
    n = len(order)
    nb = -(-n // V)
    out = np.empty((nb, L, V), dtype=np.int8)
    dll.swpack_fill_chunk(
        np.ascontiguousarray(codes_blob, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)),
        np.ascontiguousarray(offsets, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(lengths, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        np.ascontiguousarray(order, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)),
        n, L, V, pad,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), out.size)
    return out
