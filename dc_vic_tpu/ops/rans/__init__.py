"""ctypes bindings for the C++ rANS coder (auto-built on first import).

Replaces compressai.ans.{RansEncoder,RansDecoder} in the reference
(ref: src/models/subnet/context_model/minnen20_charm_context_model.py:12).
CdfTable prepares a native table handle holding dense 2^16 decode LUTs, so
decode is O(1) per symbol on the single host core.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_SRC_DIR, "rans.cpp")
_LIB_PATH = os.path.join(_SRC_DIR, "_librans.so")
_build_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB_PATH, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)

        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)

        lib.dcvic_rans_table_new.restype = ctypes.c_void_p
        lib.dcvic_rans_table_new.argtypes = [
            i32p, ctypes.c_int, ctypes.c_int, i32p, i32p]
        lib.dcvic_rans_table_free.restype = None
        lib.dcvic_rans_table_free.argtypes = [ctypes.c_void_p]

        lib.dcvic_rans_encode_with_indexes.restype = ctypes.c_int
        lib.dcvic_rans_encode_with_indexes.argtypes = [
            i32p, i32p, ctypes.c_int, ctypes.c_void_p, u8p, ctypes.c_int]
        lib.dcvic_rans_decode_with_indexes.restype = None
        lib.dcvic_rans_decode_with_indexes.argtypes = [
            u8p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_void_p, i32p]
        lib.dcvic_rans_decoder_new.restype = ctypes.c_void_p
        lib.dcvic_rans_decoder_new.argtypes = [u8p, ctypes.c_int]
        lib.dcvic_rans_decoder_free.restype = None
        lib.dcvic_rans_decoder_free.argtypes = [ctypes.c_void_p]
        lib.dcvic_rans_decode_stream.restype = None
        lib.dcvic_rans_decode_stream.argtypes = [
            ctypes.c_void_p, i32p, ctypes.c_int, ctypes.c_void_p, i32p]

        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.dcvic_tpu_encode_stream.restype = ctypes.c_int
        lib.dcvic_tpu_encode_stream.argtypes = [
            i32p, i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            u16p, ctypes.c_int, i32p]
        lib.dcvic_tpu_decode_stream.restype = ctypes.c_int
        lib.dcvic_tpu_decode_stream.argtypes = [
            u16p, ctypes.c_int, i32p, i32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, i32p]
        _lib = lib
    return _lib


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class CdfTable:
    """Quantized CDF table: rows of int32 CDFs (each summing to 1<<16),
    per-row lengths and symbol offsets. Prepares a native handle with dense
    decode LUTs on construction."""

    def __init__(self, cdfs, cdf_lengths, offsets):
        self.cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        assert self.cdfs.ndim == 2
        self.cdf_lengths = _as_i32(cdf_lengths)
        self.offsets = _as_i32(offsets)
        assert len(self.cdf_lengths) == self.cdfs.shape[0]
        assert len(self.offsets) == self.cdfs.shape[0]
        self._lib = _load()
        self._h = self._lib.dcvic_rans_table_new(
            _i32p(self.cdfs), self.cdfs.shape[0], self.cdfs.shape[1],
            _i32p(self.cdf_lengths), _i32p(self.offsets))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dcvic_rans_table_free(self._h)
            self._h = None


def encode_with_indexes(symbols, indexes, table: CdfTable) -> bytes:
    lib = _load()
    symbols = _as_i32(symbols)
    indexes = _as_i32(indexes)
    n = len(symbols)
    assert len(indexes) == n
    cap = 16 * n + 64
    while True:
        out = np.empty(cap, dtype=np.uint8)
        r = lib.dcvic_rans_encode_with_indexes(
            _i32p(symbols), _i32p(indexes), n, table._h, _u8p(out), cap)
        if r >= 0:
            return out[:r].tobytes()
        cap = -r + 64


def decode_with_indexes(stream: bytes, indexes, table: CdfTable) -> np.ndarray:
    lib = _load()
    indexes = _as_i32(indexes)
    n = len(indexes)
    buf = np.frombuffer(stream, dtype=np.uint8).copy()
    out = np.empty(n, dtype=np.int32)
    lib.dcvic_rans_decode_with_indexes(
        _u8p(buf), len(buf), _i32p(indexes), n, table._h, _i32p(out))
    return out


def _u16p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


def tpu_encode_sections(sections, table: CdfTable,
                        return_esc_max: bool = False):
    """Host-side encoder for the TPU interleaved stream format
    (byte-identical to ops/rans_device.encode_stream + pack_streams).

    sections: list of (symbols [n, L], indexes [n, L]) in decode order
    (e.g. one per ChARM slice), all with the same L. Lane states chain
    across sections: one 2L-word flush for the whole stream.
    return_esc_max=True returns (bytes, max per-section escape count,
    has_tier2) — the driver compares the count to ops/rans_device.esc_cap()
    to pick the decode graph's escape-epilogue variant, and writes the
    container's tier-2-free guarantee bit when has_tier2 is False (both
    container header flags)."""
    lib = _load()
    syms, idxs, sec_n = [], [], []
    L = None
    for symbols, indexes in sections:
        symbols = np.ascontiguousarray(symbols, np.int32)
        indexes = np.ascontiguousarray(indexes, np.int32)
        n, Ls = symbols.shape
        assert L is None or Ls == L, "sections of one stream must share L"
        L = Ls
        syms.append(symbols.reshape(-1))
        idxs.append(indexes.reshape(-1))
        sec_n.append(n)
    sym = np.concatenate(syms)
    idx = np.concatenate(idxs)
    sec_n = np.asarray(sec_n, np.int32)
    cap = 2 * L + 4 * sym.size + 16  # renorm + tier-1 + 2 tier-2 worst case
    out = np.empty(cap, dtype=np.uint16)
    esc_max = np.zeros(1, dtype=np.int32)
    r = lib.dcvic_tpu_encode_stream(
        _i32p(sym), _i32p(idx), _i32p(sec_n), len(sec_n), L, table._h,
        _u16p(out), cap, _i32p(esc_max))
    assert r >= 0, "tpu stream encode overflow (cap bug)"
    data = out[:r].tobytes()
    if not return_esc_max:
        return data
    ESC_HAS_T2 = 1 << 28  # mirrors rans.cpp kEscHasTier2
    raw = int(esc_max[0])
    return data, raw & ~ESC_HAS_T2, bool(raw & ESC_HAS_T2)


def tpu_decode_stream(words: np.ndarray, index_sections, table: CdfTable):
    """Host-side decoder for a whole chained TPU-format stream.
    index_sections: list of [n, L] index arrays in decode order (same L).
    Returns (list of symbols [n, L], words consumed)."""
    lib = _load()
    idxs, sec_n = [], []
    L = None
    for indexes in index_sections:
        indexes = np.ascontiguousarray(indexes, np.int32)
        n, Ls = indexes.shape
        assert L is None or Ls == L
        L = Ls
        idxs.append(indexes.reshape(-1))
        sec_n.append(n)
    idx = np.concatenate(idxs)
    sec_n_arr = np.asarray(sec_n, np.int32)
    words = np.ascontiguousarray(words, np.uint16)
    out = np.empty(idx.size, dtype=np.int32)
    used = lib.dcvic_tpu_decode_stream(
        _u16p(words), len(words), _i32p(idx), _i32p(sec_n_arr),
        len(sec_n), L, table._h, _i32p(out))
    secs = []
    o = 0
    for n in sec_n:
        secs.append(out[o:o + n * L].reshape(n, L))
        o += n * L
    return secs, used


class RansEncoder:
    """Buffered streaming encoder: push symbol/index batches, then flush.
    (Buffers on the Python side; the flush is a single reverse-pass encode,
    byte-identical to one-shot encoding of the concatenated sequence.)"""

    def __init__(self):
        self._syms: List[np.ndarray] = []
        self._idxs: List[np.ndarray] = []
        self._table: Optional[CdfTable] = None

    def push(self, symbols, indexes, table: CdfTable) -> None:
        assert self._table is None or self._table is table, \
            "streaming encoder requires a single CDF table per stream"
        self._table = table
        self._syms.append(_as_i32(symbols))
        self._idxs.append(_as_i32(indexes))

    def flush(self) -> bytes:
        assert self._table is not None
        out = encode_with_indexes(np.concatenate(self._syms),
                                  np.concatenate(self._idxs), self._table)
        self._syms, self._idxs, self._table = [], [], None
        return out


class RansDecoder:
    """Streaming decoder over a single rANS stream (per-slice ChARM decode)."""

    def __init__(self, stream: bytes):
        self._lib = _load()
        self._buf = np.frombuffer(stream, dtype=np.uint8).copy()
        self._h = self._lib.dcvic_rans_decoder_new(_u8p(self._buf),
                                                   len(self._buf))

    def decode_stream(self, indexes, table: CdfTable) -> np.ndarray:
        indexes = _as_i32(indexes)
        n = len(indexes)
        out = np.empty(n, dtype=np.int32)
        self._lib.dcvic_rans_decode_stream(
            self._h, _i32p(indexes), n, table._h, _i32p(out))
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dcvic_rans_decoder_free(self._h)
            self._h = None
