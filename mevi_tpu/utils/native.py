"""ctypes bindings for the C++ host kernels (native/mevi_native.cpp).

Every entry point has a pure-numpy fallback so the framework works
without the .so; ``ensure_built()`` compiles it on demand with the
in-repo Makefile.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_NATIVE_DIR = osp.join(_REPO_ROOT, "native")
_SO_PATH = osp.join(_NATIVE_DIR, "libmevi_native.so")

_lib = None


def ensure_built(force: bool = False) -> Optional[ctypes.CDLL]:
    """Load the native library, building it if needed; None on failure."""
    global _lib
    if _lib is not None and not force:
        return _lib
    if force or not osp.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    cp = ctypes.c_char_p

    lib.build_csr.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                              ctypes.c_int32, i64p, i32p]
    lib.count_lines.argtypes = [cp, ctypes.c_int64]
    lib.count_lines.restype = ctypes.c_int64
    lib.line_offsets.argtypes = [cp, ctypes.c_int64, i64p, ctypes.c_int64]
    lib.line_offsets.restype = ctypes.c_int64
    lib.match_answers.argtypes = [cp, i64p, ctypes.c_int64, cp, i64p,
                                  ctypes.c_int64, u8p]
    lib.sample_cluster_negatives.argtypes = [
        i64p, i32p, ctypes.c_int64, i64p, i32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_uint64, i32p]
    _lib = lib
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def build_csr(codes: np.ndarray, kary: int,
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Counting-sort CSR; falls back to index/csr.build_csr."""
    lib = ensure_built()
    codes = np.ascontiguousarray(codes, np.int32)
    n, levels = codes.shape
    if lib is None:
        from ..index.csr import build_csr as py_build
        off, dids = py_build(codes, kary)
        return off.astype(np.int64), dids
    C = kary ** levels
    offsets = np.zeros(C + 1, np.int64)
    doc_ids = np.zeros(n, np.int32)
    lib.build_csr(_ptr(codes, ctypes.c_int32), n, levels, kary,
                  _ptr(offsets, ctypes.c_int64),
                  _ptr(doc_ids, ctypes.c_int32))
    return offsets, doc_ids


def _concat_bytes(items: Sequence[bytes]) -> Tuple[bytes, np.ndarray]:
    offsets = np.zeros(len(items) + 1, np.int64)
    np.cumsum([len(b) for b in items], out=offsets[1:])
    return b"".join(items), offsets


def match_answers(passages: Sequence[bytes],
                  answers: Sequence[bytes]) -> np.ndarray:
    """out[i] = True if any answer is a substring of passage i
    (NQ answer-set matching, ``get_answers.py:106-180``)."""
    lib = ensure_built()
    if lib is None:
        return np.array([any(a in p for a in answers) for p in passages],
                        bool)
    pbuf, poff = _concat_bytes(list(passages))
    abuf, aoff = _concat_bytes(list(answers))
    out = np.zeros(len(passages), np.uint8)
    lib.match_answers(pbuf, _ptr(poff, ctypes.c_int64), len(passages),
                      abuf, _ptr(aoff, ctypes.c_int64), len(answers),
                      _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def line_offsets(data: bytes) -> np.ndarray:
    """Start offsets of each line (+ final sentinel = len)."""
    lib = ensure_built()
    if lib is None:
        offs = [0]
        pos = data.find(b"\n")
        while pos != -1:
            offs.append(pos + 1)
            pos = data.find(b"\n", pos + 1)
        if offs[-1] >= len(data):
            offs.pop()
        return np.array(offs + [len(data)], np.int64)
    max_lines = lib.count_lines(data, len(data))
    out = np.zeros(max_lines + 1, np.int64)
    n = lib.line_offsets(data, len(data), _ptr(out, ctypes.c_int64),
                         max_lines)
    return out[:n + 1]


def sample_cluster_negatives(offsets: np.ndarray, doc_ids: np.ndarray,
                             cluster_of: np.ndarray, pos_docs: np.ndarray,
                             n_neg: int, seed: int = 1) -> np.ndarray:
    """Batched in-cluster negatives; (b, n_neg) int32."""
    lib = ensure_built()
    pos_docs = np.ascontiguousarray(pos_docs, np.int32)
    b = len(pos_docs)
    if lib is None:
        rng = np.random.default_rng(seed)
        out = np.zeros((b, n_neg), np.int32)
        for i, pos in enumerate(pos_docs):
            c = int(cluster_of[pos])
            mem = doc_ids[offsets[c]:offsets[c + 1]]
            mem = mem[mem != pos]
            if len(mem) == 0:
                mem = rng.integers(0, len(cluster_of), 4 * n_neg)
                mem = mem[mem != pos]
            out[i] = rng.choice(mem, n_neg, replace=True)
        return out
    offsets = np.ascontiguousarray(offsets, np.int64)
    doc_ids = np.ascontiguousarray(doc_ids, np.int32)
    cluster_of = np.ascontiguousarray(cluster_of, np.int64)
    out = np.zeros((b, n_neg), np.int32)
    lib.sample_cluster_negatives(
        _ptr(offsets, ctypes.c_int64), _ptr(doc_ids, ctypes.c_int32),
        len(cluster_of), _ptr(cluster_of, ctypes.c_int64),
        _ptr(pos_docs, ctypes.c_int32), b, n_neg,
        ctypes.c_uint64(seed).value or 1, _ptr(out, ctypes.c_int32))
    return out
