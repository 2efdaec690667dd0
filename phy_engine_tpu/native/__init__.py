"""Native host backend: C++ truth-table batching with ctypes bindings.

Mirrors the role of the reference's CUDA synthesis backend
(src/pe_synth_cuda_u64_cones.cu) for the host-side optimization inner
loops.  The library is compiled on first use with g++ (cached next to
the source, keyed on source mtime) and falls back to pure numpy when no
toolchain is available, so the package works in constrained
environments.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pe_tt.cpp")
_LIB = os.path.join(_DIR, "libpe_tt.so")

_lock = threading.Lock()
_lib = None
_tried = False

OP_LEAF, OP_NOT, OP_AND, OP_OR, OP_XOR, OP_CONST0, OP_CONST1 = range(7)


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, building it if needed; None if
    unavailable (callers must use the numpy fallback)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PE_TPU_NO_NATIVE"):
            return None
        try:
            fresh = (os.path.exists(_LIB) and
                     os.path.getmtime(_LIB) >= os.path.getmtime(_SRC))
            if not fresh and not _build():
                return None
            lib = ctypes.CDLL(_LIB)
            lib.pe_tt_eval_graph.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int32,
            ]
            lib.pe_tt_eval_graph.restype = None
            lib.pe_tt_rows_equal.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
            ]
            lib.pe_tt_rows_equal.restype = ctypes.c_int32
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _as_i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def eval_graph(op, f0, f1, words: np.ndarray) -> np.ndarray:
    """Evaluate a topologically-ordered gate graph over packed pattern
    words.  ``words`` is (n_nodes, n_words) uint64 with leaf/const rows
    pre-filled (const rows may be garbage — they are filled here).
    Returns the same array, evaluated in place."""
    op = _as_i32(op)
    f0 = _as_i32(f0)
    f1 = _as_i32(f1)
    words = np.ascontiguousarray(words, dtype=np.uint64)
    n_nodes, n_words = words.shape
    lib = get_lib()
    if lib is not None:
        lib.pe_tt_eval_graph(
            op.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            f0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            f1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int32(n_nodes),
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            np.int32(n_words))
        return words
    # numpy fallback (row-at-a-time; same semantics)
    for i in range(n_nodes):
        o = op[i]
        if o == OP_LEAF:
            continue
        if o == OP_NOT:
            words[i] = ~words[f0[i]]
        elif o == OP_AND:
            words[i] = words[f0[i]] & words[f1[i]]
        elif o == OP_OR:
            words[i] = words[f0[i]] | words[f1[i]]
        elif o == OP_XOR:
            words[i] = words[f0[i]] ^ words[f1[i]]
        elif o == OP_CONST0:
            words[i] = 0
        elif o == OP_CONST1:
            words[i] = ~np.uint64(0)
    return words


def rows_equal(a: np.ndarray, b: np.ndarray, npat: int,
               neg: bool) -> bool:
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    lib = get_lib()
    if lib is not None:
        return bool(lib.pe_tt_rows_equal(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            np.int32(a.size), np.int64(npat), np.int32(1 if neg else 0)))
    bv = ~b if neg else b
    if npat % 64:
        mask = np.uint64((1 << (npat % 64)) - 1)
        head = bool((a[:-1] == bv[:-1]).all()) if a.size > 1 else True
        return head and bool((a[-1] & mask) == (bv[-1] & mask))
    return bool((a == bv).all())
