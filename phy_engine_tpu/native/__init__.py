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
_DSRC = os.path.join(_DIR, "pe_digital.cpp")
# ASan/UBSan build variant (tools/sanitize_native.py): separate .so
# names so sanitized and plain builds never collide in the cache.
# The driving process must LD_PRELOAD libasan/libubsan.
_SAN = bool(os.environ.get("PE_TPU_NATIVE_SANITIZE"))
_SANFLAGS = (["-fsanitize=address,undefined", "-fno-sanitize-recover=all",
              "-g", "-fno-omit-frame-pointer"] if _SAN else [])
_suffix = "_asan" if _SAN else ""
_LIB = os.path.join(_DIR, f"libpe_tt{_suffix}.so")
_DLIB = os.path.join(_DIR, f"libpe_digital{_suffix}.so")

_lock = threading.Lock()
_lib = None
_tried = False
_dlib = None
_dtried = False

OP_LEAF, OP_NOT, OP_AND, OP_OR, OP_XOR, OP_CONST0, OP_CONST1 = range(7)


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
           "-fPIC", "-std=c++17"] + _SANFLAGS + ["-o", _LIB, _SRC]
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


def get_digital_lib():
    """The native digital sweep engine (pe_digital.cpp), compiled on
    first use; None when no toolchain is available."""
    global _dlib, _dtried
    if _dlib is not None or _dtried:
        return _dlib
    with _lock:
        if _dlib is not None or _dtried:
            return _dlib
        _dtried = True
        if os.environ.get("PE_TPU_NO_NATIVE"):
            return None
        try:
            fresh = (os.path.exists(_DLIB) and
                     os.path.getmtime(_DLIB) >= os.path.getmtime(_DSRC))
            if not fresh:
                cmd = ["g++", "-O3", "-march=native", "-funroll-loops",
                       "-shared", "-fPIC", "-std=c++17"] + _SANFLAGS + \
                      ["-o", _DLIB, _DSRC]
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            lib = ctypes.CDLL(_DLIB)
            i32p = ctypes.POINTER(ctypes.c_int32)
            u32p = ctypes.POINTER(ctypes.c_uint32)
            u64p = ctypes.POINTER(ctypes.c_uint64)
            lib.pe_digital_run.argtypes = [
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u64p,
                i32p, i32p, i32p, i32p, i32p, ctypes.c_int32,
                i32p, i32p, i32p, i32p, i32p, ctypes.c_int32,
                i32p, i32p, i32p, i32p, i32p, ctypes.c_int32,
                i32p, i32p, i32p, i32p, i32p, ctypes.c_int32,
                ctypes.c_int32,
                i32p, i32p, i32p, i32p, i32p, i32p,
                i32p, ctypes.c_int32,
                i32p, ctypes.c_int32, u32p, u32p,
                u32p, u32p, u64p, u64p, u64p,
            ]
            lib.pe_digital_run.restype = None
            _dlib = lib
        except Exception:
            _dlib = None
        return _dlib


_I32P = ctypes.POINTER(ctypes.c_int32)
_U32P = ctypes.POINTER(ctypes.c_uint32)
_U64P = ctypes.POINTER(ctypes.c_uint64)


def _pin_i32(keep, a):
    a = np.ascontiguousarray(a, np.int32)
    keep.append(a)
    return a.ctypes.data_as(_I32P)


def _plan_static_args(plan):
    """Per-plan cached static argument tail: converted int32 tables +
    their ctypes pointers (pinned on the plan).  Re-marshalling these
    36 arrays per call dominated per-tick C-ABI latency."""
    cached = getattr(plan, "_cargs", None)
    if cached is not None:
        return cached
    keep = []
    ip = lambda a: _pin_i32(keep, a)
    c_op, c_a, c_b, c_o, _ = plan.cone
    f_op, f_a, f_b, f_o, _ = plan.full
    cy_op, cy_a, cy_b, cy_o = plan.cyc
    args = (
        (ip(c_op), ip(c_a), ip(c_b), ip(c_o), ip(plan.cone_runs),
         np.int32(len(plan.cone_runs) - 1)),
        (ip(f_op), ip(f_a), ip(f_b), ip(f_o), ip(plan.full_runs),
         np.int32(len(plan.full_runs) - 1)),
        (ip(cy_op), ip(cy_a), ip(cy_b), ip(cy_o),
         ip(plan.cyc_seg), np.int32(len(plan.cyc_seg) - 1)),
        (ip(plan.ff_d), ip(plan.ff_c), ip(plan.ff_r), ip(plan.ff_q),
         ip(plan.ff_lc), ip(plan.ff_ren),
         ip(plan.seg), np.int32(len(plan.seg) - 1)),
    )
    plan._cargs = (args, keep)
    return plan._cargs


def digital_run(plan, st, narrow, fsig, FV, FU, HV, HU) -> None:
    """One native call running len(FV) ticks of a NativePlan.

    ``st``: uint64[K] packed state (v | u<<32), updated in place;
    ``narrow``: (op, a, b, o, runs) cone tables for ticks 1..T-1."""
    lib = get_digital_lib()
    (cone_a, full_a, cyc_a, ff_a), _pins = _plan_static_args(plan)

    # narrow tables come from plan._narrow_cache (or are plan.full) —
    # cache their pointers keyed by the table object identity
    ncache = getattr(plan, "_cnarrow", None)
    if ncache is None:
        ncache = plan._cnarrow = {}
    nkey = id(narrow[1])
    nargs = ncache.get(nkey)
    if nargs is None:
        keep = []
        ip = lambda a: _pin_i32(keep, a)
        n_op, n_a, n_b, n_o, n_runs = narrow
        nargs = ncache[nkey] = (
            (ip(n_op), ip(n_a), ip(n_b), ip(n_o), ip(n_runs),
             np.int32(len(n_runs) - 1)), keep)
    keep = []                     # pin per-call temporaries
    ip = lambda a: _pin_i32(keep, a)

    fix = int(getattr(plan, "fix_budget", 0))
    bufs = getattr(plan, "_cbufs", None)
    if bufs is None:
        # native-side scratch: contents are overwritten before use
        # each call, so reusing the buffers across calls is safe
        bufs = plan._cbufs = (
            np.zeros(max(1, 6 * plan.max_seg), np.uint64),
            np.zeros(plan.K if fix else 1, np.uint64),
            np.zeros(max(1, plan.max_cyc_seg), np.uint64))
    scratch, snap, cy_tmp = bufs
    lib.pe_digital_run(
        np.int32(plan.K), np.int32(plan.S), np.int32(FV.shape[0]),
        st.ctypes.data_as(_U64P),
        *cone_a, *nargs[0], *full_a, *cyc_a,
        np.int32(fix), *ff_a,
        ip(fsig), np.int32(FV.shape[1]),
        FV.ctypes.data_as(_U32P), FU.ctypes.data_as(_U32P),
        HV.ctypes.data_as(_U32P), HU.ctypes.data_as(_U32P),
        scratch.ctypes.data_as(_U64P),
        snap.ctypes.data_as(_U64P), cy_tmp.ctypes.data_as(_U64P))


_CSRC = os.path.join(_DIR, "pe_capi.c")
_CLIB = os.path.join(_DIR, "libphyengine_tpu.so")


def build_capi() -> str:
    """Build (if stale) and return the path of the embeddable C ABI
    library (dll_api.h role; see pe_capi.c).  Raises on failure."""
    import sysconfig
    fresh = (os.path.exists(_CLIB) and
             os.path.getmtime(_CLIB) >= os.path.getmtime(_CSRC))
    if fresh:
        return _CLIB
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ver = sysconfig.get_config_var("LDVERSION") or \
        sysconfig.get_config_var("VERSION")
    cmd = ["cc", "-O2", "-shared", "-fPIC", _CSRC, f"-I{inc}",
           f"-L{libdir}", f"-lpython{ver}", "-o", _CLIB]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return _CLIB


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
