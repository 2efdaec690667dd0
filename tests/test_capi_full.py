"""Remaining dll_api.h C-surface parity: analyze_circuit one-shot,
bool sampling, tnom, the verilog_synth_* global-config family, and the
verilog-runtime introspection family (module/signal names, preprocessed
source, explicit-tick stepping) — dll_api.h:196-312.
"""

import ctypes

import pytest

from test_capi import _load

szp = ctypes.POINTER(ctypes.c_size_t)


@pytest.fixture(scope="module")
def lib():
    lib = _load()
    lib.circuit_set_tnom.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.circuit_sample.argtypes = [
        ctypes.c_void_p, szp, szp, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double), szp,
        ctypes.POINTER(ctypes.c_double), szp,
        ctypes.POINTER(ctypes.c_bool), szp]
    lib.analyze_circuit.argtypes = [
        ctypes.c_void_p, szp, szp, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), szp,
        ctypes.POINTER(ctypes.c_double), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double), szp,
        ctypes.POINTER(ctypes.c_double), szp,
        ctypes.POINTER(ctypes.c_bool), szp]
    for name in ("opt_level", "assume_binary_inputs", "allow_inout",
                 "allow_multi_driver", "optimize_wires",
                 "optimize_mul2", "optimize_adders"):
        getattr(lib, f"verilog_synth_set_{name}").argtypes = \
            [ctypes.c_uint8]
        getattr(lib, f"verilog_synth_get_{name}").restype = \
            ctypes.c_uint8
    lib.verilog_synth_set_loop_unroll_limit.argtypes = [ctypes.c_size_t]
    lib.verilog_synth_get_loop_unroll_limit.restype = ctypes.c_size_t
    for name in ("module_count", "signal_count", "preprocessed_size",
                 "top_module_name_size"):
        f = getattr(lib, f"verilog_runtime_{name}")
        f.argtypes = [ctypes.c_void_p]
        f.restype = ctypes.c_size_t
    for name in ("module_name_size", "signal_name_size",
                 "port_name_size"):
        f = getattr(lib, f"verilog_runtime_{name}")
        f.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        f.restype = ctypes.c_size_t
    for name in ("copy_module_name", "copy_signal_name"):
        getattr(lib, f"verilog_runtime_{name}").argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_size_t]
    lib.verilog_runtime_copy_preprocessed.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    lib.verilog_runtime_get_tick.argtypes = [ctypes.c_void_p]
    lib.verilog_runtime_get_tick.restype = ctypes.c_uint64
    lib.verilog_runtime_step.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint8]
    lib.verilog_runtime_get_signal_value.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t]
    lib.verilog_runtime_get_signal_value.restype = ctypes.c_uint8
    lib.verilog_runtime_set_signal_value.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint8]
    return lib


def _divider(lib):
    elements = (ctypes.c_int * 4)(0, 4, 1, 1)
    props = (ctypes.c_double * 3)(6.0, 1000.0, 2000.0)
    wires = (ctypes.c_int * 16)(
        1, 0, 2, 0, 2, 1, 3, 0, 3, 1, 0, 0, 1, 1, 0, 0)
    vec = szp()
    chunk = szp()
    comp = ctypes.c_size_t()
    h = lib.create_circuit(elements, 4, wires, 16, props,
                           ctypes.byref(vec), ctypes.byref(chunk),
                           ctypes.byref(comp))
    assert h, lib.phy_engine_last_error()
    return h, vec, chunk, comp.value


def test_capi_analyze_circuit_one_shot(lib):
    """Property update + analyze + bool sample in one call."""
    h, vec, chunk, n = _divider(lib)
    assert lib.circuit_set_analyze_type(h, 0) == 0
    assert lib.circuit_set_tnom(h, 27.0) == 0
    v_ord = (ctypes.c_size_t * (n + 1))()
    c_ord = (ctypes.c_size_t * (n + 1))()
    d_ord = (ctypes.c_size_t * (n + 1))()
    assert lib.circuit_sample_layout(h, vec, chunk, n, v_ord, c_ord,
                                     d_ord) == 0
    volts = (ctypes.c_double * v_ord[n])()
    curs = (ctypes.c_double * max(1, c_ord[n]))()
    digs = (ctypes.c_bool * max(1, d_ord[n]))()
    # change R2 (component 2) attribute 0 (resistance) to 1k -> 3V mid
    ce = (ctypes.c_int * 1)(2)
    ci = (ctypes.c_size_t * 1)(0)
    cp = (ctypes.c_double * 1)(1000.0)
    assert lib.analyze_circuit(h, vec, chunk, n, ce, ci, cp, 1,
                               volts, v_ord, curs, c_ord, digs,
                               d_ord) == 0, lib.phy_engine_last_error()
    r2 = sorted(volts[v_ord[2]:v_ord[3]])
    assert abs(r2[1] - 3.0) < 1e-6 and abs(r2[0]) < 1e-9
    # plain circuit_sample reads the same state back
    volts2 = (ctypes.c_double * v_ord[n])()
    assert lib.circuit_sample(h, vec, chunk, n, volts2, v_ord, curs,
                              c_ord, digs, d_ord) == 0
    assert abs(sorted(volts2[v_ord[2]:v_ord[3]])[1] - 3.0) < 1e-6
    lib.destroy_circuit(h, vec, chunk)


def test_capi_synth_config_roundtrip(lib):
    assert lib.verilog_synth_get_opt_level() == 0
    assert lib.verilog_synth_get_allow_multi_driver() == 1
    assert lib.verilog_synth_get_loop_unroll_limit() == 64
    lib.verilog_synth_set_opt_level(2)
    lib.verilog_synth_set_loop_unroll_limit(128)
    lib.verilog_synth_set_optimize_adders(0)
    try:
        assert lib.verilog_synth_get_opt_level() == 2
        assert lib.verilog_synth_get_loop_unroll_limit() == 128
        assert lib.verilog_synth_get_optimize_adders() == 0
    finally:
        lib.verilog_synth_set_opt_level(0)
        lib.verilog_synth_set_loop_unroll_limit(64)
        lib.verilog_synth_set_optimize_adders(1)


def test_capi_synth_multi_driver_policy(lib):
    """allow_multi_driver=false makes a doubly-driven code-301 net a
    build error (pe_synth_options:111 strict mode)."""
    from test_capi_verilog import MDRV, _build_ex
    codes = [301, 200, 200, 200, 200, 201]
    props = [1.0, 1.0, 0.0, 0.0]
    wires = [1, 0, 0, 0, 2, 0, 0, 1, 3, 0, 0, 2, 4, 0, 0, 3,
             0, 4, 5, 0]
    lib.create_circuit_ex.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_char_p), szp, ctypes.c_size_t,
        szp, szp, ctypes.POINTER(szp), ctypes.POINTER(szp), szp]
    lib.create_circuit_ex.restype = ctypes.c_void_p
    lib.verilog_synth_set_allow_multi_driver(0)
    try:
        n = len(codes)
        codes_c = (ctypes.c_int * n)(*codes)
        wires_c = (ctypes.c_int * len(wires))(*wires)
        props_c = (ctypes.c_double * len(props))(*props)
        t = MDRV.encode()
        texts_c = (ctypes.c_char_p * 1)(t)
        sizes_c = (ctypes.c_size_t * 1)(len(t))
        src_c = (ctypes.c_size_t * n)(*([0] * n))
        top_c = (ctypes.c_size_t * n)(*([2 ** 63] * n))
        vec = szp()
        chunk = szp()
        comp = ctypes.c_size_t()
        h = lib.create_circuit_ex(
            codes_c, n, wires_c, len(wires), props_c, texts_c, sizes_c,
            1, src_c, top_c, ctypes.byref(vec), ctypes.byref(chunk),
            ctypes.byref(comp))
        assert not h
        assert b"multi-driven" in lib.phy_engine_last_error()
    finally:
        lib.verilog_synth_set_allow_multi_driver(1)
    # permissive again: the same build succeeds
    h, vec, chunk, comp = _build_ex(lib, codes, wires, props, [MDRV],
                                    [0] * 6, [2 ** 63] * 6)
    assert comp.value == 6
    lib.destroy_circuit(h, vec, chunk)


TWO_MODS = """
`define WIDTH 4
module half(input a, input b, output s, output c);
  assign s = a ^ b;
  assign c = a & b;
endmodule
module top2(input clk, output [`WIDTH-1:0] q);
  reg [`WIDTH-1:0] r;
  always @(posedge clk) r <= r + 1'b1;
  assign q = r;
endmodule
"""


def test_capi_runtime_introspection(lib):
    src = TWO_MODS.encode()
    rt = lib.verilog_runtime_create(src, len(src), b"top2", 4, None,
                                    None, 0)
    assert rt, lib.phy_engine_last_error()
    assert lib.verilog_runtime_module_count(rt) == 2
    names = []
    for i in range(2):
        sz = lib.verilog_runtime_module_name_size(rt, i)
        buf = ctypes.create_string_buffer(sz + 1)
        assert lib.verilog_runtime_copy_module_name(rt, i, buf,
                                                    sz + 1) >= 0
        names.append(buf.value.decode())
    assert set(names) == {"half", "top2"}
    sz = lib.verilog_runtime_top_module_name_size(rt)
    assert sz == len("top2")

    # preprocessed text has the macro expanded away
    psz = lib.verilog_runtime_preprocessed_size(rt)
    buf = ctypes.create_string_buffer(psz + 1)
    assert lib.verilog_runtime_copy_preprocessed(rt, buf, psz + 1) >= 0
    text = buf.value.decode()
    assert "[4-1:0]" in text.replace(" ", "") and "WIDTH" not in text

    # signals: find r by name, poke it, read it back by index
    nsig = lib.verilog_runtime_signal_count(rt)
    sig = {}
    for i in range(nsig):
        s = lib.verilog_runtime_signal_name_size(rt, i)
        b = ctypes.create_string_buffer(s + 1)
        lib.verilog_runtime_copy_signal_name(rt, i, b, s + 1)
        sig[b.value.decode()] = i
    assert {"clk", "q", "r"} <= set(sig)
    # state 0 floods every bit of r known-low (4-state code semantics)
    assert lib.verilog_runtime_set_signal_value(rt, sig["r"], 0) == 0

    # explicit-tick stepping: two posedges -> r = 2
    assert lib.verilog_runtime_get_tick(rt) == 0
    t = 0
    for _ in range(2):
        t += 1
        lib.verilog_runtime_set_port_value(rt, 0, 1)   # clk port idx 0
        assert lib.verilog_runtime_step(rt, t, 1) == 0
        t += 1
        lib.verilog_runtime_set_port_value(rt, 0, 0)
        assert lib.verilog_runtime_step(rt, t, 1) == 0
    assert lib.verilog_runtime_get_tick(rt) == 4
    assert lib.verilog_runtime_get_signal_value(rt, sig["r"]) == 2
    lib.verilog_runtime_destroy(rt)
