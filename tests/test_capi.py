"""C ABI round trip (dll_api.h parity; VERDICT item 8).

Builds native/pe_capi.c into libphyengine_tpu.so and drives it through
ctypes — the calls cross the real C ABI boundary (C marshaling,
embedded-interpreter entry points, prefix-sum sample layouts) exactly
as an external C host would.
"""

import ctypes
import os

import numpy as np
import pytest


def _load():
    from phy_engine_tpu.native import build_capi
    try:
        path = build_capi()
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"no C toolchain for the ABI shim: {e}")
    lib = ctypes.CDLL(path)
    lib.phy_engine_init.argtypes = [ctypes.c_char_p]
    lib.phy_engine_init.restype = ctypes.c_int
    lib.phy_engine_last_error.restype = ctypes.c_char_p
    szp = ctypes.POINTER(ctypes.c_size_t)
    lib.create_circuit.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(szp), ctypes.POINTER(szp), szp]
    lib.create_circuit.restype = ctypes.c_void_p
    lib.circuit_set_analyze_type.argtypes = [ctypes.c_void_p,
                                             ctypes.c_uint32]
    lib.circuit_analyze.argtypes = [ctypes.c_void_p]
    lib.circuit_digital_clk.argtypes = [ctypes.c_void_p]
    lib.circuit_sample_layout.argtypes = [
        ctypes.c_void_p, szp, szp, ctypes.c_size_t, szp, szp, szp]
    lib.circuit_sample_digital_state_u8.argtypes = [
        ctypes.c_void_p, szp, szp, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double), szp,
        ctypes.POINTER(ctypes.c_double), szp,
        ctypes.POINTER(ctypes.c_uint8), szp]
    lib.circuit_set_model_digital.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_size_t, ctypes.c_uint8]
    lib.destroy_circuit.argtypes = [ctypes.c_void_p, szp, szp]
    lib.verilog_runtime_create.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_size_t]
    lib.verilog_runtime_create.restype = ctypes.c_void_p
    lib.verilog_runtime_tick.argtypes = [ctypes.c_void_p]
    lib.verilog_runtime_port_count.argtypes = [ctypes.c_void_p]
    lib.verilog_runtime_port_count.restype = ctypes.c_size_t
    lib.verilog_runtime_copy_port_name.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.c_size_t]
    lib.verilog_runtime_port_dir.argtypes = [ctypes.c_void_p,
                                             ctypes.c_size_t]
    lib.verilog_runtime_port_dir.restype = ctypes.c_uint8
    lib.verilog_runtime_get_port_value.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_size_t]
    lib.verilog_runtime_get_port_value.restype = ctypes.c_uint8
    lib.verilog_runtime_set_port_value.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint8]
    lib.verilog_runtime_destroy.argtypes = [ctypes.c_void_p]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert lib.phy_engine_init(repo.encode()) == 0, \
        lib.phy_engine_last_error()
    return lib


@pytest.fixture(scope="module")
def lib():
    return _load()


def test_capi_resistor_divider(lib):
    # VDC(4) + R(1) + R(1): 6V across 1k/2k -> middle node at 4V
    elements = (ctypes.c_int * 4)(0, 4, 1, 1)
    props = (ctypes.c_double * 3)(6.0, 1000.0, 2000.0)
    wires = (ctypes.c_int * 16)(
        1, 0, 2, 0,     # vdc+ -> r1.a
        2, 1, 3, 0,     # r1.b -> r2.a
        3, 1, 0, 0,     # r2.b -> gnd
        1, 1, 0, 0)     # vdc- -> gnd
    szp = ctypes.POINTER(ctypes.c_size_t)
    vec = szp()
    chunk = szp()
    comp = ctypes.c_size_t()
    h = lib.create_circuit(elements, 4, wires, 16, props,
                           ctypes.byref(vec), ctypes.byref(chunk),
                           ctypes.byref(comp))
    assert h, lib.phy_engine_last_error()
    assert comp.value == 3
    assert lib.circuit_set_analyze_type(h, 0) == 0     # OP
    assert lib.circuit_analyze(h) == 0, lib.phy_engine_last_error()

    n = comp.value
    v_ord = (ctypes.c_size_t * (n + 1))()
    c_ord = (ctypes.c_size_t * (n + 1))()
    d_ord = (ctypes.c_size_t * (n + 1))()
    assert lib.circuit_sample_layout(h, vec, chunk, n, v_ord, c_ord,
                                     d_ord) == 0
    volts = (ctypes.c_double * v_ord[n])()
    curs = (ctypes.c_double * max(1, c_ord[n]))()
    digs = (ctypes.c_uint8 * max(1, d_ord[n]))()
    assert lib.circuit_sample_digital_state_u8(
        h, vec, chunk, n, volts, v_ord, curs, c_ord, digs, d_ord) == 0
    # component 1 = R1: pins at (6V, 4V); component 2 = R2: (4V, 0V)
    r1 = volts[v_ord[1]:v_ord[2]]
    r2 = volts[v_ord[2]:v_ord[3]]
    assert np.isclose(sorted(r1)[1], 6.0, atol=1e-6)
    assert np.isclose(sorted(r1)[0], 4.0, atol=1e-6)
    assert np.isclose(sorted(r2)[1], 4.0, atol=1e-6)
    lib.destroy_circuit(h, vec, chunk)


def test_capi_digital_gate(lib):
    # DIGITAL_INPUT(H) + DIGITAL_INPUT(L) + AND + OUTPUT
    elements = (ctypes.c_int * 4)(200, 200, 204, 201)
    props = (ctypes.c_double * 2)(1.0, 0.0)
    wires = (ctypes.c_int * 12)(
        0, 0, 2, 0,    # inA -> and.a
        1, 0, 2, 1,    # inB -> and.b
        2, 2, 3, 0)    # and.o -> out
    szp = ctypes.POINTER(ctypes.c_size_t)
    vec = szp()
    chunk = szp()
    comp = ctypes.c_size_t()
    h = lib.create_circuit(elements, 4, wires, 12, props,
                           ctypes.byref(vec), ctypes.byref(chunk),
                           ctypes.byref(comp))
    assert h, lib.phy_engine_last_error()
    assert lib.circuit_digital_clk(h) == 0, lib.phy_engine_last_error()

    def out_state():
        n = comp.value
        v_ord = (ctypes.c_size_t * (n + 1))()
        c_ord = (ctypes.c_size_t * (n + 1))()
        d_ord = (ctypes.c_size_t * (n + 1))()
        lib.circuit_sample_layout(h, vec, chunk, n, v_ord, c_ord,
                                  d_ord)
        volts = (ctypes.c_double * max(1, v_ord[n]))()
        curs = (ctypes.c_double * max(1, c_ord[n]))()
        digs = (ctypes.c_uint8 * max(1, d_ord[n]))()
        lib.circuit_sample_digital_state_u8(
            h, vec, chunk, n, volts, v_ord, curs, c_ord, digs, d_ord)
        return digs[d_ord[3]]          # OUTPUT component's pin

    assert out_state() == 0            # H & L = L
    # flip input B high through the ABI, re-clock: H & H = H
    assert lib.circuit_set_model_digital(h, 1, 0, 0, 1) == 0
    assert lib.circuit_digital_clk(h) == 0
    assert out_state() == 1
    lib.destroy_circuit(h, vec, chunk)


def test_capi_verilog_runtime(lib):
    src = b"""
module cnt(input clk, input rst_n, output [3:0] q);
  reg [3:0] r;
  always @(posedge clk or negedge rst_n)
    if (!rst_n) r <= 4'd0; else r <= r + 4'd1;
  assign q = r;
endmodule
"""
    rt = lib.verilog_runtime_create(src, len(src), b"cnt", 3, None,
                                    None, 0)
    assert rt, lib.phy_engine_last_error()
    n = lib.verilog_runtime_port_count(rt)
    assert n == 3
    names = {}
    for i in range(n):
        buf = ctypes.create_string_buffer(64)
        lib.verilog_runtime_copy_port_name(rt, i, buf, 64)
        names[buf.value.decode()] = i
    assert set(names) == {"clk", "rst_n", "q"}
    assert lib.verilog_runtime_port_dir(rt, names["q"]) == 2  # output

    def clock():
        lib.verilog_runtime_set_port_value(rt, names["clk"], 1)
        lib.verilog_runtime_tick(rt)
        lib.verilog_runtime_set_port_value(rt, names["clk"], 0)
        lib.verilog_runtime_tick(rt)

    lib.verilog_runtime_set_port_value(rt, names["rst_n"], 0)
    lib.verilog_runtime_tick(rt)
    lib.verilog_runtime_set_port_value(rt, names["rst_n"], 1)
    for _ in range(5):
        clock()
    # q after 5 increments
    assert lib.verilog_runtime_get_port_value(rt, names["q"]) == 5
    lib.verilog_runtime_destroy(rt)


def _bind_pl(lib):
    szp = ctypes.POINTER(ctypes.c_size_t)
    lib.pl_experiment_create.argtypes = [ctypes.c_int]
    lib.pl_experiment_create.restype = ctypes.c_void_p
    lib.pl_experiment_load_from_file.argtypes = [ctypes.c_char_p,
                                                 ctypes.c_size_t]
    lib.pl_experiment_load_from_file.restype = ctypes.c_void_p
    lib.pl_experiment_destroy.argtypes = [ctypes.c_void_p]
    lib.pl_experiment_dump.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.pl_experiment_dump.restype = ctypes.POINTER(ctypes.c_char)
    lib.pl_experiment_save.argtypes = [ctypes.c_void_p,
                                       ctypes.c_char_p,
                                       ctypes.c_size_t, ctypes.c_int]
    lib.pl_experiment_add_circuit_element.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8]
    lib.pl_experiment_add_circuit_element.restype = \
        ctypes.POINTER(ctypes.c_char)
    lib.pl_experiment_connect.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_int]
    lib.pl_experiment_set_element_property_number.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_double]
    lib.pl_experiment_element_count.argtypes = [ctypes.c_void_p]
    lib.pl_experiment_auto_layout.argtypes = (
        [ctypes.c_void_p] + [ctypes.c_double] * 7 +
        [ctypes.c_int] * 2 + [ctypes.c_double] * 4 + [szp] * 5)
    lib.pl_pe_circuit_build.argtypes = [ctypes.c_void_p]
    lib.pl_pe_circuit_build.restype = ctypes.c_void_p
    lib.pl_pe_circuit_destroy.argtypes = [ctypes.c_void_p]
    lib.pl_pe_circuit_comp_size.argtypes = [ctypes.c_void_p]
    lib.pl_pe_circuit_comp_size.restype = ctypes.c_size_t
    lib.pl_pe_circuit_digital_clk.argtypes = [ctypes.c_void_p]
    lib.pl_pe_circuit_sync_inputs_from_pl.argtypes = [ctypes.c_void_p,
                                                      ctypes.c_void_p]
    lib.pl_pe_circuit_write_back_to_pl.argtypes = [ctypes.c_void_p,
                                                   ctypes.c_void_p]
    lib.pl_pe_circuit_sample_layout.argtypes = [ctypes.c_void_p, szp,
                                                szp, szp]
    lib.pe_to_pl_convert.argtypes = (
        [ctypes.c_void_p] + [ctypes.c_double] * 3 +
        [ctypes.c_uint8] * 7)
    lib.pe_to_pl_convert.restype = ctypes.c_void_p
    lib.phy_engine_string_free.argtypes = [
        ctypes.POINTER(ctypes.c_char)]
    return lib


def _take_str(lib, p):
    assert p, lib.phy_engine_last_error()
    s = ctypes.cast(p, ctypes.c_char_p).value.decode()
    lib.phy_engine_string_free(p)
    return s


def test_capi_pl_scene_sim_write_back(lib, tmp_path):
    """Scene build -> PE sim -> write-back through the .so
    (dll_api.h:318-443 pl_* family)."""
    import json
    _bind_pl(lib)
    ex = lib.pl_experiment_create(0)
    assert ex, lib.phy_engine_last_error()

    def add(mid):
        return _take_str(lib, lib.pl_experiment_add_circuit_element(
            ex, mid, len(mid), 0.0, 0.0, 0.0, 0, 0, 1))

    i_in = add(b"Logic Input")
    i_yes = add(b"Yes Gate")
    i_out = add(b"Logic Output")
    assert lib.pl_experiment_connect(ex, i_in.encode(), len(i_in), 0,
                                     i_yes.encode(), len(i_yes), 0,
                                     0) == 0
    assert lib.pl_experiment_connect(ex, i_yes.encode(), len(i_yes), 1,
                                     i_out.encode(), len(i_out), 0,
                                     0) == 0
    key = "开关".encode()
    assert lib.pl_experiment_set_element_property_number(
        ex, i_in.encode(), len(i_in), key, len(key), 1.0) == 0

    h = lib.pl_pe_circuit_build(ex)
    assert h, lib.phy_engine_last_error()
    assert lib.pl_pe_circuit_comp_size(h) == 3
    assert lib.pl_pe_circuit_sync_inputs_from_pl(h, ex) == 0
    assert lib.pl_pe_circuit_digital_clk(h) == 0, \
        lib.phy_engine_last_error()
    assert lib.pl_pe_circuit_digital_clk(h) == 0
    assert lib.pl_pe_circuit_write_back_to_pl(h, ex) == 0, \
        lib.phy_engine_last_error()

    doc = json.loads(_take_str(lib, lib.pl_experiment_dump(ex, 0)))
    status = json.loads(doc["Experiment"]["StatusSave"])
    out_el = [e for e in status["Elements"]
              if e["ModelID"] == "Logic Output"][0]
    assert out_el["Properties"]["状态"] == 1.0

    # layout + save/load round trip
    outs = [(ctypes.c_size_t * 1)() for _ in range(5)]
    assert lib.pl_experiment_auto_layout(
        ex, 0.0, 0.0, 0.0, 2.0, 2.0, 0.0, 0.0, 0, 0,
        0.16, 0.16, 0.0, 0.0, *outs) == 0
    assert outs[3][0] == 3              # placed
    path = str(tmp_path / "scene.sav").encode()
    assert lib.pl_experiment_save(ex, path, len(path), 0) == 0
    ex2 = lib.pl_experiment_load_from_file(path, len(path))
    assert ex2, lib.phy_engine_last_error()
    assert lib.pl_experiment_element_count(ex2) == 3
    lib.pl_pe_circuit_destroy(h)
    lib.pl_experiment_destroy(ex2)
    lib.pl_experiment_destroy(ex)


def test_capi_pe_to_pl_convert(lib):
    """PE circuit -> PL scene export through the .so."""
    import json
    _bind_pl(lib)
    elements = (ctypes.c_int * 4)(0, 4, 1, 1)
    props = (ctypes.c_double * 3)(6.0, 1000.0, 2000.0)
    wires = (ctypes.c_int * 16)(
        1, 0, 2, 0, 2, 1, 3, 0, 3, 1, 0, 0, 1, 1, 0, 0)
    szp = ctypes.POINTER(ctypes.c_size_t)
    vec = szp()
    chunk = szp()
    comp = ctypes.c_size_t()
    h = lib.create_circuit(elements, 4, wires, 16, props,
                           ctypes.byref(vec), ctypes.byref(chunk),
                           ctypes.byref(comp))
    assert h, lib.phy_engine_last_error()
    ex = lib.pe_to_pl_convert(h, 0.0, 0.0, 0.0, 0, 0, 1, 1, 1, 0, 0)
    assert ex, lib.phy_engine_last_error()
    doc = json.loads(_take_str(lib, lib.pl_experiment_dump(ex, 0)))
    status = json.loads(doc["Experiment"]["StatusSave"])
    mids = sorted(e["ModelID"] for e in status["Elements"])
    assert "Battery Source" in mids and mids.count("Resistor") == 2
    assert status["Wires"]
    lib.pl_experiment_destroy(ex)
    lib.destroy_circuit(h, vec, chunk)
