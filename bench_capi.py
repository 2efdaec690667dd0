"""C-ABI call-overhead benchmark (VERDICT r3 item 10).

The reference dll is called per-tick from game engines
(/root/reference/include/phy_engine/dll_api.h:238-252), so per-call
latency through the shared library is a product metric.  This measures
our `.so` (native/pe_capi.c — a C ABI over an embedded CPython) on the
three hot entry points and compares each against the identical
operation invoked directly on the Python library surface:

  - ``circuit_digital_clk``        (per-tick clocking)
  - ``circuit_sample_digital_state_u8``  (per-frame state sampling)
  - ``verilog_runtime_tick``       (embedded Verilog device ticking)

The delta between the ABI call and the direct Python call is the pure
bridge overhead (ctypes dispatch + C marshalling + PyObject_Call into
the engine).  Prints one JSON line.

Run: ``python bench_capi.py``  (CPU; builds the .so on first use).
"""

import ctypes
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPS = int(os.environ.get("PE_BENCH_CAPI_REPS", "2000"))


def _bind(lib):
    szp = ctypes.POINTER(ctypes.c_size_t)
    lib.phy_engine_init.argtypes = [ctypes.c_char_p]
    lib.phy_engine_init.restype = ctypes.c_int
    lib.phy_engine_last_error.restype = ctypes.c_char_p
    lib.create_circuit.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(szp), ctypes.POINTER(szp), szp]
    lib.create_circuit.restype = ctypes.c_void_p
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
    lib.verilog_runtime_set_port_value.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_uint8]
    lib.verilog_runtime_destroy.argtypes = [ctypes.c_void_p]
    return szp


def _time(f, reps=REPS):
    f()                                     # warm (jit, caches)
    t0 = time.perf_counter()
    for _ in range(reps):
        f()
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from phy_engine_tpu.native import build_capi

    repo = os.path.dirname(os.path.abspath(__file__))
    lib = ctypes.CDLL(build_capi())
    szp = _bind(lib)
    assert lib.phy_engine_init(repo.encode()) == 0, \
        lib.phy_engine_last_error()

    out = {}

    # --- circuit: two INPUTs -> AND -> OUTPUT (game-engine-tick shape)
    elements = (ctypes.c_int * 4)(200, 200, 204, 201)
    props = (ctypes.c_double * 2)(1.0, 0.0)
    wires = (ctypes.c_int * 12)(0, 0, 2, 0, 1, 0, 2, 1, 2, 2, 3, 0)
    vec, chunk, comp = szp(), szp(), ctypes.c_size_t()
    h = lib.create_circuit(elements, 4, wires, 12, props,
                           ctypes.byref(vec), ctypes.byref(chunk),
                           ctypes.byref(comp))
    assert h, lib.phy_engine_last_error()
    out["abi_digital_clk_us"] = _time(
        lambda: lib.circuit_digital_clk(h)) * 1e6

    n = comp.value
    v_ord = (ctypes.c_size_t * (n + 1))()
    c_ord = (ctypes.c_size_t * (n + 1))()
    d_ord = (ctypes.c_size_t * (n + 1))()
    lib.circuit_sample_layout(h, vec, chunk, n, v_ord, c_ord, d_ord)
    volts = (ctypes.c_double * max(1, v_ord[n]))()
    curs = (ctypes.c_double * max(1, c_ord[n]))()
    digs = (ctypes.c_uint8 * max(1, d_ord[n]))()
    out["abi_sample_u8_us"] = _time(
        lambda: lib.circuit_sample_digital_state_u8(
            h, vec, chunk, n, volts, v_ord, curs, c_ord, digs,
            d_ord)) * 1e6
    out["abi_set_model_digital_us"] = _time(
        lambda: lib.circuit_set_model_digital(h, 1, 0, 0, 1)) * 1e6

    # --- the same ops on the Python library surface, no ABI bridge
    from phy_engine_tpu.api import Circuit, Element, Wire
    c = Circuit(
        [Element(200, (1.0,)), Element(200, (0.0,)), Element(204),
         Element(201)],
        [Wire(0, 0, 2, 0), Wire(1, 0, 2, 1), Wire(2, 2, 3, 0)])
    out["py_digital_clk_us"] = _time(lambda: c.digital_clk()) * 1e6
    out["py_sample_us"] = _time(lambda: c.sample()) * 1e6

    # --- verilog runtime tick
    src = (b"module cnt(input clk, input rst_n, output [3:0] q);\n"
           b"  reg [3:0] r;\n"
           b"  always @(posedge clk or negedge rst_n)\n"
           b"    if (!rst_n) r <= 4'd0; else r <= r + 4'd1;\n"
           b"  assign q = r;\nendmodule\n")
    rt = lib.verilog_runtime_create(src, len(src), b"cnt", 3, None,
                                    None, 0)
    assert rt, lib.phy_engine_last_error()
    lib.verilog_runtime_set_port_value(rt, 1, 1)     # rst_n high
    out["abi_verilog_tick_us"] = _time(
        lambda: lib.verilog_runtime_tick(rt)) * 1e6

    from phy_engine_tpu.api import VerilogRuntime
    vrt = VerilogRuntime(src.decode(), "cnt")
    vrt.set_value("rst_n", 1)
    out["py_verilog_tick_us"] = _time(lambda: vrt.tick()) * 1e6

    lib.verilog_runtime_destroy(rt)
    lib.destroy_circuit(h, vec, chunk)

    for k in ("digital_clk", "verilog_tick"):
        out[f"bridge_overhead_{k}_us"] = round(
            out[f"abi_{k}_us"] - out[f"py_{k}_us"], 3)
    out = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in out.items()}
    out["verdict"] = (
        "bridge ok (<10x direct-python)"
        if out["abi_digital_clk_us"] < 10 * out["py_digital_clk_us"]
        else "bridge hot: embedded-CPython entry dominates; cache "
             "bound callables or move the hot sample path native")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
