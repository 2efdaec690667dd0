"""C ABI verilog-netlist elements (code 301) — dll_api.h parity.

Mirrors the reference's 0008.dll suite scenarios that build circuits
with E_VERILOG_NETLIST elements through the flat C API and clock them
with circuit_digital_clk (dll_main_verilog_netlist_dff.cpp,
dll_main_verilog_netlist_async_reset.cpp,
dll_main_verilog_netlist_multi_driver.cpp): the Verilog source rides in
the create_circuit_ex text stream, is synthesized to primitive gates at
element-build time, and the top ports become the element's pins.
"""

import ctypes

import pytest

from test_capi import _load

VM = 301          # ElementCode.VERILOG_NETLIST
DIN = 200         # DIGITAL_INPUT (1 property: initial boolean)
DOUT = 201        # DIGITAL_OUTPUT


@pytest.fixture(scope="module")
def lib():
    lib = _load()
    szp = ctypes.POINTER(ctypes.c_size_t)
    lib.create_circuit_ex.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_char_p), szp, ctypes.c_size_t,
        szp, szp,
        ctypes.POINTER(szp), ctypes.POINTER(szp), szp]
    lib.create_circuit_ex.restype = ctypes.c_void_p
    return lib


def _build_ex(lib, codes, wires, props, texts, src_idx, top_idx):
    szp = ctypes.POINTER(ctypes.c_size_t)
    n = len(codes)
    codes_c = (ctypes.c_int * n)(*codes)
    wires_c = (ctypes.c_int * len(wires))(*wires)
    props_c = (ctypes.c_double * max(1, len(props)))(*props)
    texts_b = [t.encode() for t in texts]
    texts_c = (ctypes.c_char_p * len(texts))(*texts_b)
    sizes_c = (ctypes.c_size_t * len(texts))(*[len(t) for t in texts_b])
    src_c = (ctypes.c_size_t * n)(*src_idx)
    top_c = (ctypes.c_size_t * n)(*top_idx)
    vec = szp()
    chunk = szp()
    comp = ctypes.c_size_t()
    h = lib.create_circuit_ex(
        codes_c, n, wires_c, len(wires), props_c,
        texts_c, sizes_c, len(texts), src_c, top_c,
        ctypes.byref(vec), ctypes.byref(chunk), ctypes.byref(comp))
    assert h, lib.phy_engine_last_error()
    return h, vec, chunk, comp


def _dig_states(lib, h, vec, chunk, n):
    """Per-component digital pin states via the prefix-sum layout."""
    v_ord = (ctypes.c_size_t * (n + 1))()
    c_ord = (ctypes.c_size_t * (n + 1))()
    d_ord = (ctypes.c_size_t * (n + 1))()
    assert lib.circuit_sample_layout(h, vec, chunk, n, v_ord, c_ord,
                                     d_ord) == 0
    volts = (ctypes.c_double * max(1, v_ord[n]))()
    curs = (ctypes.c_double * max(1, c_ord[n]))()
    digs = (ctypes.c_uint8 * max(1, d_ord[n]))()
    assert lib.circuit_sample_digital_state_u8(
        h, vec, chunk, n, volts, v_ord, curs, c_ord, digs, d_ord) == 0
    return [list(digs[d_ord[i]:d_ord[i + 1]]) for i in range(n)]


ASYNC_DFF = """
module adff(input clk, input rstn, input d, output q);
  reg r;
  always @(posedge clk or negedge rstn)
    if (!rstn) r <= 1'b0; else r <= d;
  assign q = r;
endmodule
"""


def test_capi_verilog_netlist_async_reset_dff(lib):
    # elements: adff(301) + d(200) + clk(200) + rstn(200) + q(201)
    # adff pins follow port order: clk=0, rstn=1, d=2, q=3
    codes = [VM, DIN, DIN, DIN, DOUT]
    props = [0.0, 0.0, 0.0]          # d, clk, rstn initial L
    wires = [1, 0, 0, 2,             # d -> adff.d
             2, 0, 0, 0,             # clk -> adff.clk
             3, 0, 0, 1,             # rstn -> adff.rstn
             0, 3, 4, 0]             # adff.q -> out
    h, vec, chunk, comp = _build_ex(
        lib, codes, wires, props, [ASYNC_DFF], [0, 0, 0, 0, 0],
        [2**63] * 5)
    n = comp.value
    assert n == 5

    D, CLK, RSTN = 1, 2, 3

    def setd(comp_i, v):
        assert lib.circuit_set_model_digital(h, comp_i, 0, 0, v) == 0

    def clock():
        setd(CLK, 0)
        assert lib.circuit_digital_clk(h) == 0
        setd(CLK, 1)
        assert lib.circuit_digital_clk(h) == 0

    # async reset: q initializes L even with clk pulsing
    setd(RSTN, 0)
    clock()
    assert _dig_states(lib, h, vec, chunk, n)[4][0] == 0
    # release reset, clock a 1 through
    setd(RSTN, 1)
    setd(D, 1)
    clock()
    assert _dig_states(lib, h, vec, chunk, n)[4][0] == 1
    # clock a 0 through
    setd(D, 0)
    clock()
    assert _dig_states(lib, h, vec, chunk, n)[4][0] == 0
    lib.destroy_circuit(h, vec, chunk)


MDRV = """
module mdrv(input d0, input en0, input d1, input en1, output y);
  assign y = en0 ? d0 : 1'bz;
  assign y = en1 ? d1 : 1'bz;
endmodule
"""


def test_capi_verilog_netlist_multi_driver(lib):
    # A multi-driver net INSIDE one code-301 element: synthesis inserts
    # TRI_STATE + RESOLVE2 on the doubly-driven output
    # (dll_main_verilog_netlist_multi_driver.cpp role).
    # mdrv pins follow port order: d0=0, en0=1, d1=2, en1=3, y=4
    codes = [VM, DIN, DIN, DIN, DIN, DOUT]
    #         M   d0   en0  d1   en1  bus
    props = [1.0, 1.0, 0.0, 0.0]     # d0=H en0=H d1=L en1=L
    wires = [1, 0, 0, 0,             # d0 -> M.d0
             2, 0, 0, 1,             # en0 -> M.en0
             3, 0, 0, 2,             # d1 -> M.d1
             4, 0, 0, 3,             # en1 -> M.en1
             0, 4, 5, 0]             # M.y -> out
    h, vec, chunk, comp = _build_ex(
        lib, codes, wires, props, [MDRV], [0] * 6, [2**63] * 6)
    n = comp.value
    assert n == 6

    def setd(comp_i, v):
        assert lib.circuit_set_model_digital(h, comp_i, 0, 0, v) == 0

    def bus():
        assert lib.circuit_digital_clk(h) == 0
        return _dig_states(lib, h, vec, chunk, n)[5][0]

    assert bus() == 1                # driver 0 drives H, driver 1 is Z
    setd(2, 0)                       # en0 low: nobody drives
    assert bus() == 3                # Z on the bus
    setd(4, 1)                       # driver 1 drives L
    assert bus() == 0
    # both enabled and conflicting -> X
    setd(2, 1)
    assert bus() == 2
    lib.destroy_circuit(h, vec, chunk)
