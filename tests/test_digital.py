"""Digital engine tests (test/0006.digital analogues).

4-state propagation through gate chains, sequential devices, counters,
and the mixed-signal bridge.
"""

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.digital.logic import L, H, X, Z
from phy_engine_tpu.models import (AND, OR, NOT, XOR, NAND, INPUT, OUTPUT,
                                   D_FF, COUNTER4, TICK_DELAY, HALF_ADDER,
                                   FULL_ADDER, D_LATCH, TRI_STATE, RESOLVE2,
                                   JK_FF, T_FF, EIGHT_BIT_INPUT,
                                   EIGHT_BIT_DISPLAY, RESISTANCE, VDC,
                                   COMPARATOR, SCHMITT_TRIGGER)
from phy_engine_tpu.engine.circuit import AnalyzeType


def mkc():
    c = pe.Circuit()
    c.set_analyze_type(AnalyzeType.OP)
    return c


def wire(nl, *pins):
    n = netops.create_node(nl)
    for inst, pi in pins:
        netops.add_to_node(nl, inst, pi, n)
    return n


def test_and_gate_truth_table():
    for a_code, b_code, expect in [
        (L, L, L), (L, H, L), (H, L, L), (H, H, H),
        (X, H, X), (X, L, L), (Z, H, X), (Z, L, L), (X, X, X),
    ]:
        c = mkc()
        nl = c.nl
        ia = netops.add_model(nl, INPUT, {"boolean": float(a_code)})
        ib = netops.add_model(nl, INPUT, {"boolean": float(b_code)})
        g = netops.add_model(nl, AND)
        out = netops.add_model(nl, OUTPUT)
        wire(nl, (ia, 0), (g, 0))
        wire(nl, (ib, 0), (g, 1))
        n_o = wire(nl, (g, 2), (out, 0))
        c.digital_clk()
        assert c.node_digital(n_o) == expect, (a_code, b_code)
        assert out.params["value"] == expect


def test_not_chain_propagates_in_one_tick():
    """A chain of N inverters settles within a single tick (levelled
    sweeps replace the reference's worklist iterations)."""
    c = mkc()
    nl = c.nl
    src = netops.add_model(nl, INPUT, {"boolean": float(H)})
    prev = wire(nl, (src, 0))
    gates = []
    for i in range(20):
        g = netops.add_model(nl, NOT)
        netops.add_to_node(nl, g, 0, prev)
        prev = wire(nl, (g, 1))
        gates.append(g)
    c.digital_clk()
    assert c.node_digital(prev) == H  # even number of inversions


def test_xor_nand_compose():
    c = mkc()
    nl = c.nl
    a = netops.add_model(nl, INPUT, {"boolean": float(H)})
    b = netops.add_model(nl, INPUT, {"boolean": float(L)})
    x = netops.add_model(nl, XOR)
    nd = netops.add_model(nl, NAND)
    wire(nl, (a, 0), (x, 0), (nd, 0))
    wire(nl, (b, 0), (x, 1), (nd, 1))
    nx = wire(nl, (x, 2))
    nn = wire(nl, (nd, 2))
    c.digital_clk()
    assert c.node_digital(nx) == H
    assert c.node_digital(nn) == H


def test_dff_rising_edge():
    c = mkc()
    nl = c.nl
    d_in = netops.add_model(nl, INPUT, {"boolean": float(H)})
    clk = netops.add_model(nl, INPUT, {"boolean": float(L)})
    ff = netops.add_model(nl, D_FF)
    wire(nl, (d_in, 0), (ff, 0))
    wire(nl, (clk, 0), (ff, 1))
    nq = wire(nl, (ff, 2))
    c.digital_clk()
    assert c.node_digital(nq) == X      # q initial X, no edge yet
    clk.set_attribute("boolean", float(H))   # rising edge
    c.digital_clk()
    assert c.node_digital(nq) == H
    d_in.set_attribute("boolean", float(L))
    c.digital_clk()                      # clk stays H: no edge
    assert c.node_digital(nq) == H
    clk.set_attribute("boolean", float(L))
    c.digital_clk()                      # falling edge: no capture
    assert c.node_digital(nq) == H
    clk.set_attribute("boolean", float(H))
    c.digital_clk()                      # rising edge captures L
    assert c.node_digital(nq) == L


def test_counter4_counts():
    c = mkc()
    nl = c.nl
    clk = netops.add_model(nl, INPUT, {"boolean": float(L)})
    en = netops.add_model(nl, INPUT, {"boolean": float(H)})
    cnt = netops.add_model(nl, COUNTER4)
    wire(nl, (clk, 0), (cnt, 4))
    wire(nl, (en, 0), (cnt, 5))
    qs = [wire(nl, (cnt, i)) for i in range(4)]  # q3..q0
    c.digital_clk()

    def value():
        bits = [c.node_digital(q) for q in qs]
        assert all(b in (L, H) for b in bits)
        return (bits[0] << 3) | (bits[1] << 2) | (bits[2] << 1) | bits[3]

    for k in range(1, 6):
        clk.set_attribute("boolean", float(H))
        c.digital_clk()
        assert value() == k, k
        clk.set_attribute("boolean", float(L))
        c.digital_clk()
        assert value() == k


def test_tick_delay():
    c = mkc()
    nl = c.nl
    src = netops.add_model(nl, INPUT, {"boolean": float(H)})
    td = netops.add_model(nl, TICK_DELAY)
    wire(nl, (src, 0), (td, 0))
    n_o = wire(nl, (td, 1))
    c.digital_clk()
    assert c.node_digital(n_o) == X      # initial held value
    c.digital_clk()
    assert c.node_digital(n_o) == H      # delayed by one tick


def test_full_adder_block():
    c = mkc()
    nl = c.nl
    for a, b, cin, (s, cout) in [
        (L, L, L, (L, L)), (H, L, L, (H, L)), (H, H, L, (L, H)),
        (H, H, H, (H, H)), (X, L, L, (X, X)),
    ]:
        c = mkc()
        nl = c.nl
        ia = netops.add_model(nl, INPUT, {"boolean": float(a)})
        ib = netops.add_model(nl, INPUT, {"boolean": float(b)})
        ic = netops.add_model(nl, INPUT, {"boolean": float(cin)})
        fa = netops.add_model(nl, FULL_ADDER)
        wire(nl, (ia, 0), (fa, 0))
        wire(nl, (ib, 0), (fa, 1))
        wire(nl, (ic, 0), (fa, 2))
        ns = wire(nl, (fa, 3))
        nc = wire(nl, (fa, 4))
        c.digital_clk()
        assert c.node_digital(ns) == s, (a, b, cin)
        # X carry: for (X,L,L): a&b=L... carry = or(and(a,b)=X&...):
        if cout != X:
            assert c.node_digital(nc) == cout, (a, b, cin)


def test_latch_transparent():
    c = mkc()
    nl = c.nl
    d = netops.add_model(nl, INPUT, {"boolean": float(H)})
    en = netops.add_model(nl, INPUT, {"boolean": float(H)})
    lat = netops.add_model(nl, D_LATCH)
    wire(nl, (d, 0), (lat, 0))
    wire(nl, (en, 0), (lat, 1))
    nq = wire(nl, (lat, 2))
    c.digital_clk()
    assert c.node_digital(nq) == H       # transparent
    en.set_attribute("boolean", float(L))
    d.set_attribute("boolean", float(L))
    c.digital_clk()
    assert c.node_digital(nq) == H       # held


def test_tri_state_and_resolve2():
    c = mkc()
    nl = c.nl
    d1 = netops.add_model(nl, INPUT, {"boolean": float(H)})
    e1 = netops.add_model(nl, INPUT, {"boolean": float(H)})
    d2 = netops.add_model(nl, INPUT, {"boolean": float(L)})
    e2 = netops.add_model(nl, INPUT, {"boolean": float(L)})
    t1 = netops.add_model(nl, TRI_STATE)
    t2 = netops.add_model(nl, TRI_STATE)
    res = netops.add_model(nl, RESOLVE2)
    wire(nl, (d1, 0), (t1, 0))
    wire(nl, (e1, 0), (t1, 1))
    wire(nl, (d2, 0), (t2, 0))
    wire(nl, (e2, 0), (t2, 1))
    wire(nl, (t1, 2), (res, 0))
    wire(nl, (t2, 2), (res, 1))
    n_o = wire(nl, (res, 2))
    c.digital_clk()
    assert c.node_digital(n_o) == H      # t1 drives H, t2 is Z
    e1.set_attribute("boolean", float(L))
    c.digital_clk()
    assert c.node_digital(n_o) == Z      # both Z
    e2.set_attribute("boolean", float(H))
    c.digital_clk()
    assert c.node_digital(n_o) == L      # t2 drives L


def test_jkff_and_tff():
    c = mkc()
    nl = c.nl
    j = netops.add_model(nl, INPUT, {"boolean": float(H)})
    k = netops.add_model(nl, INPUT, {"boolean": float(H)})
    clk = netops.add_model(nl, INPUT, {"boolean": float(L)})
    ff = netops.add_model(nl, JK_FF)
    wire(nl, (j, 0), (ff, 0))
    wire(nl, (k, 0), (ff, 1))
    wire(nl, (clk, 0), (ff, 2))
    nq = wire(nl, (ff, 3))
    c.digital_clk()
    # J=K=1: toggle; toggling from X gives L (enum->bool cast semantics)
    clk.set_attribute("boolean", float(H))
    c.digital_clk()
    assert c.node_digital(nq) == L
    clk.set_attribute("boolean", float(L))
    c.digital_clk()
    clk.set_attribute("boolean", float(H))
    c.digital_clk()
    assert c.node_digital(nq) == H


def test_eight_bit_io():
    c = mkc()
    nl = c.nl
    src = netops.add_model(nl, EIGHT_BIT_INPUT, {"value": 0xA5})
    dst = netops.add_model(nl, EIGHT_BIT_DISPLAY)
    for i in range(8):
        wire(nl, (src, i), (dst, i))
    c.digital_clk()
    assert int(dst.params["value"]) == 0xA5
    assert int(dst.params["unknown_mask"]) == 0


def test_comparator_mixed_signal():
    """comparator_digital_clk.cpp analogue: compares two analog nodes."""
    c = mkc()
    nl = c.nl
    v1 = netops.add_model(nl, VDC, {"V": 3.0})
    v2 = netops.add_model(nl, VDC, {"V": 2.0})
    r1 = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    r2 = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    cmp_ = netops.add_model(nl, COMPARATOR)
    na = wire(nl, (v1, 0), (r1, 0))
    nb = wire(nl, (v2, 0), (r2, 0))
    netops.add_to_node(nl, v1, 1, nl.ground_node)
    netops.add_to_node(nl, v2, 1, nl.ground_node)
    netops.add_to_node(nl, r1, 1, nl.ground_node)
    netops.add_to_node(nl, r2, 1, nl.ground_node)
    netops.add_to_node(nl, cmp_, 0, na)
    netops.add_to_node(nl, cmp_, 1, nb)
    n_o = wire(nl, (cmp_, 2))
    assert c.analyze()
    c.digital_clk()
    assert c.node_digital(n_o) == H      # 3.0 >= 2.0
    v2.set_attribute("V", 4.0)
    assert c.analyze()
    c.digital_clk()
    assert c.node_digital(n_o) == L


def test_gate_drives_analog_node():
    """hybirds.cpp analogue: digital output drives an analog net via an
    injected source branch, read back after the next analyze()."""
    c = mkc()
    nl = c.nl
    a = netops.add_model(nl, INPUT, {"boolean": float(H)})
    b = netops.add_model(nl, INPUT, {"boolean": float(H)})
    g = netops.add_model(nl, AND, {"Hl": 5.0, "Ll": 0.0})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    wire(nl, (a, 0), (g, 0))
    wire(nl, (b, 0), (g, 1))
    n_o = wire(nl, (g, 2), (r, 0))       # hybrid node: gate + resistor
    netops.add_to_node(nl, r, 1, nl.ground_node)
    assert c.analyze()                   # drives inactive: node floats at 0
    c.digital_clk()                      # AND(H,H)=H -> request 5V drive
    assert c.analyze()
    assert np.isclose(c.node_voltage(n_o).real, 5.0, atol=1e-9)
    b.set_attribute("boolean", float(L))
    c.digital_clk()
    assert c.analyze()
    assert np.isclose(c.node_voltage(n_o).real, 0.0, atol=1e-9)


def test_schmitt_trigger_hysteresis():
    c = mkc()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 0.0})
    st = netops.add_model(nl, SCHMITT_TRIGGER)
    n_in = wire(nl, (v, 0), (st, 0))
    netops.add_to_node(nl, v, 1, nl.ground_node)
    n_o = wire(nl, (st, 1))
    assert c.analyze()
    c.digital_clk()
    assert c.node_digital(n_o) == L      # below Vth_low
    v.set_attribute("V", 2.5)            # between thresholds: hold
    assert c.analyze()
    c.digital_clk()
    assert c.node_digital(n_o) == L
    v.set_attribute("V", 4.0)            # above Vth_high
    assert c.analyze()
    c.digital_clk()
    assert c.node_digital(n_o) == H
    v.set_attribute("V", 2.5)            # hold high
    assert c.analyze()
    c.digital_clk()
    assert c.node_digital(n_o) == H


def test_digital_run_scan_matches_per_tick():
    """Circuit.digital_run (device-side lax.scan over ticks) is
    tick-exact vs repeated digital_clk()."""
    import phy_engine_tpu as pe
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                              SynthOptions)

    src = """
module counter(input clk, input rst_n, output reg [3:0] q);
  always @(posedge clk or negedge rst_n)
    if (!rst_n) q <= 4'd0; else q <= q + 4'd1;
endmodule
"""

    def build():
        mods = compile_source(src)
        design = build_design(mods)
        topm = find_module(design, "counter")
        inst = elaborate(design, topm)
        c = pe.Circuit()
        nl = c.nl
        pn = {p: [netops.create_node(nl)
                  for _ in range(inst.signals[p].width)]
              for p in topm.ports}
        clk = netops.add_model(nl, INPUT, {"boolean": 0.0})
        rst = netops.add_model(nl, INPUT, {"boolean": 0.0})
        netops.add_to_node(nl, clk, 0, pn["clk"][0])
        netops.add_to_node(nl, rst, 0, pn["rst_n"][0])
        synthesize_to_netlist(nl, design, inst, pn,
                              SynthOptions(opt_level=1))
        return c, clk, rst, pn

    c1, clk1, rst1, pn1 = build()
    sched = [{}, {clk1: 1}, {clk1: 0}, {rst1: 1}]
    for _ in range(6):
        sched += [{clk1: 1, rst1: 1}, {clk1: 0, rst1: 1}]
    tr = c1.digital_run(sched)
    got = list(tr.bus_values(pn1["q"]))

    c2, clk2, rst2, pn2 = build()
    ref = []
    remap = {id(clk1): clk2, id(rst1): rst2}
    for entry in sched:
        for m, v in entry.items():
            remap[id(m)].set_attribute("boolean", float(v))
        c2.digital_clk()
        ref.append(sum((c2.node_digital(n) & 1) << i
                       for i, n in enumerate(pn2["q"])))
    assert got == ref
    assert got[-1] == 6


def test_digital_run_lane_parallel_fp16():
    """32 independent stimulus lanes per tick through the fp16 adder —
    the bit-packed multi-vector mode; every lane must match numpy
    float16 (the reference's u64 cone-batching role)."""
    import sys
    import os as _os
    sys.path.insert(0, _os.path.dirname(__file__))
    from test_fp16 import FP16_ADD_SRC, _ref_add
    import phy_engine_tpu as pe
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                              SynthOptions)

    mods = compile_source(FP16_ADD_SRC)
    design = build_design(mods)
    topm = find_module(design, "fp16_add")
    inst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    pn = {p: [netops.create_node(nl)
              for _ in range(inst.signals[p].width)]
          for p in topm.ports}
    ins = {}
    for name in ("a", "b"):
        ins[name] = []
        for n in pn[name]:
            m = netops.add_model(nl, INPUT, {"boolean": 0.0})
            netops.add_to_node(nl, m, 0, n)
            ins[name].append(m)
    synthesize_to_netlist(nl, design, inst, pn, SynthOptions(opt_level=1))

    rng = np.random.default_rng(77)
    T = 4
    vec_a = rng.integers(0, 1 << 16, (T, 32)).astype(np.int64)
    vec_b = rng.integers(0, 1 << 16, (T, 32)).astype(np.int64)
    sched = []
    for t in range(T):
        entry = {}
        for name, vals in (("a", vec_a), ("b", vec_b)):
            for i, m in enumerate(ins[name]):
                word = 0
                for lane in range(32):
                    word |= (int(vals[t, lane]) >> i & 1) << lane
                entry[m] = (word, 0)
            # (v_word per bit, u=0: all lanes known)
        sched.append(entry)
    tr = c.digital_run(sched)
    got = tr.bus_values_lanes(pn["y"])
    for t in range(T):
        for lane in range(32):
            exp = _ref_add(int(vec_a[t, lane]), int(vec_b[t, lane]))
            assert got[t, lane] == exp, (t, lane, hex(int(got[t, lane])),
                                         hex(exp))
