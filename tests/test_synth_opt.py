"""Synthesis optimization pass tests (0015.verilog_compile pattern:
correctness + gate-count assertions per pass)."""

import numpy as np
import pytest

from phy_engine_tpu.verilog.synth import SynthOptions
from tests_helpers_synth import crosscheck_opt


def test_o1_reduces_gates_and_preserves_function():
    src = """
module m(input [3:0] a, input [3:0] b, output [3:0] y, output z);
  wire [3:0] t1 = a & b;
  wire [3:0] t2 = a & b;        // duplicate -> strash
  wire [3:0] t3 = ~(~t1);       // double inverter
  assign y = t3 | (t2 & 4'b0000);   // const-and -> 0, or -> t2
  assign z = 1'b1 & 1'b1;       // constant folding
endmodule
"""
    rng = np.random.default_rng(11)
    vectors = [{"a": int(rng.integers(16)), "b": int(rng.integers(16))}
               for _ in range(12)]
    r0 = crosscheck_opt(src, "m", vectors, ["y", "z"],
                        SynthOptions(opt_level=0))
    r1 = crosscheck_opt(src, "m", vectors, ["y", "z"],
                        SynthOptions(opt_level=1))
    assert r1.gate_count < r0.gate_count
    assert r1.opt_stats.total() > 0


def test_o1_on_alu():
    src = """
module alu(input [3:0] a, input [3:0] b, input [1:0] op,
           output reg [3:0] y);
  always @* begin
    case (op)
      2'd0: y = a + b;
      2'd1: y = a - b;
      2'd2: y = a & b;
      default: y = a ^ b;
    endcase
  end
endmodule
"""
    rng = np.random.default_rng(2)
    vectors = [{"a": int(rng.integers(16)), "b": int(rng.integers(16)),
                "op": int(rng.integers(4))} for _ in range(20)]
    r0 = crosscheck_opt(src, "alu", vectors, ["y"],
                        SynthOptions(opt_level=0))
    r1 = crosscheck_opt(src, "alu", vectors, ["y"],
                        SynthOptions(opt_level=1))
    assert r1.gate_count <= r0.gate_count


def test_o1_counter_still_clocks():
    src = """
module counter(input clk, input rst_n, output reg [3:0] q);
  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) q <= 4'd0;
    else q <= q + 4'd1;
  end
endmodule
"""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT
    from phy_engine_tpu.digital.logic import L, H
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import synthesize_to_netlist
    mods = compile_source(src)
    design = build_design(mods)
    topm = find_module(design, "counter")
    inst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    port_nets = {p: [netops.create_node(nl)
                     for _ in range(inst.signals[p].width)]
                 for p in topm.ports}
    clk = netops.add_model(nl, INPUT, {"boolean": float(L)})
    rst = netops.add_model(nl, INPUT, {"boolean": float(L)})
    netops.add_to_node(nl, clk, 0, port_nets["clk"][0])
    netops.add_to_node(nl, rst, 0, port_nets["rst_n"][0])
    synthesize_to_netlist(nl, design, inst, port_nets,
                          SynthOptions(opt_level=1))
    c.digital_clk()
    rst.set_attribute("boolean", float(H))
    c.digital_clk()

    def value():
        bits = [c.node_digital(n) for n in port_nets["q"]]
        return sum(b << i for i, b in enumerate(bits))

    for k in range(1, 6):
        clk.set_attribute("boolean", float(H))
        c.digital_clk()
        assert value() == k, k
        clk.set_attribute("boolean", float(L))
        c.digital_clk()


def test_o2_factoring_and_xor_extraction():
    src = """
module m(input [3:0] a, input [3:0] b, input [3:0] c, output [3:0] y,
         output [3:0] z, output w);
  assign y = (a & b) | (a & c);                 // -> a & (b|c)
  assign z = (a & ~b) | (~a & b);               // -> a ^ b
  assign w = ~(a[0] & b[0]) | (a[1] & ~c[1]);   // NAND/NIMP selection
endmodule
"""
    rng = np.random.default_rng(17)
    vectors = [{"a": int(rng.integers(16)), "b": int(rng.integers(16)),
                "c": int(rng.integers(16))} for _ in range(20)]
    r1 = crosscheck_opt(src, "m", vectors, ["y", "z", "w"],
                        SynthOptions(opt_level=1))
    r2 = crosscheck_opt(src, "m", vectors, ["y", "z", "w"],
                        SynthOptions(opt_level=2))
    assert r2.gate_count < r1.gate_count
    assert r2.opt_stats.graph_gates_saved > 0


def test_o2_preserves_x_propagation():
    """Kleene-safe tier must not strengthen X outputs: with an X input
    the optimized netlist still reports X where O0 does."""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.digital.logic import X
    from phy_engine_tpu.models import INPUT
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import synthesize_to_netlist

    src = """
module m(input a, input b, output y);
  assign y = (a & ~b) | (~a & b);
endmodule
"""
    results = {}
    for lvl in (0, 2):
        mods = compile_source(src)
        design = build_design(mods)
        topm = find_module(design, "m")
        inst = elaborate(design, topm)
        c = pe.Circuit()
        nl = c.nl
        port_nets = {p: [netops.create_node(nl)] for p in topm.ports}
        ia = netops.add_model(nl, INPUT, {"boolean": float(X)})
        ib = netops.add_model(nl, INPUT, {"boolean": 1.0})
        netops.add_to_node(nl, ia, 0, port_nets["a"][0])
        netops.add_to_node(nl, ib, 0, port_nets["b"][0])
        synthesize_to_netlist(nl, design, inst, port_nets,
                              SynthOptions(opt_level=lvl))
        c.digital_clk()
        results[lvl] = c.node_digital(port_nets["y"][0])
    assert results[2] == results[0] == 2   # X stays X


def test_o3_tt_sweep_and_qm():
    """O3 (binary-inputs relaxation): TT-equivalence sweep + QM cone
    minimization collapse a 7-segment decoder far below O1."""
    src = """
module seg7(input [3:0] d, output reg [6:0] s);
  always @* begin
    case (d)
      4'h0: s = 7'b0111111; 4'h1: s = 7'b0000110;
      4'h2: s = 7'b1011011; 4'h3: s = 7'b1001111;
      4'h4: s = 7'b1100110; 4'h5: s = 7'b1101101;
      4'h6: s = 7'b1111101; 4'h7: s = 7'b0000111;
      4'h8: s = 7'b1111111; 4'h9: s = 7'b1101111;
      4'hA: s = 7'b1110111; 4'hB: s = 7'b1111100;
      4'hC: s = 7'b0111001; 4'hD: s = 7'b1011110;
      4'hE: s = 7'b1111001; default: s = 7'b1110001;
    endcase
  end
endmodule
"""
    vectors = [{"d": i} for i in range(16)]      # exhaustive
    r1 = crosscheck_opt(src, "seg7", vectors, ["s"],
                        SynthOptions(opt_level=1))
    r3 = crosscheck_opt(src, "seg7", vectors, ["s"],
                        SynthOptions(opt_level=3,
                                     assume_binary_inputs=True))
    assert r3.gate_count < r1.gate_count // 2
    assert r3.opt_stats.tt_merged > 0
    assert r3.opt_stats.qm_rewritten > 0


def test_o3_counter_still_clocks():
    """Sequential boundary safety: TT tier must not break FF cones."""
    src = """
module counter(input clk, input rst_n, output reg [3:0] q,
               output wrap);
  assign wrap = (q == 4'hF);
  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) q <= 4'd0;
    else q <= q + 4'd1;
  end
endmodule
"""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT
    from phy_engine_tpu.digital.logic import L, H
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import synthesize_to_netlist
    mods = compile_source(src)
    design = build_design(mods)
    topm = find_module(design, "counter")
    inst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    port_nets = {p: [netops.create_node(nl)
                     for _ in range(inst.signals[p].width)]
                 for p in topm.ports}
    clk = netops.add_model(nl, INPUT, {"boolean": float(L)})
    rst = netops.add_model(nl, INPUT, {"boolean": float(L)})
    netops.add_to_node(nl, clk, 0, port_nets["clk"][0])
    netops.add_to_node(nl, rst, 0, port_nets["rst_n"][0])
    synthesize_to_netlist(nl, design, inst, port_nets,
                          SynthOptions(opt_level=3,
                                       assume_binary_inputs=True))
    c.digital_clk()
    rst.set_attribute("boolean", float(H))
    c.digital_clk()

    def value():
        return sum(c.node_digital(n) << i
                   for i, n in enumerate(port_nets["q"]))

    for k in range(1, 17):
        clk.set_attribute("boolean", float(H))
        c.digital_clk()
        assert value() == (k & 15), k
        expected_wrap = 1 if (k & 15) == 15 else 0
        assert c.node_digital(port_nets["wrap"][0]) == expected_wrap
        clk.set_attribute("boolean", float(L))
        c.digital_clk()


def test_omax_multistart_with_verification():
    src = """
module m(input [3:0] a, input [3:0] b, output [3:0] y, output p);
  assign y = (a & b) | (a & ~b) | (~a & b);   // == a | b
  assign p = ^(a ^ b);
endmodule
"""
    rng = np.random.default_rng(23)
    vectors = [{"a": int(rng.integers(16)), "b": int(rng.integers(16))}
               for _ in range(24)]
    r = crosscheck_opt(src, "m", vectors, ["y", "p"],
                       SynthOptions(opt_level=5,
                                    assume_binary_inputs=True,
                                    omax_verify=True,
                                    omax_restarts=3))
    st = r.opt_stats
    assert st.omax_restarts >= 1
    assert st.omax_best_cost > 0
    # a|b per bit (4 OR) + parity tree — far below the raw SOP
    assert r.gate_count <= 16


def test_graphs_equivalent_detects_mismatch():
    from phy_engine_tpu.verilog.opt_graph import (GateGraph,
                                                  graphs_equivalent)

    class FakeNet:
        pass

    na, nb, nout = FakeNet(), FakeNet(), FakeNet()
    g0 = GateGraph()
    g0.set_output(nout, g0.gate("AND", g0.leaf(na), g0.leaf(nb)))
    g1 = GateGraph()
    g1.set_output(nout, g1.gate("OR", g1.leaf(na), g1.leaf(nb)))
    g2 = GateGraph()
    g2.set_output(nout, g2.gate("NOT", g2.gate(
        "NAND", g2.leaf(na), g2.leaf(nb))))
    assert not graphs_equivalent(g0, g1)
    assert graphs_equivalent(g0, g2)       # ~(a NAND b) == a & b


def test_o2_adder_macro_extraction():
    """Hand-written XOR/AND/OR ripple adder collapses to FULL_ADDER
    blocks (pe_synth optimize_adders analogue) with function intact."""
    src = """
module full_add(input a, input b, input cin, output s, output cout);
  assign s = a ^ b ^ cin;
  assign cout = (a & b) | (cin & (a ^ b));
endmodule
module add8(input [7:0] a, input [7:0] b, output [7:0] s, output cout);
  wire [8:0] c;
  assign c[0] = 1'b0;
  genvar i;
  generate
    for (i = 0; i < 8; i = i + 1) begin : bits
      full_add fa(.a(a[i]), .b(b[i]), .cin(c[i]), .s(s[i]),
                  .cout(c[i+1]));
    end
  endgenerate
  assign cout = c[8];
endmodule
"""
    rng = np.random.default_rng(5)
    vecs = [{"a": int(rng.integers(256)), "b": int(rng.integers(256))}
            for _ in range(20)]
    r2 = crosscheck_opt(src, "add8", vecs, ["s", "cout"],
                        SynthOptions(opt_level=2))
    assert r2.opt_stats.adders_extracted > 0
    assert r2.gate_count <= 10           # 8 FAs (first bit may fold)


def test_o3_espresso_wide_cone():
    """Cones beyond exact-QM reach (>10 inputs) go through the
    espresso-style EXPAND/IRREDUNDANT cover; 4 overlapping 12-bit
    match terms reduce to one cube."""
    src = """
module m(input [11:0] a, output y);
  assign y = (a == 12'h003) | (a == 12'h007) |
             (a == 12'h00B) | (a == 12'h00F);
endmodule
"""
    rng = np.random.default_rng(4)
    vecs = [{"a": v} for v in (3, 7, 0xB, 0xF, 0, 1, 2, 0x13, 0x803)]
    vecs += [{"a": int(rng.integers(1 << 12))} for _ in range(16)]
    r1 = crosscheck_opt(src, "m", vecs, ["y"],
                        SynthOptions(opt_level=1))
    r3 = crosscheck_opt(src, "m", vecs, ["y"],
                        SynthOptions(opt_level=3,
                                     assume_binary_inputs=True))
    assert r3.opt_stats.espresso_rewritten >= 1
    assert r3.gate_count < r1.gate_count // 3


def test_o3_espresso_declines_priority_encoder():
    """Priority logic has exponential two-level forms — the cost guard
    must keep the multi-level structure while staying correct."""
    src = """
module m(input [11:0] a, output [3:0] enc);
  assign enc = a[11] ? 4'd11 : a[10] ? 4'd10 : a[9] ? 4'd9 :
               a[8] ? 4'd8 : a[7] ? 4'd7 : a[6] ? 4'd6 :
               a[5] ? 4'd5 : a[4] ? 4'd4 : a[3] ? 4'd3 :
               a[2] ? 4'd2 : a[1] ? 4'd1 : 4'd0;
endmodule
"""
    rng = np.random.default_rng(2)
    vecs = [{"a": int(rng.integers(1 << 12))} for _ in range(24)]
    vecs += [{"a": 1 << k} for k in range(12)]
    r3 = crosscheck_opt(src, "m", vecs, ["enc"],
                        SynthOptions(opt_level=3,
                                     assume_binary_inputs=True))
    assert r3.gate_count < 60      # stays multi-level, no SOP blowup


def test_o2_mul2_macro_extraction():
    """Hand-written 2x2 multiplier gate web collapses to one MUL2 block
    (pe_synth optimize_mul2 analogue), exhaustively checked."""
    src = """
module m2(input [1:0] a, input [1:0] b, output [3:0] p);
  wire t1 = a[1] & b[0];
  wire t2 = a[0] & b[1];
  wire c1 = t1 & t2;
  wire t3 = a[1] & b[1];
  assign p[0] = a[0] & b[0];
  assign p[1] = t1 ^ t2;
  assign p[2] = t3 ^ c1;
  assign p[3] = t3 & c1;
endmodule
"""
    vecs = [{"a": a, "b": b} for a in range(4) for b in range(4)]
    r2 = crosscheck_opt(src, "m2", vecs, ["p"],
                        SynthOptions(opt_level=2))
    assert r2.opt_stats.mul2_extracted == 1
    assert r2.gate_count == 1


def test_espresso_cover_exactness_random():
    """Property: the espresso cover equals the original function for
    random truth tables (EXPAND/IRREDUNDANT/REDUCE must never change
    the ON-set)."""
    from phy_engine_tpu.verilog.opt_graph import (espresso_cover,
                                                  _var_patterns,
                                                  _cube_cover)
    rng = np.random.default_rng(31)
    for nvars in (4, 6, 9, 12):
        patt, npat, nwords = _var_patterns(nvars)
        ones = np.full(nwords, ~np.uint64(0))
        if npat < 64:
            ones = ones & np.uint64((1 << npat) - 1)
        for density in (0.1, 0.5, 0.9):
            bits = rng.random(npat) < density
            on = np.packbits(bits, bitorder="little")
            on = np.pad(on, (0, nwords * 8 - on.size)).view(np.uint64)
            cubes = espresso_cover(on, nvars)
            assert cubes is not None
            cover = np.zeros(nwords, np.uint64)
            for v, m in cubes:
                cover |= _cube_cover(v, m, nvars, patt, ones)
            assert ((cover & ones) == (on & ones)).all(), (nvars, density)


def test_cut_rewrite_reduces_redundant_cone():
    """The mapping tier (opt_map.cut_rewrite) re-synthesizes a bloated
    4-var cone down to its minimal form, exhaustively verified."""
    src = """
module m(input [3:0] a, output y);
  // y == a[0] & a[1]  written as a wasteful mux-and-redundancy web
  wire t0 = a[0] ? a[1] : 1'b0;
  wire t1 = a[2] ? t0 : t0;
  wire t2 = (t1 & ~a[3]) | (t1 & a[3]);
  assign y = t2;
endmodule
"""
    vectors = [{"a": i} for i in range(16)]
    r3 = crosscheck_opt(src, "m", vectors, ["y"],
                        SynthOptions(opt_level=3,
                                     assume_binary_inputs=True))
    assert r3.gate_count <= 2


def test_sop_rewrite_xz_dc_mining():
    """X-driven minterms become don't-cares under the binary-inputs
    relaxation (infer_dc_from_xz role): a case with X default folds to
    the covering cube."""
    src = """
module m(input [2:0] d, output reg y);
  always @* begin
    case (d)
      3'd0: y = 1'b1; 3'd1: y = 1'b1;
      3'd2: y = 1'b1; 3'd3: y = 1'b1;
      3'd4: y = 1'b0;
      default: y = 1'bx;         // DC-minable
    endcase
  end
endmodule
"""
    # only defined entries are checked (X rows are free)
    vectors = [{"d": i} for i in range(5)]
    r3 = crosscheck_opt(src, "m", vectors, ["y"],
                        SynthOptions(opt_level=3,
                                     assume_binary_inputs=True))
    # with DCs the function is just ~d[2]: one gate
    assert r3.gate_count <= 2


def test_resub_shares_existing_divisor():
    """Resubstitution re-expresses a cone as one gate over existing
    nodes."""
    src = """
module m(input [3:0] a, output [2:0] y);
  assign y[0] = (a[0] | a[1]) & (a[2] | a[3]);
  assign y[1] = a[0] | a[1];
  assign y[2] = a[2] | a[3];
endmodule
"""
    vectors = [{"a": i} for i in range(16)]
    r3 = crosscheck_opt(src, "m", vectors, ["y"],
                        SynthOptions(opt_level=3,
                                     assume_binary_inputs=True))
    # y1/y2 cones exist anyway; y0 should be a single AND over them
    assert r3.gate_count <= 3


def test_pass_report_records_deltas():
    src = """
module m(input [3:0] a, output y);
  assign y = (a[0] & a[1]) | (a[0] & a[2]) | (a[0] & a[3]);
endmodule
"""
    vectors = [{"a": i} for i in range(16)]
    r3 = crosscheck_opt(src, "m", vectors, ["y"],
                        SynthOptions(opt_level=3,
                                     assume_binary_inputs=True))
    names = [p[0] for p in r3.opt_stats.passes]
    assert "rewrite" in names and "qm_deep" in names
    for name, before, after, us in r3.opt_stats.passes:
        assert after <= before or name in ("factor",)
        assert us >= 0


def test_espresso_last_gasp_merges_cubes():
    from phy_engine_tpu.verilog.opt_graph import espresso_cover
    import numpy as np
    # f = minterms {0,1,2,3} over 3 vars = ~v2 (one cube after merging)
    tt = np.array([0b00001111], np.uint64)
    cubes = espresso_cover(tt, 3)
    assert cubes is not None and len(cubes) == 1
    v, mask = cubes[0]
    assert mask == 0b011 and (v & ~mask) == 0


def test_espresso_dc_support():
    from phy_engine_tpu.verilog.opt_graph import espresso_cover
    import numpy as np
    # ON = {3}, DC = {1, 2, 5, 7} over 3 vars: a single 1-literal cube
    on = np.array([0b00001000], np.uint64)
    dc = np.array([0b10100110], np.uint64)
    cubes = espresso_cover(on, 3, dc_words=dc)
    assert cubes is not None and len(cubes) == 1
    v, mask = cubes[0]
    nlits = 3 - bin(mask).count("1")
    assert nlits <= 1


def test_bdd_decompose_structured_cone():
    """Pipeline smoke: the decomposition stage runs at O3 and never
    regresses (acceptance is MFFC-gain gated, so an already-compact
    multi-level cone is correctly left alone)."""
    src = """
module m(input [3:0] b, input [4:0] f, output y);
  wire g = (b[0] & b[1]) | (b[2] & b[3]);
  // flatten the composition so O0 emits one wide 9-var cone
  assign y = (((b[0] & b[1]) | (b[2] & b[3])) & (f[0] ^ f[1] ^ f[2]))
           | (~((b[0] & b[1]) | (b[2] & b[3])) & ((f[3] & f[4]) | f[0]));
endmodule
"""
    import numpy as np
    rng = np.random.default_rng(3)
    vectors = [{"b": int(rng.integers(16)), "f": int(rng.integers(32))}
               for _ in range(40)]
    r3 = crosscheck_opt(src, "m", vectors, ["y"],
                        SynthOptions(opt_level=3,
                                     assume_binary_inputs=True))
    # functional correctness is the crosscheck; the pass must at least
    # run without regressing (acceptance is gain-gated)
    names = [p[0] for p in r3.opt_stats.passes]
    assert "bdd_decomp" in names


def test_bdd_decompose_flat_sop_wins():
    """Direct pass test (decompose_large_functions role): a 10-var
    MAJ5(a) ^ MAJ5(b) presented as a FLAT SOP (the shape machine
    generation produces) must decompose through a 1-bit encoder and
    shrink, while staying exhaustively exact."""
    import numpy as np
    from phy_engine_tpu.verilog.opt_graph import (_Builder, _build_sop,
                                                  _live_gate_count)
    from phy_engine_tpu.verilog.optimize import OptStats
    from phy_engine_tpu.verilog.opt_map import (bdd_decompose,
                                                _cone_tt_words,
                                                _tt_bits)

    def maj5(bits):
        return 1 if sum(bits) >= 3 else 0

    nv = 10
    minterms = []
    for m in range(1 << nv):
        a = [(m >> i) & 1 for i in range(5)]
        b = [(m >> (5 + i)) & 1 for i in range(5)]
        if maj5(a) ^ maj5(b):
            minterms.append(m)

    bld = _Builder(binary_ok=True)

    class _FakeNet:
        pass

    leaves = [bld.leaf(_FakeNet()) for _ in range(nv)]
    # flat single-level SOP: one cube per minterm (machine-flat form)
    root = _build_sop(bld, leaves, [(m, 0) for m in minterms], nv,
                      False)
    out_map = {0: (None, root)}
    before = _live_gate_count(bld, [root])

    stats = OptStats()
    out_map2 = bdd_decompose(bld, out_map, stats)
    root2 = next(iter(out_map2.values()))[1]
    after = _live_gate_count(bld, [root2])
    assert stats.bdd_decomposed >= 1
    assert after < before // 2, (before, after)

    # exhaustive equivalence over all 1024 minterms
    w1, npat = _cone_tt_words(bld, root, leaves)
    w2, _ = _cone_tt_words(bld, root2, leaves)
    np.testing.assert_array_equal(_tt_bits(w1, npat),
                                  _tt_bits(w2, npat))


def test_mul_digit_lowering_o2_bit_exact_and_extracted():
    """At O2+ a behavioral `*` lowers as 2-bit-digit school
    multiplication whose 8-gate webs the MUL2 extraction collapses
    (the reference's own `*` shape, pe_synth.h:1368); the gate netlist
    stays bit-exact vs the behavioral simulator and, on the 8x8
    multiplier, leaves ZERO residual pure-logic gates (the reference's
    own -O3 leaves 24)."""
    src = """
module mul8x8(input [7:0] a, input [7:0] b, output [15:0] p);
  assign p = a * b;
endmodule
"""
    rng = np.random.default_rng(7)
    vecs = [{"a": int(rng.integers(256)), "b": int(rng.integers(256))}
            for _ in range(32)]
    vecs += [{"a": 0, "b": 0}, {"a": 255, "b": 255}, {"a": 1, "b": 255}]
    for lvl, binok in ((2, False), (3, True)):
        r = crosscheck_opt(src, "mul8x8", vecs, ["p"],
                           SynthOptions(opt_level=lvl,
                                        assume_binary_inputs=binok))
        assert r.opt_stats.mul2_extracted >= 16


def test_mul_digit_lowering_mixed_width():
    """Odd/mismatched widths pad with constant digits; wrapping
    semantics (mod 2^w) must match the behavioral engine."""
    src = """
module m(input [4:0] a, input [2:0] b, output [6:0] p);
  assign p = a * b;
endmodule
"""
    rng = np.random.default_rng(11)
    vecs = [{"a": int(rng.integers(32)), "b": int(rng.integers(8))}
            for _ in range(24)]
    for lvl, binok in ((2, False), (3, True)):
        crosscheck_opt(src, "m", vecs, ["p"],
                       SynthOptions(opt_level=lvl,
                                    assume_binary_inputs=binok))


def test_opt_levels_monotone_on_mul():
    """Cross-level QoR monotonicity on the reference logic-gate metric
    (the O2-grade seeding round guarantees O3+ never regresses past
    O2's best)."""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import synthesize_to_netlist
    _LOGIC = ("AND", "OR", "XOR", "XNOR", "NOT", "NAND", "NOR",
              "IMP", "NIMP", "YES")
    src = """
module m(input [7:0] a, input [7:0] b, output [15:0] p);
  assign p = a * b;
endmodule
"""
    counts = []
    for lvl, binok in ((1, False), (2, False), (3, True), (4, True)):
        mods = compile_source(src)
        design = build_design(mods)
        topm = find_module(design, "m")
        inst = elaborate(design, topm)
        nl = pe.Circuit().nl
        pn = {}
        for pname in topm.ports:
            sig = inst.signals[pname]
            nets = [netops.create_node(nl) for _ in range(sig.width)]
            pn[pname] = nets
            if sig.decl.direction == "input":
                for n in nets:
                    mm = netops.add_model(nl, INPUT, {"boolean": 2.0})
                    netops.add_to_node(nl, mm, 0, n)
        synthesize_to_netlist(nl, design, inst, pn,
                              SynthOptions(opt_level=lvl,
                                           assume_binary_inputs=binok))
        counts.append(sum(1 for m in nl.live_models()
                          if m.mdef.digital_op in _LOGIC))
    assert counts[1] <= counts[0]
    assert counts[2] <= counts[1]
    assert counts[3] <= counts[2]
    assert counts[1] == 0          # all 16 MUL2 webs extracted


def test_liveset_matches_full_dfs_count():
    """_LiveSet (the incremental live-gate counter the QM/espresso
    accept loop uses) must agree exactly with the full-DFS
    _live_gate_count on random hash-consed graphs, across root swaps
    with shared cones, duplicate root slots, and undo."""
    import random
    from phy_engine_tpu.verilog.opt_graph import (
        _Builder, _LiveSet, _live_gate_count)

    rng = random.Random(7)
    for trial in range(20):
        bld = _Builder(binary_ok=True)
        leaves = [bld.leaf(object()) for _ in range(6)]
        pool = list(leaves)
        for _ in range(40):
            op = rng.choice(["AND", "OR", "XOR", "NOT"])
            if op == "NOT":
                pool.append(bld.NOT(rng.choice(pool)))
            else:
                a, b = rng.choice(pool), rng.choice(pool)
                pool.append(getattr(bld, op)(a, b))
        roots = [rng.choice(pool) for _ in range(5)]
        if trial % 3 == 0:
            roots.append(roots[0])        # duplicate root slot
        live = _LiveSet(bld, roots)
        assert live.gates == _live_gate_count(bld, roots)
        cur = list(roots)
        for _ in range(15):
            old = rng.choice(cur)
            new = rng.choice(pool)
            # trial cost = all slots holding `old` replaced
            want = _live_gate_count(
                bld, [new if r == old else r for r in cur])
            got = live.swap_cost_all(old, new)
            assert got == want, (trial, old, new, got, want)
            # the probe must not disturb the committed state
            assert live.gates == _live_gate_count(bld, cur)
            if rng.random() < 0.5:
                i = cur.index(old)
                cur[i] = new              # commit ONE slot
                live.swap_one(old, new)
                assert live.gates == _live_gate_count(bld, cur)
