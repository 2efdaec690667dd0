"""Synthesis tests (test/0015.verilog_compile analogues).

Cross-check pattern from the reference (0020.fp16_calc): the behavioral
simulator and the synthesized gate netlist must agree on the same input
vectors — behavioral-vs-lowered is the oracle.
"""

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.digital.logic import L, H, X, Z
from phy_engine_tpu.models import INPUT, OUTPUT
from phy_engine_tpu.verilog import (compile_source, build_design, elaborate,
                                    find_module, simulate, settle, Runtime,
                                    Val)
from phy_engine_tpu.verilog.synth import synthesize_to_netlist, SynthOptions


def synth_harness(src, top=None, params=None):
    """Compile+elaborate+synthesize; attach INPUT/OUTPUT devices to the
    top ports.  Returns (circuit, inputs{name:[INPUT models]},
    outputs{name:[nodes]}, behavioral_runtime)."""
    mods = compile_source(src)
    design = build_design(mods)
    topm = find_module(design, top) if top else mods[-1]
    inst = elaborate(design, topm, params)

    c = pe.Circuit()
    nl = c.nl
    port_nets = {}
    in_models = {}
    out_nodes = {}
    for pname in topm.ports:
        sig = inst.signals[pname]
        nets = [netops.create_node(nl) for _ in range(sig.width)]
        port_nets[pname] = nets
        if sig.decl.direction == "input":
            models = []
            for n in nets:
                m = netops.add_model(nl, INPUT, {"boolean": float(X)})
                netops.add_to_node(nl, m, 0, n)
                models.append(m)
            in_models[pname] = models
        else:
            out_nodes[pname] = nets
    report = synthesize_to_netlist(nl, design, inst, port_nets)

    rt = Runtime(inst)
    settle(rt, 0)
    return c, in_models, out_nodes, rt, report


def set_input(c, in_models, name, value, width=None):
    models = in_models[name]
    for i, m in enumerate(models):
        bit = (value >> i) & 1
        m.set_attribute("boolean", float(bit))


def read_output(c, out_nodes, name):
    val = 0
    for i, n in enumerate(out_nodes[name]):
        code = c.node_digital(n)
        assert code in (0, 1), f"output bit {name}[{i}] is {code}"
        val |= code << i
    return val


def crosscheck(src, top, vectors, out_names, ticks_per_vector=1):
    """Apply vectors to both engines; compare outputs."""
    c, ins, outs, rt, report = synth_harness(src, top)
    from phy_engine_tpu.verilog.simulate import simulate as bsim
    tick = [0]

    def apply(vec):
        for name, value in vec.items():
            set_input(c, ins, name, value)
            rt.values[name] = Val.from_int(
                value, rt.values[name].width)
        for _ in range(ticks_per_vector):
            c.digital_clk()
            tick[0] += 1
            bsim(rt, tick[0])
        for oname in out_names:
            got = read_output(c, outs, oname)
            expect = rt.values[oname].to_int()
            assert got == expect, (vec, oname, got, expect)

    for vec in vectors:
        apply(vec)
    return report


def test_synth_comb_ops():
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
    rng = np.random.default_rng(7)
    vectors = [{"a": int(rng.integers(16)), "b": int(rng.integers(16)),
                "op": int(rng.integers(4))} for _ in range(24)]
    crosscheck(src, "alu", vectors, ["y"])


def test_synth_compare_shift():
    src = """
module cmp(input [3:0] a, input [3:0] b, output lt, output ge,
           output [3:0] shl, output [3:0] shr);
  assign lt = a < b;
  assign ge = a >= b;
  assign shl = a << b[1:0];
  assign shr = a >> b[1:0];
endmodule
"""
    rng = np.random.default_rng(9)
    vectors = [{"a": int(rng.integers(16)), "b": int(rng.integers(16))}
               for _ in range(20)]
    crosscheck(src, "cmp", vectors, ["lt", "ge", "shl", "shr"])


def test_synth_counter_ff():
    src = """
module counter(input clk, input rst_n, input en, output reg [3:0] q);
  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) q <= 4'd0;
    else if (en) q <= q + 4'd1;
  end
endmodule
"""
    c, ins, outs, rt, report = synth_harness(src, "counter")
    assert report.ff_count == 4
    from phy_engine_tpu.verilog.simulate import simulate as bsim
    tick = [0]

    def step(clk, rst_n, en):
        set_input(c, ins, "clk", clk)
        set_input(c, ins, "rst_n", rst_n)
        set_input(c, ins, "en", en)
        rt.values["clk"] = Val.from_int(clk, 1)
        rt.values["rst_n"] = Val.from_int(rst_n, 1)
        rt.values["en"] = Val.from_int(en, 1)
        c.digital_clk()
        tick[0] += 1
        bsim(rt, tick[0])
        got = read_output(c, outs, "q")
        expect = rt.values["q"].to_int()
        assert got == expect, (tick[0], got, expect)
        return got

    step(0, 0, 0)        # reset low
    assert step(1, 0, 0) == 0
    step(0, 1, 1)
    for k in range(1, 8):
        assert step(1, 1, 1) == k
        step(0, 1, 1)
    # hold with en=0
    v = step(1, 1, 0)
    assert v == 7


def test_synth_hierarchy_generate():
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
    rng = np.random.default_rng(3)
    vectors = [{"a": int(rng.integers(256)), "b": int(rng.integers(256))}
               for _ in range(16)]
    crosscheck(src, "add8", vectors, ["s", "cout"])


def test_synth_function_and_mux():
    src = """
module m(input [7:0] a, input [7:0] b, input sel, output [7:0] y);
  function [7:0] pick(input [7:0] x, input [7:0] z, input s);
    begin
      if (s) pick = x;
      else pick = z;
    end
  endfunction
  assign y = pick(a, b, sel);
endmodule
"""
    vectors = [{"a": 0x5A, "b": 0xC3, "sel": 1},
               {"a": 0x5A, "b": 0xC3, "sel": 0},
               {"a": 0xFF, "b": 0x00, "sel": 1}]
    crosscheck(src, "m", vectors, ["y"])


def test_synth_mul():
    src = """
module mul4(input [3:0] a, input [3:0] b, output [7:0] p);
  assign p = a * b;
endmodule
"""
    vectors = [{"a": a, "b": b} for a in (0, 3, 7, 15)
               for b in (0, 1, 5, 15)]
    crosscheck(src, "mul4", vectors, ["p"])


def test_synth_latch_feedback():
    """Incomplete always_comb assignment becomes a latch (feedback loop
    in the gate netlist, settled by the fixpoint group)."""
    src = """
module lat(input en, input [3:0] d, output reg [3:0] q);
  always @* if (en) q = d;
endmodule
"""
    c, ins, outs, rt, report = synth_harness(src, "lat")
    set_input(c, ins, "en", 1)
    set_input(c, ins, "d", 9)
    c.digital_clk()
    assert read_output(c, outs, "q") == 9
    set_input(c, ins, "en", 0)
    set_input(c, ins, "d", 3)
    c.digital_clk()
    assert read_output(c, outs, "q") == 9    # held


def test_synth_memory_array():
    """Memories lower to FF words with demux writes and mux-tree reads
    (register-file pattern)."""
    src = """
module regfile(input clk, input we, input [1:0] waddr,
               input [7:0] wdata, input [1:0] raddr,
               output [7:0] rdata);
  reg [7:0] store [3:0];
  always @(posedge clk) if (we) store[waddr] <= wdata;
  assign rdata = store[raddr];
endmodule
"""
    c, ins, outs, rt, report = synth_harness(src, "regfile")
    assert report.ff_count == 32
    vals = {0: 0x11, 1: 0x22, 2: 0x33, 3: 0x44}

    def clock():
        set_input(c, ins, "clk", 1)
        c.digital_clk()
        set_input(c, ins, "clk", 0)
        c.digital_clk()

    set_input(c, ins, "clk", 0)
    set_input(c, ins, "we", 1)
    c.digital_clk()              # settle: clock history must see L first
    for addr, v in vals.items():
        set_input(c, ins, "waddr", addr)
        set_input(c, ins, "wdata", v)
        clock()
    set_input(c, ins, "we", 0)
    for addr, v in vals.items():
        set_input(c, ins, "raddr", addr)
        c.digital_clk()
        assert read_output(c, outs, "rdata") == v, addr
    # unchanged under further clocks with we=0
    set_input(c, ins, "wdata", 0xEE)
    clock()
    set_input(c, ins, "raddr", 2)
    c.digital_clk()
    assert read_output(c, outs, "rdata") == 0x33


def test_synth_tristate_bus():
    """Two tri-state drivers on a shared bus: 1'bz conditional assigns
    lower to TRI_STATE gates + a RESOLVE2 chain (pe_synth
    resolve_multi_driver_digital_nets analogue)."""
    src = """
module bus2(input [3:0] d0, input [3:0] d1, input en0, input en1,
            output [3:0] y);
  assign y = en0 ? d0 : 4'bzzzz;
  assign y = en1 ? d1 : 4'bzzzz;
endmodule
"""
    c, ins, outs, rt, report = synth_harness(src, "bus2")
    from phy_engine_tpu.verilog.simulate import Val, simulate as bsim
    tick = [0]

    def drive(d0, d1, en0, en1):
        for nm, v, w in (("d0", d0, 4), ("d1", d1, 4),
                         ("en0", en0, 1), ("en1", en1, 1)):
            set_input(c, ins, nm, v)
            rt.values[nm] = Val.from_int(v, w)
        c.digital_clk()
        tick[0] += 1
        bsim(rt, tick[0])

    def read_codes():
        return [c.node_digital(n) for n in outs["y"]]

    drive(0xA, 0x5, 1, 0)
    assert read_output(c, outs, "y") == 0xA
    assert rt.values["y"].to_int() == 0xA
    drive(0xA, 0x5, 0, 1)
    assert read_output(c, outs, "y") == 0x5
    drive(0xA, 0x5, 0, 0)            # nobody drives: Z
    assert all(code == 3 for code in read_codes())
    drive(0xA, 0x5, 1, 1)            # conflict on differing bits: X
    codes = read_codes()
    # 0xA vs 0x5 differ in every bit -> all X
    assert all(code == 2 for code in codes), codes


def test_dynamic_loop_truncation_warns():
    """A data-bounded while beyond dyn_loop_unroll surfaces a warning
    (trips past the bound would be silently dropped otherwise)."""
    src = """
module dynloop(input [7:0] a, output reg [7:0] y);
  reg [7:0] t; integer i;
  always @* begin
    t = 0; i = 0;
    while (i < a) begin t = t + 1; i = i + 1; end
    y = t;
  end
endmodule
"""
    _c, _i, _o, _rt, report = synth_harness(src, "dynloop")
    assert any("dynamic loop" in w for w in report.warnings), \
        report.warnings


def test_static_loop_does_not_warn():
    """A constant-bounded while folds completely: no warning."""
    src = """
module statloop(input [7:0] a, output reg [7:0] y);
  reg [7:0] t; integer i;
  always @* begin
    t = a; i = 0;
    while (i < 5) begin t = t + 1; i = i + 1; end
    y = t;
  end
endmodule
"""
    c, ins, outs, _rt, report = synth_harness(src, "statloop")
    assert not any("dynamic loop" in w for w in report.warnings), \
        report.warnings
    set_input(c, ins, "a", 7)
    c.digital_clk()
    assert read_output(c, outs, "y") == 12
