"""Verilog front-end tests (test/0007.verilog analogues).

Each test compiles+elaborates a small design and drives the behavioral
simulator tick by tick.
"""

import numpy as np
import pytest

from phy_engine_tpu.verilog import (compile_source, build_design, elaborate,
                                    find_module, simulate, settle, Runtime,
                                    Val)
from phy_engine_tpu.verilog.preprocess import preprocess, PreprocessOptions


def boot(src, top=None, params=None):
    mods = compile_source(src)
    design = build_design(mods)
    topm = find_module(design, top) if top else mods[-1]
    inst = elaborate(design, topm, params)
    rt = Runtime(inst)
    settle(rt, 0)
    return rt


def setv(rt, name, value, width=None):
    cur = rt.values[name]
    w = width or cur.width
    rt.values[name] = Val.from_int(value, w)


def getv(rt, name):
    return rt.values[name]


def test_preprocessor_define_ifdef():
    src = """
`define WIDTH 8
`define DOUBLE(x) ((x)*2)
`ifdef WIDTH
module m; wire [`WIDTH-1:0] a; wire [`DOUBLE(4)-1:0] b; endmodule
`else
garbage that would not parse
`endif
"""
    rt = boot(src)
    assert rt.inst.signals["a"].width == 8
    assert rt.inst.signals["b"].width == 8


def test_include_resolver():
    src = '`include "defs.vh"\nmodule m; wire [W-1:0] a; endmodule\n'
    mods = compile_source.__wrapped__ if False else None
    from phy_engine_tpu.verilog.parser import compile_source as cs
    opts = PreprocessOptions(include_resolver=lambda name: (
        "`define W_DEF\nlocalparam W = 4;\n" if name == "defs.vh" else None))
    # include at module scope is unusual; test resolver via define file
    src2 = '`include "w.vh"\nmodule m; wire [`W-1:0] a; endmodule\n'
    opts2 = PreprocessOptions(include_resolver=lambda name: (
        "`define W 6\n" if name == "w.vh" else None))
    mods = cs(src2, opts2)
    design = build_design(mods)
    inst = elaborate(design, mods[0])
    assert inst.signals["a"].width == 6


def test_continuous_assign_ops():
    src = """
module m(input [7:0] a, input [7:0] b, output [7:0] o_and,
         output [7:0] o_plus, output [8:0] o_sum9, output o_red,
         output [7:0] o_mux, output [15:0] o_cat);
  assign o_and = a & b;
  assign o_plus = a + b;
  assign o_sum9 = a + b;            // context-widened carry
  assign o_red = ^a;
  assign o_mux = (a > b) ? a : b;
  assign o_cat = {a, b};
endmodule
"""
    rt = boot(src)
    setv(rt, "a", 0xF0)
    setv(rt, "b", 0x33)
    simulate(rt, 1)
    assert getv(rt, "o_and").to_int() == 0x30
    assert getv(rt, "o_plus").to_int() == (0xF0 + 0x33) & 0xFF
    assert getv(rt, "o_sum9").to_int() == 0xF0 + 0x33
    assert getv(rt, "o_red").to_int() == 0     # 0xF0 has 4 ones
    assert getv(rt, "o_mux").to_int() == 0xF0
    assert getv(rt, "o_cat").to_int() == 0xF033


def test_counter_with_reset():
    src = """
module counter(input clk, input rst_n, output reg [3:0] q);
  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) q <= 4'd0;
    else q <= q + 4'd1;
  end
endmodule
"""
    rt = boot(src)
    setv(rt, "rst_n", 0, 1)
    setv(rt, "clk", 0, 1)
    simulate(rt, 1)
    assert getv(rt, "q").to_int() == 0
    setv(rt, "rst_n", 1, 1)
    simulate(rt, 2)
    for k in range(1, 5):
        setv(rt, "clk", 1, 1)
        simulate(rt, 2 * k + 1)
        assert getv(rt, "q").to_int() == k
        setv(rt, "clk", 0, 1)
        simulate(rt, 2 * k + 2)


def test_nba_swap():
    """Nonblocking swap executes with old values (NBA ordering)."""
    src = """
module swap(input clk, output reg [7:0] x, output reg [7:0] y);
  initial begin x = 8'd1; y = 8'd2; end
  always @(posedge clk) begin
    x <= y;
    y <= x;
  end
endmodule
"""
    rt = boot(src)
    setv(rt, "clk", 0, 1)
    simulate(rt, 1)
    assert getv(rt, "x").to_int() == 1
    setv(rt, "clk", 1, 1)
    simulate(rt, 2)
    assert getv(rt, "x").to_int() == 2
    assert getv(rt, "y").to_int() == 1


def test_case_statement_fsm():
    src = """
module fsm(input clk, input rst, input go, output reg [1:0] state);
  localparam IDLE = 2'd0, RUN = 2'd1, DONE = 2'd2;
  always @(posedge clk) begin
    if (rst) state <= IDLE;
    else case (state)
      IDLE: if (go) state <= RUN;
      RUN:  state <= DONE;
      DONE: state <= IDLE;
      default: state <= IDLE;
    endcase
  end
endmodule
"""
    rt = boot(src)

    def clock(t):
        setv(rt, "clk", 1, 1)
        simulate(rt, t)
        setv(rt, "clk", 0, 1)
        simulate(rt, t + 1)

    setv(rt, "rst", 1, 1)
    setv(rt, "go", 0, 1)
    setv(rt, "clk", 0, 1)
    simulate(rt, 1)
    clock(2)
    assert getv(rt, "state").to_int() == 0
    setv(rt, "rst", 0, 1)
    setv(rt, "go", 1, 1)
    clock(4)
    assert getv(rt, "state").to_int() == 1
    clock(6)
    assert getv(rt, "state").to_int() == 2
    clock(8)
    assert getv(rt, "state").to_int() == 0


def test_function_call():
    src = """
module m(input [7:0] a, output [7:0] o);
  function [7:0] double_plus1(input [7:0] x);
    begin
      double_plus1 = (x << 1) + 8'd1;
    end
  endfunction
  assign o = double_plus1(a);
endmodule
"""
    rt = boot(src)
    setv(rt, "a", 5)
    simulate(rt, 1)
    assert getv(rt, "o").to_int() == 11


def test_instance_hierarchy_adder():
    src = """
module full_add(input a, input b, input cin, output s, output cout);
  assign s = a ^ b ^ cin;
  assign cout = (a & b) | (cin & (a ^ b));
endmodule

module add4(input [3:0] a, input [3:0] b, output [3:0] s, output cout);
  wire [4:0] c;
  assign c[0] = 1'b0;
  genvar i;
  generate
    for (i = 0; i < 4; i = i + 1) begin : bit
      full_add fa(.a(a[i]), .b(b[i]), .cin(c[i]), .s(s[i]),
                  .cout(c[i+1]));
    end
  endgenerate
  assign cout = c[4];
endmodule
"""
    rt = boot(src, top="add4")
    for av, bv in [(3, 5), (15, 1), (9, 9), (0, 0)]:
        setv(rt, "a", av)
        setv(rt, "b", bv)
        simulate(rt, 1)
        total = av + bv
        assert getv(rt, "s").to_int() == total & 0xF, (av, bv)
        assert getv(rt, "cout").to_int() == (total >> 4) & 1


def test_parameter_override():
    src = """
module reg_n #(parameter N = 4) (input clk, input [N-1:0] d,
                                 output reg [N-1:0] q);
  always @(posedge clk) q <= d;
endmodule

module top(input clk, input [7:0] d, output [7:0] q);
  reg_n #(.N(8)) r(.clk(clk), .d(d), .q(q));
endmodule
"""
    rt = boot(src, top="top")
    assert rt.children[0].values["q"].width == 8
    setv(rt, "d", 0xAB)
    setv(rt, "clk", 0, 1)
    simulate(rt, 1)
    setv(rt, "clk", 1, 1)
    simulate(rt, 2)
    assert getv(rt, "q").to_int() == 0xAB


def test_memory_array():
    src = """
module mem(input clk, input we, input [1:0] waddr, input [7:0] wdata,
           input [1:0] raddr, output [7:0] rdata);
  reg [7:0] store [3:0];
  always @(posedge clk) if (we) store[waddr] <= wdata;
  assign rdata = store[raddr];
endmodule
"""
    rt = boot(src)
    setv(rt, "clk", 0, 1)
    setv(rt, "we", 1, 1)
    for addr, val in [(0, 0x11), (1, 0x22), (3, 0x44)]:
        setv(rt, "waddr", addr, 2)
        setv(rt, "wdata", val, 8)
        setv(rt, "clk", 1, 1)
        simulate(rt, 2 * addr + 1)
        setv(rt, "clk", 0, 1)
        simulate(rt, 2 * addr + 2)
    setv(rt, "we", 0, 1)
    for addr, val in [(0, 0x11), (1, 0x22), (3, 0x44)]:
        setv(rt, "raddr", addr, 2)
        simulate(rt, 100 + addr)
        assert getv(rt, "rdata").to_int() == val


def test_x_propagation():
    src = """
module m(input [3:0] a, output [3:0] o_arith, output o_eq,
         output o_caseeq);
  assign o_arith = a + 4'd1;
  assign o_eq = (a == 4'b1xzx) ? 1'b1 : 1'b0;
  assign o_caseeq = (a === 4'b1010);
endmodule
"""
    rt = boot(src)
    rt.values["a"] = Val.all_x(4)
    simulate(rt, 1)
    assert not getv(rt, "o_arith").known        # X in -> all X
    setv(rt, "a", 0b1010)
    simulate(rt, 2)
    assert getv(rt, "o_caseeq").to_int() == 1


def test_casez_wildcards():
    src = """
module m(input [3:0] a, output reg [1:0] o);
  always @* begin
    casez (a)
      4'b1???: o = 2'd3;
      4'b01??: o = 2'd2;
      4'b001?: o = 2'd1;
      default: o = 2'd0;
    endcase
  end
endmodule
"""
    rt = boot(src)
    for val, expect in [(0b1000, 3), (0b0110, 2), (0b0010, 1), (0b0001, 0)]:
        setv(rt, "a", val)
        simulate(rt, 1)
        assert getv(rt, "o").to_int() == expect, val


def test_initial_with_delay():
    src = """
module m(output reg [3:0] q);
  initial begin
    q = 4'd1;
    #2 q = 4'd2;
    #3 q = 4'd7;
  end
endmodule
"""
    rt = boot(src)
    assert getv(rt, "q").to_int() == 1
    simulate(rt, 1)
    assert getv(rt, "q").to_int() == 1
    simulate(rt, 2)
    assert getv(rt, "q").to_int() == 2
    simulate(rt, 3)
    simulate(rt, 4)
    simulate(rt, 5)
    assert getv(rt, "q").to_int() == 7


def test_clog2_and_bits():
    src = """
module m #(parameter DEPTH = 10)
          (output [31:0] w1, output [31:0] w2);
  localparam AW = $clog2(DEPTH);
  wire [AW-1:0] addr;
  assign w1 = AW;
  assign w2 = $bits(addr);
endmodule
"""
    rt = boot(src)
    simulate(rt, 1)
    assert getv(rt, "w1").to_int() == 4
    assert getv(rt, "w2").to_int() == 4


def test_shift_and_signed():
    src = """
module m(input signed [7:0] a, output signed [7:0] sar,
         output [7:0] slr);
  assign sar = a >>> 2;
  assign slr = a >> 2;
endmodule
"""
    rt = boot(src)
    rt.values["a"] = Val.from_int(0x80, 8, True)   # -128
    simulate(rt, 1)
    assert getv(rt, "sar").to_int() == 0xE0        # sign-filled
    assert getv(rt, "slr").to_int() == 0x20


def test_task_call():
    src = """
module m(input [7:0] a, input [7:0] b, output reg [7:0] lo,
         output reg [7:0] hi);
  task order(input [7:0] x, input [7:0] y, output [7:0] mn,
             output [7:0] mx);
    begin
      if (x < y) begin mn = x; mx = y; end
      else begin mn = y; mx = x; end
    end
  endtask
  always @* order(a, b, lo, hi);
endmodule
"""
    rt = boot(src)
    setv(rt, "a", 9)
    setv(rt, "b", 4)
    simulate(rt, 1)
    assert getv(rt, "lo").to_int() == 4
    assert getv(rt, "hi").to_int() == 9
