"""fp16 add/mul units (test/0020.fp16_calc / 0024-0025 analogues).

Own-design combinational IEEE-754 binary16 adder and an 8x8 multiplier,
cross-checked three ways: behavioral simulator vs numpy float16
(authoritative oracle) vs the synthesized gate netlist — the reference's
behavioral-vs-synthesized-vs-expected oracle pattern.
"""

import numpy as np
import pytest

from phy_engine_tpu.verilog import (compile_source, build_design, elaborate,
                                    find_module)
from phy_engine_tpu.verilog.simulate import Runtime, Val, settle
from phy_engine_tpu.verilog.simulate import simulate as bsim

import sys
import os
sys.path.insert(0, os.path.dirname(__file__))
from tests_helpers_synth import crosscheck_opt          # noqa: E402
from phy_engine_tpu.verilog.synth import SynthOptions   # noqa: E402

FP16_ADD_SRC = """
module fp16_add(input [15:0] a, input [15:0] b, output [15:0] y);
  wire sa = a[15];
  wire sb = b[15];
  wire [4:0] ea = a[14:10];
  wire [4:0] eb = b[14:10];
  wire [9:0] fa = a[9:0];
  wire [9:0] fb = b[9:0];

  wire a_nan = (ea == 5'd31) & (fa != 10'd0);
  wire b_nan = (eb == 5'd31) & (fb != 10'd0);
  wire a_inf = (ea == 5'd31) & (fa == 10'd0);
  wire b_inf = (eb == 5'd31) & (fb == 10'd0);

  // effective significand (hidden bit) and exponent
  wire [10:0] siga = (ea == 5'd0) ? {1'b0, fa} : {1'b1, fa};
  wire [10:0] sigb = (eb == 5'd0) ? {1'b0, fb} : {1'b1, fb};
  wire [4:0] eea = (ea == 5'd0) ? 5'd1 : ea;
  wire [4:0] eeb = (eb == 5'd0) ? 5'd1 : eb;

  // order operands by magnitude: (exp, sig)
  wire swap = (eeb > eea) | ((eeb == eea) & (sigb > siga));
  wire [10:0] sh = swap ? sigb : siga;     // high
  wire [10:0] sl = swap ? siga : sigb;     // low
  wire [4:0] eh = swap ? eeb : eea;
  wire [4:0] el = swap ? eea : eeb;
  wire s_h = swap ? sb : sa;
  wire s_l = swap ? sa : sb;

  wire [4:0] diff = eh - el;
  // 3 guard bits; 32-bit staging for sticky collection
  wire [31:0] xh = {21'd0, sh} << 3;
  wire [31:0] xl0 = {21'd0, sl} << 3;
  wire [31:0] xl = xl0 >> diff;
  wire sticky_in = ((xl0 & ~(32'hFFFFFFFF << diff)) != 32'd0);
  wire [31:0] xls = xl | {31'd0, sticky_in};

  wire do_sub = s_h ^ s_l;
  wire [15:0] mag = do_sub ? (xh[15:0] - xls[15:0])
                           : (xh[15:0] + xls[15:0]);

  // leading-zero-adjusted normalization over 15 bits (max value
  // 11111111111111x after add: bit 14 possible carry)
  function [4:0] lzc16;
    input [15:0] v;
    integer i;
    begin
      lzc16 = 5'd16;
      for (i = 0; i < 16; i = i + 1)
        if (v[i]) lzc16 = 5'd15 - i[4:0];
    end
  endfunction

  wire [4:0] lz = lzc16(mag);
  // normalized position: hidden bit should land at bit 13
  // (sig<<3 puts hidden at 13; carry-out shifts to 14)
  wire zero_res = (mag == 16'd0);

  // shift left so the MSB sits at bit 14, exponent adjusts with it
  wire [4:0] msb_pos = 5'd15 - lz;                  // valid if !zero_res
  // target: put MSB at 13 (normal) => eadj = msb_pos - 13
  wire signed [6:0] enew0 = {2'b0, eh} + {3'b0, msb_pos[3:0]} - 7'd13
                            - ((msb_pos > 5'd13) ? 7'd0 : 7'd0);
  // (computed via shifts below)

  // renormalize into [13] with guard/sticky
  wire [4:0] shl = (msb_pos < 5'd13) ? (5'd13 - msb_pos) : 5'd0;
  wire [4:0] shr = (msb_pos > 5'd13) ? (msb_pos - 5'd13) : 5'd0;
  wire [15:0] norm0 = mag << shl;
  wire [15:0] norm1 = norm0 >> shr;
  wire shr_sticky = ((norm0 & ~(16'hFFFF << shr)) != 16'd0);
  wire signed [6:0] etmp = {2'b0, eh} + {2'b0, shr} - {2'b0, shl};

  // subnormal handling: if etmp < 1, shift right extra
  wire signed [6:0] und = 7'sd1 - etmp;
  wire [4:0] extra = (und > 0) ? ((und > 7'sd15) ? 5'd15 : und[4:0])
                               : 5'd0;
  wire [15:0] norm2 = norm1 >> extra;
  wire extra_sticky = ((norm1 & ~(16'hFFFF << extra)) != 16'd0);
  wire signed [6:0] efin = (und > 0) ? 7'sd1 : etmp;

  // round to nearest even: frac = norm2[12:3], G = norm2[2],
  // R = norm2[1], S = norm2[0] | shr_sticky | extra_sticky
  wire g = norm2[2];
  wire r = norm2[1];
  wire s = norm2[0] | shr_sticky | extra_sticky;
  wire round_up = g & (r | s | norm2[3]);
  wire [11:0] rounded = {1'b0, norm2[13:3]} + {11'd0, round_up};
  // carry from rounding renormalizes
  wire rnd_carry = rounded[11];
  wire [9:0] frac_out = rnd_carry ? rounded[10:1] : rounded[9:0];
  wire hidden = rnd_carry ? rounded[11] : rounded[10];
  wire signed [6:0] efin2 = efin + (rnd_carry ? 7'sd1 : 7'sd0);

  // exponent encode: hidden==1 -> normal with exp=efin2;
  // hidden==0 -> subnormal (exp=0)
  wire [4:0] eout = hidden ? efin2[4:0] : 5'd0;
  wire overflow = hidden & (efin2 >= 7'sd31);

  wire sign_out = zero_res ? (sa & sb) : s_h;

  wire [15:0] sum_val =
      zero_res ? {sign_out, 15'd0} :
      overflow ? {s_h, 5'd31, 10'd0} :
      {sign_out, eout, frac_out};

  assign y = (a_nan | b_nan) ? 16'h7E00 :
             (a_inf & b_inf) ? ((sa == sb) ? {sa, 5'd31, 10'd0}
                                           : 16'h7E00) :
             a_inf ? a :
             b_inf ? b :
             sum_val;
endmodule
"""

MUL8_SRC = """
module mul8x8(input [7:0] a, input [7:0] b, output [15:0] p);
  assign p = a * b;
endmodule
"""


def _f16(bits):
    return np.frombuffer(np.uint16(bits).tobytes(), dtype=np.float16)[0]


def _bits(f):
    return int(np.frombuffer(np.float16(f).tobytes(),
                             dtype=np.uint16)[0])


def _ref_add(a_bits, b_bits):
    with np.errstate(all="ignore"):
        r = np.float16(_f16(a_bits)) + np.float16(_f16(b_bits))
    out = _bits(r)
    if np.isnan(np.float16(r)):
        out = 0x7E00
    return out


def _vectors(n=48, seed=3):
    rng = np.random.default_rng(seed)
    vecs = []
    # directed edge cases
    for a, b in [(0x0000, 0x0000), (0x8000, 0x0000), (0x8000, 0x8000),
                 (0x3C00, 0x3C00), (0x3C00, 0xBC00),   # 1 + 1, 1 - 1
                 (0x7C00, 0x3C00), (0x7C00, 0xFC00),   # inf+1, inf-inf
                 (0x7E00, 0x3C00),                     # nan + 1
                 (0x0001, 0x0001), (0x03FF, 0x0001),   # subnormals
                 (0x7BFF, 0x7BFF),                     # max + max -> inf
                 (0x3C00, 0x0001),                     # 1 + denorm_min
                 (0x3C01, 0xBC00)]:                    # cancellation
        vecs.append((a, b))
    while len(vecs) < n + 13:
        a = int(rng.integers(0, 1 << 16))
        b = int(rng.integers(0, 1 << 16))
        vecs.append((a, b))
    return vecs


def test_fp16_add_behavioral_vs_numpy():
    mods = compile_source(FP16_ADD_SRC)
    design = build_design(mods)
    topm = find_module(design, "fp16_add")
    inst = elaborate(design, topm)
    rt = Runtime(inst)
    settle(rt, 0)
    tick = 0
    for a, b in _vectors():
        rt.values["a"] = Val.from_int(a, 16)
        rt.values["b"] = Val.from_int(b, 16)
        tick += 1
        bsim(rt, tick)
        got = rt.values["y"].to_int()
        exp = _ref_add(a, b)
        assert got == exp, (hex(a), hex(b), hex(got), hex(exp))


@pytest.mark.parametrize("opt_level,binary", [(1, False), (3, True)])
def test_fp16_add_synth_crosscheck(opt_level, binary):
    vecs = [{"a": a, "b": b} for a, b in _vectors(24)]
    crosscheck_opt(FP16_ADD_SRC, "fp16_add", vecs, ["y"],
                   SynthOptions(opt_level=opt_level,
                                assume_binary_inputs=binary))


def test_mul8x8_synth():
    rng = np.random.default_rng(9)
    vecs = [{"a": int(rng.integers(256)), "b": int(rng.integers(256))}
            for _ in range(24)]
    vecs += [{"a": 255, "b": 255}, {"a": 0, "b": 7}]
    r = crosscheck_opt(MUL8_SRC, "mul8x8", vecs, ["p"],
                       SynthOptions(opt_level=1))
    assert r.gate_count > 0


FP16_MUL_SRC = """
module fp16_mul(input [15:0] a, input [15:0] b, output [15:0] y);
  wire sa = a[15];
  wire sb = b[15];
  wire [4:0] ea = a[14:10];
  wire [4:0] eb = b[14:10];
  wire [9:0] fa = a[9:0];
  wire [9:0] fb = b[9:0];
  wire sign = sa ^ sb;

  wire a_nan = (ea == 5'd31) & (fa != 10'd0);
  wire b_nan = (eb == 5'd31) & (fb != 10'd0);
  wire a_inf = (ea == 5'd31) & (fa == 10'd0);
  wire b_inf = (eb == 5'd31) & (fb == 10'd0);
  wire a_zero = (ea == 5'd0) & (fa == 10'd0);
  wire b_zero = (eb == 5'd0) & (fb == 10'd0);

  wire [10:0] siga = (ea == 5'd0) ? {1'b0, fa} : {1'b1, fa};
  wire [10:0] sigb = (eb == 5'd0) ? {1'b0, fb} : {1'b1, fb};
  wire signed [7:0] eea = (ea == 5'd0) ? 8'sd1 : {3'b0, ea};
  wire signed [7:0] eeb = (eb == 5'd0) ? 8'sd1 : {3'b0, eb};

  wire [21:0] prod = siga * sigb;          // Q2.20

  // normalize: product MSB at bit 21 (1x.xx * 1x.xx) or lower for
  // subnormal operands; find the leading one
  function [4:0] lzc22;
    input [21:0] v;
    integer i;
    begin
      lzc22 = 5'd31;
      for (i = 0; i < 22; i = i + 1)
        if (v[i]) lzc22 = 5'd21 - i[4:0];
    end
  endfunction
  wire [4:0] lz = lzc22(prod);
  wire prod_zero = (prod == 22'd0);

  // exponent of the product when MSB is at bit 21: eea+eeb-15+1
  wire signed [7:0] etmp0 = eea + eeb - 8'sd15 + 8'sd1 - {3'b0, lz};
  // shift so leading one lands at bit 21
  wire [21:0] norm = prod << lz;

  // subnormal: if etmp0 < 1, right-shift extra
  wire signed [7:0] und = 8'sd1 - etmp0;
  wire [4:0] extra = (und > 0) ? ((und > 8'sd21) ? 5'd21 : und[4:0])
                               : 5'd0;
  wire [21:0] norm2 = norm >> extra;
  wire extra_sticky = ((norm & ~(22'h3FFFFF << extra)) != 22'd0);
  wire signed [7:0] efin = (und > 0) ? 8'sd1 : etmp0;

  // round to nearest even: frac = norm2[20:11], G=norm2[10],
  // S = |norm2[9:0] | extra_sticky
  wire g = norm2[10];
  wire s = (norm2[9:0] != 10'd0) | extra_sticky;
  wire round_up = g & (s | norm2[11]);
  wire [11:0] rounded = {1'b0, norm2[21:11]} + {11'd0, round_up};
  wire rnd_carry = rounded[11];
  wire [9:0] frac_out = rnd_carry ? rounded[10:1] : rounded[9:0];
  wire hidden = rnd_carry ? rounded[11] : rounded[10];
  wire signed [7:0] efin2 = efin + (rnd_carry ? 8'sd1 : 8'sd0);

  wire [4:0] eout = hidden ? efin2[4:0] : 5'd0;
  wire overflow = hidden & (efin2 >= 8'sd31);

  wire [15:0] mul_val =
      prod_zero ? {sign, 15'd0} :
      overflow ? {sign, 5'd31, 10'd0} :
      {sign, eout, frac_out};

  assign y = (a_nan | b_nan) ? 16'h7E00 :
             ((a_inf & b_zero) | (b_inf & a_zero)) ? 16'h7E00 :
             (a_inf | b_inf) ? {sign, 5'd31, 10'd0} :
             mul_val;
endmodule
"""


def _ref_mul(a_bits, b_bits):
    with np.errstate(all="ignore"):
        r = np.float16(_f16(a_bits)) * np.float16(_f16(b_bits))
    out = _bits(r)
    if np.isnan(np.float16(r)):
        out = 0x7E00
    return out


def _mul_vectors(n=40, seed=5):
    rng = np.random.default_rng(seed)
    vecs = [(0x3C00, 0x3C00), (0x4000, 0x3800),   # 1*1, 2*0.5
            (0x0000, 0x7C00), (0x7C00, 0x4000),   # 0*inf, inf*2
            (0x7E00, 0x3C00), (0x8000, 0x4000),   # nan, -0*2
            (0x0001, 0x3C00), (0x0001, 0x6C00),   # denorm scaling
            (0x7BFF, 0x7BFF), (0x03FF, 0x03FF),   # overflow, under
            (0x3C01, 0x3C01)]                     # rounding
    while len(vecs) < n + 11:
        vecs.append((int(rng.integers(1 << 16)),
                     int(rng.integers(1 << 16))))
    return vecs


def test_fp16_mul_behavioral_vs_numpy():
    mods = compile_source(FP16_MUL_SRC)
    design = build_design(mods)
    topm = find_module(design, "fp16_mul")
    inst = elaborate(design, topm)
    rt = Runtime(inst)
    settle(rt, 0)
    tick = 0
    for a, b in _mul_vectors():
        rt.values["a"] = Val.from_int(a, 16)
        rt.values["b"] = Val.from_int(b, 16)
        tick += 1
        bsim(rt, tick)
        got = rt.values["y"].to_int()
        exp = _ref_mul(a, b)
        assert got == exp, (hex(a), hex(b), hex(got), hex(exp))


def test_fp16_mul_synth_crosscheck():
    vecs = [{"a": a, "b": b} for a, b in _mul_vectors(16)]
    crosscheck_opt(FP16_MUL_SRC, "fp16_mul", vecs, ["y"],
                   SynthOptions(opt_level=1))


FP16_DIV_SRC = """
module fp16_div(input [15:0] a, input [15:0] b, output [15:0] y);
  wire sa = a[15];
  wire sb = b[15];
  wire [4:0] ea = a[14:10];
  wire [4:0] eb = b[14:10];
  wire [9:0] fa = a[9:0];
  wire [9:0] fb = b[9:0];
  wire sign = sa ^ sb;

  wire a_nan = (ea == 5'd31) & (fa != 10'd0);
  wire b_nan = (eb == 5'd31) & (fb != 10'd0);
  wire a_inf = (ea == 5'd31) & (fa == 10'd0);
  wire b_inf = (eb == 5'd31) & (fb == 10'd0);
  wire a_zero = (ea == 5'd0) & (fa == 10'd0);
  wire b_zero = (eb == 5'd0) & (fb == 10'd0);

  wire [10:0] siga0 = (ea == 5'd0) ? {1'b0, fa} : {1'b1, fa};
  wire [10:0] sigb0 = (eb == 5'd0) ? {1'b0, fb} : {1'b1, fb};

  // normalize subnormal operands so both significands have the MSB
  // at bit 10 (required for the fixed quotient range)
  function [3:0] lzc11;
    input [10:0] v;
    integer i;
    begin
      lzc11 = 4'd11;
      for (i = 0; i < 11; i = i + 1)
        if (v[i]) lzc11 = 4'd10 - i[3:0];
    end
  endfunction
  wire [3:0] lza = lzc11(siga0);
  wire [3:0] lzb = lzc11(sigb0);
  wire [10:0] siga = siga0 << lza;
  wire [10:0] sigb = sigb0 << lzb;
  wire signed [7:0] eea = ((ea == 5'd0) ? 8'sd1 : {3'b0, ea})
                          - {4'b0, lza};
  wire signed [7:0] eeb = ((eb == 5'd0) ? 8'sd1 : {3'b0, eb})
                          - {4'b0, lzb};

  // restoring division: q = (siga << 13) / sigb, 14-bit quotient plus
  // a sticky flag for the remainder
  function [14:0] divqs;     // {sticky, q[13:0]}
    input [23:0] n;
    input [10:0] d;
    integer i;
    reg [23:0] rem;
    reg [13:0] q;
    begin
      rem = n;
      q = 14'd0;
      for (i = 13; i >= 0; i = i - 1) begin
        if (rem >= ({13'd0, d} << i)) begin
          rem = rem - ({13'd0, d} << i);
          q[i] = 1'b1;
        end
      end
      divqs = {(rem != 24'd0), q};
    end
  endfunction

  wire [14:0] qs = divqs({siga, 13'd0}, sigb);
  wire rem_sticky = qs[14];
  wire [13:0] q = qs[13:0];

  // ratio in (0.5, 2): q in (2^12, 2^14)
  wire signed [7:0] etmp = eea - eeb + 8'sd15 - (q[13] ? 8'sd0 : 8'sd1);
  wire [13:0] qn = q[13] ? q : (q << 1);   // hidden at bit 13

  // subnormal: shift right while etmp < 1
  wire signed [7:0] und = 8'sd1 - etmp;
  wire [3:0] extra = (und > 0) ? ((und > 8'sd13) ? 4'd13 : und[3:0])
                               : 4'd0;
  wire [13:0] qd = qn >> extra;
  wire extra_sticky = ((qn & ~(14'h3FFF << extra)) != 14'd0);
  wire signed [7:0] efin = (und > 0) ? 8'sd1 : etmp;

  // RNE: frac = qd[12:3], G = qd[2], S = qd[1:0] | stickies
  wire g = qd[2];
  wire s = (qd[1:0] != 2'd0) | rem_sticky | extra_sticky;
  wire round_up = g & (s | qd[3]);
  wire [11:0] rounded = {1'b0, qd[13:3]} + {11'd0, round_up};
  wire rnd_carry = rounded[11];
  wire [9:0] frac_out = rnd_carry ? rounded[10:1] : rounded[9:0];
  wire hidden = rnd_carry ? rounded[11] : rounded[10];
  wire signed [7:0] efin2 = efin + (rnd_carry ? 8'sd1 : 8'sd0);

  wire [4:0] eout = hidden ? efin2[4:0] : 5'd0;
  wire overflow = hidden & (efin2 >= 8'sd31);

  wire [15:0] div_val =
      overflow ? {sign, 5'd31, 10'd0} :
      {sign, eout, frac_out};

  assign y = (a_nan | b_nan) ? 16'h7E00 :
             (a_inf & b_inf) ? 16'h7E00 :
             (a_zero & b_zero) ? 16'h7E00 :
             a_inf ? {sign, 5'd31, 10'd0} :
             b_zero ? {sign, 5'd31, 10'd0} :
             (b_inf | a_zero) ? {sign, 15'd0} :
             div_val;
endmodule
"""


def _ref_div(a_bits, b_bits):
    with np.errstate(all="ignore"):
        r = np.float16(_f16(a_bits)) / np.float16(_f16(b_bits))
    out = _bits(r)
    if np.isnan(np.float16(r)):
        out = 0x7E00
    return out


def test_fp16_div_behavioral_vs_numpy():
    mods = compile_source(FP16_DIV_SRC)
    design = build_design(mods)
    topm = find_module(design, "fp16_div")
    inst = elaborate(design, topm)
    rt = Runtime(inst)
    settle(rt, 0)
    rng = np.random.default_rng(17)
    vecs = [(0x3C00, 0x4000), (0x4000, 0x3C00),   # 1/2, 2/1
            (0x3C00, 0x0000), (0x0000, 0x3C00),   # 1/0, 0/1
            (0x0000, 0x0000), (0x7C00, 0x7C00),   # 0/0, inf/inf
            (0x7C00, 0x4000), (0x4000, 0x7C00),   # inf/2, 2/inf
            (0x0001, 0x3C00), (0x3C00, 0x0001),   # denorm each side
            (0x3C00, 0x3C01), (0x7BFF, 0x0400),   # rounding, overflow
            (0x0400, 0x7BFF)]                     # underflow
    vecs += [(int(rng.integers(1 << 16)), int(rng.integers(1 << 16)))
             for _ in range(40)]
    tick = 0
    for a, b in vecs:
        rt.values["a"] = Val.from_int(a, 16)
        rt.values["b"] = Val.from_int(b, 16)
        tick += 1
        bsim(rt, tick)
        got = rt.values["y"].to_int()
        exp = _ref_div(a, b)
        assert got == exp, (hex(a), hex(b), hex(got), hex(exp))


def test_fp16_div_synth_crosscheck():
    vecs = [{"a": a, "b": b} for a, b in
            [(0x3C00, 0x4000), (0x4455, 0x3E00), (0x0001, 0x3C00),
             (0x7BFF, 0x0400), (0xC000, 0x4200), (0x5640, 0x4900)]]
    crosscheck_opt(FP16_DIV_SRC, "fp16_div", vecs, ["y"],
                   SynthOptions(opt_level=1))
