"""fp8 (E4M3) adder workload (test/0023.fp8 role, own design).

A clean-room e4m3 adder in the synthesizable subset, cross-checked
against a bit-level Python model of IEEE-style round-to-nearest-even
addition.  Unlike the reference's fp8 source (only smoke-tested
there), every random vector here is validated against ground truth.
"""

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import INPUT
from phy_engine_tpu.verilog import (compile_source, build_design,
                                    elaborate, find_module)
from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                          SynthOptions)

# E4M3 (no inf; exp=15&frac=7 is NaN per OCP FP8, simplified here to:
# exp 0 = subnormal, NaN canonical 0x7F / 0xFF treated as NaN in/out)
FP8_ADD_SRC = """
module fp8_add(input [7:0] a, input [7:0] b, output [7:0] y);
  wire sa = a[7];  wire [3:0] ea = a[6:3];  wire [2:0] fa = a[2:0];
  wire sb = b[7];  wire [3:0] eb = b[6:3];  wire [2:0] fb = b[2:0];
  wire nan_a = (ea == 4'hF) & (fa == 3'h7);
  wire nan_b = (eb == 4'hF) & (fb == 3'h7);
  wire zero_a = (a[6:0] == 7'd0);
  wire zero_b = (b[6:0] == 7'd0);

  // significand in fixed point: [hidden][frac][3 GRS zeros] = 7 bits,
  // plus 2 headroom bits at top -> 9 bits
  wire [8:0] ma = {2'b00, (ea != 0) ? 1'b1 : 1'b0, fa, 3'b000};
  wire [8:0] mb = {2'b00, (eb != 0) ? 1'b1 : 1'b0, fb, 3'b000};
  // unbiased-ish exponent with subnormals at exp=1
  wire [4:0] eua = (ea == 0) ? 5'd1 : {1'b0, ea};
  wire [4:0] eub = (eb == 0) ? 5'd1 : {1'b0, eb};

  // order by magnitude (exp, then mantissa)
  wire a_big = (eua > eub) | ((eua == eub) & (ma >= mb));
  wire [4:0] e_big = a_big ? eua : eub;
  wire [4:0] e_sml = a_big ? eub : eua;
  wire s_big = a_big ? sa : sb;
  wire s_sml = a_big ? sb : sa;
  wire [8:0] m_big = a_big ? ma : mb;
  wire [8:0] m_sml0 = a_big ? mb : ma;

  // align with sticky
  wire [4:0] diff = e_big - e_sml;
  wire [8:0] shifted = (diff >= 5'd9) ? 9'd0 : (m_sml0 >> diff);
  wire sticky_lost = (diff >= 5'd9) ? (m_sml0 != 0)
                   : ((m_sml0 & ~(9'h1FF << diff)) != 0);
  wire [8:0] m_sml = {shifted[8:1], shifted[0] | sticky_lost};

  // add / subtract magnitudes
  wire sub = s_big ^ s_sml;
  wire [8:0] msum = sub ? (m_big - m_sml) : (m_big + m_sml);

  // normalize: priority shift so bit 6 holds the hidden bit
  // (post-carry bit 7 means shift right once)
  wire [4:0] e1 = msum[7] ? (e_big + 5'd1) : e_big;
  wire [8:0] m1 = msum[7] ? {1'b0, msum[8:1]} | {8'd0, msum[0]} : msum;

  // leading-one left shifts (bounded by 7)
  wire [2:0] lz =
      m1[6] ? 3'd0 : m1[5] ? 3'd1 : m1[4] ? 3'd2 : m1[3] ? 3'd3 :
      m1[2] ? 3'd4 : m1[1] ? 3'd5 : m1[0] ? 3'd6 : 3'd7;
  wire [4:0] shl = ((e1 - 5'd1) < {2'b0, lz}) ? (e1 - 5'd1)
                                              : {2'b0, lz};
  wire [8:0] m2 = m1 << shl;
  wire [4:0] e2 = e1 - shl;

  // round to nearest even on the 3 GRS bits
  wire guard = m2[2];
  wire rnd_s = m2[1] | m2[0];
  wire [5:0] kept = {1'b0, m2[7:3]};
  wire inc = guard & (rnd_s | kept[0]);
  wire [5:0] r = kept + {5'd0, inc};
  wire [4:0] e3 = r[4] ? (e2 + 5'd1) : e2;
  wire [3:0] f3 = r[4] ? r[3:1] | {2'b0, r[0]} : r[2:0];

  // classify result
  wire zero_res = (msum == 9'd0);
  wire subn = (e3 == 5'd1) & ~(r[4] ? r[3] : r[3]);
  wire ovf = (e3 >= 5'd15);

  wire [7:0] mag = zero_res ? 8'd0
                 : ovf ? {1'b0, 4'hF, 3'h6}            // clamp to max
                 : (~r[3] & ~r[4]) ? {1'b0, 4'h0, f3[2:0]}  // subnormal
                 : {1'b0, e3[3:0], f3[2:0]};
  wire s_res = zero_res ? (sa & sb) : s_big;

  assign y = (nan_a | nan_b) ? 8'h7F
           : zero_a ? b
           : zero_b ? a
           : {s_res, mag[6:0]};
endmodule
"""


def ref_fp8_decode(x):
    s = (x >> 7) & 1
    e = (x >> 3) & 0xF
    f = x & 7
    if e == 15 and f == 7:
        return float("nan")
    if e == 0:
        v = f / 8.0 * 2.0 ** (1 - 7)
    else:
        v = (1 + f / 8.0) * 2.0 ** (e - 7)
    return -v if s else v


def ref_fp8_add(a, b):
    """Ground-truth e4m3 addition with RNE, overflow clamped to the
    max finite magnitude (matching the adder's saturating policy)."""
    if (a & 0x7F) == 0x7F or (b & 0x7F) == 0x7F:
        return 0x7F
    if (a & 0x7F) == 0:
        return b
    if (b & 0x7F) == 0:
        return a
    va = ref_fp8_decode(a)
    vb = ref_fp8_decode(b)
    v = va + vb
    if v == 0:
        return 0x80 if ((a >> 7) & (b >> 7)) else 0x00
    s = 1 if v < 0 else 0
    m = abs(v)
    # scale into e4m3: find exponent
    import math
    e = max(1, min(15, math.floor(math.log2(m)) + 7))
    # RNE quantization at this exponent's LSB
    for _ in range(3):
        lsb = 2.0 ** (e - 7 - 3)
        q = m / lsb
        qi = math.floor(q)
        rem = q - qi
        if rem > 0.5 or (rem == 0.5 and (qi & 1)):
            qi += 1
        if qi >= 16:
            e += 1
            continue
        break
    if e >= 15:
        return (s << 7) | 0x7E        # clamp to max finite
    if qi >= 8:
        return (s << 7) | ((e & 0xF) << 3) | (qi - 8)
    # subnormal (e must be 1)
    if e == 1:
        return (s << 7) | qi
    return (s << 7) | ((e & 0xF) << 3)


def test_fp8_reference_model_sanity():
    # 1.0 = 0x38 (e=7, f=0); 1.0+1.0 = 2.0 = 0x40
    assert ref_fp8_add(0x38, 0x38) == 0x40
    # x + 0 = x
    assert ref_fp8_add(0x42, 0) == 0x42
    # NaN propagates
    assert ref_fp8_add(0x7F, 0x38) == 0x7F


def _build():
    mods = compile_source(FP8_ADD_SRC)
    design = build_design(mods)
    topm = find_module(design, "fp8_add")
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
    rep = synthesize_to_netlist(nl, design, inst, pn,
                                SynthOptions(opt_level=1))
    return c, ins, pn, rep


def test_fp8_add_gate_level_vs_ground_truth():
    c, ins, pn, rep = _build()
    assert rep.gate_count > 200
    rng = np.random.default_rng(8)
    vecs = [(int(rng.integers(0, 256)), int(rng.integers(0, 256)))
            for _ in range(96)]
    vecs += [(0x38, 0x38), (0x7F, 0x01), (0x00, 0x42), (0x42, 0xC2),
             (0x01, 0x01), (0x7E, 0x7E), (0x80, 0x00)]
    sched = []
    for a, b in vecs:
        entry = {}
        for name, val in (("a", a), ("b", b)):
            for i, m in enumerate(ins[name]):
                entry[m] = (val >> i) & 1
        sched.append(entry)
    tr = c.digital_run(sched)
    got = tr.bus_values(pn["y"])
    bad = []
    for (a, b), g in zip(vecs, got):
        exp = ref_fp8_add(a, b)
        if int(g) != exp:
            # tolerate one-ULP rounding-path differences nowhere:
            bad.append((hex(a), hex(b), hex(int(g)), hex(exp)))
    assert not bad, bad[:8]
