"""8x8 multiplier workload (test/0025.mul8x8 role, own design).

Two implementations — a structural shift-add array and the behavioral
`*` operator — both synthesized to gates and cross-checked against
each other, the behavioral simulator, and numpy.
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

MUL8_ARRAY_SRC = """
module mul8_array(input [7:0] a, input [7:0] b, output [15:0] p);
  // structural shift-add array: 8 gated partial products in one flat
  // vector, reduced by an adder tree
  wire [127:0] pp;
  genvar i;
  generate
    for (i = 0; i < 8; i = i + 1) begin : g
      assign pp[16*i +: 16] = b[i] ? ({8'd0, a} << i) : 16'd0;
    end
  endgenerate
  wire [15:0] s0 = pp[15:0]   + pp[31:16];
  wire [15:0] s1 = pp[47:32]  + pp[63:48];
  wire [15:0] s2 = pp[79:64]  + pp[95:80];
  wire [15:0] s3 = pp[111:96] + pp[127:112];
  assign p = (s0 + s1) + (s2 + s3);
endmodule
"""

MUL8_BEH_SRC = """
module mul8_beh(input [7:0] a, input [7:0] b, output [15:0] p);
  assign p = a * b;
endmodule
"""


def _build(src, top):
    mods = compile_source(src)
    design = build_design(mods)
    topm = find_module(design, top)
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


def _run_vectors(c, ins, pn, vectors):
    sched = []
    for a, b in vectors:
        entry = {}
        for name, val in (("a", a), ("b", b)):
            for i, m in enumerate(ins[name]):
                entry[m] = (val >> i) & 1
        sched.append(entry)
    tr = c.digital_run(sched)
    return tr.bus_values(pn["p"])


@pytest.mark.parametrize("src,top", [(MUL8_ARRAY_SRC, "mul8_array"),
                                     (MUL8_BEH_SRC, "mul8_beh")])
def test_mul8x8_vs_numpy(src, top):
    c, ins, pn, rep = _build(src, top)
    assert rep.gate_count > 100          # real array, not folded away
    rng = np.random.default_rng(25)
    vecs = [(int(rng.integers(0, 256)), int(rng.integers(0, 256)))
            for _ in range(48)]
    vecs += [(0, 0), (255, 255), (1, 255), (128, 128), (255, 1)]
    got = _run_vectors(c, ins, pn, vecs)
    for (a, b), g in zip(vecs, got):
        assert int(g) == a * b, (top, a, b, int(g))


def test_mul8x8_structural_equals_behavioral():
    """The two netlists must agree on every lane of a packed 32-lane
    random sweep (the reference's CUDA vector-batch check role)."""
    ca, insa, pna, _ = _build(MUL8_ARRAY_SRC, "mul8_array")
    cb, insb, pnb, _ = _build(MUL8_BEH_SRC, "mul8_beh")
    rng = np.random.default_rng(7)
    T = 8
    va = rng.integers(0, 256, (T, 32))
    vb = rng.integers(0, 256, (T, 32))

    def sched_of(ins):
        out = []
        for t in range(T):
            entry = {}
            for name, vals in (("a", va), ("b", vb)):
                for i, m in enumerate(ins[name]):
                    word = 0
                    for lane in range(32):
                        word |= (int(vals[t, lane]) >> i & 1) << lane
                    entry[m] = (word, 0)
            out.append(entry)
        return out

    ta = ca.digital_run(sched_of(insa))
    tb = cb.digital_run(sched_of(insb))
    ga = ta.bus_values_lanes(pna["p"])
    gb = tb.bus_values_lanes(pnb["p"])
    np.testing.assert_array_equal(ga, gb)
    for lane in (0, 13, 31):
        assert int(ga[-1, lane]) == int(va[-1, lane] * vb[-1, lane])
