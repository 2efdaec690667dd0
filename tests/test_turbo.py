"""Turbo digital path (digital/turbo.py) vs the levelled engine.

The whole-tick MXU program must be bit-exact with the levelled XLA
engine on every signal, every tick, every stimulus lane — including
X-propagation out of reset and async-reset flip-flop semantics.  The
levelled engine is itself cross-checked against the behavioral Verilog
simulator elsewhere (test_snake / test_riscv), so agreement here chains
the oracle.
"""

import os

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import INPUT
from phy_engine_tpu.verilog import (compile_source, build_design,
                                    elaborate, find_module)
from phy_engine_tpu.verilog.synth import synthesize_to_netlist, SynthOptions

from test_snake import SNAKE_SRC


def _build_snake(opt=1):
    mods = compile_source(SNAKE_SRC)
    design = build_design(mods)
    topm = find_module(design, "snake4")
    inst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    pn = {p: [netops.create_node(nl)
              for _ in range(inst.signals[p].width)]
          for p in topm.ports}
    ins = {}
    for name, width in (("clk", 1), ("rst_n", 1), ("dir", 2)):
        ins[name] = []
        for n in pn[name]:
            m = netops.add_model(nl, INPUT, {"boolean": 0.0})
            netops.add_to_node(nl, m, 0, n)
            ins[name].append(m)
    synthesize_to_netlist(nl, design, inst, pn, SynthOptions(opt_level=opt))
    return c, ins, pn


def _snake_schedule(ins, cycles=24):
    rng = np.random.default_rng(5)
    sched = [{}, {ins["rst_n"][0]: 0}, {ins["rst_n"][0]: 0,
                                        ins["clk"][0]: 1},
             {ins["rst_n"][0]: 1, ins["clk"][0]: 0}]
    for _ in range(cycles):
        d = int(rng.integers(0, 4))
        base = {ins["rst_n"][0]: 1, ins["dir"][0]: d & 1,
                ins["dir"][1]: (d >> 1) & 1}
        hi = dict(base)
        hi[ins["clk"][0]] = 1
        lo = dict(base)
        lo[ins["clk"][0]] = 0
        sched.append(hi)
        sched.append(lo)
    return sched


def _run_mode(mode, build, schedule):
    old = os.environ.get("PE_TPU_DIGITAL")
    os.environ["PE_TPU_DIGITAL"] = mode
    try:
        c, ins, pn = build()
        tr = c.digital_run(schedule(ins))
        return tr
    finally:
        if old is None:
            os.environ.pop("PE_TPU_DIGITAL", None)
        else:
            os.environ["PE_TPU_DIGITAL"] = old


def test_turbo_xla_matches_levels_snake():
    a = _run_mode("levels", _build_snake, _snake_schedule)
    b = _run_mode("turbo_xla", _build_snake, _snake_schedule)
    assert a.sv.shape == b.sv.shape
    np.testing.assert_array_equal(a.sv, b.sv)
    np.testing.assert_array_equal(a.su, b.su)


def test_turbo_eligibility_gate():
    from phy_engine_tpu.digital import turbo
    c, ins, pn = _build_snake()
    c.prepare()
    assert turbo.eligible(c._digital.ir)


def test_turbo_lane_planes_comb():
    """32 independent lanes through a synthesized comb unit."""
    src = """
    module m(input [3:0] a, input [3:0] b, output [4:0] y);
      assign y = a + b;
    endmodule
    """

    def build():
        mods = compile_source(src)
        design = build_design(mods)
        topm = find_module(design, "m")
        inst = elaborate(design, topm)
        c = pe.Circuit()
        nl = c.nl
        pn = {p: [netops.create_node(nl)
                  for _ in range(inst.signals[p].width)]
              for p in topm.ports}
        ins = {"a": [], "b": []}
        for name in ("a", "b"):
            for n in pn[name]:
                m = netops.add_model(nl, INPUT, {"boolean": 0.0})
                netops.add_to_node(nl, m, 0, n)
                ins[name].append(m)
        synthesize_to_netlist(nl, design, inst, pn,
                              SynthOptions(opt_level=1))
        return c, ins, pn

    rng = np.random.default_rng(11)
    va = rng.integers(0, 16, (6, 32))
    vb = rng.integers(0, 16, (6, 32))

    def schedule(ins):
        sched = []
        for t in range(6):
            entry = {}
            for name, vals in (("a", va), ("b", vb)):
                for i, m in enumerate(ins[name]):
                    word = 0
                    for lane in range(32):
                        word |= (int(vals[t, lane]) >> i & 1) << lane
                    entry[m] = (word, 0)
            sched.append(entry)
        return sched

    ta = _run_mode("levels", build, schedule)
    tb = _run_mode("turbo_xla", build, schedule)
    np.testing.assert_array_equal(ta.sv, tb.sv)
    np.testing.assert_array_equal(ta.su, tb.su)
    # and the arithmetic is right on a sampled lane
    c, ins, pn = build()
    os.environ["PE_TPU_DIGITAL"] = "turbo_xla"
    try:
        tr = c.digital_run(schedule(ins))
    finally:
        os.environ.pop("PE_TPU_DIGITAL", None)
    got = tr.bus_values_lanes(pn["y"])
    for lane in (0, 7, 31):
        assert int(got[-1, lane]) == int(va[-1, lane] + vb[-1, lane])


def test_turbo_pallas_interpret_tiny():
    """The Pallas kernel itself, in interpreter mode, on a tiny FSM."""
    src = """
    module t(input clk, input rst_n, input d, output reg [1:0] q);
      always @(posedge clk or negedge rst_n)
        if (!rst_n) q <= 2'b00;
        else q <= {q[0], d ^ q[1]};
    endmodule
    """

    def build():
        mods = compile_source(src)
        design = build_design(mods)
        topm = find_module(design, "t")
        inst = elaborate(design, topm)
        c = pe.Circuit()
        nl = c.nl
        pn = {p: [netops.create_node(nl)
                  for _ in range(inst.signals[p].width)]
              for p in topm.ports}
        ins = {}
        for name in ("clk", "rst_n", "d"):
            m = netops.add_model(nl, INPUT, {"boolean": 0.0})
            netops.add_to_node(nl, m, 0, pn[name][0])
            ins[name] = m
        synthesize_to_netlist(nl, design, inst, pn,
                              SynthOptions(opt_level=1))
        return c, ins, pn

    def schedule(ins):
        sched = [{}, {ins["rst_n"]: 0}, {ins["rst_n"]: 0, ins["clk"]: 1},
                 {ins["rst_n"]: 1, ins["clk"]: 0}]
        bits = [1, 1, 0, 1, 0, 0, 1]
        for b in bits:
            sched.append({ins["rst_n"]: 1, ins["d"]: b, ins["clk"]: 1})
            sched.append({ins["rst_n"]: 1, ins["d"]: b, ins["clk"]: 0})
        return sched

    ref = _run_mode("levels", build, schedule)

    from phy_engine_tpu.digital import turbo
    c, ins, pn = build()
    c.prepare()
    eng = c._digital
    assert turbo.eligible(eng.ir)
    _eng, fs, FV, FU = c._compile_schedule(schedule(ins))
    plan = turbo.TurboPlan(eng.ir, fs)
    state0 = plan.pack_state(np.asarray(eng.sv), np.asarray(eng.su),
                             eng.seq_state)
    hv, hu = turbo.run_pallas(plan, state0, FV, FU, interpret=True)
    v, u = plan.unpack_hist(hv, hu)
    np.testing.assert_array_equal(v[:, :plan.S], ref.sv)
    np.testing.assert_array_equal(u[:, :plan.S], ref.su)
