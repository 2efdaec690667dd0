"""Native host sweep engine (digital/native_run.py + pe_digital.cpp)
vs the levelled XLA engine: bit-exact on every signal/tick/lane,
including X-propagation out of reset and async-reset FF semantics.
"""

import numpy as np
import pytest

from phy_engine_tpu.digital import native_run

from test_turbo import (_build_snake, _snake_schedule, _run_mode)

pytestmark = pytest.mark.skipif(not native_run.available(),
                                reason="no native toolchain")


def test_native_matches_levels_snake():
    a = _run_mode("levels", _build_snake, _snake_schedule)
    b = _run_mode("native", _build_snake, _snake_schedule)
    assert a.sv.shape == b.sv.shape
    np.testing.assert_array_equal(a.sv, b.sv)
    np.testing.assert_array_equal(a.su, b.su)


def test_native_state_carries_across_runs():
    """Two consecutive digital_run calls must continue seq state."""
    import os
    os.environ["PE_TPU_DIGITAL"] = "native"
    try:
        c, ins, pn = _build_snake()
        sched = _snake_schedule(ins)
        cut = len(sched) // 2
        tr1 = c.digital_run(sched[:cut])
        tr2 = c.digital_run(sched[cut:])
    finally:
        os.environ.pop("PE_TPU_DIGITAL", None)
    ref = _run_mode("levels", _build_snake, _snake_schedule)
    joined_v = np.concatenate([tr1.sv, tr2.sv])
    joined_u = np.concatenate([tr1.su, tr2.su])
    np.testing.assert_array_equal(joined_v, ref.sv)
    np.testing.assert_array_equal(joined_u, ref.su)


def _build_gate_latch():
    """4-bit transparent latch from raw gate feedback
    (q = en·d + ~en·q) + a rotate-ish XOR stage downstream — the
    comb-loop (ir.cyclic) shape that fp16-class reference units
    synthesize into via incomplete always@* assignment."""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT, AND, OR, NOT, XOR

    c = pe.Circuit()
    nl = c.nl

    def wire(*pins):
        n = netops.create_node(nl)
        for inst, pi in pins:
            netops.add_to_node(nl, inst, pi, n)
        return n

    en = netops.add_model(nl, INPUT, {"boolean": 0.0})
    n_en = wire((en, 0))
    inv = netops.add_model(nl, NOT)
    netops.add_to_node(nl, inv, 0, n_en)
    n_nen = wire((inv, 1))
    ins = {"en": [en], "d": []}
    q_nodes = []
    for i in range(4):
        d = netops.add_model(nl, INPUT, {"boolean": 0.0})
        ins["d"].append(d)
        n_d = wire((d, 0))
        g_set = netops.add_model(nl, AND)
        netops.add_to_node(nl, g_set, 0, n_en)
        netops.add_to_node(nl, g_set, 1, n_d)
        n_set = wire((g_set, 2))
        g_hold = netops.add_model(nl, AND)
        g_q = netops.add_model(nl, OR)
        netops.add_to_node(nl, g_q, 0, n_set)
        n_hold = wire((g_hold, 2), (g_q, 1))
        n_q = wire((g_q, 2), (g_hold, 1))       # feedback: q -> hold
        netops.add_to_node(nl, g_hold, 0, n_nen)
        q_nodes.append(n_q)
    # downstream comb so the loop output feeds levelled gates too
    for i in range(3):
        x = netops.add_model(nl, XOR)
        netops.add_to_node(nl, x, 0, q_nodes[i])
        netops.add_to_node(nl, x, 1, q_nodes[i + 1])
        wire((x, 2))
    return c, ins, None


def _latch_schedule(ins, cycles=10):
    rng = np.random.default_rng(9)
    sched = [{}]                     # tick 0: everything X but inputs
    for _ in range(cycles):
        d = int(rng.integers(0, 16))
        base = {ins["d"][i]: (d >> i) & 1 for i in range(4)}
        opaque = dict(base)
        opaque[ins["en"][0]] = 0
        transp = dict(base)
        transp[ins["en"][0]] = 1
        sched.append(transp)
        sched.append(opaque)
        # change d while opaque: q must hold
        d2 = int(rng.integers(0, 16))
        hold = {ins["d"][i]: (d2 >> i) & 1 for i in range(4)}
        hold[ins["en"][0]] = 0
        sched.append(hold)
    return sched


def test_native_cyclic_latch_matches_levels():
    """Gate-feedback latches (ir.cyclic) through the native engine's
    Jacobi fixpoint match the levels engine bit-exactly, including the
    initial all-X state."""
    from phy_engine_tpu.digital import turbo

    c, ins, _pn = _build_gate_latch()
    c.prepare()
    ir = c._digital.ir
    assert ir.cyclic, "test circuit must have comb feedback"
    assert not turbo.eligible(ir)
    assert turbo.eligible(ir, allow_cyclic=True)

    a = _run_mode("levels", _build_gate_latch, _latch_schedule)
    b = _run_mode("native", _build_gate_latch, _latch_schedule)
    assert a.sv.shape == b.sv.shape
    np.testing.assert_array_equal(a.sv, b.sv)
    np.testing.assert_array_equal(a.su, b.su)


def test_native_lane_planes():
    """32 independent stimulus lanes through the native engine."""
    from test_turbo import test_turbo_lane_planes_comb as _  # noqa: F401
    # reuse the builder inline: small adder with per-lane planes
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                              SynthOptions)

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
    tb = _run_mode("native", build, schedule)
    np.testing.assert_array_equal(ta.sv, tb.sv)
    np.testing.assert_array_equal(ta.su, tb.su)
