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
