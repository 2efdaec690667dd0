"""Transient tests vs closed-form solutions.

Mirrors the reference oracles in test/0008.numerical_methods (RC/RL step
responses compared against exponentials) and test/0005.models/
{rc_step_tr,rl_step_tr,capacitor_TR,inductor_TR}.cpp.
"""

import numpy as np

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import RESISTANCE, CAPACITOR, INDUCTOR, VDC, SQUARE
from phy_engine_tpu.engine.circuit import AnalyzeType


def test_rc_step_response():
    """V_C(t) = V (1 - exp(-t/RC)) from zero initial state."""
    R, C, V = 1e3, 1e-6, 5.0
    tau = R * C
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": V})
    r = netops.add_model(nl, RESISTANCE, {"r": R})
    cap = netops.add_model(nl, CAPACITOR, {"C": C})
    n_in = netops.create_node(nl)
    n_out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n_in)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n_in)
    netops.add_to_node(nl, r, 1, n_out)
    netops.add_to_node(nl, cap, 0, n_out)
    netops.add_to_node(nl, cap, 1, nl.ground_node)

    c.set_analyze_type(AnalyzeType.TR)
    c.tr.t_step = tau / 200.0
    c.tr.t_stop = 5.0 * tau
    assert c.analyze()
    wave = c.tr_waveform(n_out)
    times = c.tr_times
    expect = V * (1.0 - np.exp(-times / tau))
    # The companion model starts with i(0)=0 (capacitor.h:106-128), which
    # shifts the waveform by half a step: bounded by V*dt/(2*tau).
    dt = c.tr.t_step
    startup = V * dt / (2.0 * tau)
    assert np.max(np.abs(wave - expect)) < 1.1 * startup
    # late-time (after the startup transient decays) is much tighter
    late = times > 4.0 * tau
    assert np.max(np.abs(wave[late] - expect[late])) < 1e-3 * V


def test_rl_step_response():
    """Series R-L driven by VDC: i(t) = V/R (1-exp(-tR/L));
    V_L = V exp(-tR/L)."""
    R, L, V = 10.0, 1e-3, 2.0
    tau = L / R
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": V})
    r = netops.add_model(nl, RESISTANCE, {"r": R})
    ind = netops.add_model(nl, INDUCTOR, {"L": L})
    n_in = netops.create_node(nl)
    n_mid = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n_in)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n_in)
    netops.add_to_node(nl, r, 1, n_mid)
    netops.add_to_node(nl, ind, 0, n_mid)
    netops.add_to_node(nl, ind, 1, nl.ground_node)

    c.set_analyze_type(AnalyzeType.TR)
    c.tr.t_step = tau / 200.0
    c.tr.t_stop = 5.0 * tau
    assert c.analyze()
    v_l = c.tr_waveform(n_mid)
    times = c.tr_times
    expect = V * np.exp(-times / tau)
    # same half-step startup offset as the RC case
    dt = c.tr.t_step
    assert np.max(np.abs(v_l - expect)) < 1.1 * V * dt / (2.0 * tau)
    # final inductor current ~ V/R
    assert np.isclose(ind.branches[0].current.real, V / R, rtol=1e-2)


def test_tr_duration_persists():
    """tr_duration accumulates across analyze() calls (circuit.h TR loop)."""
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, SQUARE, {"Vh": 1.0, "Vl": 0.0, "freq": 1e3})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    n1 = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n1)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n1)
    netops.add_to_node(nl, r, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.TR)
    c.tr.t_step = 1e-5
    c.tr.t_stop = 4e-4   # 0.4 of a period: still high
    assert c.analyze()
    assert np.isclose(c.node_voltage(n1).real, 1.0)
    assert np.isclose(c.tr_duration, 4e-4)
    assert c.analyze()   # continues 0.4ms -> 0.8ms: now in low half
    assert np.isclose(c.node_voltage(n1).real, 0.0)


def test_trop_capacitor_open():
    """TROP: capacitors open for the initial operating point, then TR."""
    R, C, V = 1e3, 1e-6, 3.0
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": V})
    r = netops.add_model(nl, RESISTANCE, {"r": R})
    cap = netops.add_model(nl, CAPACITOR, {"C": C})
    n_in = netops.create_node(nl)
    n_out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n_in)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n_in)
    netops.add_to_node(nl, r, 1, n_out)
    netops.add_to_node(nl, cap, 0, n_out)
    netops.add_to_node(nl, cap, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.TROP)
    c.tr.t_step = 1e-5
    c.tr.t_stop = 1e-4
    assert c.analyze()
    # at OP the cap is open: no current, V_out = V; TR then holds steady
    assert np.isclose(c.node_voltage(n_out).real, V, atol=1e-6)


def test_tr_adaptive_rc_matches_analytic():
    """Adaptive stepping (the reference's unwired adapt_step): an RC
    charge ends at the analytic value with monotone accepted times."""
    import numpy as np
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import RESISTANCE, CAPACITOR, VDC
    from phy_engine_tpu.engine.circuit import AnalyzeType

    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 1.0})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    cap = netops.add_model(nl, CAPACITOR, {"C": 1e-6})
    top = netops.create_node(nl)
    mid = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, top)
    netops.add_to_node(nl, r, 1, mid)
    netops.add_to_node(nl, cap, 0, mid)
    netops.add_to_node(nl, cap, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.TR)
    tau = 1e-3
    c.tr.t_step = tau / 50
    c.tr.t_stop = tau
    c.tr.adaptive = True
    assert c.analyze()
    vm = c.node_voltage(mid).real
    assert np.isclose(vm, 1.0 - np.exp(-1.0), rtol=0.05)
    ts = np.asarray(c.tr_times)
    assert len(ts) >= 40
    assert np.all(np.diff(ts) > 0)
    assert np.isclose(ts[-1], tau, rtol=1e-6)


def test_tr_adaptive_nonlinear_diode():
    """Adaptive TR through a rectifier stays converged and lands on
    the same endpoint as a fine fixed-step run."""
    import numpy as np
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import (RESISTANCE, CAPACITOR, VAC,
                                       PN_JUNCTION)
    from phy_engine_tpu.engine.circuit import AnalyzeType

    def build():
        c = pe.Circuit()
        nl = c.nl
        src = netops.add_model(nl, VAC, {"Vp": 5.0, "freq": 1e3})
        d = netops.add_model(nl, PN_JUNCTION, {"Is": 1e-14, "N": 1.0})
        r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
        cap = netops.add_model(nl, CAPACITOR, {"C": 1e-6})
        nin = netops.create_node(nl)
        nout = netops.create_node(nl)
        netops.add_to_node(nl, src, 0, nin)
        netops.add_to_node(nl, src, 1, nl.ground_node)
        netops.add_to_node(nl, d, 0, nin)
        netops.add_to_node(nl, d, 1, nout)
        netops.add_to_node(nl, r, 0, nout)
        netops.add_to_node(nl, r, 1, nl.ground_node)
        netops.add_to_node(nl, cap, 0, nout)
        netops.add_to_node(nl, cap, 1, nl.ground_node)
        c.set_analyze_type(AnalyzeType.TR)
        return c, nout

    c1, n1 = build()
    c1.tr.t_step = 5e-5
    c1.tr.t_stop = 1e-3
    c1.tr.adaptive = True
    assert c1.analyze()

    c2, n2 = build()
    c2.tr.t_step = 1e-5
    c2.tr.t_stop = 1e-3
    assert c2.analyze()
    assert np.isclose(c1.node_voltage(n1).real,
                      c2.node_voltage(n2).real, atol=0.15)


def test_frozen_newton_matches_delta_and_gauss():
    """solver='frozen' (frozen-preconditioner Newton with the factor
    carry threaded across TR steps + f64 KCL-residual convergence gate)
    reproduces the delta and gauss trajectories to <=1e-6 rel on the
    bench-family nonlinear diode ladder."""
    import numpy as np
    import jax.numpy as jnp
    import __graft_entry__ as g
    from phy_engine_tpu.engine import analog
    from phy_engine_tpu.parallel.batch import (batch_params, batch_state,
                                               batch_x)

    ir = g._build_diode_ladder(63, 100.0, 1e-9)
    env = g._env()
    B, STEPS = 6, 25
    x_b = batch_x(ir, B)
    st_b = batch_state(ir, B)
    pb = batch_params(ir, B, jitter={"R": {"r": 0.05}})
    t0 = jnp.asarray(0.0, jnp.float64)
    dt = jnp.asarray(5e-8, jnp.float64)
    out = {}
    for solver in ("delta", "frozen"):
        x, st, ok, tr = analog.transient_batched(
            ir, pb, x_b, st_b, env, t0, dt, STEPS, solver=solver,
            keep_trace=True)
        assert bool(ok.all()), solver
        out[solver] = np.asarray(tr)
    scale = np.abs(out["delta"]).max()
    diff = np.abs(out["delta"] - out["frozen"]).max()
    assert diff / scale < 1e-6, diff / scale


def test_frozen_newton_experiment_knobs(monkeypatch):
    """The round-5 bench knobs (PE_TPU_FROZEN_NS_PREC=default,
    PE_TPU_FROZEN_INV=block) must preserve the frozen trajectory's
    correctness gate — the round-4 meta-rule: no perf knob without its
    gating test."""
    import numpy as np
    import jax.numpy as jnp
    import __graft_entry__ as g
    from phy_engine_tpu.engine import analog
    from phy_engine_tpu.parallel.batch import (batch_params, batch_state,
                                               batch_x)

    ir = g._build_diode_ladder(63, 100.0, 1e-9)
    env = g._env()
    B, STEPS = 4, 12
    x_b = batch_x(ir, B)
    st_b = batch_state(ir, B)
    pb = batch_params(ir, B, jitter={"R": {"r": 0.05}})
    t0 = jnp.asarray(0.0, jnp.float64)
    dt = jnp.asarray(5e-8, jnp.float64)
    x_ref, _, ok, tr_ref = analog.transient_batched(
        ir, pb, x_b, st_b, env, t0, dt, STEPS, solver="delta",
        keep_trace=True)
    assert bool(ok.all())
    ref = np.asarray(tr_ref)
    scale = np.abs(ref).max()
    for knob, val in (("FROZEN_NS_PREC", "default"),
                      ("FROZEN_INV", "block")):
        monkeypatch.setattr(analog, knob, val)
        try:
            _, _, ok, tr = analog.transient_batched(
                ir, pb, x_b, st_b, env, t0, dt, STEPS, solver="frozen",
                keep_trace=True)
            assert bool(ok.all()), knob
            diff = np.abs(ref - np.asarray(tr)).max()
            assert diff / scale < 1e-6, (knob, diff / scale)
        finally:
            monkeypatch.undo()
