"""Stepped .DC sweep and Monte-Carlo (engine/circuit.py SweepResult).

The reference's DC analysis is an OP alias with an empty settings
struct (analyzer/DC.h:9) and its Monte-Carlo story is independent
process runs; both become ONE batched device program here (vmap over
the grid / lanes onto the batched solve, parallel/batch.py).  Oracles
are closed forms and per-point single runs (SURVEY §4 tier-a).
"""

import numpy as np

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import RESISTANCE, CAPACITOR, VDC, PN_JUNCTION


def _divider(r1, r2, e=1.0):
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": e})
    top = netops.create_node(nl)
    out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    ra = netops.add_model(nl, RESISTANCE, {"r": r1})
    netops.add_to_node(nl, ra, 0, top)
    netops.add_to_node(nl, ra, 1, out)
    rb = netops.add_model(nl, RESISTANCE, {"r": r2})
    netops.add_to_node(nl, rb, 0, out)
    netops.add_to_node(nl, rb, 1, nl.ground_node)
    return c, v, ra, rb, out


def test_dc_sweep_divider():
    r1, r2 = 2e3, 3e3
    c, v, ra, rb, out = _divider(r1, r2)
    vals = np.linspace(-2.0, 5.0, 15)
    res = c.dc_sweep(v, "V", vals, out=out)
    assert res.ok.all()
    want = vals * r2 / (r1 + r2)
    assert np.allclose(res.out, want, rtol=1e-12, atol=1e-12)
    # branch-current trace: I(V) = -E/(R1+R2)
    assert np.allclose(res.trace(v), -vals / (r1 + r2), rtol=1e-12)
    # the sweep must not disturb the circuit's stored solution
    assert c.analyze()


def test_dc_sweep_diode_vs_pointwise():
    """Nonlinear sweep: each grid point matches an individual OP."""
    def build(e):
        c = pe.Circuit()
        nl = c.nl
        v = netops.add_model(nl, VDC, {"V": e})
        top = netops.create_node(nl)
        out = netops.create_node(nl)
        netops.add_to_node(nl, v, 0, top)
        netops.add_to_node(nl, v, 1, nl.ground_node)
        ra = netops.add_model(nl, RESISTANCE, {"r": 1e3})
        netops.add_to_node(nl, ra, 0, top)
        netops.add_to_node(nl, ra, 1, out)
        d = netops.add_model(nl, PN_JUNCTION, {})
        netops.add_to_node(nl, d, 0, out)
        netops.add_to_node(nl, d, 1, nl.ground_node)
        return c, v, out

    vals = np.array([0.2, 1.0, 3.0])
    c, v, out = build(0.0)
    res = c.dc_sweep(v, "V", vals, out=out)
    assert res.ok.all()
    for k, e in enumerate(vals):
        c2, _v2, out2 = build(float(e))
        assert c2.analyze()
        assert np.isclose(res.out[k], c2.node_voltage(out2).real,
                          rtol=1e-6, atol=1e-9)


def test_monte_carlo_op():
    """Jittered divider: every lane's Vout matches the closed form of
    ITS OWN sampled resistances."""
    r1, r2, e = 2e3, 3e3, 2.0
    c, v, ra, rb, out = _divider(r1, r2, e)
    res = c.monte_carlo({"R": {"r": 0.2}}, n=64)
    assert res.ok.all()
    r1s = res.param_of(ra, "r")
    r2s = res.param_of(rb, "r")
    assert np.std(r1s) > 0.0       # jitter actually applied
    want = e * r2s / (r1s + r2s)
    assert np.allclose(res.trace(out), want, rtol=1e-12)


def test_temp_sweep_diode_tempco():
    """Diode forward voltage vs temperature: each lane matches a
    pointwise run with the device Temp attribute set.  NOTE: both this
    engine and the reference scale only Ut = kT/q with temperature
    (PN_junction.h:296-356 — no Is(T)/EG/XTI), so at fixed Is the
    model's Vf RISES with T as N·(k/q)·ln(Id/Is) per kelvin; the
    physical -2 mV/K would need saturation-current tempco neither
    engine implements."""
    def build():
        c = pe.Circuit()
        nl = c.nl
        v = netops.add_model(nl, VDC, {"V": 3.0})
        top = netops.create_node(nl)
        out = netops.create_node(nl)
        netops.add_to_node(nl, v, 0, top)
        netops.add_to_node(nl, v, 1, nl.ground_node)
        ra = netops.add_model(nl, RESISTANCE, {"r": 10e3})
        netops.add_to_node(nl, ra, 0, top)
        netops.add_to_node(nl, ra, 1, out)
        d = netops.add_model(nl, PN_JUNCTION, {})
        netops.add_to_node(nl, d, 0, out)
        netops.add_to_node(nl, d, 1, nl.ground_node)
        return c, d, out

    temps = np.array([-40.0, 0.0, 27.0, 85.0, 125.0])
    c, d, out = build()
    res = c.temp_sweep(temps, out=out)
    assert res.ok.all()
    for k, t in enumerate(temps):
        c2, d2, out2 = build()
        d2.set_attribute("Temp", float(t))
        assert c2.analyze()
        assert np.isclose(res.out[k], c2.node_voltage(out2).real,
                          rtol=1e-9)
    # monotone rising Vf at N·(k/q)·ln(Id/Is) ≈ +2 mV/K (fixed-Is
    # junction law; see docstring)
    dv = np.diff(res.out) / np.diff(temps)
    assert np.all(dv > 0.5e-3) and np.all(dv < 4e-3)


def _rc(R, C):
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 1.0})
    top = netops.create_node(nl)
    out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    ra = netops.add_model(nl, RESISTANCE, {"r": R})
    netops.add_to_node(nl, ra, 0, top)
    netops.add_to_node(nl, ra, 1, out)
    cl = netops.add_model(nl, CAPACITOR, {"C": C})
    netops.add_to_node(nl, cl, 0, out)
    netops.add_to_node(nl, cl, 1, nl.ground_node)
    return c, cl, out


def test_monte_carlo_tr_rc():
    """Transient MC on an RC charge-up: each lane's waveform is
    bit-close to a SINGLE-circuit run of the same engine at that
    lane's sampled C (the MC axis must be semantically invisible),
    and tracks exp(-t/tau) of its own tau."""
    R, C = 1e3, 1e-6
    tau = R * C
    c, cl, out = _rc(R, C)
    res = c.monte_carlo({"C": {"C": 0.1}}, n=4, analysis="tr",
                        t_stop=tau, t_step=tau / 200)
    assert res.ok.all()
    w = res.waveform(out)          # (4, 200)
    cs = res.param_of(cl, "C")
    assert np.std(cs) > 0.0
    for lane in range(4):
        c2, _cl2, out2 = _rc(R, float(cs[lane]))
        c2.tr.t_stop = tau
        c2.tr.t_step = tau / 200
        from phy_engine_tpu.engine.circuit import AnalyzeType
        c2.set_analyze_type(AnalyzeType.TR)
        assert c2.analyze()
        single = c2.tr_waveform(out2)
        assert np.allclose(w[lane], single, rtol=1e-12, atol=1e-12)
        # and the physics: exp charge-up of this lane's own tau
        tl = R * cs[lane]
        want = 1.0 - np.exp(-np.asarray(res.times) / tl)
        assert np.allclose(w[lane], want, atol=5e-3)
