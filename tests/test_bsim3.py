"""BSIM3v3.2 tests (the micro-test pattern of test/0004.solver/
bsim3v32_*.cpp and test/0012.ac)."""

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import (RESISTANCE, VDC, BSIM3V32_NMOS,
                                   BSIM3V32_PMOS)
from phy_engine_tpu.engine.circuit import AnalyzeType, ACSweepType


def nmos_bias(vg=2.0, vd=3.0, rd=1e3, params=None):
    c = pe.Circuit()
    nl = c.nl
    vdd = netops.add_model(nl, VDC, {"V": vd})
    vgg = netops.add_model(nl, VDC, {"V": vg})
    r = netops.add_model(nl, RESISTANCE, {"r": rd})
    m = netops.add_model(nl, BSIM3V32_NMOS, params or
                         {"Kp": 2e-4, "Vth0": 0.7, "W": 10e-6, "L": 1e-6})
    n_vdd = netops.create_node(nl)
    n_g = netops.create_node(nl)
    n_d = netops.create_node(nl)
    netops.add_to_node(nl, vdd, 0, n_vdd)
    netops.add_to_node(nl, vdd, 1, nl.ground_node)
    netops.add_to_node(nl, vgg, 0, n_g)
    netops.add_to_node(nl, vgg, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n_vdd)
    netops.add_to_node(nl, r, 1, n_d)
    netops.add_to_node(nl, m, 0, n_d)              # D
    netops.add_to_node(nl, m, 1, n_g)              # G
    netops.add_to_node(nl, m, 2, nl.ground_node)   # S
    netops.add_to_node(nl, m, 3, nl.ground_node)   # B
    c.set_analyze_type(AnalyzeType.OP)
    return c, m, n_d, vgg, vdd


def drain_current(c, n_d, vd_supply, rd=1e3):
    vd = c.node_voltage(n_d).real
    return (vd_supply - vd) / rd


def test_id_vg_monotone_and_continuous():
    """Id(Vg) increases smoothly from subthreshold to strong inversion."""
    c, m, n_d, vgg, vdd = nmos_bias(vg=0.0)
    ids = []
    for vg in np.linspace(0.0, 2.5, 26):
        vgg.set_attribute("V", float(vg))
        assert c.analyze()
        ids.append(drain_current(c, n_d, 3.0))
    ids = np.array(ids)
    assert ids[0] < 1e-7                        # off
    assert ids[-1] > 1e-4                       # on
    # monotone + smooth above the solver's current-noise floor
    # (node-voltage tolerance 1e-6 over Rd=1k -> ~1e-9 A resolution)
    good = ids > 1e-7
    gi = ids[good]
    assert np.all(np.diff(gi) > 0)
    logi = np.log(gi)
    d2 = np.abs(np.diff(logi, 2))
    assert np.max(d2) < 1.0


def test_saturation_vs_triode():
    c, m, n_d, vgg, vdd = nmos_bias(vg=2.0)
    assert c.analyze()
    i_sat = drain_current(c, n_d, 3.0)
    # small Vds: triode (much lower current through big load)
    c2, m2, n_d2, vgg2, vdd2 = nmos_bias(vg=2.0, vd=0.2)
    assert c2.analyze()
    i_tri = drain_current(c2, n_d2, 0.2)
    assert i_tri < i_sat


def test_body_effect_raises_vth():
    """Negative Vbs raises Vth -> lower current (gamma > 0)."""
    p = {"Kp": 2e-4, "Vth0": 0.7, "gamma": 0.5, "phi": 0.7,
         "W": 10e-6, "L": 1e-6}
    c, m, n_d, vgg, vdd = nmos_bias(vg=1.5, params=p)
    assert c.analyze()
    i0 = drain_current(c, n_d, 3.0)

    # now tie bulk to -1V
    c2 = pe.Circuit()
    nl = c2.nl
    vdd2 = netops.add_model(nl, VDC, {"V": 3.0})
    vgg2 = netops.add_model(nl, VDC, {"V": 1.5})
    vbb = netops.add_model(nl, VDC, {"V": -1.0})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    m2 = netops.add_model(nl, BSIM3V32_NMOS, p)
    n_vdd = netops.create_node(nl)
    n_g = netops.create_node(nl)
    n_d2 = netops.create_node(nl)
    n_b = netops.create_node(nl)
    netops.add_to_node(nl, vdd2, 0, n_vdd)
    netops.add_to_node(nl, vdd2, 1, nl.ground_node)
    netops.add_to_node(nl, vgg2, 0, n_g)
    netops.add_to_node(nl, vgg2, 1, nl.ground_node)
    netops.add_to_node(nl, vbb, 0, n_b)
    netops.add_to_node(nl, vbb, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n_vdd)
    netops.add_to_node(nl, r, 1, n_d2)
    netops.add_to_node(nl, m2, 0, n_d2)
    netops.add_to_node(nl, m2, 1, n_g)
    netops.add_to_node(nl, m2, 2, nl.ground_node)
    netops.add_to_node(nl, m2, 3, n_b)
    c2.set_analyze_type(AnalyzeType.OP)
    assert c2.analyze()
    i1 = drain_current(c2, n_d2, 3.0)
    assert i1 < 0.8 * i0


def test_pmos_mirror():
    c = pe.Circuit()
    nl = c.nl
    vss = netops.add_model(nl, VDC, {"V": -3.0})
    vgg = netops.add_model(nl, VDC, {"V": -2.0})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    m = netops.add_model(nl, BSIM3V32_PMOS,
                         {"Kp": 2e-4, "Vth0": 0.7, "W": 10e-6, "L": 1e-6})
    n_vss = netops.create_node(nl)
    n_g = netops.create_node(nl)
    n_d = netops.create_node(nl)
    netops.add_to_node(nl, vss, 0, n_vss)
    netops.add_to_node(nl, vss, 1, nl.ground_node)
    netops.add_to_node(nl, vgg, 0, n_g)
    netops.add_to_node(nl, vgg, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n_vss)
    netops.add_to_node(nl, r, 1, n_d)
    netops.add_to_node(nl, m, 0, n_d)
    netops.add_to_node(nl, m, 1, n_g)
    netops.add_to_node(nl, m, 2, nl.ground_node)
    netops.add_to_node(nl, m, 3, nl.ground_node)
    c.set_analyze_type(AnalyzeType.OP)
    assert c.analyze()
    i_d = (c.node_voltage(n_d).real - (-3.0)) / 1e3
    # mirror of the NMOS case: same magnitude current flows
    cn, mn, n_dn, vggn, vddn = nmos_bias(vg=2.0)
    assert cn.analyze()
    i_n = drain_current(cn, n_dn, 3.0)
    assert np.isclose(i_d, i_n, rtol=1e-6)


def test_bulk_junction_diode():
    """Forward-biasing bulk-source conducts (diode_Is path)."""
    c = pe.Circuit()
    nl = c.nl
    vb = netops.add_model(nl, VDC, {"V": 0.8})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    m = netops.add_model(nl, BSIM3V32_NMOS, {})
    n_b = netops.create_node(nl)
    n_s = netops.create_node(nl)
    netops.add_to_node(nl, vb, 0, n_b)
    netops.add_to_node(nl, vb, 1, nl.ground_node)
    netops.add_to_node(nl, m, 3, n_b)              # B
    netops.add_to_node(nl, m, 2, n_s)              # S via resistor
    netops.add_to_node(nl, r, 0, n_s)
    netops.add_to_node(nl, r, 1, nl.ground_node)
    netops.add_to_node(nl, m, 0, nl.ground_node)   # D
    netops.add_to_node(nl, m, 1, nl.ground_node)   # G
    c.set_analyze_type(AnalyzeType.OP)
    assert c.analyze()
    vs = c.node_voltage(n_s).real
    assert vs > 0.05      # bulk diode pulls source node up


def test_ac_gm_matches_dc_derivative():
    c, m, n_d, vgg, vdd = nmos_bias(vg=1.5, rd=1e3)
    # numeric gm via DC finite difference
    assert c.analyze()
    i1 = drain_current(c, n_d, 3.0)
    vgg.set_attribute("V", 1.5 + 1e-4)
    assert c.analyze()
    i2 = drain_current(c, n_d, 3.0)
    gm_fd = (i2 - i1) / 1e-4
    vgg.set_attribute("V", 1.5)

    # AC: small-signal gain vd/vg = -gm*(Rd || rds); with lambda=0,
    # rds -> inf, so gain = -gm*Rd
    from phy_engine_tpu.models import VAC
    nl = c.nl
    n_g = m.pins[1].node
    vac = netops.add_model(nl, VAC, {"Vp": 1.0})
    # splice VAC in series with the gate source
    n_mid = netops.create_node(nl)
    netops.remove_from_node(nl, vgg, 0, n_g)
    netops.add_to_node(nl, vgg, 0, n_mid)
    netops.add_to_node(nl, vac, 0, n_g)
    netops.add_to_node(nl, vac, 1, n_mid)
    c.set_analyze_type(AnalyzeType.AC)
    c.ac.sweep = ACSweepType.SINGLE
    c.ac.omega = 1e3
    assert c.analyze()
    gain = abs(c.node_voltage(n_d))
    gm_ac = gain / 1e3
    assert np.isclose(gm_ac, abs(gm_fd), rtol=2e-2)


def test_tr_gate_cap_charging():
    """With Cgs set, the gate node charges through a resistor."""
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 1.0})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e6})
    m = netops.add_model(nl, BSIM3V32_NMOS, {"Cgs": 1e-12})
    n_in = netops.create_node(nl)
    n_g = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n_in)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n_in)
    netops.add_to_node(nl, r, 1, n_g)
    netops.add_to_node(nl, m, 1, n_g)              # G
    netops.add_to_node(nl, m, 0, nl.ground_node)
    netops.add_to_node(nl, m, 2, nl.ground_node)
    netops.add_to_node(nl, m, 3, nl.ground_node)
    c.set_analyze_type(AnalyzeType.TR)
    tau = 1e6 * 1e-12
    c.tr.t_step = tau / 100.0
    c.tr.t_stop = tau
    assert c.analyze()
    wave = c.tr_waveform(n_g)
    expect = 1.0 - np.exp(-1.0)
    assert np.isclose(wave[-1], expect, rtol=0.05)


def test_element_code_55():
    from phy_engine_tpu.api import Circuit, Element, Wire, ElementCode
    elements = [
        Element(ElementCode.GROUND),
        Element(ElementCode.VDC, (3.0,)),
        Element(ElementCode.VDC, (2.0,)),
        Element(ElementCode.RESISTOR, (1e3,)),
        Element(ElementCode.BSIM3V32_NMOS,
                (10e-6, 1e-6, 2e-4, 0.0, 0.7, 0.0, 0.7,
                 0.0, 0.0, 0.0, 1e-14, 1.0, 27.0)),
    ]
    wires = [
        Wire(1, 0, 3, 0), Wire(1, 1, 0, 0),       # vdd -> rd, gnd
        Wire(2, 0, 4, 1), Wire(2, 1, 0, 0),       # vg -> gate
        Wire(3, 1, 4, 0),                          # rd -> drain
        Wire(4, 2, 0, 0), Wire(4, 3, 0, 0),       # s, b -> gnd
    ]
    c = Circuit(elements, wires)
    c.set_analyze_type(AnalyzeType.OP)
    s = c.analyze_and_sample()
    v_d = s.components[3].pin_voltages[0]          # BSIM drain pin
    assert 0.0 < v_d < 3.0


def _id_at(params, vg=2.0, vd=3.0, rd=1e3):
    c, m, n_d, vgg, vdd = nmos_bias(vg=vg, vd=vd, rd=rd, params=params)
    assert c.analyze()
    return drain_current(c, n_d, vd, rd=rd)


BASE = {"Kp": 2e-4, "Vth0": 0.7, "W": 10e-6, "L": 1e-6}


def test_kt1_threshold_tempco():
    """bsim3v32_kt1-style: negative kt1 lowers Vth with temperature,
    raising subthreshold current; no effect at Tnom."""
    lo = dict(BASE, kt1=-0.11, Temp=27.0)
    hi = dict(BASE, kt1=-0.11, Temp=85.0)
    i_lo = _id_at(lo, vg=0.55)
    i_hi = _id_at(hi, vg=0.55)
    assert i_hi > i_lo * 2.0
    # kt1=0, Temp only shifts the slope, much weaker effect
    i_hi0 = _id_at(dict(BASE, kt1=0.0, Temp=85.0, ute=0.0), vg=0.55)
    assert i_hi > i_hi0


def test_ute_mobility_tempco():
    """bsim3v32_ute-style: ute<0 degrades mobility with temperature in
    strong inversion."""
    i_cold = _id_at(dict(BASE, ute=-1.5, Temp=27.0), vg=2.5)
    i_hot = _id_at(dict(BASE, ute=-1.5, Temp=125.0), vg=2.5)
    assert i_hot < 0.8 * i_cold
    # with ute=0 strong-inversion current barely moves
    i_hot0 = _id_at(dict(BASE, ute=0.0, Temp=125.0), vg=2.5)
    assert abs(i_hot0 - _id_at(dict(BASE), vg=2.5)) < \
        0.2 * _id_at(dict(BASE), vg=2.5)


def test_eta0_dibl():
    """bsim3v32_eta0-style: DIBL raises subthreshold current with Vds."""
    lo = _id_at(dict(BASE, eta0=0.08), vg=0.5, vd=0.5)
    hi = _id_at(dict(BASE, eta0=0.08), vg=0.5, vd=3.0)
    assert hi > 2.0 * lo
    # without DIBL the ratio is mild (only vdseff term)
    lo0 = _id_at(dict(BASE, eta0=0.0), vg=0.5, vd=0.5)
    hi0 = _id_at(dict(BASE, eta0=0.0), vg=0.5, vd=3.0)
    assert hi / lo > 1.5 * hi0 / lo0


def test_theta_mobility_degradation():
    """bsim3v32_ua-style: vertical-field degradation bends Id(Vg) below
    the undegraded curve at high gate drive."""
    # triode region: Id tracks ueff directly (velocity saturation
    # masks mobility at high Vds)
    # stiff drain (1 ohm) so the load line does not mask the ratio
    i_ref = _id_at(dict(BASE, theta=0.0), vg=3.0, vd=0.1, rd=1.0)
    i_deg = _id_at(dict(BASE, theta=0.5), vg=3.0, vd=0.1, rd=1.0)
    assert i_deg < 0.6 * i_ref
    # negligible effect near threshold
    i_ref_lo = _id_at(dict(BASE, theta=0.0), vg=0.9, vd=0.1, rd=1.0)
    i_deg_lo = _id_at(dict(BASE, theta=0.5), vg=0.9, vd=0.1, rd=1.0)
    assert i_deg_lo > 0.7 * i_ref_lo


def test_xti_junction_is_tempco():
    """bsim3v32_xti-style: bulk junction saturation current grows
    steeply with temperature."""
    def bulk_leak(temp):
        # reverse-biased drain junction: D at +3V, B grounded
        c, m, n_d, vgg, vdd = nmos_bias(
            vg=0.0, vd=3.0,
            params=dict(BASE, diode_Is=1e-12, Temp=temp))
        assert c.analyze()
        return abs(drain_current(c, n_d, 3.0))
    i27 = bulk_leak(27.0)
    i125 = bulk_leak(125.0)
    assert i125 > 50.0 * i27


def test_junction_cap_tr():
    """bsim3v32 cj-style: drain-bulk junction cap slows the drain node
    step response in transient."""
    import numpy as np

    def settle_steps(cjd):
        c = pe.Circuit()
        nl = c.nl
        vdd = netops.add_model(nl, VDC, {"V": 3.0})
        r = netops.add_model(nl, RESISTANCE, {"r": 100e3})
        # cjd is the reference's per-junction BOTTOM DENSITY override
        # of cj [F/m^2] (bsim3v32.h:1990-2042, wave 6) — scaled by the
        # drain area ad, so ad=1 makes the numbers read as farads
        m = netops.add_model(nl, BSIM3V32_NMOS,
                             dict(BASE, cjd=cjd, ad=1.0))
        n_vdd = netops.create_node(nl)
        n_d = netops.create_node(nl)
        netops.add_to_node(nl, vdd, 0, n_vdd)
        netops.add_to_node(nl, vdd, 1, nl.ground_node)
        netops.add_to_node(nl, r, 0, n_vdd)
        netops.add_to_node(nl, r, 1, n_d)
        netops.add_to_node(nl, m, 0, n_d)
        netops.add_to_node(nl, m, 1, nl.ground_node)   # off
        netops.add_to_node(nl, m, 2, nl.ground_node)
        netops.add_to_node(nl, m, 3, nl.ground_node)
        c.set_analyze_type(AnalyzeType.TR)
        c.tr.t_step = 1e-7
        c.tr.t_stop = 4e-5
        assert c.analyze()
        wave = np.asarray(c.tr_waveform(n_d))
        return wave

    w_fast = settle_steps(0.0)
    w_slow = settle_steps(100e-12)      # tau = 100k * 100p = 10us
    # with the cap, mid-simulation voltage is still rising
    k = len(w_fast) // 8
    assert w_fast[k] > 2.9
    assert w_slow[k] < 2.9
    assert w_slow[-1] > 2.5             # eventually approaches VDD
