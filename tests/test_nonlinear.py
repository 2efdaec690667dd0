"""Nonlinear device tests (test/0011.nonlinear, 0005.models analogues)."""

import numpy as np

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import (RESISTANCE, VDC, PN_JUNCTION, BJT_NPN,
                                   NMOSFET, PMOSFET, RELAY, CAPACITOR)
from phy_engine_tpu.engine.circuit import AnalyzeType, ACSweepType


def _scalar_diode_solve(V, R, Is=1e-14, N=1.0, Temp=27.0):
    """Independent Newton reference for VDC - R - diode to ground."""
    ut = 1.380650524e-23 * (Temp + 273.15) / 1.6021765314e-19
    ute = N * ut
    vd = 0.6
    for _ in range(200):
        i_d = Is * (np.exp(vd / ute) - 1.0)
        g = Is * np.exp(vd / ute) / ute
        f = (V - vd) / R - i_d
        df = -1.0 / R - g
        step = -f / df
        vd = vd + np.clip(step, -0.1, 0.1)
    return vd


def _diode_circuit(V=5.0, R=1e3):
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": V})
    r = netops.add_model(nl, RESISTANCE, {"r": R})
    d = netops.add_model(nl, PN_JUNCTION, {})
    n_in = netops.create_node(nl)
    n_d = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n_in)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n_in)
    netops.add_to_node(nl, r, 1, n_d)
    netops.add_to_node(nl, d, 0, n_d)
    netops.add_to_node(nl, d, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.OP)
    return c, n_d, d


def test_pn_junction_forward():
    """pn_junction_forward.cpp analogue."""
    c, n_d, d = _diode_circuit(V=5.0, R=1e3)
    assert c.analyze()
    vd = c.node_voltage(n_d).real
    expect = _scalar_diode_solve(5.0, 1e3)
    assert np.isclose(vd, expect, atol=1e-6), (vd, expect)


def test_pn_junction_reverse():
    c, n_d, d = _diode_circuit(V=-5.0, R=1e3)
    assert c.analyze()
    vd = c.node_voltage(n_d).real
    # reverse biased: nearly all voltage across the diode
    assert vd < -4.99


def test_pn_junction_breakdown():
    """Breakdown region: diode clamps near -Bv."""
    c, n_d, d = _diode_circuit(V=-60.0, R=1e3)
    assert c.analyze()
    vd = c.node_voltage(n_d).real
    assert -42.0 < vd < -39.0      # Bv = 40 with Ibv fit shift


def test_diode_ac_small_signal():
    """AC conductance equals the saved operating-point geq (the VDC bias
    source is a 0V AC short; a series VAC provides the 1V excitation —
    same pattern as the reference's ACOP tests)."""
    from phy_engine_tpu.models import VAC
    c, n_d, d = _diode_circuit(V=5.0, R=1e3)
    nl = c.nl
    # splice a VAC between the VDC and the resistor
    vdc = nl.models[0]
    r = nl.models[1]
    n_in = r.pins[0].node
    import phy_engine_tpu.netlist.operations as ops
    n_mid = ops.create_node(nl)
    ops.remove_from_node(nl, vdc, 0, n_in)
    ops.add_to_node(nl, vdc, 0, n_mid)
    vac = ops.add_model(nl, VAC, {"Vp": 1.0})
    ops.add_to_node(nl, vac, 0, n_in)
    ops.add_to_node(nl, vac, 1, n_mid)
    c.set_analyze_type(AnalyzeType.AC)
    c.ac.sweep = ACSweepType.SINGLE
    c.ac.omega = 100.0
    assert c.analyze()
    geq = d.runtime["geq"]
    assert geq > 0.0
    h = c.node_voltage(n_d)
    # divider: h = (1/geq)/(R + 1/geq)
    expect = (1.0 / geq) / (1e3 + 1.0 / geq)
    assert np.isclose(h.real, expect, rtol=1e-6)
    assert abs(h.imag) < 1e-12


def test_bjt_common_emitter_dc():
    """NPN: Ic = BetaF * Ib at the solved bias point."""
    c = pe.Circuit()
    nl = c.nl
    vcc = netops.add_model(nl, VDC, {"V": 10.0})
    vbb = netops.add_model(nl, VDC, {"V": 2.0})
    rb = netops.add_model(nl, RESISTANCE, {"r": 100e3})
    rc = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    q = netops.add_model(nl, BJT_NPN, {})
    n_vcc = netops.create_node(nl)
    n_vbb = netops.create_node(nl)
    n_b = netops.create_node(nl)
    n_c = netops.create_node(nl)
    netops.add_to_node(nl, vcc, 0, n_vcc)
    netops.add_to_node(nl, vcc, 1, nl.ground_node)
    netops.add_to_node(nl, vbb, 0, n_vbb)
    netops.add_to_node(nl, vbb, 1, nl.ground_node)
    netops.add_to_node(nl, rb, 0, n_vbb)
    netops.add_to_node(nl, rb, 1, n_b)
    netops.add_to_node(nl, rc, 0, n_vcc)
    netops.add_to_node(nl, rc, 1, n_c)
    netops.add_to_node(nl, q, 0, n_b)            # B
    netops.add_to_node(nl, q, 1, n_c)            # C
    netops.add_to_node(nl, q, 2, nl.ground_node)  # E
    c.set_analyze_type(AnalyzeType.OP)
    assert c.analyze()
    vb = c.node_voltage(n_b).real
    vc = c.node_voltage(n_c).real
    ib = (2.0 - vb) / 100e3
    ic = (10.0 - vc) / 1e3
    assert 0.55 < vb < 0.8
    assert np.isclose(ic, 100.0 * ib, rtol=1e-3)


def test_nmos_saturation():
    """Square-law: Id = Kp/2 (Vgs - Vth)^2 in saturation."""
    c = pe.Circuit()
    nl = c.nl
    vdd = netops.add_model(nl, VDC, {"V": 10.0})
    vg = netops.add_model(nl, VDC, {"V": 3.0})
    rd = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    m = netops.add_model(nl, NMOSFET, {"Kp": 1e-3, "Vth": 1.0})
    n_vdd = netops.create_node(nl)
    n_g = netops.create_node(nl)
    n_d = netops.create_node(nl)
    netops.add_to_node(nl, vdd, 0, n_vdd)
    netops.add_to_node(nl, vdd, 1, nl.ground_node)
    netops.add_to_node(nl, vg, 0, n_g)
    netops.add_to_node(nl, vg, 1, nl.ground_node)
    netops.add_to_node(nl, rd, 0, n_vdd)
    netops.add_to_node(nl, rd, 1, n_d)
    netops.add_to_node(nl, m, 0, n_d)            # D
    netops.add_to_node(nl, m, 1, n_g)            # G
    netops.add_to_node(nl, m, 2, nl.ground_node)  # S
    c.set_analyze_type(AnalyzeType.OP)
    assert c.analyze()
    vd = c.node_voltage(n_d).real
    i_d = (10.0 - vd) / 1e3
    expect = 0.5e-3 * (3.0 - 1.0) ** 2    # 2 mA
    assert np.isclose(i_d, expect, rtol=1e-9)
    assert vd > 3.0 - 1.0                  # indeed saturated


def test_pmos_mirror_of_nmos():
    c = pe.Circuit()
    nl = c.nl
    vss = netops.add_model(nl, VDC, {"V": -10.0})
    vg = netops.add_model(nl, VDC, {"V": -3.0})
    rd = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    m = netops.add_model(nl, PMOSFET, {"Kp": 1e-3, "Vth": 1.0})
    n_vss = netops.create_node(nl)
    n_g = netops.create_node(nl)
    n_d = netops.create_node(nl)
    netops.add_to_node(nl, vss, 0, n_vss)
    netops.add_to_node(nl, vss, 1, nl.ground_node)
    netops.add_to_node(nl, vg, 0, n_g)
    netops.add_to_node(nl, vg, 1, nl.ground_node)
    netops.add_to_node(nl, rd, 0, n_vss)
    netops.add_to_node(nl, rd, 1, n_d)
    netops.add_to_node(nl, m, 0, n_d)            # D
    netops.add_to_node(nl, m, 1, n_g)            # G
    netops.add_to_node(nl, m, 2, nl.ground_node)  # S (at 0, source)
    c.set_analyze_type(AnalyzeType.OP)
    assert c.analyze()
    vd = c.node_voltage(n_d).real
    i_d = (vd - (-10.0)) / 1e3              # current into drain node from rd
    expect = 0.5e-3 * (3.0 - 1.0) ** 2
    assert np.isclose(i_d, expect, rtol=1e-9)


def test_relay_hysteresis():
    """relay_hysteresis.cpp analogue: Von/Voff switching with hysteresis."""
    c = pe.Circuit()
    nl = c.nl
    vc = netops.add_model(nl, VDC, {"V": 0.0})       # coil drive
    vs = netops.add_model(nl, VDC, {"V": 8.0})       # contact supply
    rl = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    rel = netops.add_model(nl, RELAY, {"Von": 5.0, "Voff": 3.0})
    n_coil = netops.create_node(nl)
    n_sup = netops.create_node(nl)
    n_out = netops.create_node(nl)
    netops.add_to_node(nl, vc, 0, n_coil)
    netops.add_to_node(nl, vc, 1, nl.ground_node)
    netops.add_to_node(nl, vs, 0, n_sup)
    netops.add_to_node(nl, vs, 1, nl.ground_node)
    netops.add_to_node(nl, rel, 0, n_coil)           # C+
    netops.add_to_node(nl, rel, 1, nl.ground_node)   # C-
    netops.add_to_node(nl, rel, 2, n_sup)            # A
    netops.add_to_node(nl, rel, 3, n_out)            # B
    netops.add_to_node(nl, rl, 0, n_out)
    netops.add_to_node(nl, rl, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.DC)

    def out_v():
        assert c.analyze()
        return c.node_voltage(n_out).real

    assert out_v() < 1e-3                        # released
    vc.set_attribute("V", 6.0)
    assert np.isclose(out_v(), 8.0, atol=1e-5)   # engaged (>= Von)
    vc.set_attribute("V", 4.0)
    assert np.isclose(out_v(), 8.0, atol=1e-5)   # stays engaged (hysteresis)
    vc.set_attribute("V", 2.0)
    assert out_v() < 1e-3                        # released (<= Voff)


def test_diode_rc_rectifier_tr():
    """Half-wave rectifier reaches a positive cap voltage (TR+nonlinear)."""
    from phy_engine_tpu.models import VAC
    c = pe.Circuit()
    nl = c.nl
    freq = 1e3
    v = netops.add_model(nl, VAC, {"Vp": 5.0, "freq": freq})
    d = netops.add_model(nl, PN_JUNCTION, {})
    r = netops.add_model(nl, RESISTANCE, {"r": 10e3})
    cap = netops.add_model(nl, CAPACITOR, {"C": 1e-6})
    n_in = netops.create_node(nl)
    n_out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n_in)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, d, 0, n_in)
    netops.add_to_node(nl, d, 1, n_out)
    netops.add_to_node(nl, r, 0, n_out)
    netops.add_to_node(nl, r, 1, nl.ground_node)
    netops.add_to_node(nl, cap, 0, n_out)
    netops.add_to_node(nl, cap, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.TR)
    c.tr.t_step = 1.0 / freq / 200.0
    c.tr.t_stop = 3.0 / freq
    assert c.analyze()
    wave = c.tr_waveform(n_out)
    assert wave.max() > 3.5          # peak minus a diode drop
    assert wave.min() > -0.5         # rectified: never strongly negative


def test_full_bridge_rectifier_tr():
    """Full-wave rectifier: both AC half-cycles drive the load positive
    (full_bridge_rectifier.h composite-of-4-diodes semantics)."""
    from phy_engine_tpu.models import VAC, FULL_BRIDGE_RECTIFIER
    c = pe.Circuit()
    nl = c.nl
    freq = 1e3
    v = netops.add_model(nl, VAC, {"Vp": 5.0, "freq": freq})
    fbr = netops.add_model(nl, FULL_BRIDGE_RECTIFIER, {})
    rl = netops.add_model(nl, RESISTANCE, {"r": 10e3})
    # DC- is tied to ground so node voltages are referenced there.
    n_a = netops.create_node(nl)
    n_b = netops.create_node(nl)
    n_p = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n_a)
    netops.add_to_node(nl, v, 1, n_b)
    netops.add_to_node(nl, fbr, 0, n_a)
    netops.add_to_node(nl, fbr, 1, n_b)
    netops.add_to_node(nl, fbr, 2, n_p)
    netops.add_to_node(nl, fbr, 3, nl.ground_node)
    netops.add_to_node(nl, rl, 0, n_p)
    netops.add_to_node(nl, rl, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.TR)
    c.tr.t_step = 1.0 / freq / 200.0
    c.tr.t_stop = 2.0 / freq
    assert c.analyze()
    wave = np.asarray(c.tr_waveform(n_p))
    # full-wave: output stays non-negative and peaks near Vp - 2 diode
    # drops on BOTH half cycles.
    assert wave.max() > 3.0
    assert wave.min() > -0.2
    # second half-cycle also rectified: a peak exists in each half period
    half = len(wave) // 4
    assert wave[half:2 * half].max() > 3.0 or wave[:half].max() > 3.0
    mid = len(wave) // 2
    assert wave[mid:].max() > 3.0


def test_bjt_stiff_bias_pnjlim():
    """Stiff base-bias network: VDC 3V -> 47k -> base, collector tied
    high, emitter grounded.  The reference's raw-exponential BJT stamp
    (BJT_NPN.h:116-160, no limiting) diverges here; the pnjlim
    junction limiter (extension past parity) must converge to the
    textbook drop.  Both polarities."""
    from phy_engine_tpu.models import BJT_PNP

    def build(pnp):
        env = pe.Environment(V_eps_max=1e-12, V_epsr_max=1e-9)
        c = pe.Circuit(env=env)
        nl = c.nl
        v = netops.add_model(nl, VDC, {"V": 3.0})
        top = netops.create_node(nl)
        b = netops.create_node(nl)
        netops.add_to_node(nl, v, 0, top)
        netops.add_to_node(nl, v, 1, nl.ground_node)
        r = netops.add_model(nl, RESISTANCE, {"r": 47e3})
        q = netops.add_model(nl, BJT_PNP if pnp else BJT_NPN, {})
        if pnp:
            netops.add_to_node(nl, r, 0, nl.ground_node)
            netops.add_to_node(nl, r, 1, b)
            netops.add_to_node(nl, q, 0, b)
            netops.add_to_node(nl, q, 1, nl.ground_node)
            netops.add_to_node(nl, q, 2, top)
        else:
            netops.add_to_node(nl, r, 0, top)
            netops.add_to_node(nl, r, 1, b)
            netops.add_to_node(nl, q, 0, b)
            netops.add_to_node(nl, q, 1, top)
            netops.add_to_node(nl, q, 2, nl.ground_node)
        return c, b

    for pnp in (False, True):
        c, b = build(pnp)
        assert c.analyze()
        vb = c.node_voltage(b).real
        vj = (3.0 - vb) if pnp else vb
        assert 0.3 < vj < 1.0
        # KCL at the base: I_R == I_B = Is*(exp(vj/Ut)-1)
        i_r = (3.0 - vj) / 47e3
        ut = 1.380650524e-23 * (27.0 + 273.15) / 1.6021765314e-19
        i_b = 1e-16 * (np.exp(vj / ut) - 1.0)
        assert np.isclose(i_r, i_b, rtol=1e-5)
