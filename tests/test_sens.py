"""Sensitivity analysis (engine/sens.py — SPICE .SENS class).

The reference has NO sensitivity analysis (nothing under
`circuits/analyzer/` computes parameter derivatives), so there is no
cross-engine oracle; these tests use closed-form derivatives and
central finite differences (SURVEY §4 tier-a pattern):

* resistor divider       -> closed-form dVout/dR1, dVout/dR2, dVout/dE;
* output-current variant -> dI(V1)/dR closed form;
* biased diode           -> FD cross-check through the Newton solve;
* AC RC lowpass          -> closed-form d|H|/dC at each sweep point;
* MOSFET amplifier (AC)  -> FD cross-check incl. the bias-shift chain
  (a bias-only parameter must price correctly at AC).
"""

import numpy as np

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.engine.circuit import (ACSettings, ACSweepType,
                                           AnalyzeType)
from phy_engine_tpu.models import (RESISTANCE, CAPACITOR, VDC, VAC,
                                   PN_JUNCTION, NMOSFET)


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


def test_divider_closed_form():
    r1, r2, e = 4.7e3, 1.2e3, 2.5
    c, v, ra, rb, out = _divider(r1, r2, e)
    res = c.sens(out)
    assert res is not None
    # Vout = E·R2/(R1+R2)
    dvdr1 = -e * r2 / (r1 + r2) ** 2
    dvdr2 = e * r1 / (r1 + r2) ** 2
    dvde = r2 / (r1 + r2)
    assert np.isclose(res.get(ra, "r"), dvdr1, rtol=1e-9)
    assert np.isclose(res.get(rb, "r"), dvdr2, rtol=1e-9)
    assert np.isclose(res.get(v, "V"), dvde, rtol=1e-9)
    # normalized rows = p·dV/dp
    rows = {(n, p): nrm for n, p, _val, nrm in res.rows()}
    got = [nrm for (_n, p), nrm in rows.items() if p == "V"]
    assert np.isclose(got[0], e * dvde, rtol=1e-9)


def test_branch_current_output():
    """Output = I(V1): I = -E/(R1+R2) (branch current flows out of +),
    so dI/dR1 = E/(R1+R2)^2."""
    r1, r2, e = 1e3, 3e3, 2.0
    c, v, ra, rb, out = _divider(r1, r2, e)
    res = c.sens(v)
    assert res is not None
    want = e / (r1 + r2) ** 2
    assert np.isclose(res.get(ra, "r"), want, rtol=1e-9)
    assert np.isclose(res.get(rb, "r"), want, rtol=1e-9)


def _diode_chain(e, r):
    # tight Newton tolerances: the adjoint is exact at the true fixed
    # point, so the comparison floor is the convergence tolerance
    env = pe.Environment(V_eps_max=1e-12, V_epsr_max=1e-9)
    c = pe.Circuit(env=env)
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": e})
    top = netops.create_node(nl)
    out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    ra = netops.add_model(nl, RESISTANCE, {"r": r})
    netops.add_to_node(nl, ra, 0, top)
    netops.add_to_node(nl, ra, 1, out)
    d = netops.add_model(nl, PN_JUNCTION, {})
    netops.add_to_node(nl, d, 0, out)
    netops.add_to_node(nl, d, 1, nl.ground_node)
    return c, v, ra, d, out


def test_diode_fd_cross_check():
    """Nonlinear OP: adjoint sensitivity vs central finite
    differences through full re-solves."""
    e, r = 2.0, 1e3
    c, v, ra, d, out = _diode_chain(e, r)
    res = c.sens(out)
    assert res is not None

    def vout(rval, eval_):
        c2, v2, ra2, d2, out2 = _diode_chain(eval_, rval)
        assert c2.analyze()
        return c2.node_voltage(out2).real

    h = 1e-3
    fd_r = (vout(r * (1 + h), e) - vout(r * (1 - h), e)) / (2 * r * h)
    fd_e = (vout(r, e + h) - vout(r, e - h)) / (2 * h)
    assert np.isclose(res.get(ra, "r"), fd_r, rtol=2e-4)
    assert np.isclose(res.get(v, "V"), fd_e, rtol=2e-4)


def test_ac_rc_closed_form():
    """RC lowpass driven by unit AC source: |H| = 1/sqrt(1+(wRC)^2),
    d|H|/dC = -w^2 R^2 C (1+(wRC)^2)^{-3/2}."""
    R, C = 1e3, 1e-9
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VAC, {"Vp": 1.0, "phase": 0.0})
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
    w3 = 1.0 / (R * C)
    c.ac = ACSettings(sweep=ACSweepType.LOG, omega_start=w3 / 100,
                      omega_stop=w3 * 100, points=9)
    got = c.sens_ac(out)
    assert got is not None
    freqs, mag, res = got
    w = 2 * np.pi * freqs
    wrc = w * R * C
    assert np.allclose(mag, 1.0 / np.sqrt(1 + wrc ** 2), rtol=1e-9)
    want_dc = -(w ** 2) * R * R * C * (1 + wrc ** 2) ** -1.5
    assert np.allclose(res.get(cl, "C"), want_dc, rtol=1e-8)
    want_dr = -(w ** 2) * R * C * C * (1 + wrc ** 2) ** -1.5
    assert np.allclose(res.get(ra, "r"), want_dr, rtol=1e-8)


def _mos_amp(vb):
    """Common-source square-law NMOS stage with a unit AC gate drive
    on top of the VDC bias VB.  VB only enters AC through the bias
    point (gm), so its AC sensitivity exercises the full bias-shift
    chain in sens_ac."""
    c = pe.Circuit()
    nl = c.nl
    vdd = netops.add_model(nl, VDC, {"V": 5.0})
    vg = netops.add_model(nl, VDC, {"V": vb})
    vsig = netops.add_model(nl, VAC, {"Vp": 1.0, "phase": 0.0})
    nd_vdd = netops.create_node(nl)
    nd_mid = netops.create_node(nl)
    nd_g = netops.create_node(nl)
    nd_d = netops.create_node(nl)
    netops.add_to_node(nl, vdd, 0, nd_vdd)
    netops.add_to_node(nl, vdd, 1, nl.ground_node)
    netops.add_to_node(nl, vsig, 0, nd_mid)
    netops.add_to_node(nl, vsig, 1, nl.ground_node)
    netops.add_to_node(nl, vg, 0, nd_g)
    netops.add_to_node(nl, vg, 1, nd_mid)
    rl = netops.add_model(nl, RESISTANCE, {"r": 10e3})
    netops.add_to_node(nl, rl, 0, nd_vdd)
    netops.add_to_node(nl, rl, 1, nd_d)
    m = netops.add_model(nl, NMOSFET, {})
    netops.add_to_node(nl, m, 0, nd_d)            # drain
    netops.add_to_node(nl, m, 1, nd_g)            # gate
    netops.add_to_node(nl, m, 2, nl.ground_node)  # source
    return c, vg, nd_d


def test_ac_mos_bias_chain_fd():
    """d|V(d)|/dVB at AC vs finite differences: nonzero only via the
    bias shift — validates the save_op chain in sens_ac."""
    vb = 1.6
    w = 2 * np.pi * 1e3
    c, vg, nd_d = _mos_amp(vb)
    c.ac = ACSettings(sweep=ACSweepType.SINGLE, omega=w)
    got = c.sens_ac(nd_d)
    assert got is not None
    _freqs, mag, res = got
    s = res.get(vg, "V")
    s = float(np.asarray(s).reshape(-1)[0])

    def mag_at(vbv):
        c2, vg2, nd2 = _mos_amp(vbv)
        c2.ac = ACSettings(sweep=ACSweepType.SINGLE, omega=w)
        c2.set_analyze_type(AnalyzeType.AC)
        assert c2.analyze()
        return abs(c2.node_voltage(nd2))

    h = 1e-4
    fd = (mag_at(vb + h) - mag_at(vb - h)) / (2 * h)
    assert abs(fd) > 1e-3          # the stage actually amplifies
    assert np.isclose(s, fd, rtol=5e-3)


def test_api_element_surface():
    """api.Circuit.sens — element-index surface over the adjoint
    sweep (mirrors the reference's python/ctypes surface shape)."""
    from phy_engine_tpu.api import Circuit, Element, Wire, ElementCode
    r1, r2, e = 4.7e3, 1.2e3, 2.5
    elements = [
        Element(ElementCode.GROUND),
        Element(ElementCode.VDC, (e,)),
        Element(ElementCode.RESISTOR, (r1,)),
        Element(ElementCode.RESISTOR, (r2,)),
    ]
    wires = [
        Wire(1, 0, 2, 0),
        Wire(2, 1, 3, 0),
        Wire(3, 1, 0, 0),
        Wire(1, 1, 0, 0),
    ]
    c = Circuit(elements, wires)
    res = c.sens(2, out_pin=1)
    rows = {(n, p): v for n, p, v, _nrm in res.rows()}
    vals = sorted(v for (n, p), v in rows.items() if p == "r")
    dvdr1 = -e * r2 / (r1 + r2) ** 2
    dvdr2 = e * r1 / (r1 + r2) ** 2
    assert np.allclose(vals, sorted([dvdr1, dvdr2]), rtol=1e-9)
