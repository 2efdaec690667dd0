"""AC small-signal tests vs analytic transfer functions.

Mirrors test/0012.ac and test/0004.solver/ac.cpp patterns.
"""

import numpy as np

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import (RESISTANCE, CAPACITOR, INDUCTOR, VAC,
                                   COUPLED_INDUCTORS)
from phy_engine_tpu.engine.circuit import AnalyzeType, ACSweepType


def _rc_lowpass(c):
    nl = c.nl
    R, C = 1e3, 1e-6
    v = netops.add_model(nl, VAC, {"Vp": 1.0})
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
    return R, C, n_out


def test_rc_lowpass_single():
    c = pe.Circuit()
    R, C, n_out = _rc_lowpass(c)
    c.set_analyze_type(AnalyzeType.AC)
    w = 1.0 / (R * C)      # corner: |H| = 1/sqrt(2), phase -45deg
    c.ac.sweep = ACSweepType.SINGLE
    c.ac.omega = w
    assert c.analyze()
    h = c.node_voltage(n_out)
    assert np.isclose(abs(h), 1.0 / np.sqrt(2.0), rtol=1e-9)
    assert np.isclose(np.angle(h), -np.pi / 4.0, rtol=1e-9)


def test_rc_lowpass_log_sweep():
    c = pe.Circuit()
    R, C, n_out = _rc_lowpass(c)
    c.set_analyze_type(AnalyzeType.AC)
    c.ac.sweep = ACSweepType.LOG
    c.ac.omega_start = 1.0
    c.ac.omega_stop = 1e6
    c.ac.points = 40
    assert c.analyze()
    idx = c._ir.index_of(n_out)
    for w, x in c.ac_sweep_results:
        h = x[idx]
        expect = 1.0 / (1.0 + 1j * w * R * C)
        assert np.isclose(h, expect, rtol=1e-9), (w, h, expect)


def test_rlc_resonance():
    """Series RLC: |I| peaks at w0 = 1/sqrt(LC) with I = V/R."""
    R, L, C = 10.0, 1e-3, 1e-6
    w0 = 1.0 / np.sqrt(L * C)
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VAC, {"Vp": 1.0})
    r = netops.add_model(nl, RESISTANCE, {"r": R})
    ind = netops.add_model(nl, INDUCTOR, {"L": L})
    cap = netops.add_model(nl, CAPACITOR, {"C": C})
    n1 = netops.create_node(nl)
    n2 = netops.create_node(nl)
    n3 = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n1)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n1)
    netops.add_to_node(nl, r, 1, n2)
    netops.add_to_node(nl, ind, 0, n2)
    netops.add_to_node(nl, ind, 1, n3)
    netops.add_to_node(nl, cap, 0, n3)
    netops.add_to_node(nl, cap, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.AC)
    c.ac.sweep = ACSweepType.SINGLE
    c.ac.omega = w0
    assert c.analyze()
    i_src = v.branches[0].current
    # at resonance the impedance is purely R -> |I| = 1/R (source supplies -I)
    assert np.isclose(abs(i_src), 1.0 / R, rtol=1e-9)


def test_coupled_inductors_transformer_action():
    """Tightly-coupled inductors approximate an ideal transformer
    n = sqrt(L1/L2) at high frequency."""
    L1, L2, k = 1.0, 0.25, 0.99999
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VAC, {"Vp": 1.0})
    kl = netops.add_model(nl, COUPLED_INDUCTORS, {"L1": L1, "L2": L2, "k": k})
    rl = netops.add_model(nl, RESISTANCE, {"r": 50.0})
    np_ = netops.create_node(nl)
    ns = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, np_)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, kl, 0, np_)
    netops.add_to_node(nl, kl, 1, nl.ground_node)
    netops.add_to_node(nl, kl, 2, ns)
    netops.add_to_node(nl, kl, 3, nl.ground_node)
    netops.add_to_node(nl, rl, 0, ns)
    netops.add_to_node(nl, rl, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.AC)
    c.ac.sweep = ACSweepType.SINGLE
    c.ac.omega = 1e6
    assert c.analyze()
    vs = c.node_voltage(ns)
    # ideal ratio: Vs = Vp * sqrt(L2/L1) = 0.5
    assert np.isclose(abs(vs), 0.5, rtol=1e-2)
