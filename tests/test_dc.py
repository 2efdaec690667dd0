"""DC / operating-point tests.

Oracles follow the reference's unit-test pattern (test/0005.models):
closed-form dividers and ratios checked against analytic expectations.
"""

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import (RESISTANCE, VDC, IDC, VCVS, VCCS, CCVS,
                                   CCCS, OP_AMP, TRANSFORMER, SWITCH)
from phy_engine_tpu.engine.circuit import AnalyzeType


def make_circuit():
    c = pe.Circuit()
    c.set_analyze_type(AnalyzeType.DC)
    return c


def test_voltage_divider():
    c = make_circuit()
    nl = c.nl
    r1 = netops.add_model(nl, RESISTANCE, {"r": 1000.0})
    r2 = netops.add_model(nl, RESISTANCE, {"r": 3000.0})
    v = netops.add_model(nl, VDC, {"V": 4.0})
    top = netops.create_node(nl)
    mid = netops.create_node(nl)
    gnd = nl.ground_node
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, gnd)
    netops.add_to_node(nl, r1, 0, top)
    netops.add_to_node(nl, r1, 1, mid)
    netops.add_to_node(nl, r2, 0, mid)
    netops.add_to_node(nl, r2, 1, gnd)
    assert c.analyze()
    assert np.isclose(c.node_voltage(top).real, 4.0, atol=1e-9)
    assert np.isclose(c.node_voltage(mid).real, 3.0, atol=1e-9)
    # branch current through the source: V/(R1+R2) = 1 mA flowing + -> -
    assert np.isclose(v.branches[0].current.real, -1e-3, atol=1e-12)


def test_series_parallel_ladder():
    """Random series ladder vs numpy solve (series_parallel.cpp analogue)."""
    rng = np.random.default_rng(42)
    n = 50
    rs = rng.uniform(10.0, 1e4, size=n)
    c = make_circuit()
    nl = c.nl
    vsrc = netops.add_model(nl, VDC, {"V": 3.0})
    nodes = [netops.create_node(nl) for _ in range(n)]
    netops.add_to_node(nl, vsrc, 0, nodes[0])
    netops.add_to_node(nl, vsrc, 1, nl.ground_node)
    for i, r in enumerate(rs):
        m = netops.add_model(nl, RESISTANCE, {"r": float(r)})
        netops.add_to_node(nl, m, 0, nodes[i])
        tgt = nl.ground_node if i == n - 1 else nodes[i + 1]
        netops.add_to_node(nl, m, 1, tgt)
    assert c.analyze()
    # analytic: current = V / sum(R), node k voltage = V * (1 - cum/total)
    total = rs.sum()
    i_expect = 3.0 / total
    cum = np.cumsum(rs)
    for k in range(1, n):
        expect = 3.0 * (1.0 - cum[k - 1] / total)
        got = c.node_voltage(nodes[k]).real
        assert np.isclose(got, expect, rtol=1e-9), (k, got, expect)
    assert np.isclose(vsrc.branches[0].current.real, -i_expect, rtol=1e-9)


def test_current_source_divider():
    c = make_circuit()
    nl = c.nl
    i1 = netops.add_model(nl, IDC, {"I": 2e-3})
    r1 = netops.add_model(nl, RESISTANCE, {"r": 500.0})
    n1 = netops.create_node(nl)
    # IDC: current flows A->B through the source; stamp pulls from node A
    netops.add_to_node(nl, i1, 0, nl.ground_node)
    netops.add_to_node(nl, i1, 1, n1)
    netops.add_to_node(nl, r1, 0, n1)
    netops.add_to_node(nl, r1, 1, nl.ground_node)
    assert c.analyze()
    assert np.isclose(c.node_voltage(n1).real, 1.0, atol=1e-12)


def test_vcvs_gain():
    """vcvs_gain.cpp analogue: out = mu * (control voltage)."""
    c = make_circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 1.5})
    e = netops.add_model(nl, VCVS, {"mu": 4.0})
    rload = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    nin = netops.create_node(nl)
    nout = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, nin)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, e, 0, nout)           # S (out+)
    netops.add_to_node(nl, e, 1, nl.ground_node)  # T
    netops.add_to_node(nl, e, 2, nin)            # P (ctrl+)
    netops.add_to_node(nl, e, 3, nl.ground_node)  # Q
    netops.add_to_node(nl, rload, 0, nout)
    netops.add_to_node(nl, rload, 1, nl.ground_node)
    assert c.analyze()
    assert np.isclose(c.node_voltage(nout).real, 6.0, atol=1e-9)


def test_vccs_and_cccs():
    c = make_circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 2.0})
    g = netops.add_model(nl, VCCS, {"g": 1e-3})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    nin = netops.create_node(nl)
    nout = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, nin)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, g, 0, nout)
    netops.add_to_node(nl, g, 1, nl.ground_node)
    netops.add_to_node(nl, g, 2, nin)
    netops.add_to_node(nl, g, 3, nl.ground_node)
    netops.add_to_node(nl, r, 0, nout)
    netops.add_to_node(nl, r, 1, nl.ground_node)
    assert c.analyze()
    # i = g*vin = 2 mA pulled out of node S -> v(out) = -i*R = -2 V
    assert np.isclose(c.node_voltage(nout).real, -2.0, atol=1e-9)


def test_opamp_follower():
    c = make_circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 1.25})
    oa = netops.add_model(nl, OP_AMP, {"mu": 1e6})
    nin = netops.create_node(nl)
    nout = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, nin)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, oa, 0, nin)            # +
    netops.add_to_node(nl, oa, 1, nout)           # - (feedback)
    netops.add_to_node(nl, oa, 2, nout)           # OUT+
    netops.add_to_node(nl, oa, 3, nl.ground_node)  # OUT-
    assert c.analyze()
    assert np.isclose(c.node_voltage(nout).real, 1.25, rtol=1e-5)


def test_transformer_ratio():
    """transformer_ratio.cpp analogue: Vp = n Vs under load."""
    c = make_circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 10.0})
    tx = netops.add_model(nl, TRANSFORMER, {"n": 2.0})
    rl = netops.add_model(nl, RESISTANCE, {"r": 100.0})
    np_ = netops.create_node(nl)
    ns = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, np_)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, tx, 0, np_)              # P
    netops.add_to_node(nl, tx, 1, nl.ground_node)   # Q
    netops.add_to_node(nl, tx, 2, ns)               # S
    netops.add_to_node(nl, tx, 3, nl.ground_node)   # T
    netops.add_to_node(nl, rl, 0, ns)
    netops.add_to_node(nl, rl, 1, nl.ground_node)
    assert c.analyze()
    # Vp = n * Vs -> Vs = 10/2 = 5
    assert np.isclose(c.node_voltage(ns).real, 5.0, atol=1e-9)


def test_switch_open_closed():
    c = make_circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 5.0})
    sw = netops.add_model(nl, SWITCH, {"cut_through": 0.0})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    a = netops.create_node(nl)
    b = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, a)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, sw, 0, a)
    netops.add_to_node(nl, sw, 1, b)
    netops.add_to_node(nl, r, 0, b)
    netops.add_to_node(nl, r, 1, nl.ground_node)
    assert c.analyze()
    assert c.node_voltage(b).real < 1e-6           # open: ~0 V across load
    sw.set_attribute("cut_through", 1.0)
    assert c.analyze()
    assert np.isclose(c.node_voltage(b).real, 5.0, atol=1e-6)


def test_parameter_edit_no_restructure():
    c = make_circuit()
    nl = c.nl
    r1 = netops.add_model(nl, RESISTANCE, {"r": 1000.0})
    r2 = netops.add_model(nl, RESISTANCE, {"r": 1000.0})
    v = netops.add_model(nl, VDC, {"V": 2.0})
    top = netops.create_node(nl)
    mid = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r1, 0, top)
    netops.add_to_node(nl, r1, 1, mid)
    netops.add_to_node(nl, r2, 0, mid)
    netops.add_to_node(nl, r2, 1, nl.ground_node)
    assert c.analyze()
    assert np.isclose(c.node_voltage(mid).real, 1.0)
    ir_before = c._ir
    r2.set_attribute("r", 3000.0)
    assert c.analyze()
    assert c._ir is ir_before          # no recompile on parameter edit
    assert np.isclose(c.node_voltage(mid).real, 1.5)


def test_profile_solve_hooks(capfd, monkeypatch):
    """PE_TPU_PROFILE_SOLVE[_VALIDATE] print a per-solve stderr report
    with a residual check (reference: PHY_ENGINE_PROFILE_SOLVE)."""
    monkeypatch.setenv("PE_TPU_PROFILE_SOLVE", "1")
    monkeypatch.setenv("PE_TPU_PROFILE_SOLVE_VALIDATE", "1")
    c = make_circuit()
    nl = c.nl
    r1 = netops.add_model(nl, RESISTANCE, {"r": 1000.0})
    r2 = netops.add_model(nl, RESISTANCE, {"r": 3000.0})
    v = netops.add_model(nl, VDC, {"V": 8.0})
    top = netops.create_node(nl)
    mid = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r1, 0, top)
    netops.add_to_node(nl, r1, 1, mid)
    netops.add_to_node(nl, r2, 0, mid)
    netops.add_to_node(nl, r2, 1, nl.ground_node)
    assert c.analyze()
    err = capfd.readouterr().err
    assert "[pe-tpu-profile]" in err
    assert "max_residual=" in err
    resid = float(err.split("max_residual=")[1].split()[0])
    assert resid < 1e-6
