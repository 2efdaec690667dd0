"""Internal-node lowering + BSIM3 terminal-parasitic variant.

The reference's models can create per-instance internal nodes during
prepare() (model_refs/concept.h can_generate_internal_node_view;
bsim3v32.h:3380-3400 stamps rd/rs/rg/rb as resistors to intrinsic
nodes).  Here ``ModelDef.n_internal`` makes the lowering allocate
fresh nodes per instance and extend the stamp's pin vector."""

import numpy as np
import jax.numpy as jnp
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import (RESISTANCE, VDC, BSIM3V32_NMOS,
                                   BSIM3V32_NMOS_RC)


def _bias_circuit(model, **extra):
    """Common-source stage: VDD -> RL -> drain; gate driven by VG."""
    c = pe.Circuit()
    c.set_analyze_type(pe.AnalyzeType.OP)
    nl = c.nl
    vdd_n = netops.create_node(nl)
    d_n = netops.create_node(nl)
    g_n = netops.create_node(nl)
    gnd = nl.ground_node
    vdd = netops.add_model(nl, VDC, {"V": 3.0})
    netops.add_to_node(nl, vdd, 0, vdd_n)
    netops.add_to_node(nl, vdd, 1, gnd)
    vg = netops.add_model(nl, VDC, {"V": 1.5})
    netops.add_to_node(nl, vg, 0, g_n)
    netops.add_to_node(nl, vg, 1, gnd)
    rl = netops.add_model(nl, RESISTANCE, {"r": 10e3})
    netops.add_to_node(nl, rl, 0, vdd_n)
    netops.add_to_node(nl, rl, 1, d_n)
    params = {"W": 10e-6, "L": 1e-6, "Kp": 2e-4, "Vth0": 0.7}
    params.update(extra)
    m = netops.add_model(nl, model, params)
    netops.add_to_node(nl, m, 0, d_n)   # D
    netops.add_to_node(nl, m, 1, g_n)   # G
    netops.add_to_node(nl, m, 2, gnd)   # S
    netops.add_to_node(nl, m, 3, gnd)   # B
    return c, d_n


def test_internal_nodes_allocated():
    c, _ = _bias_circuit(BSIM3V32_NMOS_RC)
    ir = c.prepare()
    # 3 external nets + 4 internal nodes
    assert ir.n_nodes == 7
    names = [nd.name for nd in ir.node_list]
    assert sum(1 for s in names if s.startswith("BSIM3_NMOS_RC.int")) \
        == 4


def test_rc_zero_resistance_matches_base():
    """With all parasitics ~0 the RC variant reproduces the 4-node
    model's operating point."""
    c0, d0 = _bias_circuit(BSIM3V32_NMOS)
    assert c0.analyze()
    c1, d1 = _bias_circuit(BSIM3V32_NMOS_RC)
    assert c1.analyze()
    v0 = c0.node_voltage(d0).real
    v1 = c1.node_voltage(d1).real
    assert v0 < 2.9                 # transistor actually conducting
    assert np.isclose(v0, v1, atol=1e-5)


def test_rc_drain_resistance_raises_vd():
    """Series drain resistance adds IR drop: the internal drain sits
    below the external drain and the external drain voltage rises
    (less effective vds -> slightly less current through RL)."""
    c0, d0 = _bias_circuit(BSIM3V32_NMOS_RC)
    assert c0.analyze()
    c1, d1 = _bias_circuit(BSIM3V32_NMOS_RC, rd=2000.0)
    assert c1.analyze()
    v0 = c0.node_voltage(d0).real
    v1 = c1.node_voltage(d1).real
    assert v1 > v0 + 1e-3


def test_rc_source_resistance_degenerates():
    """Source degeneration reduces the drain current (higher vd)."""
    c0, d0 = _bias_circuit(BSIM3V32_NMOS_RC)
    c1, d1 = _bias_circuit(BSIM3V32_NMOS_RC, rs=1000.0)
    assert c0.analyze() and c1.analyze()
    assert c1.node_voltage(d1).real > c0.node_voltage(d0).real + 0.05


def test_rc_rsh_nrd_adds_sheet_resistance():
    """rd_total = rd + rsh*nrd (bsim3v32.h:3391)."""
    c0, d0 = _bias_circuit(BSIM3V32_NMOS_RC, rd=2000.0)
    c1, d1 = _bias_circuit(BSIM3V32_NMOS_RC, rd=1000.0, rsh=500.0,
                           nrd=2.0)
    assert c0.analyze() and c1.analyze()
    assert np.isclose(c0.node_voltage(d0).real,
                      c1.node_voltage(d1).real, atol=1e-6)


def test_rc_internal_node_voltage_written_back():
    """Internal nodes are written back like real nets (reference:
    internal nodes are ordinary netlist nodes)."""
    c, d_n = _bias_circuit(BSIM3V32_NMOS_RC, rd=2000.0)
    assert c.analyze()
    ir = c.prepare()
    d_int = [nd for nd in ir.node_list
             if nd.name == "BSIM3_NMOS_RC.int0"][0]
    vd_ext = c.node_voltage(d_n).real
    vd_int = d_int.voltage.real
    assert vd_int < vd_ext - 1e-3   # IR drop across rd


def test_rc_transient_runs():
    """TR with the 8-terminal companion (64-entry G state)."""
    c, d_n = _bias_circuit(BSIM3V32_NMOS_RC, rd=500.0, cgso=1e-10,
                           capmod=1.0)
    c.set_analyze_type(pe.AnalyzeType.TROP)
    c.tr.t_step = 1e-9
    c.tr.t_stop = 20e-9
    assert c.analyze()
    assert np.isfinite(c.node_voltage(d_n).real)


def test_attribute_aliases():
    """Reference attribute spellings resolve to canonical params
    (bsim3v32.h:2865+ name table: w/l/kp, diode_Isd/isd, Rd/rd...)."""
    c = pe.Circuit()
    nl = c.nl
    m = netops.add_model(nl, BSIM3V32_NMOS, {})
    assert m.set_attribute("w", 5e-6)
    assert m.get_attribute("W") == 5e-6
    assert m.set_attribute("diode_Isd", 1e-13)
    assert m.get_attribute("isd") == 1e-13
    assert m.set_attribute("Rd", 100.0)
    assert m.get_attribute("rd") == 100.0
    assert m.set_attribute("drainArea", 2e-12)
    assert m.get_attribute("ad") == 2e-12
    assert m.set_attribute("capMod", 1.0)
    assert m.get_attribute("capmod") == 1.0
    assert not m.set_attribute("no_such_param", 1.0)


def test_rc_ac_small_signal():
    """AC through the 8-terminal parasitic stamp: a common-source
    stage has finite low-frequency gain and Cgd Miller roll-off at
    high frequency (validates J + jwC of the *_RC ac_stamp)."""
    from phy_engine_tpu.models import VAC
    from phy_engine_tpu.engine.circuit import AnalyzeType, ACSweepType

    def build():
        c = pe.Circuit()
        nl = c.nl
        vdd_n = netops.create_node(nl)
        d_n = netops.create_node(nl)
        g_n = netops.create_node(nl)
        gb_n = netops.create_node(nl)
        gnd = nl.ground_node
        vdd = netops.add_model(nl, VDC, {"V": 3.0})
        netops.add_to_node(nl, vdd, 0, vdd_n)
        netops.add_to_node(nl, vdd, 1, gnd)
        vb = netops.add_model(nl, VDC, {"V": 1.0})
        netops.add_to_node(nl, vb, 0, gb_n)
        netops.add_to_node(nl, vb, 1, gnd)
        vac = netops.add_model(nl, VAC, {"Vp": 1.0})
        netops.add_to_node(nl, vac, 0, g_n)
        netops.add_to_node(nl, vac, 1, gb_n)
        rl = netops.add_model(nl, RESISTANCE, {"r": 10e3})
        netops.add_to_node(nl, rl, 0, vdd_n)
        netops.add_to_node(nl, rl, 1, d_n)
        m = netops.add_model(nl, BSIM3V32_NMOS_RC,
                             {"W": 10e-6, "L": 1e-6, "Kp": 2e-4,
                              "Vth0": 0.7, "rd": 200.0,
                              "Cgd": 5e-12})
        netops.add_to_node(nl, m, 0, d_n)
        netops.add_to_node(nl, m, 1, g_n)
        netops.add_to_node(nl, m, 2, gnd)
        netops.add_to_node(nl, m, 3, gnd)
        return c, d_n

    def gain(w):
        c, d_n = build()
        c.set_analyze_type(AnalyzeType.AC)
        c.ac.sweep = ACSweepType.SINGLE
        c.ac.omega = w
        assert c.analyze()
        return abs(c.node_voltage(d_n))

    h_lo = gain(1e3)
    assert np.isfinite(h_lo) and h_lo > 1.0   # real gain at low freq
    # past the output pole 1/(RL*Cgd) = 2e7 rad/s -> roll-off bites
    h_mid = gain(8e7)
    assert h_mid < 0.7 * h_lo
    # w -> inf: Cgd feeds the gate signal straight through, |H| -> 1
    h_hi = gain(1e10)
    assert 0.5 < h_hi < 2.0
