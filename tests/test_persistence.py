"""Persistence tests (pe_nl_fileformat analogues): save/load round-trips,
checkpoint/resume by stable id, checksum validation."""

import json
import os

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import (RESISTANCE, CAPACITOR, VDC, PN_JUNCTION,
                                   VAC)
from phy_engine_tpu.engine.circuit import AnalyzeType
from phy_engine_tpu.io import save, load, SaveOptions, LoadOptions, \
    compute_stable_ids


def rc_diode_circuit():
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VAC, {"Vp": 5.0, "freq": 1e3}, name="src")
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3}, name="r1")
    d = netops.add_model(nl, PN_JUNCTION, {}, name="d1")
    cap = netops.add_model(nl, CAPACITOR, {"C": 1e-6}, name="c1")
    n1 = netops.create_node(nl, "in")
    n2 = netops.create_node(nl, "out")
    netops.add_to_node(nl, v, 0, n1)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n1)
    netops.add_to_node(nl, r, 1, n2)
    netops.add_to_node(nl, d, 0, n2)
    netops.add_to_node(nl, d, 1, nl.ground_node)
    netops.add_to_node(nl, cap, 0, n2)
    netops.add_to_node(nl, cap, 1, nl.ground_node)
    return c, n2


def test_structure_roundtrip(tmp_path):
    c, n2 = rc_diode_circuit()
    p = str(tmp_path / "a.penl")
    save(p, c)
    c2 = load(p)
    assert c2.nl.model_count() == 4
    assert [m.mdef.id_name for m in c2.nl.live_models()] == \
        [m.mdef.id_name for m in c.nl.live_models()]
    # same topology -> same stable ids
    assert compute_stable_ids(c2.nl) == compute_stable_ids(c.nl)
    # loaded circuit analyzes identically
    c.set_analyze_type(AnalyzeType.TR)
    c.tr.t_step = 1e-6
    c.tr.t_stop = 1e-4
    assert c.analyze()
    c2.set_analyze_type(AnalyzeType.TR)
    c2.tr.t_step = 1e-6
    c2.tr.t_stop = 1e-4
    assert c2.analyze()
    out2 = [n for n in c2.nl.nodes if n.name == "out"][0]
    assert np.isclose(c.node_voltage(n2).real,
                      c2.node_voltage(out2).real, atol=1e-12)


def test_checkpoint_resume(tmp_path):
    """runtime_only checkpoint: run half, checkpoint, continue; compare
    against an uninterrupted run (bit-exact resume)."""
    c, n2 = rc_diode_circuit()
    c.set_analyze_type(AnalyzeType.TR)
    c.tr.t_step = 1e-6
    c.tr.t_stop = 2e-4
    assert c.analyze()
    full_final = c.node_voltage(n2).real

    # interrupted run
    ci, ni = rc_diode_circuit()
    ci.set_analyze_type(AnalyzeType.TR)
    ci.tr.t_step = 1e-6
    ci.tr.t_stop = 1e-4
    assert ci.analyze()
    p = str(tmp_path / "ckpt.penl")
    save(p, ci, SaveOptions(mode="runtime_only"))

    # fresh circuit, resume from checkpoint
    cr, nr = rc_diode_circuit()
    load(p, circuit=cr)
    assert np.isclose(cr.tr_duration, 1e-4)
    cr.tr.t_step = 1e-6
    cr.tr.t_stop = 1e-4
    cr.set_analyze_type(AnalyzeType.TR)
    # seed solver state from restored node voltages on prepare()
    assert cr.analyze()
    resumed_final = cr.node_voltage(nr).real
    assert np.isclose(resumed_final, full_final, rtol=1e-6)


def test_checksum_detects_corruption(tmp_path):
    c, _ = rc_diode_circuit()
    p = str(tmp_path / "x.penl")
    save(p, c)
    with open(p) as f:
        doc = json.load(f)
    doc["body"]["models"][0]["params"]["Vp"] = 99.0
    with open(p, "w") as f:
        json.dump(doc, f)
    from phy_engine_tpu.io.penl import LoadError
    with pytest.raises(LoadError):
        load(p)


def test_directory_layout(tmp_path):
    c, _ = rc_diode_circuit()
    p = str(tmp_path / "dir.penl")
    save(p, c, SaveOptions(layout="directory"))
    assert os.path.exists(os.path.join(p, "structure.json"))
    assert os.path.exists(os.path.join(p, "runtime.json"))
    c2 = load(p)
    assert c2.nl.model_count() == 4


def test_verilog_module_roundtrip(tmp_path):
    from phy_engine_tpu.models import make_verilog_module, INPUT
    from phy_engine_tpu.digital.logic import L, H
    src = """
module toggle(input clk, output q);
  reg s;
  always @(posedge clk) s <= ~s;
  initial s = 1'b0;
  assign q = s;
endmodule
"""
    c = pe.Circuit()
    nl = c.nl
    vm = netops.add_model(nl, make_verilog_module(src, top="toggle"))
    clk = netops.add_model(nl, INPUT, {"boolean": float(L)})
    nclk = netops.create_node(nl)
    nq = netops.create_node(nl)
    netops.add_to_node(nl, clk, 0, nclk)
    netops.add_to_node(nl, vm, 0, nclk)
    netops.add_to_node(nl, vm, 1, nq)
    c.digital_clk()
    clk.set_attribute("boolean", float(H))
    c.digital_clk()                      # toggles to 1
    assert c.node_digital(nq) == H
    p = str(tmp_path / "vm.penl")
    save(p, c)
    c2 = load(p)
    vm2 = c2.nl.live_models()[0]
    assert vm2.mdef.id_name == "VERILOG"
    # internal state restored: s == 1
    assert vm2.runtime["rt"].values["s"].to_int() == 1
