"""PhysicsLab scene interop tests (0014.phy_lab_wrapper / 0018.plsav
analogues)."""

import json

import numpy as np
import pytest

from phy_engine_tpu.api import ElementCode, DigitalState, AnalyzeType
from phy_engine_tpu.io.plsav import (Experiment, experiment_to_circuit,
                                     sync_inputs, write_back,
                                     circuit_to_experiment)
from phy_engine_tpu.io.layout import auto_layout


def build_and_scene():
    ex = Experiment("and-test")
    a = ex.add_element("Logic Input")
    b = ex.add_element("Logic Input")
    g = ex.add_element("And Gate")
    o = ex.add_element("Logic Output")
    ex.add_wire(a, 0, g, 0)
    ex.add_wire(b, 0, g, 1)
    ex.add_wire(g, 2, o, 0)
    return ex, (a, b, g, o)


def test_scene_roundtrip(tmp_path):
    ex, _ = build_and_scene()
    p = str(tmp_path / "x.sav")
    ex.save(p)
    ex2 = Experiment.load(p)
    assert len(ex2.elements) == 4
    assert len(ex2.wires) == 3
    assert ex2.elements[2].model_id == "And Gate"
    # the .sav outer shell is PL-compatible
    with open(p, encoding="utf-8") as f:
        root = json.load(f)
    assert root["Type"] == 0
    assert isinstance(root["Experiment"]["StatusSave"], str)
    status = json.loads(root["Experiment"]["StatusSave"])
    assert len(status["Elements"]) == 4


def test_scene_simulation_and_writeback():
    ex, (a, b, g, o) = build_and_scene()
    a.properties["开关"] = 1.0
    b.properties["开关"] = 1.0
    c, _ = experiment_to_circuit(ex)
    sync_inputs(ex, c)
    c.digital_clk()
    write_back(ex, c)
    assert o.properties["状态"] == 1.0
    b.properties["开关"] = 0.0
    sync_inputs(ex, c)
    c.digital_clk()
    write_back(ex, c)
    assert o.properties["状态"] == 0.0


def test_analog_scene():
    ex = Experiment("divider")
    v = ex.add_element("Battery Source", properties={"电压": 4.0,
                                                     "锁定": 1.0})
    r1 = ex.add_element("Resistor", properties={"电阻": 1000.0})
    r2 = ex.add_element("Resistor", properties={"电阻": 3000.0})
    gnd = ex.add_element("Ground Component")
    ex.add_wire(v, 0, r1, 0)
    ex.add_wire(r1, 1, r2, 0)
    ex.add_wire(r2, 1, gnd, 0)
    ex.add_wire(v, 1, gnd, 0)
    c, _ = experiment_to_circuit(ex)
    c.set_analyze_type(AnalyzeType.DC)
    c.analyze()
    write_back(ex, c)
    assert np.isclose(r2.statistics["电压"], 3.0)


def test_pe_to_pl_export():
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT, OUTPUT, AND
    nl = pe.Netlist()
    a = netops.add_model(nl, INPUT)
    b = netops.add_model(nl, INPUT)
    g = netops.add_model(nl, AND)
    o = netops.add_model(nl, OUTPUT)
    n1 = netops.create_node(nl)
    n2 = netops.create_node(nl)
    n3 = netops.create_node(nl)
    netops.add_to_node(nl, a, 0, n1)
    netops.add_to_node(nl, g, 0, n1)
    netops.add_to_node(nl, b, 0, n2)
    netops.add_to_node(nl, g, 1, n2)
    netops.add_to_node(nl, g, 2, n3)
    netops.add_to_node(nl, o, 0, n3)
    ex = circuit_to_experiment(nl)
    ids = [el.model_id for el in ex.elements]
    assert ids.count("Logic Input") == 2
    assert "And Gate" in ids
    assert "Logic Output" in ids
    assert len(ex.wires) == 3
    # positions assigned by auto-layout
    assert all(el.position != (0.0, 0.0, 0.0) or i == 0
               for i, el in enumerate(ex.elements))


def test_auto_layout_levels():
    ex, (a, b, g, o) = build_and_scene()
    stats = auto_layout(ex)
    assert stats.placed == 4
    # inputs in column 0, gate next, output last
    assert a.position[0] < g.position[0] < o.position[0]


def test_auto_layout_quality_spectral():
    """Quality mode: connectivity-aware placement with no cell
    overlaps (auto_layout.h spectral/force/occupancy roles)."""
    import numpy as np
    from phy_engine_tpu.io.plsav import Experiment
    from phy_engine_tpu.io.layout import auto_layout_quality

    ex = Experiment(name="t")
    # two 6-element cliques joined by one bridge wire: spectral
    # embedding must keep cliques compact and separated
    els = [ex.add_element("Logic Input") for _ in range(12)]
    for grp in (els[:6], els[6:]):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                ex.add_wire(grp[i], 0, grp[j], 0)
    ex.add_wire(els[0], 0, els[6], 0)
    stats = auto_layout_quality(ex, seed=7)
    assert stats.placed == 12
    pos = np.array([el.position[:2] for el in ex.elements])
    # no two elements share a grid cell
    assert len({tuple(p) for p in map(tuple, pos)}) == 12
    intra = []
    for grp in (range(6), range(6, 12)):
        for i in grp:
            for j in grp:
                if i < j:
                    intra.append(np.linalg.norm(pos[i] - pos[j]))
    centroid_a = pos[:6].mean(axis=0)
    centroid_b = pos[6:].mean(axis=0)
    assert np.linalg.norm(centroid_a - centroid_b) > np.mean(intra)


def test_auto_layout_quality_big_footprints():
    from phy_engine_tpu.io.plsav import Experiment
    from phy_engine_tpu.io.layout import auto_layout_quality

    ex = Experiment(name="t")
    big = [ex.add_element("8bit Input") for _ in range(4)]
    for i in range(3):
        ex.add_wire(big[i], 0, big[i + 1], 0)
    assert all(el.is_big for el in ex.elements)
    stats = auto_layout_quality(ex, spacing=0.1)
    assert stats.placed == 4
    # 2x2 footprints: min pairwise distance >= 2 cells = 0.2
    import numpy as np
    pos = np.array([el.position[:2] for el in ex.elements])
    for i in range(4):
        for j in range(i + 1, 4):
            d = np.abs(pos[i] - pos[j]).max()
            assert d >= 0.2 - 1e-9, (i, j, pos[i], pos[j])


def test_corner_locator():
    from phy_engine_tpu.io.plsav import Experiment
    from phy_engine_tpu.io.layout import CornerLocator

    ex = Experiment(name="t")
    lt = ex.add_element("Logic Input")
    lb = ex.add_element("Logic Output")
    rt = ex.add_element("8bit Input")
    rb = ex.add_element("8bit Display")
    lt.position = (0.0, 1.0, 0.0)
    lb.position = (0.0, 0.0, 0.0)
    rt.position = (2.0, 1.0, 0.0)
    rb.position = (2.0, 0.0, 0.0)
    loc = CornerLocator.from_experiment(
        ex, "Logic Input", "Logic Output", "8bit Input",
        "8bit Display")
    assert loc.locate(0.0, 0.0) == (0.0, 0.0, 0.0)
    assert loc.locate(1.0, 1.0) == (2.0, 1.0, 0.0)
    assert loc.locate(0.5, 0.5) == (1.0, 0.5, 0.0)
    grid = loc.grid(3, 2)
    assert len(grid) == 6
    assert grid[0] == (0.0, 0.0, 0.0)
    assert grid[-1] == (2.0, 1.0, 0.0)

    import pytest as _pt
    with _pt.raises(ValueError):
        CornerLocator.from_experiment(ex, "Nope", "Logic Output",
                                      "8bit Input", "8bit Display")
