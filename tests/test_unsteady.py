"""Tsu/Th unsteady-state automata following TR substeps.

Reference semantics (and.h:161-363): an analog threshold crossing on a
sampled gate input enters an X window whose commit requires the level
to HOLD for Tsu/Th of transient time.  The reference evaluates the
automaton only at digital_clk granularity; here every accepted TR
substep feeds it (circuit._observe_tr_substeps), so the window opens
and closes at the analog crossing times, not at tick endpoints.
"""

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.digital.logic import L, H, X
from phy_engine_tpu.models import YES, INPUT, VDC, RESISTANCE, CAPACITOR
from phy_engine_tpu.engine.circuit import AnalyzeType, Circuit


def _rc_gate(tsu, th):
    """VDC 5V -> R -> C node sampled by a YES gate (Hl=3V).
    tau = 1 ms; the node crosses 3 V at t ~ 0.92 ms."""
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 5.0})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    cap = netops.add_model(nl, CAPACITOR, {"C": 1e-6})
    g = netops.add_model(nl, YES, {"Ll": 1.0, "Hl": 3.0,
                                   "Tsu": tsu, "Th": th})
    n_s = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n_s)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r, 0, n_s)
    n_c = netops.create_node(nl)
    netops.add_to_node(nl, r, 1, n_c)
    netops.add_to_node(nl, cap, 0, n_c)
    netops.add_to_node(nl, cap, 1, nl.ground_node)
    netops.add_to_node(nl, g, 0, n_c)
    n_o = netops.create_node(nl)
    netops.add_to_node(nl, g, 1, n_o)
    # plain TR from the zero initial state: the C node charges
    # 0 -> 5 V with tau = 1 ms (TROP would start at the 5 V steady
    # state — capacitors open in the operating point)
    c.set_analyze_type(AnalyzeType.TR)
    c.tr.t_step = 1e-4
    c.tr.t_stop = 5e-3
    return c, n_o


def test_substeps_commit_within_chunk():
    """Crossing early in a 5 ms TR chunk, Th = 1 ms: the hold time
    elapses DURING the chunk, so the first tick already reads H."""
    c, n_o = _rc_gate(tsu=2e-3, th=1e-3)
    assert c.analyze()                # 0 -> 5 ms, crossing at ~0.92 ms
    c.digital_clk()
    assert c.node_digital(n_o) == H


def test_tick_only_model_shows_spurious_window():
    """A settled-L input crosses early in a 5 ms chunk (Th = 1 ms
    elapses mid-chunk).  Substep observation commits H before the
    tick; with it disabled the crossing is first seen AT the tick, so
    the tick spuriously reads X and resolves one full chunk later."""
    for substeps in (True, False):
        c, n_o = _rc_gate(tsu=2e-4, th=1e-3)
        if not substeps:
            c._observe_tr_substeps = lambda: None
        c.tr.t_stop = 2e-4               # v(0.2ms)=0.9V < Ll: settle L
        assert c.analyze()
        c.digital_clk()
        assert c.node_digital(n_o) == L
        c.tr.t_stop = 5e-3               # crossing at ~0.92 ms
        assert c.analyze()
        c.digital_clk()
        if substeps:
            assert c.node_digital(n_o) == H      # committed mid-chunk
        else:
            assert c.node_digital(n_o) == X      # spurious window
            assert c.analyze()
            c.digital_clk()
            assert c.node_digital(n_o) == H


def test_late_crossing_keeps_window_open():
    """Hold time NOT yet elapsed at the tick: a genuine X window.
    Th = 8 ms > the 4.1 ms held since the crossing."""
    c, n_o = _rc_gate(tsu=2e-3, th=8e-3)
    assert c.analyze()
    c.digital_clk()
    assert c.node_digital(n_o) == X              # real setup window
    assert c.analyze()                           # held long enough now
    c.digital_clk()
    assert c.node_digital(n_o) == H


def test_glitch_reverts_without_commit():
    """A level that falls back below Ll before Th elapses must revert
    to L, never reaching H (the automaton's revert arms)."""
    c, n_o = _rc_gate(tsu=1e-3, th=8e-3)
    assert c.analyze()                # charge to ~5 V over 5 ms
    c.digital_clk()
    assert c.node_digital(n_o) == X   # pending H (Th = 8 ms)
    # source collapses: node discharges below Ll before Th elapsed
    for m in c.nl.live_models():
        if m.mdef.id_name == "VDC":
            m.set_attribute("V", 0.0)
    c.set_analyze_type(AnalyzeType.TR)
    c.tr.t_stop = 5e-3
    assert c.analyze()
    c.digital_clk()
    assert c.node_digital(n_o) == L   # reverted, H never appeared


def test_zero_tsu_th_is_plain_threshold():
    """Tsu=Th=0 keeps the raw in-jit thresholding (no automaton)."""
    c, n_o = _rc_gate(tsu=0.0, th=0.0)
    assert c.analyze()
    c.digital_clk()
    assert c.node_digital(n_o) == H
