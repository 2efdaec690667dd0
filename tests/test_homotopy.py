"""Gmin-stepping homotopy (Circuit._gmin_stepping) — convergence aid
past parity: the reference's solve() just returns false on Newton
failure (circuit.h:892-985).  Gating cases, all verified to fail the
plain 64-iteration Newton path (gmin_steps=0):

* a DC-floating node between coupling capacitors — structurally
  singular at the engines' shared g_min=0 default (environment.h:14);
  the rescue terminates at SPICE's GMIN=1e-12 exactly like ngspice's
  gmin stepping, defining the node.  This is the genuine-rescue case.
* a 20-long series diode string forced to 100 V — every junction
  limexp-saturates (PN_junction.h:10-16), conductances reach ~1e12 S,
  and NO Δx-convergent point can satisfy KCL at f64+tolerance
  resolution.  The ladder reaches a Δx-stationary point, but the
  rescue's ROW-WISE residual validation refuses to report it: the
  honest outcome is failure (the reference fails here too, at its
  64-iteration cap — but would also accept a Δx-stationary garbage
  point if its Newton ever reached one, circuit.h:921-948 checks Δx
  only).
"""

import numpy as np

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import RESISTANCE, CAPACITOR, VDC, PN_JUNCTION

def _string(n=20, v_src=100.0, gmin_steps=None):
    c = pe.Circuit()
    nl = c.nl
    if gmin_steps is not None:
        c.gmin_steps = gmin_steps
    v = netops.add_model(nl, VDC, {"V": v_src})
    top = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    nodes = [top]
    is_vals = []
    prev = top
    for k in range(n):
        nxt = netops.create_node(nl) if k < n - 1 else nl.ground_node
        is_k = 1e-14 * (10 ** (k % 3))
        d = netops.add_model(nl, PN_JUNCTION, {"Is": is_k})
        netops.add_to_node(nl, d, 0, prev)
        netops.add_to_node(nl, d, 1, nxt)
        is_vals.append(is_k)
        nodes.append(nxt)
        prev = nxt
    return c, nodes, is_vals


def test_diode_string_honest_reject():
    """Both the plain path AND the rescue must report failure: the
    limexp-saturated string admits no KCL-consistent point at Δx
    resolution, and the rescue's row-wise residual validation must
    catch the Δx-stationary impostor the ladder reaches (verified:
    without the validation the ladder 'converges' with junction
    currents spread over ~18%)."""
    c, _nodes, _ = _string(gmin_steps=0)
    assert not c.analyze()          # plain 64-iter Newton genuinely fails
    c2, nodes, is_vals = _string()
    assert c2.gmin_steps > 0        # default on
    assert not c2.analyze()         # rescue refuses the garbage point


def test_floating_cap_node():
    """AC-coupling capacitor node with no DC path: singular at the
    g_min=0 default both engines share; the ladder's GMIN floor
    defines it (the classic SPICE GMIN role)."""
    def build(gmin_steps=None):
        c = pe.Circuit()
        nl = c.nl
        if gmin_steps is not None:
            c.gmin_steps = gmin_steps
        v = netops.add_model(nl, VDC, {"V": 2.0})
        top = netops.create_node(nl)
        m = netops.create_node(nl)
        netops.add_to_node(nl, v, 0, top)
        netops.add_to_node(nl, v, 1, nl.ground_node)
        c1 = netops.add_model(nl, CAPACITOR, {"C": 1e-9})
        netops.add_to_node(nl, c1, 0, top)
        netops.add_to_node(nl, c1, 1, m)
        c2 = netops.add_model(nl, CAPACITOR, {"C": 1e-9})
        netops.add_to_node(nl, c2, 0, m)
        netops.add_to_node(nl, c2, 1, nl.ground_node)
        r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
        netops.add_to_node(nl, r, 0, top)
        netops.add_to_node(nl, r, 1, nl.ground_node)
        return c, m

    c, _m = build(gmin_steps=0)
    assert not c.analyze()          # singular without GMIN
    c2, m = build()
    assert c2.analyze()
    assert abs(c2.node_voltage(m).real) < 1e-9


def test_homotopy_leaves_easy_circuits_alone():
    """An easy divider + diode must converge on the plain path (the
    ladder only runs after a failure)."""
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 2.0})
    top = netops.create_node(nl)
    out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    netops.add_to_node(nl, r, 0, top)
    netops.add_to_node(nl, r, 1, out)
    d = netops.add_model(nl, PN_JUNCTION, {})
    netops.add_to_node(nl, d, 0, out)
    netops.add_to_node(nl, d, 1, nl.ground_node)
    c.gmin_steps = 0                # even with the ladder disabled
    assert c.analyze()
    assert 0.5 < c.node_voltage(out).real < 0.8
