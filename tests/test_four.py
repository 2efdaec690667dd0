"""Fourier analysis (.FOUR class, Circuit.four) — extension past
parity; the reference has no Fourier post-processor.  Oracles are
synthetic: sources with exactly known harmonic content through linear
resistive paths, so the transient waveform's spectrum is closed-form.
"""

import numpy as np

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.engine.circuit import AnalyzeType
from phy_engine_tpu.models import RESISTANCE, VAC


F0 = 1e3


def _two_tone(a1, a3):
    """VAC(f0) in series with VAC(3·f0) across a resistive divider:
    Vout = (a1·sin(w t) + a3·sin(3w t)) / 2."""
    c = pe.Circuit()
    nl = c.nl
    v1 = netops.add_model(nl, VAC, {"Vp": a1, "freq": F0, "phase": 0.0})
    v3 = netops.add_model(nl, VAC, {"Vp": a3, "freq": 3 * F0,
                                    "phase": 0.0})
    top = netops.create_node(nl)
    mid = netops.create_node(nl)
    out = netops.create_node(nl)
    netops.add_to_node(nl, v1, 0, top)
    netops.add_to_node(nl, v1, 1, mid)
    netops.add_to_node(nl, v3, 0, mid)
    netops.add_to_node(nl, v3, 1, nl.ground_node)
    ra = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    netops.add_to_node(nl, ra, 0, top)
    netops.add_to_node(nl, ra, 1, out)
    rb = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    netops.add_to_node(nl, rb, 0, out)
    netops.add_to_node(nl, rb, 1, nl.ground_node)
    return c, out


def test_four_two_tone():
    a1, a3 = 2.0, 0.5
    c, out = _two_tone(a1, a3)
    c.tr.t_stop = 4.0 / F0
    c.tr.t_step = 1.0 / (F0 * 512)
    c.set_analyze_type(AnalyzeType.TR)
    assert c.analyze()
    res = c.four(F0, out, harmonics=9)
    assert np.isclose(res.amps[1], a1 / 2, rtol=1e-3)
    assert np.isclose(res.amps[3], a3 / 2, rtol=1e-3)
    # everything else is numerically zero
    others = [res.amps[k] for k in (0, 2, 4, 5, 6, 7, 8, 9)]
    assert max(np.abs(others)) < 1e-3 * a1
    assert np.isclose(res.thd, a3 / a1, rtol=2e-3)


def test_four_pure_tone_thd_zero():
    c, out = _two_tone(1.0, 0.0)
    c.tr.t_stop = 3.0 / F0
    c.tr.t_step = 1.0 / (F0 * 512)
    c.set_analyze_type(AnalyzeType.TR)
    assert c.analyze()
    res = c.four(F0, out)
    assert np.isclose(res.amps[1], 0.5, rtol=1e-3)
    assert res.thd < 2e-3
