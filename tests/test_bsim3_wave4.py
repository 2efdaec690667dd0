"""BSIM3v3.2 wave-4 micro-tests: junction geometry current densities
(js/jsw/jswg), per-junction breakdown (bvd/ibvd/bvs/ibvs), gate-edge
sidewall depletion caps (cjswg/mjswg/pbswg), and junction cap/potential
temperature coefficients (tcj/tcjsw/tcjswg/tpb/tpbsw/tpbswg) — one
parameter/feature each, mirroring the test/0004.solver per-parameter
pattern against bsim3v32.h:1921-2027,3340-3347."""

import numpy as np
import jax
import jax.numpy as jnp

from phy_engine_tpu.models.bsim3 import (_PARAMS, _DEFAULTS,
                                         _terminal_currents, _charges)


def P_of(**kw):
    d = dict(_DEFAULTS)
    d.update({"Kp": 2e-4, "Vth0": 0.7, "W": 10e-6, "L": 1e-6})
    d.update(kw)
    return jnp.array([float(d[p]) for p in _PARAMS])


@jax.jit
def _I(P, v4):
    return _terminal_currents(P, v4, +1.0)


@jax.jit
def _Q(P, v4):
    return _charges(P, v4, +1.0)


def I(vd, vg, vs=0.0, vb=0.0, **kw):
    return np.asarray(_I(P_of(**kw), jnp.array([vd, vg, vs, vb])))


def Q(vd, vg, vs=0.0, vb=0.0, **kw):
    return np.asarray(_Q(P_of(**kw), jnp.array([vd, vg, vs, vb])))


def ibulk(vd, vg=0.0, vb=0.0, **kw):
    """Bulk terminal current (junction diodes dominate with gate off)."""
    return float(I(vd, vg, vb=vb, **kw)[3])


# -- junction geometry current densities ------------------------------------

def test_js_area_scaling():
    """Is_d = js*Ad: doubling the drain area doubles the forward
    bulk-drain current (bulk high, drain grounded)."""
    a = ibulk(0.0, vb=0.5, js=1e-6, ad=1e-12, as_=0.0) if False else None
    kw = dict(js=1e-6, diode_Is=0.0)
    i1 = ibulk(0.0, vb=0.5, ad=1e-12, **{"as": 1e-12}, **kw)
    i2 = ibulk(0.0, vb=0.5, ad=2e-12, **{"as": 1e-12}, **kw)
    # i_b = ibs + ibd; only ibd changed: delta equals the ibd part
    assert i2 > i1 > 0.0
    assert np.isclose((i2 - i1) / i1, 1.0 / 2.0, rtol=0.05)


def test_jsw_perimeter_scaling():
    kw = dict(jsw=1e-10, diode_Is=0.0)
    i1 = ibulk(0.0, vb=0.5, pd=4e-6, ps=4e-6, **kw)
    i2 = ibulk(0.0, vb=0.5, pd=8e-6, ps=4e-6, **kw)
    assert i2 > i1 > 0.0


def test_jswg_uses_weff():
    kw = dict(jswg=1e-10, diode_Is=0.0)
    i_w = ibulk(0.0, vb=0.5, W=10e-6, **kw)
    i_2w = ibulk(0.0, vb=0.5, W=20e-6, **kw)
    # gate-edge term scales ~ with Weff (both junctions)
    assert np.isclose(i_2w / i_w, 2.0, rtol=0.1)


def test_density_zero_falls_back_to_diode_is():
    """js=jsw=jswg=0 reproduces the legacy scalar diode_Is path."""
    i_legacy = ibulk(0.0, vb=0.5, diode_Is=1e-15)
    i_same = ibulk(0.0, vb=0.5, diode_Is=1e-15, js=0.0, jsw=0.0)
    assert i_legacy == i_same


def test_density_asymmetric_junctions():
    """Different drain/source areas give different ibd/ibs splits."""
    kw = dict(js=1e-6, diode_Is=0.0, ad=4e-12)
    kw["as"] = 1e-12
    i = I(-0.5, 0.0, vb=0.0, **kw)     # drain low: B-D forward
    # forward B->D current leaves bulk, enters drain
    assert i[3] > 0.0 and i[0] < 0.0


# -- junction breakdown -----------------------------------------------------

def test_no_breakdown_below_bv():
    """Reverse current stays ~ -Is when |Vbd| << Bv."""
    i = ibulk(5.0, vb=0.0, diode_Is=1e-15, bvd=40.0, ibvd=1e-3)
    assert abs(i) < 1e-12


def test_breakdown_knee_at_ibv():
    """At Vbd = -Bv the breakdown current magnitude equals Ibv
    (Bv_eff = Bv - nv*ln(Ibv/Is) calibration)."""
    i_d = float(I(40.0, 0.0, vb=0.0, diode_Is=1e-15,
                  bvd=40.0, ibvd=1e-3)[0])
    assert np.isclose(i_d, 1e-3, rtol=0.05)


def test_breakdown_grows_past_bv():
    i1 = float(I(40.0, 0.0, diode_Is=1e-15, bvd=40.0, ibvd=1e-3)[0])
    i2 = float(I(41.0, 0.0, diode_Is=1e-15, bvd=40.0, ibvd=1e-3)[0])
    assert i2 > 10.0 * i1


def test_breakdown_disabled_by_nonpositive_bv():
    i = float(I(41.0, 0.0, diode_Is=1e-15, bvd=0.0)[0])
    assert abs(i) < 1e-9


def test_source_breakdown_independent():
    """bvs breaks the B-S junction; drain stays quiet."""
    i = I(0.0, 0.0, vs=30.0, vb=0.0, diode_Is=1e-15,
          bvs=25.0, ibvs=1e-3, bvd=200.0)
    assert i[2] > 1e-4          # source sinks breakdown current
    assert abs(i[0]) < 1e-9


def test_breakdown_scales_with_junction_is():
    """Ibv rides the geometry-scaled Is (bsim3v32.h:3340-3347): the
    knee current stays Ibv even when js scaling changes Is."""
    kw = dict(js=1e-6, ad=1e-12, diode_Is=0.0, bvd=40.0, ibvd=1e-3)
    kw["as"] = 1e-12
    i_d = float(I(40.0, 0.0, vb=0.0, **kw)[0])
    assert np.isclose(i_d, 1e-3, rtol=0.05)


# -- junction cap tempcos + gate-edge sidewall ------------------------------

CJ = dict(cj=1e-3, ad=1e-12, pd=4e-6, ps=4e-6, capmod=0.0)
CJ["as"] = 1e-12


def test_tcj_scales_area_cap_charge():
    qb_cold = Q(2.0, 0.0, vb=0.0, **CJ)[3]
    qb_hot = Q(2.0, 0.0, vb=0.0, Temp=127.0, tcj=1e-3, **CJ)[3]
    # reverse-bias depletion charge is negative; 10% larger cj -> more
    assert abs(qb_hot) > abs(qb_cold) * 1.05


def test_tpb_shifts_junction_potential():
    q_cold = Q(2.0, 0.0, **CJ)[3]
    q_hot = Q(2.0, 0.0, Temp=127.0, tpb=2e-3, **CJ)[3]
    assert not np.isclose(q_cold, q_hot, rtol=1e-3, atol=0.0)


def test_tcjsw_scales_sidewall_charge():
    kw = dict(cjsw=1e-9, pd=4e-6, ps=4e-6, capmod=0.0)
    q_cold = Q(2.0, 0.0, **kw)[3]
    q_hot = Q(2.0, 0.0, Temp=127.0, tcjsw=1e-3, **kw)[3]
    assert abs(q_hot) > abs(q_cold) * 1.05


def test_cjswg_adds_gate_edge_charge():
    base = Q(2.0, 0.0, capmod=0.0)[3]
    with_g = Q(2.0, 0.0, capmod=0.0, cjswg=1e-9)[3]
    assert abs(with_g) > abs(base)


def test_cjswg_scales_with_weff():
    q_w = Q(2.0, 0.0, capmod=0.0, cjswg=1e-9, W=10e-6)[3]
    q_2w = Q(2.0, 0.0, capmod=0.0, cjswg=1e-9, W=20e-6)[3]
    assert np.isclose(q_2w / q_w, 2.0, rtol=0.05)


def test_pbswg_inherits_pbsw():
    """pbswg <= 0 falls back to pbsw (bsim3v32.h:2012-2015)."""
    q_inherit = Q(2.0, 0.0, capmod=0.0, cjswg=1e-9, pbsw=0.8)[3]
    q_explicit = Q(2.0, 0.0, capmod=0.0, cjswg=1e-9, pbsw=0.8,
                   pbswg=0.8)[3]
    assert np.isclose(q_inherit, q_explicit, rtol=1e-12)


def test_mjswg_inherits_mjsw():
    q_inherit = Q(2.0, 0.0, capmod=0.0, cjswg=1e-9, mjsw=0.4)[3]
    q_explicit = Q(2.0, 0.0, capmod=0.0, cjswg=1e-9, mjsw=0.4,
                   mjswg=0.4)[3]
    assert np.isclose(q_inherit, q_explicit, rtol=1e-12)


def test_terminal_currents_still_conserve():
    kw = dict(js=1e-6, jsw=1e-10, ad=1e-12, pd=4e-6, ps=4e-6,
              bvd=40.0, ibvd=1e-3, diode_Is=0.0)
    kw["as"] = 1e-12
    i = I(1.5, 2.0, vb=-0.5, **kw)
    assert abs(float(i.sum())) < 1e-15
