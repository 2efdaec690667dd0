"""BSIM3v3.2 wave-6 micro-tests: per-junction depletion-cap
override/inherit chains (cjd/cjs, cjswd/s, cjswgd/s, pbd/pbs,
pbswd/s, pbswgd/s, mjd/mjs, mjswd/s, mjswgd/s, fcd/fcs —
bsim3v32.h:1990-2042) and the rdsMod / rgateMod / rbodyMod model
selectors (bsim3v32.h:983,1642-1645,1833-1834)."""

import numpy as np
import jax
import jax.numpy as jnp

from phy_engine_tpu.models.bsim3 import (_PARAMS, _DEFAULTS,
                                         _terminal_currents, _charges,
                                         _rc_conductances)


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


_GEO = {"ad": 1e-12, "pd": 4e-6, "ps": 4e-6}
_GEO["as"] = 1e-12


# -- bottom density overrides cjd / cjs --------------------------------------

def test_cjd_overrides_cj_on_drain_only():
    """cjd != 0 replaces cj for the DRAIN junction; the source
    junction keeps cj (bsim3v32.h:3990 cjd0 = cjd ? cjd : cj)."""
    base = Q(2.0, 0.0, cj=1e-3, **_GEO)
    halfd = Q(2.0, 0.0, cj=1e-3, cjd=0.5e-3, **_GEO)
    # drain charge shrinks, source charge unchanged
    assert abs(halfd[0]) < abs(base[0]) - 1e-18
    assert np.isclose(halfd[2], base[2], rtol=1e-12)


def test_cjs_zero_inherits_cj():
    a = Q(2.0, 0.0, cj=1e-3, cjs=0.0, **_GEO)
    b = Q(2.0, 0.0, cj=1e-3, **_GEO)
    assert np.allclose(a, b, rtol=1e-12)


def test_cjs_equal_to_cj_matches_inherit():
    a = Q(2.0, 0.0, cj=1e-3, cjs=1e-3, cjd=1e-3, **_GEO)
    b = Q(2.0, 0.0, cj=1e-3, **_GEO)
    assert np.allclose(a, b, rtol=1e-12)


# -- sidewall density overrides ----------------------------------------------

def test_cjswd_overrides_sidewall_on_drain():
    base = Q(2.0, 0.0, cjsw=1e-9, **_GEO)
    boosted = Q(2.0, 0.0, cjsw=1e-9, cjswd=3e-9, **_GEO)
    assert abs(boosted[0]) > abs(base[0]) + 1e-18
    assert np.isclose(boosted[2], base[2], rtol=1e-12)


def test_cjswgs_overrides_gate_edge_on_source():
    base = Q(0.0, 0.0, vb=-1.0, cjswg=1e-9, **_GEO)
    boosted = Q(0.0, 0.0, vb=-1.0, cjswg=1e-9, cjswgs=3e-9, **_GEO)
    assert abs(boosted[2]) > abs(base[2]) + 1e-20
    # drain gate-edge keeps cjswg; with vd=vs=0 and symmetric
    # geometry, only the source leg changed
    assert np.isclose(boosted[0], base[0], rtol=1e-12)


# -- per-junction potentials / grading / fc ----------------------------------

def test_pbd_changes_drain_junction_only():
    base = Q(2.0, 0.0, cj=1e-3, **_GEO)
    got = Q(2.0, 0.0, cj=1e-3, pbd=0.6, **_GEO)
    assert not np.isclose(got[0], base[0], rtol=1e-6, atol=0.0)
    assert np.isclose(got[2], base[2], rtol=1e-12, atol=0.0)


def test_pbd_nonpositive_inherits_pb():
    a = Q(2.0, 0.0, cj=1e-3, pbd=0.0, **_GEO)
    b = Q(2.0, 0.0, cj=1e-3, **_GEO)
    assert np.allclose(a, b, rtol=1e-12)


def test_mjs_changes_source_junction_only():
    base = Q(0.0, 0.0, vb=-1.5, cj=1e-3, **_GEO)
    got = Q(0.0, 0.0, vb=-1.5, cj=1e-3, mjs=0.9, **_GEO)
    assert not np.isclose(got[2], base[2], rtol=1e-6, atol=0.0)
    assert np.isclose(got[0], base[0], rtol=1e-12, atol=0.0)


def test_mjd_negative_inherits_mj():
    a = Q(2.0, 0.0, cj=1e-3, mjd=-1.0, **_GEO)
    b = Q(2.0, 0.0, cj=1e-3, **_GEO)
    assert np.allclose(a, b, rtol=1e-12)


def test_mjswgd_inherit_chain_mjswg_then_mjsw():
    """mjswgd<0 -> mjswg; mjswg<=0 -> mjsw (bsim3v32.h:2029-2037)."""
    a = Q(2.0, 0.0, cjswg=1e-9, mjswg=0.0, mjsw=0.7, **_GEO)
    b = Q(2.0, 0.0, cjswg=1e-9, mjswgd=0.7, mjswgs=0.7, mjsw=0.7,
          **_GEO)
    assert np.allclose(a, b, rtol=1e-12)


def test_fcd_changes_forward_bias_drain_charge():
    """fc bites only forward of fc*pb: bias the drain junction
    forward and check fcd steers the linearization point."""
    base = Q(-0.8, 0.0, vb=0.0, cj=1e-3, **_GEO)
    got = Q(-0.8, 0.0, vb=0.0, cj=1e-3, fcd=0.1, **_GEO)
    assert not np.isclose(got[0], base[0], rtol=1e-6, atol=0.0)
    assert np.isclose(got[2], base[2], rtol=1e-12, atol=0.0)


def test_fcs_negative_inherits_fc():
    a = Q(0.0, 0.0, vb=0.9, cj=1e-3, fcs=-1.0, **_GEO)
    b = Q(0.0, 0.0, vb=0.9, cj=1e-3, **_GEO)
    assert np.allclose(a, b, rtol=1e-12)


# -- rdsMod ------------------------------------------------------------------

def test_rdsmod_zero_disables_internal_rds():
    """rdsMod=0 ignores rdsw entirely (bsim3v32.h:983,1834)."""
    no_rds = I(1.5, 1.5)
    with_rds = I(1.5, 1.5, rdsw=5e3)
    off = I(1.5, 1.5, rdsw=5e3, rdsmod=0.0)
    assert with_rds[0] < no_rds[0] - 1e-9     # rdsw reduces Ids
    assert np.allclose(off, no_rds, rtol=1e-12)


def test_rdsmod_default_enabled():
    a = I(1.5, 1.5, rdsw=5e3)
    b = I(1.5, 1.5, rdsw=5e3, rdsmod=1.0)
    assert np.allclose(a, b, rtol=1e-12)


# -- rgateMod / rbodyMod -----------------------------------------------------

def test_rgatemod_zero_shorts_gate_resistance():
    g_on = np.asarray(_rc_conductances(P_of(rg=100.0)))
    g_off = np.asarray(_rc_conductances(P_of(rg=100.0,
                                             rgatemod=0.0)))
    assert np.isclose(g_on[1], 1.0 / 100.0, rtol=1e-9)
    assert g_off[1] > 1e5                      # floored short

def test_rbodymod_zero_shorts_body_resistance():
    g_on = np.asarray(_rc_conductances(P_of(rb=50.0)))
    g_off = np.asarray(_rc_conductances(P_of(rb=50.0,
                                             rbodymod=0.0)))
    assert np.isclose(g_on[3], 1.0 / 50.0, rtol=1e-9)
    assert g_off[3] > 1e5


def test_selector_attribute_aliases():
    from phy_engine_tpu.models import BSIM3V32_NMOS
    from phy_engine_tpu import Netlist, netops
    nl = Netlist()
    m = netops.add_model(nl, BSIM3V32_NMOS, {})
    assert m.set_attribute("rdsMod", 0.0)
    assert m.get_attribute("rdsmod") == 0.0
    assert m.set_attribute("rgateMod", 0.0)
    assert m.set_attribute("rbodyMod", 0.0)
