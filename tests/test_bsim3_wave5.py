"""BSIM3v3.2 wave-5 micro-tests: m/nf multiplicity, device dtemp,
overlap-cap densities (cgso/cgdo/cgbo with the acm selector), fc
forward-bias depletion coefficient, junction transit-time diffusion
charge (tt/ttd/tts), per-junction Is/N overrides (isd/iss/nd/ns) and
recombination currents (isr/nr + jsr densities) — one
parameter/feature each, against bsim3v32.h:1426-1470,1953-2016,
3225-3270,3388."""

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


# -- m / nf multiplicity -----------------------------------------------------

def test_m_scales_all_currents():
    i1 = I(1.5, 1.5)
    i4 = I(1.5, 1.5, m=4.0)
    assert np.allclose(i4, 4.0 * i1, rtol=1e-12)


def test_nf_scales_all_currents():
    i1 = I(1.5, 1.5)
    i3 = I(1.5, 1.5, nf=3.0)
    assert np.allclose(i3, 3.0 * i1, rtol=1e-12)


def test_m_scales_charges():
    q1 = Q(1.5, 1.5, capmod=1.0, cgso=1e-10)
    q2 = Q(1.5, 1.5, capmod=1.0, cgso=1e-10, m=2.0)
    assert np.allclose(q2, 2.0 * q1, rtol=1e-12)


def test_nonpositive_m_treated_as_one():
    assert np.allclose(I(1.5, 1.5, m=0.0), I(1.5, 1.5), rtol=1e-12)


# -- dtemp -------------------------------------------------------------------

def test_dtemp_equals_temp_shift():
    """Temp=27,dtemp=73 == Temp=100 for every electrical quantity."""
    i_dt = I(1.5, 1.5, Temp=27.0, dtemp=73.0, diode_Is=1e-14)
    i_t = I(1.5, 1.5, Temp=100.0, diode_Is=1e-14)
    assert np.allclose(i_dt, i_t, rtol=1e-12)


def test_dtemp_applies_to_charges():
    q_dt = Q(2.0, 0.0, Temp=27.0, dtemp=73.0, cj=1e-3, ad=1e-12,
             tcj=1e-3, capmod=0.0, **{"as": 1e-12})
    q_t = Q(2.0, 0.0, Temp=100.0, cj=1e-3, ad=1e-12, tcj=1e-3,
            capmod=0.0, **{"as": 1e-12})
    assert np.allclose(q_dt, q_t, rtol=1e-12)


# -- overlap densities -------------------------------------------------------

def test_cgso_adds_overlap_charge():
    q0 = Q(0.0, 1.0, capmod=0.0)
    q1 = Q(0.0, 1.0, capmod=0.0, cgso=1e-10)
    # qg grows by cgso*W*(vg-vs) = 1e-10*10e-6*1 = 1e-15
    assert np.isclose(q1[1] - q0[1], 1e-15, rtol=1e-6)
    assert np.isclose(q1[2] - q0[2], -1e-15, rtol=1e-6)


def test_cgbo_uses_length():
    q = Q(0.0, 1.0, capmod=0.0, cgbo=1e-10)
    # cgbo*L*(vg-vb) = 1e-10*1e-6 = 1e-16
    assert np.isclose(q[1], 1e-16, rtol=1e-6)


def test_acm_disables_density_overlaps():
    q = Q(0.0, 1.0, capmod=0.0, cgso=1e-10, acm=1.0)
    q0 = Q(0.0, 1.0, capmod=0.0)
    assert np.allclose(q, q0, rtol=1e-12)


# -- fc ----------------------------------------------------------------------

def test_fc_moves_linearization_knee():
    """Higher fc keeps the graded expression valid deeper into forward
    bias, so the forward charge differs."""
    kw = dict(cj=1e-3, ad=1e-12, pb=1.0, capmod=0.0)
    kw["as"] = 1e-12
    q_lo = Q(-0.9, 0.0, vb=0.0, fc=0.3, **kw)[3]
    q_hi = Q(-0.9, 0.0, vb=0.0, fc=0.9, **kw)[3]
    assert not np.isclose(q_lo, q_hi, rtol=1e-6, atol=0.0)


def test_fc_reverse_bias_unaffected():
    kw = dict(cj=1e-3, ad=1e-12, pb=1.0, capmod=0.0)
    kw["as"] = 1e-12
    q_lo = Q(3.0, 0.0, fc=0.3, **kw)[3]
    q_hi = Q(3.0, 0.0, fc=0.9, **kw)[3]
    assert np.isclose(q_lo, q_hi, rtol=1e-12)


# -- transit-time diffusion charge ------------------------------------------

def test_tt_adds_forward_diffusion_charge():
    kw = dict(diode_Is=1e-12, capmod=0.0)
    q0 = Q(-0.65, 0.0, vb=0.0, **kw)[3]
    qt = Q(-0.65, 0.0, vb=0.0, tt=1e-6, **kw)[3]
    # q_diff = tt * Is*(exp(0.65/vt)-1) > 0 added to qb via qbd
    assert qt > q0


def test_ttd_overrides_tt():
    kw = dict(diode_Is=1e-12, capmod=0.0)
    q_tt = Q(-0.65, 0.0, vb=0.0, tt=1e-6, **kw)[3]
    q_ttd = Q(-0.65, 0.0, vb=0.0, tt=1e-9, ttd=1e-6, **kw)[3]
    assert np.isclose(q_tt, q_ttd, rtol=1e-9)


def test_tts_is_source_side():
    kw = dict(diode_Is=1e-12, capmod=0.0)
    # forward-bias the B-S junction: vb=0.65, vs=0
    q0 = Q(2.0, 0.0, vb=0.65, **kw)
    q1 = Q(2.0, 0.0, vb=0.65, tts=1e-6, tt=0.0, **kw)
    assert q1[3] > q0[3]            # bulk charge grows
    assert q1[2] < q0[2]            # taken from the source terminal


# -- per-junction overrides --------------------------------------------------

def test_isd_overrides_drain_junction():
    """isd only affects the B-D diode; B-S stays at diode_Is."""
    base = I(-0.5, 0.0, vb=0.0, diode_Is=1e-15)
    ovr = I(-0.5, 0.0, vb=0.0, diode_Is=1e-15, isd=1e-12)
    assert abs(ovr[0]) > 100.0 * abs(base[0])
    # source current unchanged (B-S junction unbiased)
    assert np.isclose(ovr[2], base[2], rtol=1e-6)


def test_nd_changes_drain_slope():
    i1 = I(-0.5, 0.0, vb=0.0, diode_Is=1e-15)[0]
    i2 = I(-0.5, 0.0, vb=0.0, diode_Is=1e-15, nd=2.0)[0]
    # higher emission coefficient -> much less current at same bias
    assert abs(i2) < abs(i1) * 1e-2


def test_isr_recombination_current():
    """isr adds a (exp(v/(nr*vt))-1) term with default nr=2."""
    base = abs(I(-0.3, 0.0, vb=0.0, diode_Is=1e-15)[0])
    with_r = abs(I(-0.3, 0.0, vb=0.0, diode_Is=1e-15, isr=1e-9)[0])
    assert with_r > 10.0 * base


def test_jsr_density_scaling():
    kw = dict(jsr=1.0, diode_Is=0.0, isr=0.0)
    i1 = abs(I(-0.3, 0.0, vb=0.0, ad=1e-12, **kw)[0])
    i2 = abs(I(-0.3, 0.0, vb=0.0, ad=2e-12, **kw)[0])
    assert np.isclose(i2 / i1, 2.0, rtol=0.05)


def test_jswd_per_junction_density():
    """jswd only raises the drain-side sidewall current."""
    kw = dict(jsw=1e-10, diode_Is=0.0, pd=4e-6, ps=4e-6)
    base = I(-0.5, 0.0, vb=0.0, **kw)
    ovr = I(-0.5, 0.0, vb=0.0, jswd=1e-8, **kw)
    assert abs(ovr[0]) > 10.0 * abs(base[0])


def test_conservation_with_wave5_features():
    kw = dict(m=2.0, nf=3.0, dtemp=10.0, isr=1e-12, tt=1e-8,
              js=1e-6, ad=1e-12, pd=4e-6, ps=4e-6,
              cgso=1e-10, cgdo=1e-10, cgbo=1e-10)
    kw["as"] = 1e-12
    i = I(1.5, 2.0, vb=-0.5, **kw)
    assert abs(float(i.sum())) < 1e-14
