"""BSIM3v3.2 wave-2 micro-tests: one parameter/feature each, the
test/0004.solver/bsim3v32_*.cpp per-parameter pattern.

Most tests evaluate the terminal-current / terminal-charge functions
directly (the reference's dual3-evaluation micro-test level); a few
drive full OP/AC/TR circuit solves for stamp-level integration.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import RESISTANCE, VDC, BSIM3V32_NMOS
from phy_engine_tpu.models.bsim3 import (_PARAMS, _DEFAULTS,
                                         _terminal_currents, _charges)
from phy_engine_tpu.engine.circuit import AnalyzeType, ACSweepType

from test_bsim3 import nmos_bias, drain_current, _id_at, BASE


def P_of(**kw):
    d = dict(_DEFAULTS)
    d.update({"Kp": 2e-4, "Vth0": 0.7, "W": 10e-6, "L": 1e-6})
    d.update(kw)
    return jnp.array([float(d[p]) for p in _PARAMS])


@jax.jit
def _I(P, v4):
    return _terminal_currents(P, v4, +1.0)


@jax.jit
def _Ip(P, v4):
    return _terminal_currents(P, v4, -1.0)


@jax.jit
def _Q(P, v4):
    return _charges(P, v4, +1.0)


@jax.jit
def _Qp(P, v4):
    return _charges(P, v4, -1.0)


_CMAT = jax.jit(jax.jacfwd(lambda P, v4: _charges(P, v4, +1.0),
                           argnums=1))


def I(vd, vg, vs=0.0, vb=0.0, **kw):
    return np.asarray(_I(P_of(**kw), jnp.array([vd, vg, vs, vb])))


def Q(vd, vg, vs=0.0, vb=0.0, **kw):
    return np.asarray(_Q(P_of(**kw), jnp.array([vd, vg, vs, vb])))


def C(vd, vg, vs=0.0, vb=0.0, **kw):
    return np.asarray(_CMAT(P_of(**kw), jnp.array([vd, vg, vs, vb])))


# ---------------------------------------------------------------------------
# series resistance (rdsw/prwg/prwb/prt)
# ---------------------------------------------------------------------------

def test_rdsw_reduces_triode_current():
    i0 = I(0.1, 3.0)[0]
    i1 = I(0.1, 3.0, rdsw=5000.0)[0]
    assert 0 < i1 < 0.7 * i0


def test_rdsw_width_normalization():
    """rdsw is Ohm*um: Rds scales 1/Weff while Ids0 scales Weff, so
    the *relative* degradation is width-invariant (the BSIM rdsw
    normalization semantic) while the absolute resistance is not."""
    r_narrow = I(0.1, 3.0, rdsw=5000.0, W=2e-6)[0] / I(0.1, 3.0,
                                                       W=2e-6)[0]
    r_wide = I(0.1, 3.0, rdsw=5000.0, W=50e-6)[0] / I(0.1, 3.0,
                                                      W=50e-6)[0]
    assert np.isclose(r_wide, r_narrow, rtol=1e-3)


def test_prwg_gate_bias_dependence():
    """prwg>0 raises Rds with gate drive: degradation ratio worsens at
    high Vg relative to plain rdsw."""
    base_lo = I(0.1, 1.2, rdsw=2000.0)[0] / I(0.1, 1.2)[0]
    base_hi = I(0.1, 3.0, rdsw=2000.0)[0] / I(0.1, 3.0)[0]
    pg_lo = I(0.1, 1.2, rdsw=2000.0, prwg=1.0)[0] / I(0.1, 1.2)[0]
    pg_hi = I(0.1, 3.0, rdsw=2000.0, prwg=1.0)[0] / I(0.1, 3.0)[0]
    assert pg_hi < base_hi          # extra degradation at high Vg
    assert (base_lo - pg_lo) < (base_hi - pg_hi) + 0.05


def test_prwb_weak_at_vbs_zero():
    """prwb rides sqrt(phi-vbs)-sqrt(phi): tiny at vbs=0 (only the
    smooth clamp residual), large under reverse body bias."""
    d0 = abs(I(0.1, 2.0, rdsw=2000.0, prwb=0.5)[0] -
             I(0.1, 2.0, rdsw=2000.0)[0])
    db = abs(I(0.1, 2.0, vb=-2.0, rdsw=2000.0, prwb=0.5)[0] -
             I(0.1, 2.0, vb=-2.0, rdsw=2000.0)[0])
    assert db > 5.0 * d0


def test_prwb_body_bias_effect():
    i0 = I(0.1, 2.0, vb=-1.0, rdsw=2000.0, gamma=0.0)[0]
    i1 = I(0.1, 2.0, vb=-1.0, rdsw=2000.0, gamma=0.0, prwb=0.8)[0]
    assert i1 < i0                 # sqrt(phi-vbs)-sqrt(phi) > 0


def test_prt_rds_tempco():
    """prt>0 makes rdsw grow with temperature; inert at Tnom."""
    i_hot = I(0.1, 3.0, rdsw=3000.0, prt=2.0, Temp=125.0)[0]
    i_hot_base = I(0.1, 3.0, rdsw=3000.0, Temp=125.0)[0]
    assert i_hot < 0.9 * i_hot_base
    assert np.isclose(I(0.1, 3.0, rdsw=3000.0, prt=2.0, Temp=27.0)[0],
                      I(0.1, 3.0, rdsw=3000.0, Temp=27.0)[0],
                      rtol=1e-9)


# ---------------------------------------------------------------------------
# GIDL / GISL (bsim3v32.h:1018-1054)
# ---------------------------------------------------------------------------

_GIDL = dict(agidl=1e-3, bgidl=2.3, cgidl=0.5)


def test_gidl_off_state_drain_leak():
    i_off = I(3.0, 0.0)[0]
    i_gidl = I(3.0, 0.0, **_GIDL)[0]
    assert i_gidl > i_off + 1e-9
    # and it flows out of the bulk
    assert I(3.0, 0.0, **_GIDL)[3] < -1e-9


def test_gidl_grows_with_vd():
    i1 = I(1.5, 0.0, **_GIDL)[0]
    i2 = I(3.0, 0.0, **_GIDL)[0]
    assert i2 > 2.0 * i1


def test_gidl_needs_both_params():
    assert I(3.0, 0.0, agidl=1e-3)[0] == pytest.approx(
        I(3.0, 0.0)[0], abs=1e-15)
    assert I(3.0, 0.0, bgidl=2.3)[0] == pytest.approx(
        I(3.0, 0.0)[0], abs=1e-15)


def test_cgidl_raises_leak():
    i1 = I(3.0, 0.0, agidl=1e-3, bgidl=2.3, cgidl=0.2)[0]
    i2 = I(3.0, 0.0, agidl=1e-3, bgidl=2.3, cgidl=1.0)[0]
    assert i2 > i1


def test_egidl_threshold_shift():
    i1 = I(3.0, 0.0, **_GIDL)[0]
    i2 = I(3.0, 0.0, **dict(_GIDL, egidl=1.0))[0]
    assert i2 < i1


def test_gisl_fallback_to_gidl_params():
    """Source-side leak with the source raised mirrors GIDL on the
    drain side using the same params when GISL's are unset."""
    # source high, drain low: vsg large -> GISL active
    i_s = I(0.0, 0.0, vs=3.0, **_GIDL)[2]
    assert abs(i_s) > 1e-9
    # explicit agisl dominates the fallback
    i_s2 = I(0.0, 0.0, vs=3.0, **dict(_GIDL, agisl=2e-3))[2]
    assert abs(i_s2) > 1.5 * abs(i_s)


def test_gidl_temperature_scaling():
    """barrier(T) = barrier(Tnom)*Tnom/T: hotter -> more GIDL."""
    i_cold = I(3.0, 0.0, **_GIDL, Temp=27.0)[0]
    i_hot = I(3.0, 0.0, **_GIDL, Temp=125.0)[0]
    assert i_hot > i_cold


# ---------------------------------------------------------------------------
# impact ionization (bsim3v32.h:1141-1154)
# ---------------------------------------------------------------------------

_III = dict(alpha0=0.1, beta0=10.0)


def test_alpha0_substrate_current():
    ib0 = I(3.0, 2.0)[3]
    ib1 = I(3.0, 2.0, **_III)[3]
    assert ib1 < ib0 - 1e-9        # bulk collects the ionization holes
    # and the drain carries the extra current
    assert I(3.0, 2.0, **_III)[0] > I(3.0, 2.0)[0]


def test_iii_grows_with_vds():
    i1 = abs(I(2.0, 2.0, **_III)[3])
    i2 = abs(I(4.0, 2.0, **_III)[3])
    assert i2 > 2.0 * i1


def test_iii_tracks_channel_current():
    i_small = abs(I(3.0, 2.0, **_III, W=5e-6)[3])
    i_big = abs(I(3.0, 2.0, **_III, W=20e-6)[3])
    assert i_big > 3.0 * i_small


def test_beta0_suppresses_iii():
    i_lo = abs(I(3.0, 2.0, alpha0=0.1, beta0=5.0)[3])
    i_hi = abs(I(3.0, 2.0, alpha0=0.1, beta0=30.0)[3])
    assert i_hi < 0.2 * i_lo


# ---------------------------------------------------------------------------
# geometry: lint/wint + binning (bsim3v32_lw_scale)
# ---------------------------------------------------------------------------

def test_lint_shrinks_leff_raises_current():
    assert I(3.0, 2.0, lint=0.2e-6)[0] > 1.2 * I(3.0, 2.0)[0]


def test_wint_shrinks_weff_lowers_current():
    assert I(3.0, 2.0, wint=2e-6)[0] < 0.8 * I(3.0, 2.0)[0]


def test_lvth0_binning():
    """p_eff = p + l*(Leff-Lref): longer than Lref raises Vth when
    lvth0 > 0; exactly Lref leaves it untouched."""
    kw = dict(lref=1e-6, lvth0=0.3e6)       # +0.3 V per um over Lref
    i_ref = I(3.0, 1.2, **kw, L=1e-6)[0]
    i_ref0 = I(3.0, 1.2, L=1e-6)[0]
    assert np.isclose(i_ref, i_ref0, rtol=1e-9)
    i_long = I(3.0, 1.2, **kw, L=2e-6)[0]
    i_long0 = I(3.0, 1.2, L=2e-6)[0]
    assert i_long < 0.5 * i_long0


def test_wvth0_binning():
    kw = dict(wref=10e-6, wvth0=-0.02e6)
    i_wide = I(3.0, 1.2, **kw, W=20e-6)[0]
    i_wide0 = I(3.0, 1.2, W=20e-6)[0]
    assert i_wide > i_wide0        # Vth lowered for W > Wref


def test_pvth0_cross_term():
    kw = dict(lref=1e-6, wref=10e-6, pvth0=0.05e12)
    i_c = I(3.0, 1.2, **kw, L=2e-6, W=20e-6)[0]
    i_c0 = I(3.0, 1.2, L=2e-6, W=20e-6)[0]
    assert i_c < i_c0              # dL*dW > 0 raises Vth


def test_lkp_binning():
    kw = dict(lref=1e-6, lkp=-1e2)          # Kp drops for longer L
    i_long = I(3.0, 2.0, **kw, L=2e-6)[0]
    i_long0 = I(3.0, 2.0, L=2e-6)[0]
    assert i_long < 0.8 * i_long0


def test_lu0_binning():
    kw = dict(lref=1e-6, lu0=-3e4, theta=0.3)
    # u0 binning only matters through the degradation ratio; check it
    # moves the strong-inversion current
    i_long = I(0.1, 3.0, **kw, L=2e-6)[0]
    i_long0 = I(0.1, 3.0, theta=0.3, L=2e-6)[0]
    assert not np.isclose(i_long, i_long0, rtol=1e-3)


def test_lvsat_binning():
    kw = dict(lref=1e-6, lvsat=-3e10)       # vsat drops for longer L
    i_long = I(3.0, 3.0, **kw, L=2e-6)[0]
    i_long0 = I(3.0, 3.0, L=2e-6)[0]
    assert i_long < i_long0


# ---------------------------------------------------------------------------
# mobMod1 mobility (ua/ub/uc + ua1/ub1/uc1) and kt2
# ---------------------------------------------------------------------------

def test_ua_vertical_field_degradation():
    i0 = I(0.1, 3.0)[0]
    i1 = I(0.1, 3.0, ua=2e-9)[0]
    assert i1 < 0.75 * i0
    # negligible near threshold
    assert I(0.1, 0.9, ua=2e-9)[0] > 0.7 * I(0.1, 0.9)[0]


def test_ub_quadratic_term():
    """ub acts on E^2: relatively stronger at high gate drive."""
    r_lo = I(0.1, 1.5, ub=2e-18)[0] / I(0.1, 1.5)[0]
    r_hi = I(0.1, 3.5, ub=2e-18)[0] / I(0.1, 3.5)[0]
    assert r_hi < r_lo


def test_uc_weak_at_vbs_zero():
    """uc multiplies vbs: only the smooth-clamp residual remains at
    vbs=0; reverse body bias activates it."""
    d0 = abs(I(0.1, 2.0, uc=-5e-10)[0] - I(0.1, 2.0)[0])
    db = abs(I(0.1, 2.0, vb=-2.0, uc=-5e-10)[0] -
             I(0.1, 2.0, vb=-2.0)[0])
    assert db > 5.0 * d0


def test_uc_body_bias_effect():
    i0 = I(0.1, 2.0, vb=-2.0)[0]
    i1 = I(0.1, 2.0, vb=-2.0, uc=-5e-10)[0]
    assert not np.isclose(i0, i1, rtol=1e-3)


def test_ua1_mobility_tempco():
    i_hot0 = I(0.1, 3.0, ua=1e-9, Temp=125.0)[0]
    i_hot1 = I(0.1, 3.0, ua=1e-9, ua1=2e-11, Temp=125.0)[0]
    i_cold1 = I(0.1, 3.0, ua=1e-9, ua1=2e-11, Temp=27.0)[0]
    assert i_hot1 < i_hot0
    assert np.isclose(i_cold1, I(0.1, 3.0, ua=1e-9)[0], rtol=1e-9)


def test_kt2_body_bias_tempco():
    # inactive at vbs=0 and at Tnom
    assert np.isclose(I(3.0, 1.2, kt2=0.03, Temp=27.0)[0],
                      I(3.0, 1.2)[0], rtol=1e-9)
    assert np.isclose(I(3.0, 1.2, kt2=0.03, Temp=125.0)[0],
                      I(3.0, 1.2, Temp=125.0)[0], rtol=1e-9)
    # with reverse body bias, kt2<0 raises Vth with temperature
    i0 = I(3.0, 1.2, vb=-2.0, Temp=125.0)[0]
    i1 = I(3.0, 1.2, vb=-2.0, kt2=-0.06, Temp=125.0)[0]
    assert i1 != pytest.approx(i0, rel=1e-3)


# ---------------------------------------------------------------------------
# charge model: capMod intrinsic + junction depletion caps
# ---------------------------------------------------------------------------

_CAP = dict(capmod=1.0, nch=1.7e23, tox=1e-8, k1=0.5, xpart=0.0)


def test_capmod_off_is_overlap_only():
    q = Q(1.0, 2.0, Cgs=1e-12, Cgd=2e-12, Cgb=3e-12)
    assert q[1] == pytest.approx(1e-12 * 2.0 + 2e-12 * 1.0 +
                                 3e-12 * 2.0, rel=1e-9)
    assert q[0] == pytest.approx(2e-12 * -1.0, rel=1e-9)


def test_capmod_inversion_gate_charge():
    qg_off = Q(0.05, 0.0, **_CAP)[1]
    qg_on = Q(0.05, 2.5, **_CAP)[1]
    assert qg_on > qg_off + 1e-16
    # grows with drive
    assert Q(0.05, 3.0, **_CAP)[1] > Q(0.05, 2.0, **_CAP)[1]


def test_charge_conservation():
    for vg in (0.0, 0.8, 1.5, 3.0):
        for vd in (0.0, 0.4, 2.5):
            q = Q(vd, vg, **_CAP, Cgs=1e-12, Cgd=1e-12,
                  cj=1e-3, ad=1e-11, pb=0.8)
            assert abs(q.sum()) < 1e-20


def test_xpart_partition_anchors():
    """Saturation partition: xpart=0 -> 0/100 (qd ~ 0); xpart=1 ->
    40/60; xpart=0.5 -> 50/50."""
    qd0 = Q(3.0, 2.0, **dict(_CAP, xpart=0.0))[0]
    qd5 = Q(3.0, 2.0, **dict(_CAP, xpart=0.5))[0]
    qd1 = Q(3.0, 2.0, **dict(_CAP, xpart=1.0))[0]
    qs1 = Q(3.0, 2.0, **dict(_CAP, xpart=1.0))[2]
    assert abs(qd0) < 0.2 * abs(qd5)
    assert abs(qd1) < abs(qs1)          # 40/60: drain gets less
    assert abs(qd1 / qs1 - 2.0 / 3.0) < 0.25


def test_accumulation_gate_cap():
    """Deep accumulation (vg << vfb): Cgg approaches Cox*W*L."""
    cox_wl = 3.9 * 8.854187817e-12 / 1e-8 * 10e-6 * 1e-6
    cgg = C(0.0, -3.0, **_CAP)[1, 1]
    assert 0.5 * cox_wl < cgg < 1.3 * cox_wl


def test_depletion_cgg_below_accumulation():
    """Between flatband and threshold the gate sees the series
    Cox/Cdep capacitance: Cgg is nonzero but well below the
    accumulation value."""
    cgg_dep = C(0.0, 0.3, **_CAP)[1, 1]
    cgg_acc = C(0.0, -3.0, **_CAP)[1, 1]
    assert 0.0 < cgg_dep < 0.9 * cgg_acc


def test_pmos_charge_mirror():
    qn = Q(0.05, 2.5, **_CAP)
    qp = np.asarray(_Qp(P_of(**_CAP), jnp.array([-0.05, -2.5, 0.0,
                                                 0.0])))
    np.testing.assert_allclose(qn, -qp, rtol=1e-6, atol=1e-22)


def test_junction_cap_grading():
    """C(V) = cj0*(1 - V/pb)^-mj: reverse bias shrinks the cap."""
    kw = dict(cj=1e-3, ad=1e-11, mj=0.5, pb=0.8)
    c0 = -C(0.0, 0.0, **kw)[0, 3]          # dQd/dvb at vbd = 0
    c_rev = -C(3.0, 0.0, **kw)[0, 3]       # vbd = -3
    assert c_rev < 0.6 * c0
    assert c0 == pytest.approx(1e-3 * 1e-11, rel=0.05)


def test_junction_cap_mj_grading_exponent():
    kw = dict(cj=1e-3, ad=1e-11, pb=0.8)
    shallow = -C(3.0, 0.0, **dict(kw, mj=0.2))[0, 3]
    steep = -C(3.0, 0.0, **dict(kw, mj=0.8))[0, 3]
    assert steep < shallow


def test_cjsw_sidewall_term():
    kw = dict(cj=1e-3, ad=1e-11)
    c_area = -C(0.0, 0.0, **kw)[0, 3]
    c_both = -C(0.0, 0.0, **dict(kw, cjsw=1e-9, pd=2e-5))[0, 3]
    assert c_both > c_area + 1e-17


def test_source_junction_symmetry():
    kw = dict(cj=1e-3, ad=1e-11, **{"as": 1e-11})
    cm = C(0.0, 0.0, **kw)
    assert cm[0, 3] == pytest.approx(cm[2, 3], rel=1e-6)


# ---------------------------------------------------------------------------
# stamp-level integration (OP / AC / TR through the circuit engine)
# ---------------------------------------------------------------------------

def test_op_with_wave2_params_converges():
    p = dict(BASE, rdsw=2000.0, ua=1e-9, alpha0=0.05, beta0=15.0,
             agidl=1e-4, bgidl=2.3, cgidl=0.5, capmod=1.0,
             nch=1.7e23, k1=0.5, cj=1e-3, ad=1e-11)
    i = _id_at(p, vg=2.0, vd=3.0)
    assert 1e-5 < i < 1e-2


def test_ac_capmod_gate_admittance():
    """capMod=1 adds intrinsic gate capacitance visible as AC gate
    current (roll-off through a large series resistor)."""
    from phy_engine_tpu.models import VAC

    def gate_mag(capmod):
        c = pe.Circuit()
        nl = c.nl
        vac = netops.add_model(nl, VAC, {"Vp": 1.0})
        r = netops.add_model(nl, RESISTANCE, {"r": 1e6})
        m = netops.add_model(nl, BSIM3V32_NMOS,
                             dict(BASE, W=100e-6, L=10e-6,
                                  capmod=capmod, nch=1.7e23, k1=0.5))
        n_in = netops.create_node(nl)
        n_g = netops.create_node(nl)
        netops.add_to_node(nl, vac, 0, n_in)
        netops.add_to_node(nl, vac, 1, nl.ground_node)
        netops.add_to_node(nl, r, 0, n_in)
        netops.add_to_node(nl, r, 1, n_g)
        netops.add_to_node(nl, m, 1, n_g)
        netops.add_to_node(nl, m, 0, nl.ground_node)
        netops.add_to_node(nl, m, 2, nl.ground_node)
        netops.add_to_node(nl, m, 3, nl.ground_node)
        c.set_analyze_type(AnalyzeType.ACOP)
        c.ac.sweep = ACSweepType.SINGLE
        c.ac.omega = 2e6
        assert c.analyze()
        return abs(c.node_voltage(n_g))

    m_off = gate_mag(0.0)
    m_on = gate_mag(1.0)
    assert m_on < 0.95 * m_off      # intrinsic Cgg loads the divider


def test_tr_junction_cv_settling():
    """Voltage-dependent drain junction cap (cj/ad) slows the drain
    step response like the fixed-cap case but with bias-dependent
    tau."""
    def wave(cj):
        c = pe.Circuit()
        nl = c.nl
        vdd = netops.add_model(nl, VDC, {"V": 3.0})
        r = netops.add_model(nl, RESISTANCE, {"r": 100e3})
        m = netops.add_model(nl, BSIM3V32_NMOS,
                             dict(BASE, cj=cj, ad=1e-7, pb=0.8))
        n_vdd = netops.create_node(nl)
        n_d = netops.create_node(nl)
        netops.add_to_node(nl, vdd, 0, n_vdd)
        netops.add_to_node(nl, vdd, 1, nl.ground_node)
        netops.add_to_node(nl, r, 0, n_vdd)
        netops.add_to_node(nl, r, 1, n_d)
        netops.add_to_node(nl, m, 0, n_d)
        netops.add_to_node(nl, m, 1, nl.ground_node)
        netops.add_to_node(nl, m, 2, nl.ground_node)
        netops.add_to_node(nl, m, 3, nl.ground_node)
        c.set_analyze_type(AnalyzeType.TR)
        c.tr.t_step = 1e-7
        c.tr.t_stop = 4e-5
        assert c.analyze()
        return np.asarray(c.tr_waveform(n_d))

    w_fast = wave(0.0)
    w_slow = wave(1e-3)            # ~100 pF at zero bias
    k = len(w_fast) // 8
    assert w_fast[k] > 2.9
    assert w_slow[k] < 2.9
    assert w_slow[-1] > 2.0


def test_param_prefix_abi_stable():
    """The first 25 params remain the C-ABI compat stream
    (dll_main.cpp:1921 order) — wave 2 only appends."""
    assert _PARAMS[:25] == (
        "W", "L", "Kp", "lambda", "Vth0", "gamma", "phi",
        "Cgs", "Cgd", "Cgb", "diode_Is", "diode_N", "Temp",
        "vsat", "nfactor", "u0",
        "kt1", "ute", "at", "xti", "eg", "eta0", "theta",
        "cjs", "cjd")
