"""BSIM3v3.2 wave-3 micro-tests: gate leakage, short-channel /
narrow-width Vth physics, mobMod selector, Early-voltage output
conductance, SCBE, bin-grid binning — one parameter/feature each (the
test/0004.solver/bsim3v32_*.cpp per-parameter pattern, mirrored
against bsim3v32.h:740-1160)."""

import numpy as np
import jax
import jax.numpy as jnp

from phy_engine_tpu.models.bsim3 import (_PARAMS, _DEFAULTS,
                                         _terminal_currents)


def P_of(**kw):
    d = dict(_DEFAULTS)
    d.update({"Kp": 2e-4, "Vth0": 0.7, "W": 10e-6, "L": 1e-6})
    d.update(kw)
    return jnp.array([float(d[p]) for p in _PARAMS])


@jax.jit
def _I(P, v4):
    return _terminal_currents(P, v4, +1.0)


def I(vd, vg, vs=0.0, vb=0.0, **kw):
    return np.asarray(_I(P_of(**kw), jnp.array([vd, vg, vs, vb])))


GL = {"aigb": 1e-3, "bigb": 2.0, "cigb": 0.5}


# -- gate leakage (igb/igs/igd) ---------------------------------------------

def test_ig_zero_by_default():
    assert I(1.5, 1.2)[1] == 0.0


def test_igb_flows_gate_to_bulk():
    i = I(0.0, 2.0, **GL)
    assert i[1] > 0.0                     # gate sources current
    assert i[3] < 0.0                     # bulk sinks it


def test_terminal_currents_conserve():
    i = I(1.5, 2.0, vb=-0.5, **GL,
          aigs=1e-3, aigd=1e-3, agidl=1e-3, bgidl=1.0,
          alpha0=1e-2, beta0=5.0, diode_Is=1e-15)
    assert abs(float(i.sum())) < 1e-15


def test_igb_increases_with_vgb():
    a = I(0.0, 1.0, **GL)[1]
    b = I(0.0, 2.5, **GL)[1]
    assert b > a > 0.0


def test_eigb_shifts_onset():
    base = I(0.0, 2.0, **GL)[1]
    shifted = I(0.0, 2.0, **GL, eigb=1.0)[1]
    assert shifted < base


def test_igs_flows_gate_to_source():
    i = I(0.0, 2.0, aigs=1e-3, bigs=2.0, cigs=0.5)
    assert i[1] > 0.0
    # source picks up -igs relative to the leakage-free device
    i0 = I(0.0, 2.0)
    assert i[2] < i0[2]


def test_igs_falls_back_to_igb_coeffs():
    explicit = I(0.0, 2.0, aigs=1e-3, bigs=2.0, cigs=0.5)[1]
    fallback = I(0.0, 2.0, aigs=1e-3, bigb=2.0, cigb=0.5)[1]
    assert np.isclose(explicit, fallback, rtol=1e-12)


def test_igd_depends_on_vgd():
    p = {"aigd": 1e-3, "bigd": 2.0, "cigd": 0.5}
    low_vgd = I(2.0, 2.0, **p)[1]     # vgd = 0
    high_vgd = I(0.0, 2.0, **p)[1]    # vgd = 2
    assert high_vgd > low_vgd


def test_gate_leak_temperature_barrier():
    cold = I(0.0, 2.0, **GL, Temp=27.0)[1]
    hot = I(0.0, 2.0, **GL, Temp=127.0)[1]
    assert hot > cold                  # barrier ~ Tnom/T shrinks


def test_dwc_dlc_shrink_leak_area():
    base = I(0.0, 2.0, **GL)[1]
    small = I(0.0, 2.0, **GL, dwc=2e-6, dlc=0.2e-6)[1]
    assert 0.0 < small < base


# -- short-channel / DIBL / narrow-width Vth --------------------------------

def test_dvt0_lowers_vth_short_channel():
    base = I(1.5, 0.9)[0]
    sce = I(1.5, 0.9, dvt0=2.2, dvt1=0.53, nch=1.7e23)[0]
    assert sce > base                  # roll-off -> more current


def test_sce_rolloff_shrinks_with_length():
    p = {"dvt0": 2.2, "dvt1": 0.53, "nch": 1.7e23}
    gain_short = I(1.5, 0.9, L=0.5e-6, **p)[0] / I(1.5, 0.9,
                                                   L=0.5e-6)[0]
    gain_long = I(1.5, 0.9, L=5e-6, **p)[0] / I(1.5, 0.9, L=5e-6)[0]
    assert gain_short > gain_long


def test_dvt2_body_bias_modulates_sce():
    p = {"dvt0": 2.2, "dvt1": 0.53, "nch": 1.7e23, "gamma": 0.4}
    a = I(1.5, 0.9, vb=-1.0, **p)[0]
    b = I(1.5, 0.9, vb=-1.0, dvt2=-0.3, **p)[0]
    assert not np.isclose(a, b, rtol=1e-6)


def test_dsub_scales_dibl_depth():
    # plain eta0 DIBL vs dsub-gated: a large dsub on a long channel
    # kills the DIBL Vth shift -> less current at high vds
    base = I(3.0, 0.9, eta0=0.1)[0]
    gated = I(3.0, 0.9, eta0=0.1, dsub=5.0, nch=1.7e23)[0]
    assert gated < base


def test_etab_body_dependence_of_dibl():
    a = I(3.0, 0.9, eta0=0.08, vb=-1.0, gamma=0.4)[0]
    b = I(3.0, 0.9, eta0=0.08, etab=-0.05, vb=-1.0, gamma=0.4)[0]
    assert b > a              # etab*vbs_c > 0 deepens DIBL


def test_k3_narrow_width_raises_vth():
    wide = I(1.5, 0.9, k3=80.0, w0=2.5e-6, W=10e-6)[0]
    wide0 = I(1.5, 0.9, W=10e-6)[0]
    narrow = I(1.5, 0.9, k3=80.0, w0=2.5e-6, W=1e-6)[0]
    narrow0 = I(1.5, 0.9, W=1e-6)[0]
    assert wide < wide0 and narrow < narrow0
    assert narrow / narrow0 < wide / wide0     # stronger when narrow


def test_nlx_lateral_doping_raises_vth():
    base = I(1.5, 0.9, gamma=0.5)[0]
    shifted = I(1.5, 0.9, gamma=0.5, nlx=2e-7)[0]
    assert shifted < base


def test_voff_shifts_subthreshold():
    base = I(1.5, 0.5)[0]
    neg = I(1.5, 0.5, voff=-0.1)[0]    # typical negative voff
    pos = I(1.5, 0.5, voff=0.1)[0]
    assert neg > base > pos


def test_cit_degrades_subthreshold_slope():
    base = I(1.5, 0.45)[0]
    cit = I(1.5, 0.45, cit=2e-3)[0]
    # larger n -> slower turn-off -> more current below Vth
    assert cit > base


def test_noff_multiplies_n():
    base = I(1.5, 0.45)[0]
    noff = I(1.5, 0.45, noff=0.5)[0]
    assert noff > base


# -- mobility selector -------------------------------------------------------

def test_mobmod1_degrades_with_ua():
    clean = I(1.5, 2.0, mobmod=1.0)[0]
    deg = I(1.5, 2.0, mobmod=1.0, ua=0.5)[0]
    assert deg < clean


def test_mobmod2_uses_tox_field():
    thin = I(1.5, 2.0, mobmod=2.0, ua=1e-9, tox=2e-9)[0]
    thick = I(1.5, 2.0, mobmod=2.0, ua=1e-9, tox=2e-8)[0]
    # same ua: thinner oxide -> larger Eeff -> more degradation
    t0_thin = I(1.5, 2.0, mobmod=2.0, tox=2e-9)[0]
    t0_thick = I(1.5, 2.0, mobmod=2.0, tox=2e-8)[0]
    assert thin / t0_thin < thick / t0_thick


def test_mobmod3_adds_thermal_term():
    m2 = I(1.5, 0.75, mobmod=2.0, ua=1e-8)[0]
    m3 = I(1.5, 0.75, mobmod=3.0, ua=1e-8)[0]
    assert m3 < m2                    # Eeff includes +2vt -> more deg


def test_mobmod_selector_degenerate_equal():
    # with ua=ub=uc=theta=0 every mobility law collapses to u0
    vals = [I(1.5, 2.0, mobmod=float(m))[0] for m in (0, 1, 2, 3)]
    assert np.allclose(vals, vals[0], rtol=1e-12)


def test_keta_abulk_in_iv():
    base = I(1.5, 2.0, vb=-1.0, gamma=0.4)[0]
    keta = I(1.5, 2.0, vb=-1.0, gamma=0.4, keta=0.5)[0]
    assert not np.isclose(base, keta, rtol=1e-6, atol=0.0)


# -- output conductance: CLM / DIBL / SCBE ----------------------------------

def test_pclm_finite_output_conductance():
    p = {"pclm": 1.3, "nch": 1.7e23}
    i2 = I(2.0, 2.0, **p)[0]
    i3 = I(3.0, 2.0, **p)[0]
    assert i3 > i2                     # saturation slope


def test_larger_pclm_smaller_early_voltage_slope():
    lo = I(3.0, 2.0, pclm=0.6, nch=1.7e23)[0] / \
        I(2.0, 2.0, pclm=0.6, nch=1.7e23)[0]
    hi = I(3.0, 2.0, pclm=2.5, nch=1.7e23)[0] / \
        I(2.0, 2.0, pclm=2.5, nch=1.7e23)[0]
    assert hi > lo > 1.0     # pclm sits in VACLM's denominator:
    # larger pclm -> smaller Early voltage -> steeper saturation


def test_pdiblc2_adds_output_conductance():
    base_hi = I(3.0, 2.0, pclm=1.3, nch=1.7e23)[0]
    dibl_hi = I(3.0, 2.0, pclm=1.3, pdiblc2=0.02, nch=1.7e23)[0]
    assert dibl_hi > base_hi


def test_pscbe_substrate_current_induced_body_effect():
    p = {"pclm": 1.3, "nch": 1.7e23}
    base = I(4.0, 2.0, **p)[0]
    scbe = I(4.0, 2.0, pscbe1=4e8, pscbe2=1e-5, **p)[0]
    assert scbe > base


def test_clm_params_supersede_legacy_lambda():
    lam = I(3.0, 2.0, **{"lambda": 0.1})[0]
    both = I(3.0, 2.0, pclm=1.3, nch=1.7e23, **{"lambda": 0.1})[0]
    # with pclm set, lambda must be ignored (different result)
    assert not np.isclose(lam, both, rtol=1e-6, atol=0.0)


def test_vdsatii_shifts_substrate_current_onset():
    p = {"alpha0": 1e-2, "beta0": 5.0}
    base = abs(I(2.0, 2.0, **p)[3])
    late = abs(I(2.0, 2.0, vdsatii=1.5, **p)[3])
    assert late != base


def test_delta_smooths_vdseff():
    a = I(0.5, 2.0, delta=0.001)[0]
    b = I(0.5, 2.0, delta=0.2)[0]
    assert np.isfinite(a) and np.isfinite(b) and a != b


def test_toxm_rescales_k1():
    base = I(1.5, 1.0, gamma=0.5, vb=-1.0)[0]
    scaled = I(1.5, 1.0, gamma=0.5, vb=-1.0, toxm=2e-8)[0]
    assert not np.isclose(base, scaled, rtol=1e-6, atol=0.0)


# -- bin-grid binning --------------------------------------------------------

def _binned_pair(pname, coeff, base_kw):
    """Current with and without an L-bin coefficient at leff != lref."""
    kw = dict(base_kw)
    kw.update({"lref": 2e-6})          # leff(1um) != lref -> dl != 0
    a = I(1.5, 2.0, **kw)[0]
    kw["l" + pname] = coeff
    b = I(1.5, 2.0, **kw)[0]
    return a, b


def test_bin_ua():
    a, b = _binned_pair("ua", -0.3e6, {"mobmod": 1.0, "ua": 0.4})
    assert not np.isclose(a, b, rtol=1e-6, atol=0.0)


def test_bin_k1():
    a, b = _binned_pair("k1", 0.4e6, {"k1": 0.5, "gamma": 0.5})
    assert not np.isclose(a, b, rtol=1e-6, atol=0.0)


def test_bin_eta0():
    a, b = _binned_pair("eta0", 0.05e6, {"eta0": 0.05})
    assert not np.isclose(a, b, rtol=1e-6, atol=0.0)


def test_bin_nfactor():
    kw = {"lref": 2e-6}
    a = I(1.5, 0.5, **kw)[0]
    kw["lnfactor"] = 0.5e6
    b = I(1.5, 0.5, **kw)[0]
    assert not np.isclose(a, b, rtol=1e-6, atol=0.0)


def test_bin_voff_keta_rdsw():
    kw = {"lref": 2e-6, "rdsw": 200.0, "gamma": 0.4}
    a = I(1.5, 2.0, vb=-0.5, **kw)[0]
    kw.update({"lvoff": -0.05e6, "lketa": 0.2e6, "lrdsw": 100e6})
    b = I(1.5, 2.0, vb=-0.5, **kw)[0]
    assert not np.isclose(a, b, rtol=1e-6, atol=0.0)


def test_bin_phi_gamma_nch():
    kw = {"lref": 2e-6, "gamma": 0.5, "nch": 1.7e23,
          "dvt0": 2.2, "dvt1": 0.53}
    a = I(1.5, 1.0, vb=-0.5, **kw)[0]
    kw.update({"lphi": 0.1e6, "lgamma": 0.1e6, "lnch": 0.5e29})
    b = I(1.5, 1.0, vb=-0.5, **kw)[0]
    assert not np.isclose(a, b, rtol=1e-6, atol=0.0)
