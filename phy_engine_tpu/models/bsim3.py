"""BSIM3v3.2 MOSFET (clean-room, TPU-native).

Scope parity with the reference's clean-room module
(non-linear/bsim3v32.h — itself an explicitly incremental
implementation, see its header TODO): 4-terminal D/G/S/B device with

* Vth with body effect (gamma/k1/k2), DIBL (eta0), temperature scaling
  (kt1/kt2/ute/at/xti), and the BSIM3 ``Vgsteff`` / ``Vdseff``
  smoothing functions (bsim3v32.h:668+) for continuous subthreshold ->
  strong-inversion -> saturation transitions;
* mobMod1 vertical-field mobility degradation (ua/ub/uc with ua1/ub1/
  uc1 tempcos; the legacy ``theta`` surface remains as a first-order
  term), velocity saturation (Esat*L) and channel-length modulation;
* source/drain series resistance folded into the I-V
  (bsim3v32.h:985-1000 rdsw/prwg/prwb/prt semantics);
* GIDL/GISL (bsim3v32.h:1018-1054 subset: agidl*Weff*Vdb*
  exp(-bgidl/(Vdg+cgidl)), GISL falling back to GIDL params);
* impact-ionization substrate current
  (bsim3v32.h:1141-1154: alpha0*|Ids|*vds_eff*exp(-beta0/vds_eff));
* bulk junction diodes B-S / B-D with SPICE limexp clamping and
  Is(T) = Is*(T/Tnom)^(XTI/N)*exp(Eg/N*(1/Vtnom-1/Vt));
* geometry: Leff/Weff via lint/wint and linear L/W binning
  p_eff = p + l*(Leff-Lref) + w*(Weff-Wref) + p*(dL*dW)
  (bsim3v32_lw_scale, bsim3v32.h:304-313) for Vth0/Kp/u0/vsat;
* charge-based C-V: one Q(v_d,v_g,v_s,v_b) function covering the gate
  overlap caps, capMod>=1 intrinsic charges (Vgsteff_cv / Vdseff_cv,
  smooth linear/saturation blend, xpart 0/100-50/50-40/60 partition,
  k1-based depletion charge, accumulation/depletion gate-bulk terms —
  bsim3v32.h:1202-1420 semantics), and voltage-dependent bulk junction
  depletion charges (cj/mj/pb area + cjsw/mjsw/pbsw sidewall).

Where the reference hand-rolls forward-mode duals (``bsim3v32_dual3``,
bsim3v32.h:507) to get gm/gds/gmb and the C matrix, this
implementation differentiates the terminal-current and terminal-charge
functions with ``jax.jacfwd`` — the Newton stamp is the exact 4x4
Jacobian of I(v), and the transient companion / AC susceptance is the
exact 4x4 C(v) = dQ/dv, machine-generated and always consistent.

Status ledger against the reference's own header TODO
(bsim3v32.h:14-31), item for item:

* Parameter coverage — PARTIAL: ~220 parameters across five waves
  (compat prefix + geometry/binning + mobility/Rds/GIDL/II/charge/
  junction + gate leakage/SCE/DIBL/narrow-width/CLM/SCBE/bin grid +
  multiplicity/overlap-density/per-junction/recombination/diffusion);
  Rd/Rs/Rg/Rb terminal parasitics covered by the *_RC internal-node
  variant (BSIM3_NMOS_RC/BSIM3_PMOS_RC below; the reference gates the
  same topology per-parameter at prepare(), bsim3v32.h:3380-3400);
  wave 6 adds the rdsMod/rgateMod/rbodyMod selectors and the full
  per-junction depletion-cap override/inherit chains (cjd/cjs,
  cjswd/s, cjswgd/s, pbd/pbs, pbswd/s, pbswgd/s, mjd/mjs, mjswd/s,
  mjswgd/s, fcd/fcs — bsim3v32.h:1990-2042); cjd/cjs follow the
  reference's density-override semantics, not fixed caps.
* Geometry & binning — DONE to the reference's own depth: linear
  lw_scale bin grid over vth0/kp/u0/vsat/ua/ub/uc/nch/phi/gamma/k1/
  k2/eta0/nfactor/voff/keta/rdsw (bsim3v32.h:762-840 set) plus m*nf
  multiplicity scaling of currents and charges (wave 5,
  bsim3v32.h:3229,3388); WPE remains open in both implementations.
* Temperature — DONE to the reference's depth: Vth (kt1/kt2),
  mobility (ute + ua1/ub1/uc1), vsat (at), junction Is (xti/eg), Rds
  (prt), leakage barriers (Tnom/T), junction potential/cap tempcos
  (tcj/tcjsw/tcjswg/tpb/tpbsw/tpbswg, bsim3v32.h:2018-2027).
* Charge/C-V — PARTIAL: capMod>=1 intrinsic charges with smooth
  blend + xpart partition + accumulation/depletion terms; capMod=3
  full equations open (same stepping-stone level as the reference).
* Gate leakage — DONE to the reference's subset: igb/igs/igd with
  a/b/c/e coefficients, igb-fallback, dwc/dlc area, Tnom/T barrier
  scaling (bsim3v32.h:1069-1131); Berkeley's full Igc partition open.
* GIDL/GISL — DONE to the reference's subset (wave 2).
* Junctions — DONE to the reference's depth: SPICE-style currents
  with js/jsw/jswg geometry density scaling + per-junction overrides
  (jsd/jss/jswd/jsws/jswgd/jswgs, isd/iss, nd/ns —
  bsim3v32.h:1953-1966,3225-3245), recombination currents (isr/nr +
  jsr/jsrw/jsrwg densities), transit-time diffusion charge
  (tt/ttd/tts, bsim3v32.h:3248-3263), breakdown forwarded per
  junction (bvd/ibvd/bvs/ibvs, bsim3v32.h:1921-1926,3340-3347), area
  + sidewall + gate-edge sidewall depletion charges with tempcos and
  the fc forward-bias coefficient, dtemp device-temperature delta,
  cgso/cgdo/cgbo overlap densities gated by acm; charge-conserving
  full Berkeley junction equations open in both implementations.
* NQS — DONE here (wave 9), OPEN in the reference (bsim3v32.h:27
  leaves it entirely unimplemented): first-order single-pole Elmore
  relaxation of the intrinsic charge system — nqsMod=1 + elm params;
  TR integrates the charge-deficit ODE dQdef/dt = dQint/dt − Qdef/τ
  trapezoidally with the terminal currents Qdef/τ (overlap/junction
  charges stay quasi-static), AC gets the relaxation pole
  jωC_int/(1+jωτ); τ⁻¹ = 16·μ0·Ut/Leff² + elm·gd0/(Cox·Weff·Leff).
  4-terminal variants only (the *_RC parasitic variant keeps
  quasi-static charges).
* Noise — DONE here, OPEN in the reference: wave 7 adds channel
  thermal 8kT(gm+gds+gmb)/3 + flicker kf*Ids^af/(Cox*Leff^2*f^ef)
  (SPICE2/noiMod=1 forms, kf/af/ef/noimod params), consumed by the
  engine's adjoint-network noise analysis (engine/noise.py) — the
  reference's bsim3v32.h:28-29 TODO asks for exactly this
  infrastructure and never got it; the *_RC variant additionally
  emits 4kT*g thermal for each real terminal resistance.  Wave 8
  completes the TODO's remaining clause ("induced gate noise,
  correlation"): van der Ziel S_ig = (16/15)kT·ω²Cgs²/gd0 on the
  gate, cross-correlated j·0.395·sqrt(S_ig·S_id0) with the channel
  source, through the engine's correlated-group hooks
  (ModelDef.noise_corr).
* Validation — 155 micro-tests (waves 1-6) mirroring the
  test/0004.solver + test/0012.ac per-parameter pattern, plus the
  noise oracles in tests/test_noise.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import ModelDef, DeviceClass, register
from .nonlinear import limexp

_K_B = 1.380649e-23
_Q_E = 1.602176634e-19
_T0 = 273.15
_EPS_SI = 11.7 * 8.854187817e-12
_EPS_OX = 3.9 * 8.854187817e-12

# parameter order = the C ABI compat property stream (dll_main.cpp:1921)
# followed by the tiered BSIM parameter waves (appended so the compat
# stream prefix stays stable).
_PARAMS = (
    # -- compat prefix (wave 1) ------------------------------------------
    "W", "L", "Kp", "lambda", "Vth0", "gamma", "phi",
    "Cgs", "Cgd", "Cgb", "diode_Is", "diode_N", "Temp",
    "vsat", "nfactor", "u0",
    "kt1", "ute", "at", "xti", "eg", "eta0", "theta",
    "cjs", "cjd",
    # -- wave 2: geometry ------------------------------------------------
    "lint", "wint", "lref", "wref",
    "lvth0", "wvth0", "pvth0", "lkp", "wkp", "pkp",
    "lu0", "wu0", "pu0", "lvsat", "wvsat", "pvsat",
    # -- wave 2: mobility (mobMod1) + tempcos ----------------------------
    "tox", "ua", "ub", "uc", "ua1", "ub1", "uc1", "kt2",
    # -- wave 2: series resistance ---------------------------------------
    "rdsw", "prwg", "prwb", "prt",
    # -- wave 2: GIDL / GISL ----------------------------------------------
    "agidl", "bgidl", "cgidl", "egidl",
    "agisl", "bgisl", "cgisl", "egisl",
    # -- wave 2: impact ionization ----------------------------------------
    "alpha0", "beta0",
    # -- wave 2: charge model ---------------------------------------------
    "capmod", "xpart", "k1", "k2", "keta", "nch", "vfbcv", "voffcv",
    # -- wave 2: junction capacitance --------------------------------------
    "cj", "mj", "pb", "cjsw", "mjsw", "pbsw",
    "ad", "as", "pd", "ps",
    # -- wave 3: gate leakage (bsim3v32.h:1069-1131) ----------------------
    "aigb", "bigb", "cigb", "eigb",
    "aigs", "bigs", "cigs", "eigs",
    "aigd", "bigd", "cigd", "eigd",
    "dwc", "dlc",
    # -- wave 3: short-channel / DIBL / narrow width (bsim3v32.h:820-860) -
    "dvt0", "dvt1", "dvt2", "xj", "vbi", "dsub", "etab",
    "k3", "k3b", "w0", "nlx", "voff", "cit", "noff", "delta",
    # -- wave 3: mobility selector + oxide ref ----------------------------
    "mobmod", "toxm",
    # -- wave 3: output resistance (CLM/DIBL/SCBE, bsim3v32.h:930-1006) ---
    "pclm", "pdiblc1", "pdiblc2", "pdiblcb", "drout", "pvag",
    "pscbe1", "pscbe2", "vdsatii",
    # -- wave 3: bin-grid coefficients for the wave-2/3 parameter set -----
    "lua", "wua", "pua", "lub", "wub", "pub", "luc", "wuc", "puc",
    "lnch", "wnch", "pnch", "lphi", "wphi", "pphi",
    "lgamma", "wgamma", "pgamma",
    "lk1", "wk1", "pk1", "lk2", "wk2", "pk2",
    "leta0", "weta0", "peta0", "lnfactor", "wnfactor", "pnfactor",
    "lvoff", "wvoff", "pvoff", "lketa", "wketa", "pketa",
    "lrdsw", "wrdsw", "prdsw",
    # -- wave 4: junction geometry currents, breakdown, tempcos
    #    (bsim3v32.h:1921-2027) -----------------------------------------
    "js", "jsw", "jswg",
    "bvd", "ibvd", "bvs", "ibvs",
    "cjswg", "mjswg", "pbswg",
    "tcj", "tcjsw", "tpb", "tpbsw", "tcjswg", "tpbswg",
    # -- wave 5: multiplicity, device dtemp, overlap densities,
    #    per-junction overrides, recombination, diffusion charge
    #    (bsim3v32.h:1426-1470,1953-2016,3225-3270,3388) --------------
    "m", "nf", "dtemp",
    "cgso", "cgdo", "cgbo", "acm", "fc",
    "tt", "ttd", "tts",
    "isd", "iss", "nd", "ns",
    "isr", "nr", "isrd", "isrs", "nrd", "nrs",
    "jsd", "jss", "jswd", "jsws", "jswgd", "jswgs",
    "jsr", "jsrw", "jsrwg",
    # -- terminal parasitics (used by the *_RC internal-node variant;
    #    bsim3v32.h:3388-3400 rd/rs/rg/rb + rsh*nrd/nrs sheet terms) --
    "rd", "rs", "rg", "rb", "rsh", "nrd", "nrs",
    # -- wave 6: per-junction depletion-cap overrides + model
    #    selectors (bsim3v32.h:1990-2042 inherit chains;
    #    :983,1642-1645,1833-1834 rdsMod/rgateMod/rbodyMod) ----------
    "cjswd", "cjsws", "cjswgd", "cjswgs",
    "pbd", "pbs", "pbswd", "pbsws", "pbswgd", "pbswgs",
    "mjd", "mjs", "mjswd", "mjsws", "mjswgd", "mjswgs",
    "fcd", "fcs",
    "rdsmod", "rgatemod", "rbodymod",
    # -- wave 7: noise model (SPICE2/noiMod=1 Berkeley set: channel
    #    thermal 8kT(gm+gds+gmb)/3 + flicker kf*Ids^af/(Cox*Leff^2*f^ef);
    #    consumed by engine/noise.py — an analysis the reference never
    #    had, bsim3v32.h:28-29) ----------------------------------------
    "kf", "af", "ef", "noimod",
    # -- wave 9: NQS (first-order single-pole Elmore relaxation of the
    #    intrinsic charge system; the reference's TODO leaves NQS
    #    entirely unimplemented, bsim3v32.h:27) ------------------------
    "nqsmod", "elm",
)
_DEFAULTS = {p: 0.0 for p in _PARAMS}
_DEFAULTS.update({
    "W": 1e-6, "L": 1e-6, "Kp": 1e-4, "lambda": 0.0,
    "Vth0": 0.7, "gamma": 0.0, "phi": 0.7,
    "Cgs": 0.0, "Cgd": 0.0, "Cgb": 0.0,
    "diode_Is": 1e-14, "diode_N": 1.0, "Temp": 27.0,
    "vsat": 8e4, "nfactor": 1.0, "u0": 0.06,
    "xti": 3.0, "eg": 1.12,
    "tox": 1e-8, "xpart": 0.0,
    "mj": 0.5, "pb": 1.0, "mjsw": 0.33, "pbsw": 1.0,
    # breakdown enabled at the reference defaults (bvd/bvs 40 V,
    # ibvd/ibvs 1 mA; <=0 disables — bsim3v32.h:1921-1926)
    "bvd": 40.0, "ibvd": 1e-3, "bvs": 40.0, "ibvs": 1e-3,
    # wave 5: m/nf multiplicity default 1; negative per-junction
    # overrides mean "inherit the base parameter"
    "m": 1.0, "nf": 1.0, "fc": 0.5, "nr": 2.0,
    "ttd": -1.0, "tts": -1.0,
    "isd": -1.0, "iss": -1.0, "isrd": -1.0, "isrs": -1.0,
    # wave 6: negative mj*/fc* overrides inherit; <=0 pb* inherit;
    # zero cj* densities inherit; selectors default ENABLED (1)
    # (bsim3v32.h:1990-2042,1644-1645,1834)
    "mjd": -1.0, "mjs": -1.0, "mjswd": -1.0, "mjsws": -1.0,
    "mjswgd": -1.0, "mjswgs": -1.0, "fcd": -1.0, "fcs": -1.0,
    "rdsmod": 1.0, "rgatemod": 1.0, "rbodymod": 1.0,
    # wave 7: Berkeley noise defaults (kf=0 off; noimod=1 SPICE2 form)
    "af": 1.0, "ef": 1.0, "noimod": 1.0,
    # wave 9: NQS off by default; elm = Berkeley Elmore constant
    "elm": 5.0,
})
_TNOM = 27.0
_IX = {p: i for i, p in enumerate(_PARAMS)}


def _p(P, name):
    return P[_IX[name]]


def _geom(P):
    """Leff/Weff (lint/wint) and the binned parameter set
    (bsim3v32_lw_scale: p + l*dL + w*dW + p*dL*dW)."""
    leff = jnp.maximum(_p(P, "L") - 2.0 * _p(P, "lint"), 1e-9)
    weff = jnp.maximum(_p(P, "W") - 2.0 * _p(P, "wint"), 1e-9)
    lref = jnp.where(_p(P, "lref") > 0.0, _p(P, "lref"), leff)
    wref = jnp.where(_p(P, "wref") > 0.0, _p(P, "wref"), weff)
    dl = leff - lref
    dw = weff - wref

    def scale(base, pre):
        return (base + _p(P, "l" + pre) * dl + _p(P, "w" + pre) * dw +
                _p(P, "p" + pre) * dl * dw)

    # full bin grid: every wave-2/3 electrical parameter carries l/w/p
    # coefficients (bsim3v32.h:762-840 applies bsim3v32_lw_scale to the
    # same set); coefficients default 0 -> binned == base.
    binned = {
        "vth0": scale(_p(P, "Vth0"), "vth0"),
        "kp": scale(_p(P, "Kp"), "kp"),
        "u0": scale(_p(P, "u0"), "u0"),
        "vsat": scale(_p(P, "vsat"), "vsat"),
        "ua": scale(_p(P, "ua"), "ua"),
        "ub": scale(_p(P, "ub"), "ub"),
        "uc": scale(_p(P, "uc"), "uc"),
        "nch": scale(_p(P, "nch"), "nch"),
        "phi": scale(_p(P, "phi"), "phi"),
        "gamma": scale(_p(P, "gamma"), "gamma"),
        "k1": scale(_p(P, "k1"), "k1"),
        "k2": scale(_p(P, "k2"), "k2"),
        "eta0": scale(_p(P, "eta0"), "eta0"),
        "nfactor": scale(_p(P, "nfactor"), "nfactor"),
        "voff": scale(_p(P, "voff"), "voff"),
        "keta": scale(_p(P, "keta"), "keta"),
        "rdsw": scale(_p(P, "rdsw"), "rdsw"),
    }
    return leff, weff, binned


def _pos_smooth(x, eps=1e-4):
    return 0.5 * (x + jnp.sqrt(x * x + 4.0 * eps * eps))


def _vgsteff(vgst, n, vt):
    arg = vgst / (2.0 * n * vt)
    return 2.0 * n * vt * jnp.where(
        arg > 30.0, arg, jnp.log1p(limexp(jnp.minimum(arg, 30.0))))


def _core(P, vgs, vds, vbs):
    """Channel quantities for vds >= 0 (forward orientation).

    Returns (ids, vgsteff, vdseff, vdsat, vth).  Wave-3 physics
    (bsim3v32.h bsim3v32_ids_core, :740-1007): short-channel Vth
    roll-off (dvt0/dvt1/dvt2 with lt from Xdep and xj), dsub-based
    DIBL depth with etab body dependence, narrow-width correction
    (k3/k3b/w0) and lateral-doping nlx term, voff/cit/noff subthreshold
    shape, mobMod 1/2/3 selector, Abulk(keta), Early-voltage CLM/DIBL
    output conductance (pclm/pdiblc1/pdiblc2/pdiblcb/drout/pvag) and
    SCBE (pscbe1/pscbe2).  Every new parameter defaults to 0 = off so
    the calibrated wave-1/2 behavior is bitwise unchanged."""
    leff, weff, B = _geom(P)
    temp = _p(P, "Temp")
    vt = _K_B * (temp + _T0) / _Q_E
    t_ratio = (temp + _T0) / (_TNOM + _T0)
    dt_c = temp - _TNOM

    # oxide: tox_ratio generalizes k1/k2 to a toxm reference
    tox = jnp.maximum(_p(P, "tox"), 1e-9)
    toxm = jnp.where(_p(P, "toxm") > 0.0, _p(P, "toxm"), tox)
    tox_ratio = tox / toxm
    cox = _EPS_OX / tox

    # temperature scaling (bsim3v32.h temperature section)
    vth0_t = B["vth0"] + (_p(P, "kt1") +
                          _p(P, "kt2") * vbs) * (t_ratio - 1.0)
    vsat = jnp.maximum(B["vsat"] - _p(P, "at") * (t_ratio - 1.0), 1e3)

    # body effect; clamp vbs below phi to keep sqrt real (smoothly)
    phi_s = jnp.maximum(B["phi"], 0.1)
    vbs_c = phi_s - 0.5 * ((phi_s - vbs) +
                           jnp.sqrt((phi_s - vbs) ** 2 + 4.0 * 0.01))
    sqrt_phi = jnp.sqrt(phi_s)
    sqrt_pv = jnp.sqrt(jnp.maximum(phi_s - vbs_c, 1e-12))
    k1 = jnp.where(B["k1"] != 0.0, B["k1"], B["gamma"]) * tox_ratio
    k2 = B["k2"] * tox_ratio
    vth = vth0_t + k1 * (sqrt_pv - sqrt_phi) - k2 * vbs_c

    # depletion width / characteristic lengths for SCE + DIBL depth
    nch = jnp.where(B["nch"] > 1.0, B["nch"], 1e23)
    xdep = jnp.sqrt(2.0 * _EPS_SI *
                    jnp.maximum(phi_s - vbs_c, 1e-12) / (_Q_E * nch))
    xdep0 = jnp.sqrt(2.0 * _EPS_SI * phi_s / (_Q_E * nch))
    xj = jnp.where(_p(P, "xj") > 0.0, _p(P, "xj"), xdep0)
    lt0 = jnp.sqrt((_EPS_SI / _EPS_OX) * tox * xj)
    lt = jnp.sqrt((_EPS_SI / _EPS_OX) * tox * xdep)
    lt = jnp.maximum(lt * (1.0 + _p(P, "dvt2") * vbs_c), 1e-18)

    # short-channel Vth roll-off (dvt0 gates the branch)
    vbi = jnp.where(_p(P, "vbi") > 0.0, _p(P, "vbi"), phi_s + 0.5)
    theta_th = _p(P, "dvt0") * (
        limexp(-_p(P, "dvt1") * leff / (2.0 * lt)) +
        2.0 * limexp(-_p(P, "dvt1") * leff / lt))
    vth = vth - theta_th * (vbi - phi_s)

    # DIBL: plain eta0*vds unless dsub sets a length-dependent depth
    theta_dibl = jnp.where(
        _p(P, "dsub") > 0.0,
        limexp(-_p(P, "dsub") * leff / (2.0 * lt0)) +
        2.0 * limexp(-_p(P, "dsub") * leff / lt0),
        1.0)
    vth = vth - theta_dibl * (B["eta0"] + _p(P, "etab") * vbs_c) * vds

    # narrow width + lateral doping (k3/k3b/w0, nlx); the tox/(Weff+W0)
    # normalization is the BSIM3 manual form (the reference's clean-room
    # variant drops the tox factor, which blows the term up by ~1e3 at
    # default k3 — deliberately not mirrored)
    vth = vth + (_p(P, "k3") + _p(P, "k3b") * vbs_c) * tox_ratio * \
        (tox / jnp.maximum(weff + _p(P, "w0"), 1e-18)) * phi_s
    vth = vth + k1 * (jnp.maximum(_p(P, "nlx"), 0.0) / leff) * sqrt_phi

    vgst = vgs - vth - B["voff"]

    # Vgsteff smoothing (strong inversion <-> subthreshold); n picks up
    # interface states (cit) and the noff multiplier
    n = jnp.maximum(B["nfactor"], 0.1) * (1.0 + _p(P, "noff"))
    n = n + _p(P, "cit") / cox
    vgsteff = _vgsteff(vgst, n, vt)

    # mobility: mobmod 0 = legacy wave-2 blend (default); 1/2/3 mirror
    # bsim3v32_ueff_mobmod1/2/3
    ua = B["ua"] + _p(P, "ua1") * dt_c
    ub = B["ub"] + _p(P, "ub1") * dt_c
    uc = B["uc"] + _p(P, "uc1") * dt_c
    e_leg = (vgsteff + 2.0 * vth) / tox
    den_leg = 1.0 + (ua + uc * vbs_c) * e_leg + ub * e_leg * e_leg
    e3 = (vgsteff + 2.0 * vt) / tox
    den3 = 1.0 + (ua * e3 + ub * e3 * e3) * (1.0 + uc * vbs_c)
    e2 = vgsteff / tox
    den2 = 1.0 + (ua * e2 + ub * e2 * e2) * (1.0 + uc * vbs_c)
    den1 = 1.0 + ua * vgsteff + ub * vgsteff * vgsteff + uc * vbs_c
    mm = _p(P, "mobmod")
    denom = jnp.where(mm < 0.5, den_leg,
                      jnp.where(mm < 1.5, den1,
                                jnp.where(mm < 2.5, den2, den3)))
    denom = jnp.maximum(denom, 0.1) * (1.0 + _p(P, "theta") * vgsteff)
    u0 = B["u0"] * t_ratio ** _p(P, "ute") / denom
    kp_eff = B["kp"] * (u0 / jnp.maximum(B["u0"], 1e-12))
    beta = kp_eff * weff / leff
    esat_l = 2.0 * vsat * leff / jnp.maximum(u0, 1e-6)

    # Abulk (keta hook) enters vdsat and the linear-region charge term
    abulk = jnp.maximum(1.0 + B["keta"] * vbs_c, 0.1)
    vdsat = esat_l * vgsteff / (abulk * esat_l + vgsteff)
    delta = jnp.where(_p(P, "delta") > 0.0, _p(P, "delta"), 0.01)
    t1 = vdsat - vds - delta
    vdseff = vdsat - 0.5 * (t1 + jnp.sqrt(t1 * t1 +
                                          4.0 * delta * vdsat))

    vgst2 = vgsteff + 2.0 * vt
    ids0 = beta * vgsteff * (1.0 - abulk * vdseff /
                             (2.0 * vgst2)) * vdseff
    ids0 = ids0 / (1.0 + vdseff / esat_l)

    # series resistance fold (bsim3v32.h:985-1000): rdsw [Ohm*um];
    # rdsMod == 0 disables the internal Rds model entirely
    # (bsim3v32.h:983,1833-1834)
    rdsw = B["rdsw"] * (1.0 + _p(P, "prt") * (t_ratio - 1.0))
    rds = rdsw * (1.0 + _p(P, "prwg") * vgsteff +
                  _p(P, "prwb") * (sqrt_pv - sqrt_phi))
    rds = jnp.maximum(rds, 0.0) * 1e-6 / weff
    rds = jnp.where(_p(P, "rdsmod") != 0.0, rds, 0.0)
    ids0 = ids0 / (1.0 + rds * ids0 / jnp.maximum(vdseff, 1e-6))

    # output conductance: Early-voltage CLM/DIBL + SCBE when the
    # advanced params are set, legacy lambda otherwise
    vdsx = _pos_smooth(vds - vdseff)
    pclm = _p(P, "pclm")
    pd1 = _p(P, "pdiblc1")
    pd2 = _p(P, "pdiblc2")
    vaclm = (abulk * esat_l + vgsteff) * vdsx / \
        (jnp.maximum(pclm, 1e-12) * abulk * esat_l / leff *
         jnp.maximum(lt, 1e-18))
    theta_rout = pd1 * (limexp(-_p(P, "drout") * leff / (2.0 * lt0)) +
                        2.0 * limexp(-_p(P, "drout") * leff / lt0)) + \
        pd2
    t3 = 1.0 - abulk * vdsat / jnp.maximum(abulk * vdsat + vgst2,
                                           1e-18)
    pvag_f = 1.0 + _p(P, "pvag") * u0 * vgsteff / \
        jnp.maximum(2.0 * vsat * leff, 1e-18)
    vadiblc = vgst2 / jnp.maximum(
        theta_rout * (1.0 + _p(P, "pdiblcb") * vbs_c) * t3, 1e-18) * \
        pvag_f
    inv_va = jnp.where(pclm > 0.0, 1.0 / jnp.maximum(vaclm, 1e-12),
                       0.0)
    inv_va = inv_va + jnp.where(theta_rout != 0.0,
                                1.0 / jnp.maximum(vadiblc, 1e-12), 0.0)
    clm_f = 1.0 + vdsx * inv_va
    inv_vascbe = jnp.where(
        (_p(P, "pscbe1") > 0.0) & (_p(P, "pscbe2") != 0.0),
        _p(P, "pscbe2") * limexp(-_p(P, "pscbe1") * lt /
                                 jnp.maximum(vdsx, 1e-12)) / leff,
        0.0)
    scbe_f = 1.0 + vdsx * inv_vascbe
    legacy = (pclm <= 0.0) & (pd1 == 0.0) & (pd2 == 0.0)
    ids = jnp.where(legacy,
                    ids0 * (1.0 + _p(P, "lambda") * (vds - vdseff)),
                    ids0 * clm_f * scbe_f)
    return ids, vgsteff, vdseff, vdsat, vth


def _barrier_t(P, b):
    """barrier(T) = barrier(Tnom) * Tnom/T (bsim3v32.h:399-409)."""
    t_k = _p(P, "Temp") + _T0
    return b * (_TNOM + _T0) / jnp.maximum(t_k, 1.0)


def _gidl(P, weff, a, b, c, e, vg, vx, vb):
    """Clean-room GIDL subset (bsim3v32.h:1018-1040):
    I = a*Weff * Vxb_eff * exp(-b_T / (Vxg_eff + c)), flowing x->bulk
    (x = drain for GIDL, source for GISL)."""
    vxg_eff = _pos_smooth((vx - vg) - e)
    vxb_eff = _pos_smooth(vx - vb)
    denom = jnp.maximum(vxg_eff + c, 1e-6)
    on = (a > 0.0) & (b > 0.0)
    i = a * weff * vxb_eff * limexp(-_barrier_t(P, b) / denom)
    return jnp.where(on, i, 0.0)


def _with_dtemp(P):
    """Fold the per-device temperature delta into the Temp slot
    (bsim3v32.h:2131 Temp = base + dtemp)."""
    return P.at[_IX["Temp"]].add(_p(P, "dtemp"))


def _mnf_scale(P):
    """m*nf multiplicity (bsim3v32.h:3229,3388); nonpositive -> 1."""
    m = jnp.where(_p(P, "m") > 0.0, _p(P, "m"), 1.0)
    nf = jnp.where(_p(P, "nf") > 0.0, _p(P, "nf"), 1.0)
    return m * nf


def _junction_params(P, weff):
    """Per-junction saturation/recombination currents + emission
    slopes (bsim3v32.h:3225-3270 fallback chains + 1953-1966 geometry
    densities).  Returns (is_d, is_s, nv_d, nv_s, isr_d, isr_s,
    nvr_d, nvr_s) with temperature scaling applied."""
    vt = _K_B * (_p(P, "Temp") + _T0) / _Q_E
    vtnom = _K_B * (_TNOM + _T0) / _Q_E
    t_ratio = (_p(P, "Temp") + _T0) / (_TNOM + _T0)

    def tfac(n):
        return t_ratio ** (_p(P, "xti") / n) * \
            limexp((_p(P, "eg") / n) * (1.0 / vtnom - 1.0 / vt))

    # emission coefficients with per-junction overrides (nd/ns > 0)
    nj = jnp.maximum(_p(P, "diode_N"), 0.1)
    nj_d = jnp.where(_p(P, "nd") > 0.0, _p(P, "nd"), nj)
    nj_s = jnp.where(_p(P, "ns") > 0.0, _p(P, "ns"), nj)
    nr = jnp.maximum(_p(P, "nr"), 0.1)
    nr_d = jnp.where(_p(P, "nrd") > 0.0, _p(P, "nrd"), nr)
    nr_s = jnp.where(_p(P, "nrs") > 0.0, _p(P, "nrs"), nr)

    # saturation currents: density geometry > per-junction Is > Is
    js_, jsw_, jswg_ = _p(P, "js"), _p(P, "jsw"), _p(P, "jswg")
    jsd_ = jnp.where(_p(P, "jsd") > 0.0, _p(P, "jsd"), js_)
    jss_ = jnp.where(_p(P, "jss") > 0.0, _p(P, "jss"), js_)
    jswd_ = jnp.where(_p(P, "jswd") > 0.0, _p(P, "jswd"), jsw_)
    jsws_ = jnp.where(_p(P, "jsws") > 0.0, _p(P, "jsws"), jsw_)
    jswgd_ = jnp.where(_p(P, "jswgd") > 0.0, _p(P, "jswgd"), jswg_)
    jswgs_ = jnp.where(_p(P, "jswgs") > 0.0, _p(P, "jswgs"), jswg_)
    use_dens = (jsd_ > 0.0) | (jss_ > 0.0) | (jswd_ > 0.0) | \
        (jsws_ > 0.0) | (jswgd_ > 0.0) | (jswgs_ > 0.0)
    is0 = _p(P, "diode_Is")
    is0_d = jnp.where(_p(P, "isd") >= 0.0, _p(P, "isd"), is0)
    is0_s = jnp.where(_p(P, "iss") >= 0.0, _p(P, "iss"), is0)
    is_d = jnp.where(
        use_dens,
        jnp.maximum(jsd_ * _p(P, "ad") + jswd_ * _p(P, "pd") +
                    jswgd_ * weff, 1e-30), is0_d) * tfac(nj_d)
    is_s = jnp.where(
        use_dens,
        jnp.maximum(jss_ * _p(P, "as") + jsws_ * _p(P, "ps") +
                    jswgs_ * weff, 1e-30), is0_s) * tfac(nj_s)

    # recombination currents (jsr densities > per-junction > isr)
    jsr_, jsrw_, jsrwg_ = (_p(P, "jsr"), _p(P, "jsrw"),
                           _p(P, "jsrwg"))
    use_jsr = (jsr_ > 0.0) | (jsrw_ > 0.0) | (jsrwg_ > 0.0)
    isr0 = _p(P, "isr")
    isr0_d = jnp.where(_p(P, "isrd") >= 0.0, _p(P, "isrd"), isr0)
    isr0_s = jnp.where(_p(P, "isrs") >= 0.0, _p(P, "isrs"), isr0)
    isr_d = jnp.where(
        use_jsr,
        jsr_ * _p(P, "ad") + jsrw_ * _p(P, "pd") + jsrwg_ * weff,
        isr0_d) * tfac(nr_d)
    isr_s = jnp.where(
        use_jsr,
        jsr_ * _p(P, "as") + jsrw_ * _p(P, "ps") + jsrwg_ * weff,
        isr0_s) * tfac(nr_s)

    return (is_d, is_s, nj_d * vt, nj_s * vt,
            isr_d, isr_s, nr_d * vt, nr_s * vt)


def _terminal_currents(P, v4, sign):
    """I(d,g,s,b) with symmetric source/drain swap for reverse vds.

    ``sign``: +1 NMOS, -1 PMOS (PMOS evaluated in mirrored voltages).
    """
    P = _with_dtemp(P)
    vd, vg, vs, vb = (sign * v4[0], sign * v4[1],
                      sign * v4[2], sign * v4[3])
    vds = vd - vs
    fwd = vds >= 0.0

    ids_f, vgst_f, vdse_f, _vds_f, _vth_f = _core(P, vg - vs, vds,
                                                  vb - vs)
    ids_r, vgst_r, vdse_r, _vds_r, _vth_r = _core(P, vg - vd, -vds,
                                                  vb - vd)
    ids = jnp.where(fwd, ids_f, -ids_r)
    vdseff = jnp.where(fwd, vdse_f, vdse_r)

    # impact ionization (bsim3v32.h:1141-1154): drain->bulk; vdsatii
    # overrides the saturation-voltage subtraction point when set
    vds_ii = _pos_smooth(jnp.abs(vds) -
                         jnp.where(_p(P, "vdsatii") > 0.0,
                                   _p(P, "vdsatii"), vdseff))
    a0, b0 = _p(P, "alpha0"), _p(P, "beta0")
    iii = jnp.where((a0 > 0.0) & (b0 > 0.0),
                    a0 * jnp.abs(ids) * vds_ii *
                    limexp(-_barrier_t(P, b0) / jnp.maximum(vds_ii,
                                                            1e-6)),
                    0.0)

    # GIDL (drain edge) and GISL (source edge, params fall back)
    leff, weff, _B = _geom(P)
    ig_d = _gidl(P, weff, _p(P, "agidl"), _p(P, "bgidl"),
                 _p(P, "cgidl"), _p(P, "egidl"), vg, vd, vb)
    ag = jnp.where(_p(P, "agisl") > 0.0, _p(P, "agisl"),
                   _p(P, "agidl"))
    bg = jnp.where(_p(P, "bgisl") > 0.0, _p(P, "bgisl"),
                   _p(P, "bgidl"))
    cg = jnp.where(_p(P, "cgisl") > 0.0, _p(P, "cgisl"),
                   _p(P, "cgidl"))
    eg_ = jnp.where(_p(P, "egisl") > 0.0, _p(P, "egisl"),
                    _p(P, "egidl"))
    ig_s = _gidl(P, weff, ag, bg, cg, eg_, vg, vs, vb)

    # bulk junctions (SPICE-style, limexp-clamped): geometry-scaled /
    # per-junction saturation + recombination currents with Is(T) =
    # Is * (T/Tnom)^(XTI/N) * exp(Eg/N * (1/Vtnom - 1/Vt)) scaling
    (is_d, is_s, nv_d, nv_s,
     isr_d, isr_s, nvr_d, nvr_s) = _junction_params(P, weff)
    ibs = is_s * (limexp((vb - vs) / nv_s) - 1.0) + \
        isr_s * (limexp((vb - vs) / nvr_s) - 1.0)
    ibd = is_d * (limexp((vb - vd) / nv_d) - 1.0) + \
        isr_d * (limexp((vb - vd) / nvr_d) - 1.0)

    # junction breakdown (bsim3v32.h:1921-1926,3340-3347): forwarded
    # PN_junction breakdown with Bv_eff = Bv - nv*ln(Ibv/Is) so the
    # knee sits at Ibv; Bv<=0 or Ibv<=0 disables.
    def _jbk(v, is_eff, nv, bv, ibv):
        on = (bv > 0.0) & (ibv > 0.0)
        is_safe = jnp.maximum(is_eff, 1e-30)
        bv_eff = bv - nv * jnp.log(jnp.maximum(ibv / is_safe, 1.0))
        bk = on & (v < -bv_eff)
        return jnp.where(bk,
                         -is_eff * limexp(-(bv_eff + v) / nv), 0.0)

    ibd = ibd + _jbk(vb - vd, is_d, nv_d, _p(P, "bvd"),
                     _p(P, "ibvd"))
    ibs = ibs + _jbk(vb - vs, is_s, nv_s, _p(P, "bvs"),
                     _p(P, "ibvs"))

    # gate leakage (bsim3v32.h:1069-1131 igb/igs/igd subset):
    # Ig = a * Weff_c * Leff_c * V_eff^2 * exp(-b_T/(V_eff + c)),
    # V_eff = pos_smooth(V - e); igs/igd fall back to the igb b/c/e.
    weff_c = jnp.maximum(_p(P, "W") -
                         2.0 * jnp.maximum(_p(P, "dwc"), 0.0), 1e-18)
    leff_c = jnp.maximum(_p(P, "L") -
                         2.0 * jnp.maximum(_p(P, "dlc"), 0.0), 1e-18)

    def _ig(a, b, c, e, dv):
        b_ = jnp.where(b > 0.0, b, _p(P, "bigb"))
        c_ = jnp.where(c != 0.0, c, _p(P, "cigb"))
        e_ = jnp.where(e != 0.0, e, _p(P, "eigb"))
        v_eff = _pos_smooth(dv - e_)
        denom = jnp.maximum(v_eff + c_, 1e-12)
        on = (a > 0.0) & (b_ > 0.0)
        i = a * weff_c * leff_c * v_eff * v_eff * \
            limexp(-_barrier_t(P, b_) / denom)
        return jnp.where(on, i, 0.0)

    igb = _ig(_p(P, "aigb"), _p(P, "bigb"), _p(P, "cigb"),
              _p(P, "eigb"), vg - vb)
    igs = _ig(_p(P, "aigs"), _p(P, "bigs"), _p(P, "cigs"),
              _p(P, "eigs"), vg - vs)
    igd = _ig(_p(P, "aigd"), _p(P, "bigd"), _p(P, "cigd"),
              _p(P, "eigd"), vg - vd)

    i_d = ids - ibd + iii + ig_d - igd
    i_s = -ids - ibs + ig_s - igs
    i_b = ibs + ibd - iii - ig_d - ig_s - igb
    i_g = igb + igs + igd
    # m*nf multiplicity, then un-mirror currents for PMOS
    return (sign * _mnf_scale(P)) * jnp.stack([i_d, i_g, i_s, i_b])


# ---------------------------------------------------------------------------
# charge model: one Q(v) covering overlaps, intrinsic C-V, junctions
# ---------------------------------------------------------------------------

def _qj(v, cj0, mjq, pbq, fcq=0.5):
    """Depletion charge of a junction cap (SPICE grading), linearized
    above fc*pb (forward-bias coefficient, default 0.5) to stay finite
    in forward bias."""
    pbq = jnp.maximum(pbq, 0.1)
    mjq = jnp.clip(mjq, 0.05, 0.95)
    fc = jnp.clip(fcq, 0.0, 0.95) * pbq
    q_rev = cj0 * pbq / (1.0 - mjq) * \
        (1.0 - jnp.maximum(1.0 - jnp.minimum(v, fc) / pbq,
                           1e-3) ** (1.0 - mjq))
    c_fc = cj0 * (1.0 - fc / pbq) ** (-mjq)
    q_fwd = q_rev + c_fc * (v - fc)      # evaluated at v=fc boundary
    return jnp.where(v <= fc, q_rev, q_fwd)


def _intrinsic_charges(P, vgs, vds, vbs):
    """capMod>=1 intrinsic (qd, qg, qs, qb) — clean-room simplified
    charge model mirroring bsim3v32.h:1202-1420 semantics."""
    leff, weff, B = _geom(P)
    temp = _p(P, "Temp")
    vt = _K_B * (temp + _T0) / _Q_E
    cox = _EPS_OX / jnp.maximum(_p(P, "tox"), 1e-9)
    coxwl = cox * weff * leff

    phi_s = jnp.maximum(B["phi"], 0.1)
    vbseff = phi_s - _pos_smooth(phi_s - vbs, 1e-2)
    sqrt_phi = jnp.sqrt(phi_s)
    sqrt_pv = jnp.sqrt(jnp.maximum(phi_s - vbseff, 1e-12))
    k1 = jnp.where(B["k1"] != 0.0, B["k1"], B["gamma"])
    qb = coxwl * (k1 * (sqrt_pv - sqrt_phi) - _p(P, "k2") * vbseff)

    # CV-effective gate overdrive (voffcv-shifted)
    _ids, vgsteff, vdseff, vdsat, vth = _core(P, vgs, _pos_smooth(vds),
                                              vbs)
    vgst_cv = vgs - vth - _p(P, "voffcv")
    n = jnp.maximum(_p(P, "nfactor"), 0.1)
    vgsteff_cv = _vgsteff(vgst_cv, n, vt)
    abulk = 1.0 + B["keta"] * vbseff
    vds_pos = _pos_smooth(vds)

    # smooth linear/saturation blend around vdsat
    delta = 0.01
    s_reg = vds_pos - vdsat
    f_sat = 0.5 * (1.0 + s_reg / jnp.sqrt(s_reg * s_reg +
                                          delta * delta))

    qinv_lin = -coxwl * (vgsteff_cv - abulk * vdseff / 2.0)
    qinv_sat = -(2.0 / 3.0) * coxwl * vgsteff_cv
    qinv = (1.0 - f_sat) * qinv_lin + f_sat * qinv_sat

    # partition: Ward-Dutton-ish in linear; xpart anchors in saturation
    qd_lin = -coxwl * (0.5 * vgsteff_cv - abulk * vdseff / 3.0)
    xp = jnp.clip(_p(P, "xpart"), 0.0, 1.0)
    frac_d = jnp.where(xp <= 0.5, xp, 0.6 - 0.2 * xp)
    qd_sat = frac_d * qinv_sat
    qd = (1.0 - f_sat) * qd_lin + f_sat * qd_sat
    qs = qinv - qd

    qg = -(qinv + qb)

    # accumulation / depletion gate-bulk charge (vfbcv observable)
    nch = jnp.where(B["nch"] > 1.0, B["nch"], 1e23)
    xdep = jnp.sqrt(2.0 * _EPS_SI *
                    jnp.maximum(phi_s - vbseff, 1e-12) / (_Q_E * nch))
    cdep = _EPS_SI / jnp.maximum(xdep, 1e-18)
    cdep_wl = coxwl * cdep / (cox + cdep)
    vfb = jnp.where(_p(P, "vfbcv") != 0.0, _p(P, "vfbcv"),
                    B["vth0"] - phi_s)
    x = (vgs - vbs) - vfb
    absx = jnp.sqrt(x * x + 1e-4)
    minx = 0.5 * (x - absx)
    maxx = 0.5 * (x + absx)
    vgst_sgn = vgs - vth
    f_cut = 0.5 * (1.0 - vgst_sgn / jnp.sqrt(vgst_sgn * vgst_sgn +
                                             1e-4))
    qacc = coxwl * minx
    qdep = cdep_wl * maxx * f_cut
    qg = qg + qacc + qdep
    qb = qb - qacc - qdep
    return qd, qg, qs, qb


def _charges(P, v4, sign):
    """Terminal charges Q(d,g,s,b): overlap + intrinsic + junction."""
    P = _with_dtemp(P)
    vd, vg, vs, vb = (sign * v4[0], sign * v4[1],
                      sign * v4[2], sign * v4[3])
    # overlap caps: fixed wave-1 surface plus per-width densities
    # (bsim3v32.h:1426-1470: cgs_ovl = cgso*Weff, cgd_ovl = cgdo*Weff,
    # cgb_ovl = cgbo*Leff; acm != 0 selects the charge-based overlap
    # path instead, zeroing the densities)
    leff_c = jnp.maximum(_p(P, "L") -
                         2.0 * jnp.maximum(_p(P, "dlc"), 0.0), 1e-18)
    weff_c = jnp.maximum(_p(P, "W") -
                         2.0 * jnp.maximum(_p(P, "dwc"), 0.0), 1e-18)
    dens_on = (_p(P, "acm") == 0.0)
    cgs_e = _p(P, "Cgs") + jnp.where(dens_on,
                                     _p(P, "cgso") * weff_c, 0.0)
    cgd_e = _p(P, "Cgd") + jnp.where(dens_on,
                                     _p(P, "cgdo") * weff_c, 0.0)
    cgb_e = _p(P, "Cgb") + jnp.where(dens_on,
                                     _p(P, "cgbo") * leff_c, 0.0)
    qg = (cgs_e * (vg - vs) + cgd_e * (vg - vd) + cgb_e * (vg - vb))
    qd = cgd_e * (vd - vg)
    qs = cgs_e * (vs - vg)
    qb = cgb_e * (vb - vg)
    # voltage-dependent junction depletion charges (area + sidewall +
    # gate-edge sidewall) with linear tempcos (bsim3v32.h:2018-2027:
    # cj(T)=cj*(1+tcj*dT), pb(T)=pb*(1+tpb*dT), per component) and
    # wave-6 per-junction override/inherit chains (bsim3v32.h:
    # 1990-2042: zero densities inherit the base density, <=0
    # potentials inherit down the pbsw->pb chain, negative grading/fc
    # coefficients inherit; cjd/cjs are the reference's per-junction
    # BOTTOM density overrides of cj, not fixed capacitances).
    dT = _p(P, "Temp") - _TNOM

    def ov(name, base):
        v = _p(P, name)                  # <=0 inherits base
        return jnp.where(v > 0.0, v, base)

    cj_d0 = jnp.where(_p(P, "cjd") != 0.0, _p(P, "cjd"), _p(P, "cj"))
    cj_s0 = jnp.where(_p(P, "cjs") != 0.0, _p(P, "cjs"), _p(P, "cj"))
    cjsw_d0 = jnp.where(_p(P, "cjswd") != 0.0, _p(P, "cjswd"),
                        _p(P, "cjsw"))
    cjsw_s0 = jnp.where(_p(P, "cjsws") != 0.0, _p(P, "cjsws"),
                        _p(P, "cjsw"))
    cjswg_d0 = jnp.where(_p(P, "cjswgd") != 0.0, _p(P, "cjswgd"),
                         _p(P, "cjswg"))
    cjswg_s0 = jnp.where(_p(P, "cjswgs") != 0.0, _p(P, "cjswgs"),
                         _p(P, "cjswg"))
    tcj_f = 1.0 + _p(P, "tcj") * dT
    tcjsw_f = 1.0 + _p(P, "tcjsw") * dT
    tcjswg_f = 1.0 + _p(P, "tcjswg") * dT
    # potentials: pbd/pbs <=0 -> pb; pbswd/pbsws <=0 -> pbsw;
    # pbswgd/pbswgs <=0 -> pbswg -> pbsw (bsim3v32.h:2004-2015)
    pb_d0 = ov("pbd", _p(P, "pb"))
    pb_s0 = ov("pbs", _p(P, "pb"))
    pbsw_d0 = ov("pbswd", _p(P, "pbsw"))
    pbsw_s0 = ov("pbsws", _p(P, "pbsw"))
    pbswg_b = jnp.where(_p(P, "pbswg") > 0.0, _p(P, "pbswg"),
                        _p(P, "pbsw"))
    pbswg_d0 = ov("pbswgd", pbswg_b)
    pbswg_s0 = ov("pbswgs", pbswg_b)
    tpb_f = 1.0 + _p(P, "tpb") * dT
    tpbsw_f = 1.0 + _p(P, "tpbsw") * dT
    tpbswg_f = 1.0 + _p(P, "tpbswg") * dT
    # grading: mjd/mjs <0 -> mj; mjswd/mjsws <0 -> mjsw;
    # mjswgd/mjswgs <0 -> mjswg -> mjsw (bsim3v32.h:2029-2037)
    mj_d = jnp.where(_p(P, "mjd") >= 0.0, _p(P, "mjd"), _p(P, "mj"))
    mj_s = jnp.where(_p(P, "mjs") >= 0.0, _p(P, "mjs"), _p(P, "mj"))
    mjsw_d = jnp.where(_p(P, "mjswd") >= 0.0, _p(P, "mjswd"),
                       _p(P, "mjsw"))
    mjsw_s = jnp.where(_p(P, "mjsws") >= 0.0, _p(P, "mjsws"),
                       _p(P, "mjsw"))
    mjswg_b = jnp.where(_p(P, "mjswg") > 0.0, _p(P, "mjswg"),
                        _p(P, "mjsw"))
    mjswg_d = jnp.where(_p(P, "mjswgd") >= 0.0, _p(P, "mjswgd"),
                        mjswg_b)
    mjswg_s = jnp.where(_p(P, "mjswgs") >= 0.0, _p(P, "mjswgs"),
                        mjswg_b)
    # forward-bias coefficient: fcd/fcs <0 -> fc (bsim3v32.h:2041-2042)
    fc_d = jnp.where(_p(P, "fcd") >= 0.0, _p(P, "fcd"), _p(P, "fc"))
    fc_s = jnp.where(_p(P, "fcs") >= 0.0, _p(P, "fcs"), _p(P, "fc"))
    weff_cv = jnp.maximum(_p(P, "W") -
                          2.0 * jnp.maximum(_p(P, "dwc"), 0.0), 1e-18)
    cj_s_ = cj_s0 * tcj_f * _p(P, "as")
    cj_d_ = cj_d0 * tcj_f * _p(P, "ad")
    cjsw_s_ = cjsw_s0 * tcjsw_f * _p(P, "ps")
    cjsw_d_ = cjsw_d0 * tcjsw_f * _p(P, "pd")
    cjswg_s_ = cjswg_s0 * tcjswg_f * weff_cv   # gate edge = Weff
    cjswg_d_ = cjswg_d0 * tcjswg_f * weff_cv
    qbs = _qj(vb - vs, cj_s_, mj_s, pb_s0 * tpb_f, fc_s) + \
        _qj(vb - vs, cjsw_s_, mjsw_s, pbsw_s0 * tpbsw_f, fc_s) + \
        _qj(vb - vs, cjswg_s_, mjswg_s, pbswg_s0 * tpbswg_f, fc_s)
    qbd = _qj(vb - vd, cj_d_, mj_d, pb_d0 * tpb_f, fc_d) + \
        _qj(vb - vd, cjsw_d_, mjsw_d, pbsw_d0 * tpbsw_f, fc_d) + \
        _qj(vb - vd, cjswg_d_, mjswg_d, pbswg_d0 * tpbswg_f, fc_d)

    # diffusion (transit-time) charge q = tt * I_junction(v)
    # (bsim3v32.h:3248-3263: ttd/tts >= 0 override tt; forwarded to
    # the internal diodes in the reference)
    tt_d = jnp.where(_p(P, "ttd") >= 0.0, _p(P, "ttd"), _p(P, "tt"))
    tt_s = jnp.where(_p(P, "tts") >= 0.0, _p(P, "tts"), _p(P, "tt"))
    leff_w, weff_w, _Bw = _geom(P)
    (is_d, is_s, nv_d, nv_s,
     isr_d, isr_s, nvr_d, nvr_s) = _junction_params(P, weff_w)
    qbs = qbs + jnp.maximum(tt_s, 0.0) * (
        is_s * (limexp((vb - vs) / nv_s) - 1.0))
    qbd = qbd + jnp.maximum(tt_d, 0.0) * (
        is_d * (limexp((vb - vd) / nv_d) - 1.0))

    qb = qb + qbs + qbd
    qs = qs - qbs
    qd = qd - qbd

    # intrinsic charges (capMod >= 1), source/drain-swap symmetric
    vds = vd - vs
    fwd = vds >= 0.0
    qd_f, qg_f, qs_f, qb_f = _intrinsic_charges(P, vg - vs, vds,
                                                vb - vs)
    qs_r, qg_r, qd_r, qb_r = _intrinsic_charges(P, vg - vd, -vds,
                                                vb - vd)
    on = _p(P, "capmod") >= 1.0
    qd = qd + jnp.where(on, jnp.where(fwd, qd_f, qd_r), 0.0)
    qg = qg + jnp.where(on, jnp.where(fwd, qg_f, qg_r), 0.0)
    qs = qs + jnp.where(on, jnp.where(fwd, qs_f, qs_r), 0.0)
    qb = qb + jnp.where(on, jnp.where(fwd, qb_f, qb_r), 0.0)
    # m*nf multiplicity, then un-mirror for PMOS
    return (sign * _mnf_scale(P)) * jnp.stack([qd, qg, qs, qb])


def _charges_intrinsic_only(P, v4, sign):
    """The intrinsic (capMod >= 1) terminal-charge vector alone, with
    the same source/drain-swap symmetrization, capmod gate and
    sign·m·nf scaling as the intrinsic block inside ``_charges`` —
    this is the subsystem wave-9 NQS relaxes (overlap and junction
    charges stay quasi-static)."""
    P = _with_dtemp(P)
    vd, vg, vs, vb = (sign * v4[0], sign * v4[1],
                      sign * v4[2], sign * v4[3])
    vds = vd - vs
    fwd = vds >= 0.0
    qd_f, qg_f, qs_f, qb_f = _intrinsic_charges(P, vg - vs, vds,
                                                vb - vs)
    qs_r, qg_r, qd_r, qb_r = _intrinsic_charges(P, vg - vd, -vds,
                                                vb - vd)
    on = _p(P, "capmod") >= 1.0
    qd = jnp.where(on, jnp.where(fwd, qd_f, qd_r), 0.0)
    qg = jnp.where(on, jnp.where(fwd, qg_f, qg_r), 0.0)
    qs = jnp.where(on, jnp.where(fwd, qs_f, qs_r), 0.0)
    qb = jnp.where(on, jnp.where(fwd, qb_f, qb_r), 0.0)
    return (sign * _mnf_scale(P)) * jnp.stack([qd, qg, qs, qb])


def _nqs_tau(P, v4, sign):
    """Wave-9 NQS relaxation time (clean-room first-order Elmore
    form; the reference implements NO NQS, bsim3v32.h:27):

        1/τ = 1/τ_diff + 1/τ_drift,
        τ_diff  = Leff² / (16·μ0·Ut)          (diffusion limit)
        τ_drift = Cox·Weff·Leff / (elm·gd0)   (drift limit)

    with gd0 = gm+gds+gmb at the bias (same jacfwd core the noise
    model uses) and elm the Berkeley Elmore constant (default 5)."""
    P2 = _with_dtemp(P)
    leff, weff, B = _geom(P2)
    ut = _K_B * (_p(P2, "Temp") + _T0) / _Q_E
    cox = _EPS_OX / jnp.maximum(_p(P2, "tox"), 1e-9)
    cwl = cox * weff * leff
    u0b = jnp.maximum(B["u0"], 1e-6)
    inv_diff = 16.0 * u0b * ut / (leff * leff)
    _ids, g0 = _chan_noise_bias(P2, v4, sign)
    elm = jnp.maximum(_p(P2, "elm"), 1e-3)
    inv_drift = elm * g0 / jnp.maximum(cwl, 1e-30)
    return 1.0 / (inv_diff + inv_drift)


# ---------------------------------------------------------------------------
# stamps
# ---------------------------------------------------------------------------

def _make_stamp(sign):
    def stamp(P, v, ib, state, ctx):
        f = lambda v4: _terminal_currents(P, v4, sign)
        i_now = f(v)
        J = jax.jacfwd(f)(v)
        ieq = i_now - J @ v
        a_vals = J.reshape(-1)
        z_vals = -ieq
        new_state = dict(state)
        # save the operating point for AC (save_op role)
        new_state["vd"] = v[0]
        new_state["vg"] = v[1]
        new_state["vs"] = v[2]
        new_state["vb"] = v[3]
        if ctx.mode == "tr":
            # trapezoidal charge companion: i = G@v + h with G, h from
            # the last accepted step (step_update); the ng/nh slots
            # carry the wave-9 NQS relaxed-channel current model (all
            # zero at nqsmod=0, so adding them is an exact no-op)
            G = jnp.stack([state[f"cg{k}"] + state[f"ng{k}"]
                           for k in range(16)])
            h = jnp.stack([state[f"ch{k}"] + state[f"nh{k}"]
                           for k in range(4)])
            a_vals = a_vals + G
            z_vals = z_vals - h
        return a_vals, z_vals, new_state
    return stamp


def _make_step_update(sign):
    def _step_update(P, v, ib, state, dt, t):
        out = dict(state)
        C = jax.jacfwd(lambda v4: _charges(P, v4, sign))(v)
        # wave-9 NQS: relax the intrinsic charge subsystem with a
        # single pole (dQdef/dt = dQint/dt − Qdef/τ, terminal currents
        # Qdef/τ); the quasi-static trapezoid then runs on the
        # remaining (overlap + junction) charges only.  At nqsmod=0
        # C_qs == C and every NQS slot is 0 — bit-identical behavior.
        nqs_on = _p(P, "nqsmod") != 0.0
        C_int = jax.jacfwd(
            lambda v4: _charges_intrinsic_only(P, v4, sign))(v)
        C_qs = jnp.where(nqs_on, C - C_int, C)
        G_prev = jnp.stack([state[f"cg{k}"]
                            for k in range(16)]).reshape(4, 4)
        h_prev = jnp.stack([state[f"ch{k}"] for k in range(4)])
        ic_now = G_prev @ v + h_prev          # companion current at t
        G_new = 2.0 * C_qs / dt
        h_new = -(G_new @ v) - ic_now
        for k in range(16):
            out[f"cg{k}"] = G_new.reshape(-1)[k]
        for k in range(4):
            out[f"ch{k}"] = h_new[k]
        # NQS current model for the next step, trapezoid-consistent:
        # trapezoid on dQdef/dt = dQint/dt − i with i = Qdef/τ gives
        #   i(v') = [Qdef_n − (dt/2)·i_n + C_int·(v'−v)] / (τ + dt/2)
        # and the accepted deficit satisfies Qdef_n = τ_prev·i_n
        # exactly (substitute the model equation into its own
        # trapezoid), so one extra scalar of state (ntau) suffices.
        # τ→0 collapses this onto the QS trapezoid recurrence
        # i(v') = (2C_int/dt)(v'−v) − i_n sample-for-sample.
        tau = _nqs_tau(P, v, sign)
        i_n = jnp.stack([state[f"ng{k}"]
                         for k in range(16)]).reshape(4, 4) @ v + \
            jnp.stack([state[f"nh{k}"] for k in range(4)])
        qdef_n = state["ntau"] * i_n
        den = tau + dt / 2.0
        Gn = C_int / den
        hn = (qdef_n - (dt / 2.0) * i_n) / den - Gn @ v
        z = jnp.zeros(())
        for k in range(16):
            out[f"ng{k}"] = jnp.where(nqs_on, Gn.reshape(-1)[k], z)
        for k in range(4):
            out[f"nh{k}"] = jnp.where(nqs_on, hn[k], z)
        out["ntau"] = jnp.where(nqs_on, tau, z)
        return out
    return _step_update


def _make_ac_stamp(sign):
    def _ac_stamp(P, state, omega):
        v = jnp.stack([state["vd"], state["vg"], state["vs"],
                       state["vb"]])
        J = jax.jacfwd(lambda v4: _terminal_currents(P, v4, sign))(v)
        C = jax.jacfwd(lambda v4: _charges(P, v4, sign))(v)
        # wave-9 NQS: the intrinsic charge admittance gets the single
        # relaxation pole, jωC_int → jωC_int/(1+jωτ), i.e. a real loss
        # ω²τC/(1+ω²τ²) plus a rolled-off imaginary part; overlap and
        # junction caps stay jωC.  Exact no-op at nqsmod=0.
        nqs_on = _p(P, "nqsmod") != 0.0
        C_int = jax.jacfwd(
            lambda v4: _charges_intrinsic_only(P, v4, sign))(v)
        tau = _nqs_tau(P, v, sign)
        den = 1.0 + (omega * tau) ** 2
        a_re = J.reshape(-1) + jnp.where(
            nqs_on, (omega * omega * tau / den) * C_int.reshape(-1),
            0.0)
        a_im = omega * jnp.where(
            nqs_on, (C - C_int).reshape(-1) +
            C_int.reshape(-1) / den, C.reshape(-1))
        return a_re, a_im, jnp.zeros(4), jnp.zeros(4)
    return _ac_stamp


def _pattern(pins, brs):
    d, g, s, b = pins
    order = (d, g, s, b)
    rows, cols = [], []
    for r in order:
        for c in order:
            rows.append(r)
            cols.append(c)
    return rows, cols


def _rhs(pins, brs):
    d, g, s, b = pins
    return [d, g, s, b]


_STATE = tuple([("vd", 0.0), ("vg", 0.0), ("vs", 0.0), ("vb", 0.0)] +
               [(f"cg{k}", 0.0) for k in range(16)] +
               [(f"ch{k}", 0.0) for k in range(4)] +
               # wave-9 NQS: relaxed-channel current model + its τ
               [(f"ng{k}", 0.0) for k in range(16)] +
               [(f"nh{k}", 0.0) for k in range(4)] +
               [("ntau", 0.0)])


# alternate attribute spellings (the reference's get_attribute_name
# table exposes both cases and long/short junction names,
# bsim3v32.h:2865+); resolved by ModelInstance.set/get_attribute.
_ALIASES = {
    "w": "W", "l": "L", "kp": "Kp", "vth0": "Vth0", "temp": "Temp",
    "cgs": "Cgs", "cgd": "Cgd", "cgb": "Cgb",
    "mobMod": "mobmod", "capMod": "capmod",
    "rdsMod": "rdsmod", "rgateMod": "rgatemod",
    "rbodyMod": "rbodymod", "nqsMod": "nqsmod",
    "is": "diode_Is", "n": "diode_N",
    "diode_Isr": "isr", "diode_Nr": "nr",
    "diode_Isd": "isd", "diode_Iss": "iss",
    "diode_Nd": "nd", "diode_Ns": "ns",
    "diode_Isrd": "isrd", "diode_Isrs": "isrs",
    "diode_Nrd": "nrd", "diode_Nrs": "nrs",
    "Rd": "rd", "Rs": "rs", "Rb": "rb",
    "drainArea": "ad", "sourceArea": "as",
    "drainPerimeter": "pd", "sourcePerimeter": "ps",
}


def _chan_noise_bias(P2, v4, sign):
    """(ids, gsum) at the OP bias: gsum = gm+gds+gmb from jacfwd of the
    same channel-current core the stamps use, so noise and Newton
    linearization can never disagree."""

    def chan(v4_):
        vd, vg, vs, vb = (sign * v4_[0], sign * v4_[1],
                          sign * v4_[2], sign * v4_[3])
        vds = vd - vs
        ids_f = _core(P2, vg - vs, vds, vb - vs)[0]
        ids_r = _core(P2, vg - vd, -vds, vb - vd)[0]
        return jnp.where(vds >= 0.0, ids_f, -ids_r)

    ids = chan(v4)
    J = jax.jacfwd(chan)(v4)
    gsum = jnp.abs(J[1]) + jnp.abs(J[0]) + jnp.abs(J[3])
    return ids, gsum


def _make_noise(sign):
    """Wave 7: drain-source channel noise at the OP bias (SPICE2 /
    Berkeley noiMod=1 forms): thermal 8kT(gm+gds+gmb)/3 + flicker
    kf·Ids^af / (Cox·Leff²·f^ef).  The reference has NO noise
    analysis to compare against (bsim3v32.h:28-29 TODO)."""

    def _noise(P, v, ib, state, env, f):
        P2 = _with_dtemp(P)
        T = _p(P2, "Temp") + _T0
        ids, gsum = _chan_noise_bias(P2, v[:4], sign)
        thermal = (8.0 / 3.0) * _K_B * T * gsum
        leff, _weff, _B = _geom(P2)
        cox = _EPS_OX / jnp.maximum(_p(P2, "tox"), 1e-9)
        flicker = (_p(P2, "kf") * jnp.abs(ids) ** _p(P2, "af") /
                   (cox * leff * leff *
                    jnp.maximum(f, 1e-30) ** _p(P2, "ef")))
        on = _p(P2, "noimod") != 0.0
        return jnp.array([jnp.where(on, (thermal + flicker) *
                                    _mnf_scale(P2), 0.0)])

    return _noise


def _make_noise_corr(sign, src):
    """Wave 8 — induced gate noise with gate-drain correlation (the
    last clause of the reference's noise TODO, bsim3v32.h:28-29: it
    asks for "thermal, flicker, induced gate noise, correlation"; the
    first two are wave 7).  van der Ziel long-channel forms:

        S_ig    = (16/15)·kT·ω²·Cgs² / gd0        (δ = 4/3)
        S_ig,id = j·0.395·sqrt(S_ig · S_id0),  S_id0 = (8/3)·kT·gd0

    with gd0 = gm+gds+gmb at the bias and Cgs = (2/3)·Cox·Weff·Leff
    the intrinsic gate-source capacitance.  The drain thermal itself
    stays in the plain wave-7 hook (S_bb = 0 here avoids double
    counting); pairs are (gate=(g,s), drain=(d,s)) so +Im follows the
    same current orientation on both sources."""

    def _corr(P, v, ib, state, env, f, w):
        P2 = _with_dtemp(P)
        T = _p(P2, "Temp") + _T0
        _ids, gsum = _chan_noise_bias(P2, v[src], sign)
        leff, weff, _B = _geom(P2)
        cox = _EPS_OX / jnp.maximum(_p(P2, "tox"), 1e-9)
        cgs = (2.0 / 3.0) * cox * weff * leff
        g0 = jnp.maximum(gsum, 1e-18)
        sig = (16.0 / 15.0) * _K_B * T * (w * cgs) ** 2 / g0
        sid0 = (8.0 / 3.0) * _K_B * T * g0
        cr_im = 0.395 * jnp.sqrt(sig * sid0)
        scale = _mnf_scale(P2)
        on = (_p(P2, "noimod") != 0.0)
        z = jnp.zeros(())
        return jnp.where(on, 1.0, 0.0) * scale * jnp.array(
            [[sig, z, z, cr_im]])

    return _corr


def _mk(name, id_name, sign):
    return register(ModelDef(
        name=name, id_name=id_name, device_class=DeviceClass.NONLINEAR,
        pins=("D", "G", "S", "B"), defaults=dict(_DEFAULTS),
        param_order=_PARAMS,
        state_vars=_STATE,
        pattern=_pattern, rhs_pattern=_rhs,
        stamp=_make_stamp(sign), ac_stamp=_make_ac_stamp(sign),
        step_update=_make_step_update(sign), nonlinear=True,
        attrs=_PARAMS, attr_aliases=_ALIASES,
        noise=_make_noise(sign), noise_pairs=((0, 2),),
        # induced gate noise group: gate source (G,S) correlated with
        # the drain source (D,S); S_bb = 0 there (drain thermal lives
        # in the plain hook above)
        noise_corr=_make_noise_corr(sign, slice(0, 4)),
        noise_corr_pairs=(((1, 2), (0, 2)),),
    ))


BSIM3V32_NMOS = _mk("BSIM3v32 NMOS", "BSIM3_NMOS", +1.0)
BSIM3V32_PMOS = _mk("BSIM3v32 PMOS", "BSIM3_PMOS", -1.0)


# ---------------------------------------------------------------------------
# parasitic-terminal variant: D/G/S/B series resistances via internal
# nodes (bsim3v32.h:3388-3400: rd_total = Rd + rsh*nrd etc., stamped as
# linear resistors between each external terminal and the intrinsic
# device node; the reference creates the internal nodes conditionally
# at prepare() — here they are a static model choice, with the
# resistances floored at 1 uOhm so an unused terminal degenerates to a
# numerically safe short).
# ---------------------------------------------------------------------------

_R_FLOOR = 1e-6


def _rc_conductances(P):
    """Per-terminal series conductances g = scale / max(R_eff, floor)
    in pin order (d, g, s, b)."""
    scale = _mnf_scale(P)
    rsh = jnp.maximum(_p(P, "rsh"), 0.0)
    rd = jnp.maximum(_p(P, "rd"), 0.0) + rsh * \
        jnp.maximum(_p(P, "nrd"), 0.0)
    rs = jnp.maximum(_p(P, "rs"), 0.0) + rsh * \
        jnp.maximum(_p(P, "nrs"), 0.0)
    # rgateMod/rbodyMod == 0 disable rg / rb even when set
    # (bsim3v32.h:1642-1645); the floor then degenerates the branch
    # to a numerically safe short
    rg = jnp.where(_p(P, "rgatemod") != 0.0,
                   jnp.maximum(_p(P, "rg"), 0.0), 0.0)
    rb = jnp.where(_p(P, "rbodymod") != 0.0,
                   jnp.maximum(_p(P, "rb"), 0.0), 0.0)
    rr = jnp.stack([rd, rg, rs, rb])
    return scale / jnp.maximum(rr, _R_FLOOR)


def _rc_currents(P, v8, sign):
    """Total currents of the 8-terminal device:
    v8 = [vd, vg, vs, vb, vd', vg', vs', vb'] (ext then internal);
    intrinsic BSIM3 evaluated at the internal nodes, series resistors
    between ext and internal."""
    g = _rc_conductances(P)
    i_ser = g * (v8[:4] - v8[4:])               # into ext pins
    i_int = _terminal_currents(P, v8[4:], sign)
    return jnp.concatenate([i_ser, i_int - i_ser])


def _rc_charges(P, v8, sign):
    """Terminal charges: intrinsic Q at the internal nodes only."""
    q_int = _charges(P, v8[4:], sign)
    return jnp.concatenate([jnp.zeros(4, q_int.dtype), q_int])


def _make_rc_stamp(sign):
    def stamp(P, v, ib, state, ctx):
        f = lambda v8: _rc_currents(P, v8, sign)
        i_now = f(v)
        J = jax.jacfwd(f)(v)
        ieq = i_now - J @ v
        a_vals = J.reshape(-1)
        z_vals = -ieq
        new_state = dict(state)
        for k in range(8):
            new_state[f"v{k}"] = v[k]
        if ctx.mode == "tr":
            G = jnp.stack([state[f"cg{k}"] for k in range(64)])
            h = jnp.stack([state[f"ch{k}"] for k in range(8)])
            a_vals = a_vals + G
            z_vals = z_vals - h
        return a_vals, z_vals, new_state
    return stamp


def _make_rc_step_update(sign):
    def _step_update(P, v, ib, state, dt, t):
        out = dict(state)
        C = jax.jacfwd(lambda v8: _rc_charges(P, v8, sign))(v)
        G_prev = jnp.stack([state[f"cg{k}"]
                            for k in range(64)]).reshape(8, 8)
        h_prev = jnp.stack([state[f"ch{k}"] for k in range(8)])
        ic_now = G_prev @ v + h_prev
        G_new = 2.0 * C / dt
        h_new = -(G_new @ v) - ic_now
        for k in range(64):
            out[f"cg{k}"] = G_new.reshape(-1)[k]
        for k in range(8):
            out[f"ch{k}"] = h_new[k]
        return out
    return _step_update


def _make_rc_ac_stamp(sign):
    def _ac_stamp(P, state, omega):
        v = jnp.stack([state[f"v{k}"] for k in range(8)])
        J = jax.jacfwd(lambda v8: _rc_currents(P, v8, sign))(v)
        C = jax.jacfwd(lambda v8: _rc_charges(P, v8, sign))(v)
        return (J.reshape(-1), omega * C.reshape(-1),
                jnp.zeros(8), jnp.zeros(8))
    return _ac_stamp


def _rc_pattern(pins, brs):
    rows, cols = [], []
    for r in pins:
        for c in pins:
            rows.append(r)
            cols.append(c)
    return rows, cols


def _rc_rhs(pins, brs):
    return list(pins)


_RC_STATE = tuple([(f"v{k}", 0.0) for k in range(8)] +
                  [(f"cg{k}", 0.0) for k in range(64)] +
                  [(f"ch{k}", 0.0) for k in range(8)])


def _make_rc_noise(sign):
    """Wave 7 for the parasitic variant: channel noise sits between
    the INTERNAL d'/s' nodes; each series terminal resistance adds its
    own 4kT·g thermal source (floored-to-short terminals are treated
    as noiseless ideal shorts)."""
    core = _make_noise(sign)

    def _noise(P, v, ib, state, env, f):
        ch = core(P, v[4:], ib, state, env, f)[0]
        P2 = _with_dtemp(P)
        T = _p(P2, "Temp") + _T0
        g = _rc_conductances(P2)
        gmax = _mnf_scale(P2) / _R_FLOOR
        th = jnp.where(g < gmax * (1.0 - 1e-9),
                       4.0 * _K_B * T * g, 0.0)
        return jnp.concatenate([jnp.array([ch]), th])

    return _noise


def _mk_rc(name, id_name, sign):
    return register(ModelDef(
        name=name, id_name=id_name, device_class=DeviceClass.NONLINEAR,
        pins=("D", "G", "S", "B"), defaults=dict(_DEFAULTS),
        param_order=_PARAMS,
        state_vars=_RC_STATE,
        pattern=_rc_pattern, rhs_pattern=_rc_rhs,
        stamp=_make_rc_stamp(sign), ac_stamp=_make_rc_ac_stamp(sign),
        step_update=_make_rc_step_update(sign), nonlinear=True,
        attrs=_PARAMS, attr_aliases=_ALIASES, n_internal=4,
        # channel between internal d'(4)/s'(6); series-R thermal
        # between each external pin and its internal node
        noise=_make_rc_noise(sign),
        noise_pairs=((4, 6), (0, 4), (1, 5), (2, 6), (3, 7)),
        # induced gate noise on the INTERNAL g'(5)-s'(6) pair,
        # correlated with the internal channel source d'(4)-s'(6)
        noise_corr=_make_noise_corr(sign, slice(4, 8)),
        noise_corr_pairs=(((5, 6), (4, 6)),),
    ))


BSIM3V32_NMOS_RC = _mk_rc("BSIM3v32 NMOS (terminal parasitics)",
                          "BSIM3_NMOS_RC", +1.0)
BSIM3V32_PMOS_RC = _mk_rc("BSIM3v32 PMOS (terminal parasitics)",
                          "BSIM3_PMOS_RC", -1.0)
