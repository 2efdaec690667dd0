"""Nonlinear analog devices: PN junction, BJT (Ebers-Moll-style), MOSFET
square-law.

Equation parity with the reference (cited per device); every piecewise
branch is re-expressed as branchless ``jnp.where`` selection so one
vmapped kernel evaluates the whole family per Newton iteration with no
data-dependent control flow (TPU/XLA requirement).

Guarded-log/exp discipline: because ``where`` evaluates both sides, every
log/exp argument is clamped to a safe domain before the transcendental,
then the correct branch is selected — values in the unselected branch are
finite garbage, never NaN/Inf (NaN would poison gradients and the masked
Newton loop).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import ModelDef, DeviceClass, register

_K_KELVIN = -273.15
_Q_E = 1.6021765314e-19        # same physical constants as the reference
_K_B = 1.380650524e-23
_SQRT2 = 1.4142135623730950488
_TINY = 1e-300


def limexp(x):
    """Smooth overflow-protected exp (PN_junction.h:10-16)."""
    xc = jnp.clip(x, -50.0, 50.0)
    e = jnp.exp(xc)
    e50 = 5.184705528587072e21   # exp(50)
    return jnp.where(x > 50.0, e50 * (1.0 + (x - 50.0)),
                     jnp.where(x < -50.0, jnp.exp(-50.0), e))


def _safe_log(x):
    return jnp.log(jnp.maximum(x, _TINY))


# ---------------------------------------------------------------------------
# PN junction  (non-linear/PN_junction.h)
# ---------------------------------------------------------------------------

def _pn_derived(P):
    """prepare_foundation (PN_junction.h:296-356): effective params."""
    Is, N, Isr, Nr, Temp, Ibv, Bv, Bv_set, Area, tt = (P[i] for i in range(10))
    Is_eff = Is * Area
    Isr_eff = Isr * Area
    Ut = _K_B * (Temp - _K_KELVIN) / _Q_E
    Bv_eff = jnp.where(Bv_set > 0.5,
                       Bv - N * Ut * _safe_log(Ibv / Is_eff), Bv)
    Uth = N * Ut * _safe_log(N * Ut / (_SQRT2 * Is_eff))
    return Is_eff, Isr_eff, N, Nr, Ut, Bv_eff, Uth, Bv_set, tt


def pn_vlimit(Ud, Ud_last, Ute, Uth, Bv_eff, Bv_set):
    """SPICE3F5 junction voltage limiting (PN_junction.h:58-109),
    branchless."""
    flag = (Bv_set > 0.5) & (Ud < jnp.minimum(0.0, -Bv_eff + 10.0 * Ute))
    ud0 = jnp.where(flag, -(Ud + Bv_eff), Ud)
    ud1 = jnp.where(flag, -(Ud_last + Bv_eff), Ud_last)

    high = (ud0 > Uth) & (jnp.abs(ud0 - ud1) > 2.0 * Ute)
    arg = (ud0 - ud1) / Ute
    f_pos = ud1 + Ute * (2.0 + _safe_log(arg - 2.0))
    f_neg = ud1 - Ute * (2.0 + _safe_log(2.0 - arg))
    f_a = jnp.where(arg > 0.0, f_pos, f_neg)
    f_b = Ute * _safe_log(ud0 / Ute)
    f_high = jnp.where(ud1 > 0.0, f_a, f_b)

    arg_l = jnp.where(ud1 > 0.0, -1.0 - ud1, 2.0 * ud1 - 1.0)
    f_low = jnp.where((ud0 < 0.0) & (ud0 < arg_l), arg_l, ud0)

    ud_f = jnp.where(high, f_high, f_low)
    return jnp.where(flag, -(ud_f + Bv_eff), ud_f)


def _pn_eval(P, Ud):
    """Diode current + conductance incl. breakdown and recombination
    (PN_junction.h:358-402)."""
    Is_eff, Isr_eff, N, Nr, Ut, Bv_eff, Uth, Bv_set, tt = _pn_derived(P)
    Ute = N * Ut
    Uter = Nr * Ut
    bk = (Bv_set > 0.5) & (Ud < -Bv_eff)

    e_b = limexp(-(Bv_eff + Ud) / Ute)
    Id_b = -Is_eff * e_b
    g_b = Is_eff * e_b / Ute

    e_f = limexp(Ud / Ute)
    g_f = Is_eff * e_f / Ute
    Id_f = Is_eff * (e_f - 1.0)
    e_r = limexp(Ud / Uter)
    g_f = g_f + Isr_eff * e_r / Uter
    Id_f = Id_f + Isr_eff * (e_r - 1.0)

    geq = jnp.where(bk, g_b, g_f)
    Id = jnp.where(bk, Id_b, Id_f)
    return geq, Id


def _pn_stamp(P, v, ib, state, ctx):
    Is_eff, Isr_eff, N, Nr, Ut, Bv_eff, Uth, Bv_set, tt = _pn_derived(P)
    Ute = N * Ut
    Ud = v[0] - v[1]
    Ud = pn_vlimit(Ud, state["ud_last"], Ute, Uth, Bv_eff, Bv_set)
    geq, Id = _pn_eval(P, Ud)
    Ieq = Id - Ud * geq
    new_state = dict(state)
    new_state["ud_last"] = Ud
    new_state["geq"] = geq

    g_tot = geq
    i_tot_a = -Ieq
    i_tot_b = Ieq
    if ctx.mode == "tr":
        # diffusion-capacitance trapezoidal companion (PN_junction.h:440+)
        gc = state["tr_prev_g"]
        hc = state["tr_hist"]
        g_tot = g_tot + gc
        i_tot_a = i_tot_a - hc
        i_tot_b = i_tot_b + hc
    a_vals = jnp.stack([g_tot, -g_tot, -g_tot, g_tot])
    z_vals = jnp.stack([i_tot_a, i_tot_b])
    return a_vals, z_vals, new_state


def _pn_step(P, v, ib, state, dt, t):
    tt = P[9]
    geq = state["geq"]
    v_prev = v[0] - v[1]
    valid = (dt > 0.0) & (tt > 0.0) & (geq > 0.0)
    cd = tt * geq
    g_new = 2.0 * cd / dt
    hist = -(g_new + state["tr_prev_g"]) * v_prev - state["tr_hist"]
    out = dict(state)
    out["ud_last"] = v_prev
    out["tr_prev_g"] = jnp.where(valid, g_new, 0.0)
    out["tr_hist"] = jnp.where(valid, hist, 0.0)
    return out


def _pn_ac(P, state, omega):
    """AC: saved linearization geq (+ optional diffusion cap tt*geq), no
    Ieq injection (PN_junction.h:406-438)."""
    tt = P[9]
    geq = state["geq"]
    use_cd = (tt > 0.0) & (geq > 0.0)
    b = jnp.where(use_cd, tt * geq * omega, 0.0)
    return (jnp.stack([geq, -geq, -geq, geq]),
            jnp.stack([b, -b, -b, b]),
            jnp.zeros(2), jnp.zeros(2))


def _pn_check_conv(P, v, state):
    """Not converged while vlimit is still clamping: the raw junction
    voltage must agree with the limited one used for the stamps."""
    Is_eff, Isr_eff, N, Nr, Ut, Bv_eff, Uth, Bv_set, tt = _pn_derived(P)
    ud_raw = v[0] - v[1]
    return jnp.abs(ud_raw - state["ud_last"]) <= 2.0 * N * Ut + 1e-9


def _pn_noise(P, v, ib, state, env, f):
    """SPICE diode noise: shot 2q·|Id| + flicker kf·|Id|^af / f."""
    _g, Id = _pn_eval(P, v[0] - v[1])
    kf, af = P[10], P[11]
    return jnp.array([2.0 * _Q_E * jnp.abs(Id) +
                      kf * jnp.abs(Id) ** af / f])


PN_JUNCTION = register(ModelDef(
    name="PN Junction", id_name="PN", device_class=DeviceClass.NONLINEAR,
    pins=("A", "B"), check_conv=_pn_check_conv,
    defaults={"Is": 1e-14, "N": 1.0, "Isr": 0.0, "Nr": 2.0, "Temp": 27.0,
              "Ibv": 1e-3, "Bv": 40.0, "Bv_set": 1.0, "Area": 1.0,
              "tt": 0.0, "kf": 0.0, "af": 1.0},
    param_order=("Is", "N", "Isr", "Nr", "Temp", "Ibv", "Bv", "Bv_set",
                 "Area", "tt", "kf", "af"),
    state_vars=(("ud_last", 0.0), ("geq", 0.0), ("tr_prev_g", 0.0),
                ("tr_hist", 0.0)),
    pattern=lambda p, b: ([p[0], p[0], p[1], p[1]], [p[0], p[1], p[0], p[1]]),
    rhs_pattern=lambda p, b: [p[0], p[1]],
    stamp=_pn_stamp, ac_stamp=_pn_ac, step_update=_pn_step,
    nonlinear=True,
    attrs=("Is", "N", "Isr", "Nr", "Temp", "Ibv", "Bv", "Area", "tt",
           "kf", "af"),
    noise=_pn_noise, noise_pairs=((0, 1),),
))


# ---------------------------------------------------------------------------
# BJT  (non-linear/BJT_NPN.h:116-185, BJT_PNP.h mirrored): BE diode
# linearization + current-gain VCCS.  Pins B, C, E.
# ---------------------------------------------------------------------------

def _bjt_ut(P):
    return _K_B * (P[3] - _K_KELVIN) / _Q_E     # P[3] = Temp


def _bjt_npn_pattern(pins, brs):
    b, c, e = pins
    rows = [b, b, e, e,   c, c, e, e]
    cols = [b, e, b, e,   b, e, b, e]
    return rows, cols


def _bjt_uth(Is_eff, Ute):
    """Critical voltage for junction limiting (same form as the
    diode's Uth, PN_junction.h:330-346)."""
    return Ute * _safe_log(Ute / (1.4142135623730951 * Is_eff))


def _bjt_npn_stamp(P, v, ib, state, ctx):
    """NPN Newton companion.  The reference stamps the RAW exponential
    (BJT_NPN.h:116-160 — no limiting), which diverges for stiff bias
    networks; here the B-E junction voltage passes through the same
    SPICE pnjlim limiter the diode uses (extension past parity)."""
    Is_eff = P[0] * P[4]
    Ute = P[1] * _bjt_ut(P)
    beta = P[2]
    vbe = v[0] - v[2]
    vbe = pn_vlimit(vbe, state["vj_last"], Ute,
                    _bjt_uth(Is_eff, Ute), 0.0, 0.0)
    e = jnp.exp(jnp.clip(vbe / Ute, -200.0, 200.0))
    geq = Is_eff * e / Ute
    ibe = Is_eff * (e - 1.0)
    ieq_be = ibe - vbe * geq
    gm = beta * geq
    ieq_c = beta * ibe - gm * vbe
    a = jnp.stack([geq, -geq, -geq, geq, gm, -gm, -gm, gm])
    z = jnp.stack([-ieq_be, ieq_be, -ieq_c, ieq_c])
    new_state = {"geq": geq, "gm": gm, "vj_last": vbe}
    return a, z, new_state


def _bjt_check_conv(sign):
    """Not converged while pnjlim is still clamping (mirrors the
    diode's check_conv)."""

    def _check(P, v, state):
        Ute = P[1] * _bjt_ut(P)
        vj_raw = (v[0] - v[2]) * sign
        return jnp.abs(vj_raw - state["vj_last"]) <= 2.0 * Ute + 1e-9

    return _check


def _bjt_npn_ac(P, state, omega):
    geq, gm = state["geq"], state["gm"]
    a = jnp.stack([geq, -geq, -geq, geq, gm, -gm, -gm, gm])
    return a, jnp.zeros(8), jnp.zeros(4), jnp.zeros(4)


def _bjt_noise(sign):
    """SPICE BJT noise at the OP bias: base shot 2q·|Ib| (+ flicker
    kf·|Ib|^af/f) between B-E, collector shot 2q·|Ic| between C-E.
    Currents are recomputed from the same exponential the stamp uses.
    (TPU-native extension — the reference has no noise analysis.)"""

    def _noise(P, v, ib, state, env, f):
        Is_eff = P[0] * P[4]
        Ute = P[1] * _bjt_ut(P)
        vj = (v[0] - v[2]) * sign
        e = jnp.exp(jnp.clip(vj / Ute, -200.0, 200.0))
        i_b = jnp.abs(Is_eff * (e - 1.0))
        i_c = P[2] * i_b
        kf, af = P[5], P[6]
        sb = 2.0 * _Q_E * i_b + kf * i_b ** af / f
        sc = 2.0 * _Q_E * i_c
        return jnp.stack([sb, sc])

    return _noise


BJT_NPN = register(ModelDef(
    name="NPN BJT", id_name="QNP", device_class=DeviceClass.NONLINEAR,
    pins=("B", "C", "E"),
    defaults={"Is": 1e-16, "N": 1.0, "BetaF": 100.0, "Temp": 27.0,
              "Area": 1.0, "kf": 0.0, "af": 1.0},
    param_order=("Is", "N", "BetaF", "Temp", "Area", "kf", "af"),
    state_vars=(("geq", 0.0), ("gm", 0.0), ("vj_last", 0.0)),
    check_conv=_bjt_check_conv(1.0),
    pattern=_bjt_npn_pattern,
    rhs_pattern=lambda p, b: [p[0], p[2], p[1], p[2]],
    stamp=_bjt_npn_stamp, ac_stamp=_bjt_npn_ac, nonlinear=True,
    attrs=("Is", "N", "BetaF", "Temp", "Area", "kf", "af"),
    noise=_bjt_noise(1.0), noise_pairs=((0, 2), (1, 2)),
))


def _bjt_pnp_pattern(pins, brs):
    b, c, e = pins
    # EB diode quad + VCCS(E->C controlled by Veb) (BJT_PNP.h:126-156)
    rows = [e, e, b, b,   e, e, c, c]
    cols = [e, b, e, b,   e, b, e, b]
    return rows, cols


def _bjt_pnp_stamp(P, v, ib, state, ctx):
    """PNP mirror of the NPN stamp, with the same pnjlim limiting on
    the E-B junction (extension past BJT_PNP.h's raw exponential)."""
    Is_eff = P[0] * P[4]
    Ute = P[1] * _bjt_ut(P)
    beta = P[2]
    veb = v[2] - v[0]
    veb = pn_vlimit(veb, state["vj_last"], Ute,
                    _bjt_uth(Is_eff, Ute), 0.0, 0.0)
    e = jnp.exp(jnp.clip(veb / Ute, -200.0, 200.0))
    geq = Is_eff * e / Ute
    ieb = Is_eff * (e - 1.0)
    ieq_eb = ieb - veb * geq
    gm = beta * geq
    ieq_c = beta * ieb - gm * veb
    a = jnp.stack([geq, -geq, -geq, geq, gm, -gm, -gm, gm])
    z = jnp.stack([-ieq_eb, ieq_eb, -ieq_c, ieq_c])
    return a, z, {"geq": geq, "gm": gm, "vj_last": veb}


def _bjt_pnp_ac(P, state, omega):
    geq, gm = state["geq"], state["gm"]
    a = jnp.stack([geq, -geq, -geq, geq, gm, -gm, -gm, gm])
    return a, jnp.zeros(8), jnp.zeros(4), jnp.zeros(4)


BJT_PNP = register(ModelDef(
    name="PNP BJT", id_name="QPN", device_class=DeviceClass.NONLINEAR,
    pins=("B", "C", "E"),
    defaults={"Is": 1e-16, "N": 1.0, "BetaF": 100.0, "Temp": 27.0,
              "Area": 1.0, "kf": 0.0, "af": 1.0},
    param_order=("Is", "N", "BetaF", "Temp", "Area", "kf", "af"),
    state_vars=(("geq", 0.0), ("gm", 0.0), ("vj_last", 0.0)),
    check_conv=_bjt_check_conv(-1.0),
    pattern=_bjt_pnp_pattern,
    rhs_pattern=lambda p, b: [p[2], p[0], p[2], p[1]],
    stamp=_bjt_pnp_stamp, ac_stamp=_bjt_pnp_ac, nonlinear=True,
    attrs=("Is", "N", "BetaF", "Temp", "Area", "kf", "af"),
    noise=_bjt_noise(-1.0), noise_pairs=((0, 2), (1, 2)),
))


# ---------------------------------------------------------------------------
# MOSFET square-law  (non-linear/nmosfet.h:85-140, pmosfet.h mirrored).
# Pins D, G, S.
# ---------------------------------------------------------------------------

def _mos_pattern(pins, brs):
    d, g, s = pins
    # gds quad + gm entries
    rows = [d, d, s, s,   d, d, s, s]
    cols = [d, s, d, s,   g, s, g, s]
    return rows, cols


def _nmos_eval(P, vgs, vds):
    kp, lam, vth = P[0], P[1], P[2]
    vov = vgs - vth
    off = vov <= 0.0
    triode = vds < vov
    b = vov * vds - 0.5 * vds * vds
    id_tri = kp * b * (1.0 + lam * vds)
    gm_tri = kp * vds * (1.0 + lam * vds)
    gds_tri = kp * ((vov - vds) * (1.0 + lam * vds) + b * lam)
    id_sat = 0.5 * kp * vov * vov * (1.0 + lam * vds)
    gm_sat = kp * vov * (1.0 + lam * vds)
    gds_sat = 0.5 * kp * vov * vov * lam
    i_d = jnp.where(off, 0.0, jnp.where(triode, id_tri, id_sat))
    gm = jnp.where(off, 0.0, jnp.where(triode, gm_tri, gm_sat))
    gds = jnp.where(off, 0.0, jnp.where(triode, gds_tri, gds_sat))
    return i_d, gm, gds


def _nmos_stamp(P, v, ib, state, ctx):
    vgs = v[1] - v[2]
    vds = v[0] - v[2]
    i_d, gm, gds = _nmos_eval(P, vgs, vds)
    ieq = i_d - gm * vgs - gds * vds
    a = jnp.stack([gds, -gds, -gds, gds, gm, -gm, -gm, gm])
    z = jnp.stack([-ieq, ieq])
    return a, z, {"gm": gm, "gds": gds}


def _nmos_ac(P, state, omega):
    gm, gds = state["gm"], state["gds"]
    a = jnp.stack([gds, -gds, -gds, gds, gm, -gm, -gm, gm])
    return a, jnp.zeros(8), jnp.zeros(2), jnp.zeros(2)


def _nmos_noise(P, v, ib, state, env, f):
    """Channel thermal 8kT(gm+gds)/3 + flicker kf·|Id|^af/f between
    D-S, from the same square-law eval the stamp uses.  (TPU-native
    extension — the reference has no noise analysis.)"""
    i_d, gm, gds = _nmos_eval(P, v[1] - v[2], v[0] - v[2])
    T = env["temperature"] + 273.15
    th = (8.0 / 3.0) * _K_B * T * (jnp.abs(gm) + jnp.abs(gds))
    return jnp.array([th + P[3] * jnp.abs(i_d) ** P[4] / f])


NMOSFET = register(ModelDef(
    name="NMOSFET", id_name="NMOS", device_class=DeviceClass.NONLINEAR,
    pins=("D", "G", "S"),
    defaults={"Kp": 1e-3, "lambda": 0.0, "Vth": 1.0,
              "kf": 0.0, "af": 1.0},
    param_order=("Kp", "lambda", "Vth", "kf", "af"),
    state_vars=(("gm", 0.0), ("gds", 0.0)),
    pattern=_mos_pattern, rhs_pattern=lambda p, b: [p[0], p[2]],
    stamp=_nmos_stamp, ac_stamp=_nmos_ac, nonlinear=True,
    attrs=("Kp", "lambda", "Vth", "kf", "af"),
    noise=_nmos_noise, noise_pairs=((0, 2),),
))


def _pmos_pattern(pins, brs):
    d, g, s = pins
    # gds quad + gm controlled by (Vs - Vg)  (pmosfet.h:123-133)
    rows = [d, d, s, s,   d, d, s, s]
    cols = [d, s, d, s,   s, g, s, g]
    return rows, cols


def _pmos_stamp(P, v, ib, state, ctx):
    kp, lam, vth = P[0], P[1], P[2]
    vsg = v[2] - v[1]
    vds = v[0] - v[2]
    vov = vsg - vth
    off = vov <= 0.0
    vsd = -vds
    triode = vsd < vov
    b = vov * vsd - 0.5 * vsd * vsd
    id_tri = -(kp * b * (1.0 + lam * vsd))
    gm_tri = kp * vsd * (1.0 + lam * vsd)
    gds_tri = -(kp * ((vov - vsd) * (1.0 + lam * vsd) + b * lam))
    id_sat = -(0.5 * kp * vov * vov * (1.0 + lam * vsd))
    gm_sat = kp * vov * (1.0 + lam * vsd)
    gds_sat = 0.5 * kp * vov * vov * (-lam)
    i_d = jnp.where(off, 0.0, jnp.where(triode, id_tri, id_sat))
    gm = jnp.where(off, 0.0, jnp.where(triode, gm_tri, gm_sat))
    gds = jnp.where(off, 0.0, jnp.where(triode, gds_tri, gds_sat))
    ieq = i_d - gm * vsg - gds * vds
    a = jnp.stack([gds, -gds, -gds, gds, gm, -gm, -gm, gm])
    z = jnp.stack([-ieq, ieq])
    return a, z, {"gm": gm, "gds": gds}


def _pmos_noise(P, v, ib, state, env, f):
    """PMOS channel noise: same forms with the source-referenced
    square law (vsg/vsd) the PMOS stamp uses."""
    i_d, gm, gds = _nmos_eval(P, v[2] - v[1], v[2] - v[0])
    T = env["temperature"] + 273.15
    th = (8.0 / 3.0) * _K_B * T * (jnp.abs(gm) + jnp.abs(gds))
    return jnp.array([th + P[3] * jnp.abs(i_d) ** P[4] / f])


PMOSFET = register(ModelDef(
    name="PMOSFET", id_name="PMOS", device_class=DeviceClass.NONLINEAR,
    pins=("D", "G", "S"),
    defaults={"Kp": 1e-3, "lambda": 0.0, "Vth": 1.0,
              "kf": 0.0, "af": 1.0},
    param_order=("Kp", "lambda", "Vth", "kf", "af"),
    state_vars=(("gm", 0.0), ("gds", 0.0)),
    pattern=_pmos_pattern, rhs_pattern=lambda p, b: [p[0], p[2]],
    stamp=_pmos_stamp, ac_stamp=_nmos_ac, nonlinear=True,
    attrs=("Kp", "lambda", "Vth", "kf", "af"),
    noise=_pmos_noise, noise_pairs=((0, 2),),
))


# ---------------------------------------------------------------------------
# Full-bridge rectifier  (non-linear/full_bridge_rectifier.h)
# ---------------------------------------------------------------------------
# Composite of four PN junctions sharing one (default) parameter set:
# D1 A->+, D2 B->+, D3 - -> A, D4 - -> B
# (full_bridge_rectifier.h:20-47).  Lowered as a single 4-pin device whose
# stamp evaluates the shared diode kernel over the four (anode,cathode)
# pin pairs — same vmapped execution path as standalone diodes.

_FBR_PAIRS = ((0, 2), (1, 2), (3, 0), (3, 1))


def _fbr_sub(state, k):
    return {"ud_last": state[f"ud_last{k}"], "geq": state[f"geq{k}"],
            "tr_prev_g": state[f"tr_prev_g{k}"],
            "tr_hist": state[f"tr_hist{k}"]}


def _fbr_merge(new_state, ns, k):
    for key in ("ud_last", "geq", "tr_prev_g", "tr_hist"):
        new_state[f"{key}{k}"] = ns[key]


def _fbr_stamp(P, v, ib, state, ctx):
    a_parts, z_parts = [], []
    new_state = dict(state)
    for k, (a, c) in enumerate(_FBR_PAIRS):
        av, zv, ns = _pn_stamp(P, jnp.stack([v[a], v[c]]), ib,
                               _fbr_sub(state, k), ctx)
        a_parts.append(av)
        z_parts.append(zv)
        _fbr_merge(new_state, ns, k)
    return jnp.concatenate(a_parts), jnp.concatenate(z_parts), new_state


def _fbr_step(P, v, ib, state, dt, t):
    new_state = dict(state)
    for k, (a, c) in enumerate(_FBR_PAIRS):
        ns = _pn_step(P, jnp.stack([v[a], v[c]]), ib,
                      _fbr_sub(state, k), dt, t)
        _fbr_merge(new_state, ns, k)
    return new_state


def _fbr_ac(P, state, omega):
    re_a, im_a, re_z, im_z = [], [], [], []
    for k in range(4):
        ra, ia, rz, iz = _pn_ac(P, _fbr_sub(state, k), omega)
        re_a.append(ra)
        im_a.append(ia)
        re_z.append(rz)
        im_z.append(iz)
    return (jnp.concatenate(re_a), jnp.concatenate(im_a),
            jnp.concatenate(re_z), jnp.concatenate(im_z))


def _fbr_check_conv(P, v, state):
    ok = True
    for k, (a, c) in enumerate(_FBR_PAIRS):
        ok = ok & _pn_check_conv(P, jnp.stack([v[a], v[c]]),
                                 _fbr_sub(state, k))
    return ok


def _fbr_pattern(p, b):
    rows, cols = [], []
    for a, c in _FBR_PAIRS:
        rows += [p[a], p[a], p[c], p[c]]
        cols += [p[a], p[c], p[a], p[c]]
    return rows, cols


def _fbr_rhs(p, b):
    out = []
    for a, c in _FBR_PAIRS:
        out += [p[a], p[c]]
    return out


FULL_BRIDGE_RECTIFIER = register(ModelDef(
    name="Full Bridge Rectifier", id_name="FBR",
    device_class=DeviceClass.NONLINEAR,
    pins=("A", "B", "+", "-"),
    defaults=dict(PN_JUNCTION.defaults),
    param_order=PN_JUNCTION.param_order,
    state_vars=tuple((f"{nm}{k}", init)
                     for k in range(4)
                     for nm, init in (("ud_last", 0.0), ("geq", 0.0),
                                      ("tr_prev_g", 0.0),
                                      ("tr_hist", 0.0))),
    pattern=_fbr_pattern, rhs_pattern=_fbr_rhs,
    stamp=_fbr_stamp, ac_stamp=_fbr_ac, step_update=_fbr_step,
    check_conv=_fbr_check_conv, nonlinear=True,
))
