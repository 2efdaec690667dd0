"""BSIM3v3.2 MOSFET (clean-room, TPU-native).

Scope parity with the reference's clean-room module
(non-linear/bsim3v32.h — itself an explicitly incremental
implementation, see its header TODO): 4-terminal D/G/S/B device with

* Vth with body effect (k1/k2-style via gamma/phi) and the BSIM3
  ``Vgsteff`` / ``Vdseff`` smoothing functions (bsim3v32.h:668+ uses the
  same smoothed-transition approach) for continuous subthreshold ->
  strong-inversion -> saturation transitions;
* velocity saturation (Esat*L) and channel-length modulation (the
  compat ``lambda`` surface of the C ABI, dll_main.cpp:1919-1941);
* bulk junction diodes B-S / B-D with SPICE limexp clamping;
* gate overlap capacitances Cgs/Cgd/Cgb: trapezoidal companions in TR,
  jwC stamps in AC.

Where the reference hand-rolls forward-mode duals (``bsim3v32_dual3``,
bsim3v32.h:507) to get gm/gds/gmb, this implementation differentiates
the terminal-current function with ``jax.jacfwd`` — the Newton stamp is
the exact 4x4 Jacobian of I(vd,vg,vs,vb), machine-generated and always
consistent with the current equation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import ModelDef, DeviceClass, register
from .nonlinear import limexp

_K_B = 1.380649e-23
_Q_E = 1.602176634e-19
_T0 = 273.15

# parameter order = the C ABI compat property stream (dll_main.cpp:1921)
# followed by the second-tier BSIM parameters (appended so the compat
# stream prefix is stable): temperature coefficients (kt1/ute/at/xti —
# bsim3v32.h temperature scaling), DIBL (eta0), vertical-field mobility
# degradation (theta == ua-surface), junction caps (cjs/cjd).
_PARAMS = ("W", "L", "Kp", "lambda", "Vth0", "gamma", "phi",
           "Cgs", "Cgd", "Cgb", "diode_Is", "diode_N", "Temp",
           "vsat", "nfactor", "u0",
           "kt1", "ute", "at", "xti", "eg", "eta0", "theta",
           "cjs", "cjd")
_DEFAULTS = {"W": 1e-6, "L": 1e-6, "Kp": 1e-4, "lambda": 0.0,
             "Vth0": 0.7, "gamma": 0.0, "phi": 0.7,
             "Cgs": 0.0, "Cgd": 0.0, "Cgb": 0.0,
             "diode_Is": 1e-14, "diode_N": 1.0, "Temp": 27.0,
             "vsat": 8e4, "nfactor": 1.0, "u0": 0.06,
             "kt1": 0.0, "ute": 0.0, "at": 0.0, "xti": 3.0,
             "eg": 1.12, "eta0": 0.0, "theta": 0.0,
             "cjs": 0.0, "cjd": 0.0}
_TNOM = 27.0


def _core_ids(P, vgs, vds, vbs, sign):
    """Channel current for vds >= 0 (forward orientation)."""
    W, L, kp, lam = P[0], P[1], P[2], P[3]
    vth0, gamma, phi = P[4], P[5], P[6]
    temp, vsat, nf = P[12], P[13], P[14]
    vt = _K_B * (temp + _T0) / _Q_E

    # temperature scaling (bsim3v32.h temperature section):
    # Vth(T) = Vth0 + kt1*(T/Tnom - 1); u0(T) = u0*(T/Tnom)^ute;
    # vsat(T) = vsat - at*(T/Tnom - 1)
    t_ratio = (temp + _T0) / (_TNOM + _T0)
    kt1, ute, at_ = P[16], P[17], P[18]
    vth0_t = vth0 + kt1 * (t_ratio - 1.0)
    vsat = jnp.maximum(vsat - at_ * (t_ratio - 1.0), 1e3)

    # body effect; clamp vbs below phi to keep sqrt real (smoothly)
    phi_s = jnp.maximum(phi, 0.1)
    vbs_c = phi_s - 0.5 * ((phi_s - vbs) +
                           jnp.sqrt((phi_s - vbs) ** 2 + 4.0 * 0.01))
    vth = vth0_t + gamma * (jnp.sqrt(jnp.maximum(phi_s - vbs_c,
                                                 1e-12)) -
                            jnp.sqrt(phi_s))
    # DIBL: threshold lowered by eta0 * vds (bsim3v32.h dvt/eta terms)
    vth = vth - P[21] * vds
    vgst = vgs - vth

    # Vgsteff smoothing (strong inversion <-> subthreshold)
    n = jnp.maximum(nf, 0.1)
    arg = vgst / (2.0 * n * vt)
    vgsteff = 2.0 * n * vt * jnp.where(
        arg > 30.0, arg, jnp.log1p(limexp(jnp.minimum(arg, 30.0))))

    # vertical-field mobility degradation + temperature exponent
    u0 = P[15] * t_ratio ** P[17]
    u0 = u0 / (1.0 + P[22] * vgsteff)
    kp_eff = kp * (u0 / jnp.maximum(P[15], 1e-12))
    beta = kp_eff * W / jnp.maximum(L, 1e-9)
    esat_l = 2.0 * vsat * L / jnp.maximum(u0, 1e-6)
    vdsat = esat_l * vgsteff / (esat_l + vgsteff)
    # Vdseff smoothing (delta = 10 mV)
    delta = 0.01
    t1 = vdsat - vds - delta
    vdseff = vdsat - 0.5 * (t1 + jnp.sqrt(t1 * t1 +
                                          4.0 * delta * vdsat))

    ids0 = beta * vgsteff * (1.0 - vdseff /
                             (2.0 * (vgsteff + 2.0 * vt))) * vdseff
    ids0 = ids0 / (1.0 + vdseff / esat_l)
    ids = ids0 * (1.0 + lam * (vds - vdseff))
    return ids


def _terminal_currents(P, v4, sign):
    """I(d,g,s,b) with symmetric source/drain swap for reverse vds.

    ``sign``: +1 NMOS, -1 PMOS (PMOS evaluated in mirrored voltages).
    """
    vd, vg, vs, vb = v4[0], v4[1], v4[2], v4[3]
    # PMOS: mirror all voltages
    vd, vg, vs, vb = sign * vd, sign * vg, sign * vs, sign * vb
    vds = vd - vs
    fwd = vds >= 0.0

    def chan(vgs, vdsx, vbs):
        return _core_ids(P, vgs, vdsx, vbs, sign)

    ids_f = chan(vg - vs, vds, vb - vs)
    ids_r = chan(vg - vd, -vds, vb - vd)
    ids = jnp.where(fwd, ids_f, -ids_r)

    # bulk junctions (SPICE-style, limexp-clamped) with Is(T) scaling:
    # Is(T) = Is * (T/Tnom)^(XTI/N) * exp(Eg/N * (1/Vtnom - 1/Vt)/1)
    nj = P[11]
    vt = _K_B * (P[12] + _T0) / _Q_E
    vtnom = _K_B * (_TNOM + _T0) / _Q_E
    t_ratio = (P[12] + _T0) / (_TNOM + _T0)
    njc = jnp.maximum(nj, 0.1)
    # exp(Eg/N * (1/Vt_nom - 1/Vt)): Eg[eV]/Vt[V] = Eg*q/kT
    is_ = P[10] * t_ratio ** (P[19] / njc) * \
        limexp((P[20] / njc) * (1.0 / vtnom - 1.0 / vt))
    nv = njc * vt
    ibs = is_ * (limexp((vb - vs) / nv) - 1.0)
    ibd = is_ * (limexp((vb - vd) / nv) - 1.0)

    i_d = ids - ibd
    i_s = -ids - ibs
    i_b = ibs + ibd
    i_g = jnp.zeros(())
    # un-mirror currents for PMOS
    return sign * jnp.stack([i_d, i_g, i_s, i_b])


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
            cap_a, cap_z, new_state = _cap_companion(P, v, new_state,
                                                     apply=True)
        else:
            cap_a = jnp.zeros(4 * len(_CAP_PAIRS))
            cap_z = jnp.zeros(2 * len(_CAP_PAIRS))
        return (jnp.concatenate([a_vals, cap_a]),
                jnp.concatenate([z_vals, cap_z]), new_state)
    return stamp


# capacitor terminal pairs: gate overlaps (g,s),(g,d),(g,b) plus bulk
# junction caps (b,s),(b,d) — (pin_a, pin_b, P index)
_CAP_PAIRS = ((1, 2, 7), (1, 0, 8), (1, 3, 9),
              (3, 2, 23), (3, 0, 24))


def _cap_companion(P, v, state, apply: bool):
    a_parts = []
    z_parts = []
    for ci, (pa, pb, pi) in enumerate(_CAP_PAIRS):
        geq = state[f"cg{ci}_g"]
        ieq = state[f"cg{ci}_h"]
        a_parts.append(jnp.stack([geq, -geq, -geq, geq]))
        z_parts.append(jnp.stack([-ieq, ieq]))
    return jnp.concatenate(a_parts), jnp.concatenate(z_parts), state


def _step_update(P, v, ib, state, dt, t):
    out = dict(state)
    for ci, (pa, pb, pi) in enumerate(_CAP_PAIRS):
        c = P[pi]
        v_prev = v[pa] - v[pb]
        g_new = 2.0 * c / dt
        hist = -(g_new + state[f"cg{ci}_g"]) * v_prev - \
            state[f"cg{ci}_h"]
        valid = c > 0.0
        out[f"cg{ci}_g"] = jnp.where(valid, g_new, 0.0)
        out[f"cg{ci}_h"] = jnp.where(valid, hist, 0.0)
    return out


def _make_ac_stamp(sign):
    def _ac_stamp(P, state, omega):
        v = jnp.stack([state["vd"], state["vg"], state["vs"],
                       state["vb"]])
        J = jax.jacfwd(lambda v4: _terminal_currents(P, v4, sign))(v)
        return _ac_common(P, J.reshape(-1), omega)
    return _ac_stamp


def _ac_common(P, j, omega):
    a_re = jnp.concatenate([j, jnp.zeros(4 * len(_CAP_PAIRS))])
    caps = []
    for ci, (pa, pb, pi) in enumerate(_CAP_PAIRS):
        y = P[pi] * omega
        caps.append(jnp.stack([y, -y, -y, y]))
    a_im = jnp.concatenate([jnp.zeros(16)] + caps)
    nz = 4 + 2 * len(_CAP_PAIRS)
    return a_re, a_im, jnp.zeros(nz), jnp.zeros(nz)


def _pattern(pins, brs):
    d, g, s, b = pins
    order = (d, g, s, b)
    rows, cols = [], []
    for r in order:
        for c in order:
            rows.append(r)
            cols.append(c)
    # overlap caps
    for (pa, pb, _pi) in _CAP_PAIRS:
        a, b2 = order[pa], order[pb]
        rows.extend([a, a, b2, b2])
        cols.extend([a, b2, a, b2])
    return rows, cols


def _rhs(pins, brs):
    d, g, s, b = pins
    out = [d, g, s, b]
    for (pa, pb, _pi) in _CAP_PAIRS:
        out.extend([pins[pa], pins[pb]])
    return out


_STATE = tuple([("vd", 0.0), ("vg", 0.0), ("vs", 0.0), ("vb", 0.0)] +
               [(f"cg{i}_{k}", 0.0) for i in range(len(_CAP_PAIRS))
                for k in ("g", "h")])


def _mk(name, id_name, sign):
    return register(ModelDef(
        name=name, id_name=id_name, device_class=DeviceClass.NONLINEAR,
        pins=("D", "G", "S", "B"), defaults=dict(_DEFAULTS),
        param_order=_PARAMS,
        state_vars=_STATE,
        pattern=_pattern, rhs_pattern=_rhs,
        stamp=_make_stamp(sign), ac_stamp=_make_ac_stamp(sign),
        step_update=_step_update, nonlinear=True,
        attrs=_PARAMS,
    ))


BSIM3V32_NMOS = _mk("BSIM3v32 NMOS", "BSIM3_NMOS", +1.0)
BSIM3V32_PMOS = _mk("BSIM3v32 PMOS", "BSIM3_PMOS", -1.0)
