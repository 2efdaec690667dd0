"""Linear analog devices.

Stamp conventions are behaviour-identical with the reference's device
headers under ``include/phy_engine/model/models/linear/`` (cited per
device below).  Each device supplies per-instance scalar kernels that the
lowering pass vmaps over the family; patterns are host-side (numpy ints).

MNA block convention (circuits/MNA/mna.h): unknown vector is
``[node voltages | branch currents]``; the pattern functions below receive
*global* indices (branch indices already offset past the node count), so
G/B/C/D quadrants are just regions of one (N+1)x(N+1) scatter target
(index N = ground dummy).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import ModelDef, DeviceClass, register

TWO_PI = 6.283185307179586476925286766559
DEG = 0.017453292519943295769236907684886


# ---------------------------------------------------------------------------
# shared pattern helpers
# ---------------------------------------------------------------------------

def pat_g2(pins, brs):
    """2-terminal conductance quad: (a,a),(a,b),(b,a),(b,b)."""
    a, b = pins
    return [a, a, b, b], [a, b, a, b]


def rhs_2(pins, brs):
    a, b = pins
    return [a, b]


def pat_vsrc(pins, brs):
    """Ideal-source pattern: B rows (a,k),(b,k); C rows (k,a),(k,b)."""
    a, b = pins
    k = brs[0]
    return [a, b, k, k], [k, k, a, b]


def rhs_branch(pins, brs):
    return [brs[0]]


_VSRC_VALS = (1.0, -1.0, 1.0, -1.0)


# ---------------------------------------------------------------------------
# Resistance  (linear/resistance.h:82-110)
# ---------------------------------------------------------------------------

def _r_stamp(P, v, ib, state, ctx):
    g = 1.0 / P[0]
    return jnp.array([g, -g, -g, g]), jnp.zeros(0), state


def _r_ac(P, state, omega):
    g = 1.0 / P[0]
    return (jnp.array([g, -g, -g, g]), jnp.zeros(4),
            jnp.zeros(0), jnp.zeros(0))


def _r_noise(P, v, ib, state, env, f):
    """Johnson-Nyquist thermal noise, current form: S_i = 4kT/R."""
    T = env["temperature"] + 273.15
    return jnp.array([4.0 * 1.380649e-23 * T / P[0]])


RESISTANCE = register(ModelDef(
    name="Resistance", id_name="R", device_class=DeviceClass.LINEAR,
    pins=("A", "B"), defaults={"r": 1000.0}, param_order=("r",),
    pattern=pat_g2, rhs_pattern=lambda p, b: [],
    stamp=_r_stamp, ac_stamp=_r_ac, attrs=("R",),
    noise=_r_noise, noise_pairs=((0, 1),),
))


# ---------------------------------------------------------------------------
# Capacitor  (linear/capacitor.h): open in DC/OP/TROP; trapezoidal Norton
# companion in TR (geq = 2C/dt, recurrence capacitor.h:106-128); jwC in AC.
# ---------------------------------------------------------------------------

def _c_stamp(P, v, ib, state, ctx):
    if ctx.mode == "tr":
        geq = state["prev_g"]
        ieq = state["hist_i"]
        a_vals = jnp.array([geq, -geq, -geq, geq])
        z_vals = jnp.array([-ieq, ieq])
    else:  # op/dc/trop: open circuit
        a_vals = jnp.zeros(4)
        z_vals = jnp.zeros(2)
    return a_vals, z_vals, state


def _c_step(P, v, ib, state, dt, t):
    c = P[0]
    v_prev = v[0] - v[1]
    g_new = 2.0 * c / dt
    hist = -(g_new + state["prev_g"]) * v_prev - state["hist_i"]
    return {"prev_g": g_new, "hist_i": hist}


def _c_ac(P, state, omega):
    y = P[0] * omega
    return (jnp.zeros(4), jnp.array([y, -y, -y, y]),
            jnp.zeros(2), jnp.zeros(2))


CAPACITOR = register(ModelDef(
    name="Capacitor", id_name="C", device_class=DeviceClass.LINEAR,
    pins=("A", "B"), defaults={"C": 1e-5}, param_order=("C",),
    state_vars=(("prev_g", 0.0), ("hist_i", 0.0)),
    pattern=pat_g2, rhs_pattern=rhs_2,
    stamp=_c_stamp, ac_stamp=_c_ac, step_update=_c_step, attrs=("C",),
))


# ---------------------------------------------------------------------------
# Inductor  (linear/inductor.h): short in DC (branch); TR Thevenin companion
# req = 2L/dt, Ueq = -v_prev - req*i_prev (inductor.h:134-208); -jwL in AC.
# Pattern: vsrc quad + D(k,k); rhs row k.
# ---------------------------------------------------------------------------

def _l_pattern(pins, brs):
    a, b = pins
    k = brs[0]
    return [a, b, k, k, k], [k, k, a, b, k]


def _l_stamp(P, v, ib, state, ctx):
    if ctx.mode == "tr":
        d = -state["req"]
        z = state["ueq"]
    else:  # dc/op/trop: ideal short
        d = jnp.zeros(())
        z = jnp.zeros(())
    a_vals = jnp.array([1.0, -1.0, 1.0, -1.0, 0.0]).at[4].set(d)
    return a_vals, jnp.array([z]), state


def _l_step(P, v, ib, state, dt, t):
    lval = P[0]
    req = 2.0 * lval / dt
    ueq = -(v[0] - v[1]) - req * ib[0]
    return {"req": req, "ueq": ueq}


def _l_ac(P, state, omega):
    a_re = jnp.array([1.0, -1.0, 1.0, -1.0, 0.0])
    a_im = jnp.zeros(5).at[4].set(-omega * P[0])
    return a_re, a_im, jnp.zeros(1), jnp.zeros(1)


INDUCTOR = register(ModelDef(
    name="Inductor", id_name="L", device_class=DeviceClass.LINEAR,
    pins=("A", "B"), defaults={"L": 1e-5}, param_order=("L",),
    nbranches=1, state_vars=(("req", 0.0), ("ueq", 0.0)),
    pattern=_l_pattern, rhs_pattern=rhs_branch,
    stamp=_l_stamp, ac_stamp=_l_ac, step_update=_l_step, attrs=("L",),
))


# ---------------------------------------------------------------------------
# VDC  (linear/VDC.h:82-116)
# ---------------------------------------------------------------------------

def _vdc_stamp(P, v, ib, state, ctx):
    return jnp.array(_VSRC_VALS), jnp.array([P[0]]), state


def _vdc_ac(P, state, omega):
    # AC small-signal: DC source is 0V perturbation (VDC.h:101-113)
    return (jnp.array(_VSRC_VALS), jnp.zeros(4), jnp.zeros(1), jnp.zeros(1))


VDC = register(ModelDef(
    name="VDC", id_name="VDC", device_class=DeviceClass.LINEAR,
    pins=("+", "-"), defaults={"V": 5.0}, param_order=("V",), nbranches=1,
    pattern=pat_vsrc, rhs_pattern=rhs_branch,
    stamp=_vdc_stamp, ac_stamp=_vdc_ac, attrs=("V",),
))


# ---------------------------------------------------------------------------
# VAC  (linear/VAC.h): DC/OP -> 0V source; TR -> Vp*sin(w t + phase);
# AC -> complex phasor Vp*e^{j phase}.  Attributes: Vp, freq (Hz), phase
# (degrees) — converted exactly like VAC.h:43-49.
# ---------------------------------------------------------------------------

def _vac_stamp(P, v, ib, state, ctx):
    vp, freq, ph = P[0], P[1], P[2]
    if ctx.mode == "tr":
        e = vp * jnp.sin(freq * TWO_PI * ctx.t + ph * DEG)
    else:
        e = jnp.zeros(())
    return jnp.array(_VSRC_VALS), jnp.array([e]), state


def _vac_ac(P, state, omega):
    vp, _, ph = P[0], P[1], P[2]
    return (jnp.array(_VSRC_VALS), jnp.zeros(4),
            jnp.array([vp * jnp.cos(ph * DEG)]),
            jnp.array([vp * jnp.sin(ph * DEG)]))


VAC = register(ModelDef(
    name="VAC", id_name="VAC", device_class=DeviceClass.LINEAR,
    pins=("+", "-"), defaults={"Vp": 5.0, "freq": 50.0 / TWO_PI, "phase": 0.0},
    param_order=("Vp", "freq", "phase"), nbranches=1,
    pattern=pat_vsrc, rhs_pattern=rhs_branch,
    stamp=_vac_stamp, ac_stamp=_vac_ac, attrs=("Vp", "freq", "phase"),
))


# ---------------------------------------------------------------------------
# IDC / IAC  (linear/IDC.h:90-91, IAC.h:139-157): pure RHS current stamps.
# ---------------------------------------------------------------------------

def _idc_stamp(P, v, ib, state, ctx):
    i = P[0]
    return jnp.zeros(0), jnp.array([-i, i]), state


def _idc_ac(P, state, omega):
    return jnp.zeros(0), jnp.zeros(0), jnp.zeros(2), jnp.zeros(2)


IDC = register(ModelDef(
    name="IDC", id_name="IDC", device_class=DeviceClass.LINEAR,
    pins=("A", "B"), defaults={"I": 0.2}, param_order=("I",),
    pattern=lambda p, b: ([], []), rhs_pattern=rhs_2,
    stamp=_idc_stamp, ac_stamp=_idc_ac, attrs=("I",),
))


def _iac_stamp(P, v, ib, state, ctx):
    ip, freq, ph = P[0], P[1], P[2]
    if ctx.mode == "tr":
        i = ip * jnp.sin(freq * TWO_PI * ctx.t + ph * DEG)
    else:
        i = jnp.zeros(())
    return jnp.zeros(0), jnp.array([-i, i]), state


def _iac_ac(P, state, omega):
    ir = P[0] * jnp.cos(P[2] * DEG)
    ii = P[0] * jnp.sin(P[2] * DEG)
    return (jnp.zeros(0), jnp.zeros(0),
            jnp.array([-ir, ir]), jnp.array([-ii, ii]))


IAC = register(ModelDef(
    name="IAC", id_name="IAC", device_class=DeviceClass.LINEAR,
    pins=("A", "B"), defaults={"Ip": 0.2, "freq": 50.0 / TWO_PI, "phase": 0.0},
    param_order=("Ip", "freq", "phase"),
    pattern=lambda p, b: ([], []), rhs_pattern=rhs_2,
    stamp=_iac_stamp, ac_stamp=_iac_ac, attrs=("Ip", "freq", "phase"),
))


# ---------------------------------------------------------------------------
# Controlled sources.  Pin order S,T,P,Q throughout (output S-T, control
# P-Q), matching linear/{VCVS,VCCS,CCVS,CCCS}.h.
# ---------------------------------------------------------------------------

def _vcvs_pattern(pins, brs):
    s, t, p, q = pins
    k = brs[0]
    # B: (s,k),(t,k); C: (k,s),(k,t),(k,p),(k,q)
    return [s, t, k, k, k, k], [k, k, s, t, p, q]


def _vcvs_stamp(P, v, ib, state, ctx):
    mu = P[0]
    return jnp.array([1.0, -1.0, 1.0, -1.0, 0.0, 0.0]).at[4].set(-mu).at[5].set(mu), \
        jnp.zeros(0), state


def _vcvs_ac(P, state, omega):
    mu = P[0]
    a = jnp.array([1.0, -1.0, 1.0, -1.0, 0.0, 0.0])
    return (a.at[4].set(-mu).at[5].set(mu), jnp.zeros(6),
            jnp.zeros(0), jnp.zeros(0))


VCVS = register(ModelDef(
    name="VCVS", id_name="VCVS", device_class=DeviceClass.LINEAR,
    pins=("S", "T", "P", "Q"), defaults={"mu": 1.0}, param_order=("mu",),
    nbranches=1, pattern=_vcvs_pattern, rhs_pattern=lambda p, b: [],
    stamp=_vcvs_stamp, ac_stamp=_vcvs_ac, attrs=("mu",),
))


def _vccs_pattern(pins, brs):
    s, t, p, q = pins
    return [s, s, t, t], [p, q, p, q]


def _vccs_stamp(P, v, ib, state, ctx):
    g = P[0]
    return jnp.array([g, -g, -g, g]), jnp.zeros(0), state


def _vccs_ac(P, state, omega):
    g = P[0]
    return (jnp.array([g, -g, -g, g]), jnp.zeros(4),
            jnp.zeros(0), jnp.zeros(0))


VCCS = register(ModelDef(
    name="VCCS", id_name="VCCS", device_class=DeviceClass.LINEAR,
    pins=("S", "T", "P", "Q"), defaults={"g": 1.0}, param_order=("g",),
    pattern=_vccs_pattern, rhs_pattern=lambda p, b: [],
    stamp=_vccs_stamp, ac_stamp=_vccs_ac, attrs=("g",),
))


def _ccvs_pattern(pins, brs):
    s, t, p, q = pins
    k, c = brs
    # B: (s,k),(t,k),(p,c),(q,c); C: (k,s),(k,t),(c,p),(c,q); D: (k,c)
    return ([s, t, p, q, k, k, c, c, k],
            [k, k, c, c, s, t, p, q, c])


def _ccvs_stamp(P, v, ib, state, ctx):
    r = P[0]
    return (jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 0.0])
            .at[8].set(-r)), jnp.zeros(0), state


def _ccvs_ac(P, state, omega):
    r = P[0]
    a = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 0.0])
    return a.at[8].set(-r), jnp.zeros(9), jnp.zeros(0), jnp.zeros(0)


CCVS = register(ModelDef(
    name="CCVS", id_name="CCVS", device_class=DeviceClass.LINEAR,
    pins=("S", "T", "P", "Q"), defaults={"r": 10.0}, param_order=("r",),
    nbranches=2, pattern=_ccvs_pattern, rhs_pattern=lambda p, b: [],
    stamp=_ccvs_stamp, ac_stamp=_ccvs_ac, attrs=("r",),
))


def _cccs_pattern(pins, brs):
    s, t, p, q = pins
    c = brs[0]
    # B: (s,c)*alpha,(t,c)*-alpha,(p,c),(q,c); C: (c,p),(c,q)
    return [s, t, p, q, c, c], [c, c, c, c, p, q]


def _cccs_stamp(P, v, ib, state, ctx):
    al = P[0]
    return (jnp.array([0.0, 0.0, 1.0, -1.0, 1.0, -1.0])
            .at[0].set(al).at[1].set(-al)), jnp.zeros(0), state


def _cccs_ac(P, state, omega):
    al = P[0]
    a = jnp.array([0.0, 0.0, 1.0, -1.0, 1.0, -1.0])
    return (a.at[0].set(al).at[1].set(-al), jnp.zeros(6),
            jnp.zeros(0), jnp.zeros(0))


CCCS = register(ModelDef(
    name="CCCS", id_name="CCCS", device_class=DeviceClass.LINEAR,
    pins=("S", "T", "P", "Q"), defaults={"alpha": 10.0},
    param_order=("alpha",), nbranches=1,
    pattern=_cccs_pattern, rhs_pattern=lambda p, b: [],
    stamp=_cccs_stamp, ac_stamp=_cccs_ac, attrs=("alpha",),
))


# ---------------------------------------------------------------------------
# Ideal op-amp  (linear/op_amp.h): high-gain VCVS, pins +,-,OUT+,OUT-;
# constraint V(out+)-V(out-) = mu (V(+)-V(-)).
# ---------------------------------------------------------------------------

def _opamp_pattern(pins, brs):
    s, t, p, q = pins     # +, -, OUT+, OUT-
    k = brs[0]
    return [p, q, k, k, k, k], [k, k, p, q, s, t]


def _opamp_stamp(P, v, ib, state, ctx):
    mu = P[0]
    return (jnp.array([1.0, -1.0, 1.0, -1.0, 0.0, 0.0])
            .at[4].set(-mu).at[5].set(mu)), jnp.zeros(0), state


def _opamp_ac(P, state, omega):
    mu = P[0]
    a = jnp.array([1.0, -1.0, 1.0, -1.0, 0.0, 0.0])
    return (a.at[4].set(-mu).at[5].set(mu), jnp.zeros(6),
            jnp.zeros(0), jnp.zeros(0))


OP_AMP = register(ModelDef(
    name="Op Amp", id_name="OPAMP", device_class=DeviceClass.LINEAR,
    pins=("+", "-", "OUT+", "OUT-"), defaults={"mu": 1.0e5},
    param_order=("mu",), nbranches=1,
    pattern=_opamp_pattern, rhs_pattern=lambda p, b: [],
    stamp=_opamp_stamp, ac_stamp=_opamp_ac, attrs=("mu",),
))


# ---------------------------------------------------------------------------
# Ideal transformer  (linear/transformer.h:67-99): Vp = n*Vs; Is = -n*Ip.
# Pins P,Q,S,T (primary P-Q dotted at P).
# ---------------------------------------------------------------------------

def _tx_pattern(pins, brs):
    p, q, s, t = pins
    kp, ks = brs
    return ([p, q, kp, kp, s, t, kp, kp, ks, ks],
            [kp, kp, p, q, ks, ks, s, t, ks, kp])


def _tx_stamp(P, v, ib, state, ctx):
    n = P[0]
    vals = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 0.0, 0.0, 1.0, 0.0])
    return vals.at[6].set(-n).at[7].set(n).at[9].set(n), jnp.zeros(0), state


def _tx_ac(P, state, omega):
    n = P[0]
    vals = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 0.0, 0.0, 1.0, 0.0])
    return (vals.at[6].set(-n).at[7].set(n).at[9].set(n), jnp.zeros(10),
            jnp.zeros(0), jnp.zeros(0))


TRANSFORMER = register(ModelDef(
    name="Transformer", id_name="TX", device_class=DeviceClass.LINEAR,
    pins=("P", "Q", "S", "T"), defaults={"n": 1.0}, param_order=("n",),
    nbranches=2, pattern=_tx_pattern, rhs_pattern=lambda p, b: [],
    stamp=_tx_stamp, ac_stamp=_tx_ac, attrs=("n",),
))


# ---------------------------------------------------------------------------
# Center-tapped transformer  (linear/transformer_center_tap.h:80-133):
# two half-secondaries S1-CT, CT-S2, each V_half = V_p / n_half;
# ampere-turns Ip + (Ih1+Ih2)/n_half = 0.
# ---------------------------------------------------------------------------

def _txct_pattern(pins, brs):
    p, q, s1, ct, s2 = pins
    kp, k1, k2 = brs
    rows = [p, q, s1, ct, ct, s2,            # B quads
            k1, k1, k1, k1,                  # KVL half 1
            k2, k2, k2, k2,                  # KVL half 2
            kp, kp, kp]                      # ampere-turns
    cols = [kp, kp, k1, k1, k2, k2,
            s1, ct, p, q,
            ct, s2, p, q,
            kp, k1, k2]
    return rows, cols


def _txct_stamp(P, v, ib, state, ctx):
    inv = 1.0 / P[0]
    vals = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0,
                      1.0, -1.0, 0.0, 0.0,
                      1.0, -1.0, 0.0, 0.0,
                      1.0, 0.0, 0.0])
    vals = (vals.at[8].set(-inv).at[9].set(inv)
                .at[12].set(-inv).at[13].set(inv)
                .at[15].set(inv).at[16].set(inv))
    return vals, jnp.zeros(0), state


def _txct_ac(P, state, omega):
    a = _txct_stamp(P, None, None, {}, None)[0]
    return a, jnp.zeros(17), jnp.zeros(0), jnp.zeros(0)


TRANSFORMER_CENTER_TAP = register(ModelDef(
    name="Transformer(center tapped)", id_name="TXCT",
    device_class=DeviceClass.LINEAR,
    pins=("P", "Q", "S1", "CT", "S2"), defaults={"n_half": 1.0},
    param_order=("n_half",), nbranches=3,
    pattern=_txct_pattern, rhs_pattern=lambda p, b: [],
    stamp=_txct_stamp, ac_stamp=_txct_ac, attrs=("n_half",),
))


# ---------------------------------------------------------------------------
# Coupled inductors  (linear/coupled_inductors.h:92-230): Z-matrix
# [[L1,M],[M,L2]]; DC short; TR trapezoidal Thevenin with matrix Req.
# ---------------------------------------------------------------------------

def _kl_pattern(pins, brs):
    p1, p2, s1, s2 = pins
    k1, k2 = brs
    rows = [p1, p2, s1, s2, k1, k1, k2, k2, k1, k1, k2, k2]
    cols = [k1, k1, k2, k2, p1, p2, s1, s2, k1, k2, k1, k2]
    return rows, cols


def _kl_stamp(P, v, ib, state, ctx):
    base = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0,
                      0.0, 0.0, 0.0, 0.0])
    if ctx.mode == "tr":
        a = (base.at[8].set(-state["req11"]).at[9].set(-state["req12"])
                 .at[10].set(-state["req12"]).at[11].set(-state["req22"]))
        z = jnp.array([state["ueq1"], state["ueq2"]])
    else:
        a = base
        z = jnp.zeros(2)
    return a, z, state


def _kl_step(P, v, ib, state, dt, t):
    l1, l2, k = P[0], P[1], P[2]
    m = k * jnp.sqrt(l1 * l2)
    sc = 2.0 / dt
    req11, req12, req22 = sc * l1, sc * m, sc * l2
    v1p = v[0] - v[1]
    v2p = v[2] - v[3]
    i1p, i2p = ib[0], ib[1]
    return {"req11": req11, "req12": req12, "req22": req22,
            "ueq1": -v1p - (req11 * i1p + req12 * i2p),
            "ueq2": -v2p - (req12 * i1p + req22 * i2p)}


def _kl_ac(P, state, omega):
    l1, l2, k = P[0], P[1], P[2]
    m = k * jnp.sqrt(l1 * l2)
    a_re = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0,
                      0.0, 0.0, 0.0, 0.0])
    a_im = (jnp.zeros(12).at[8].set(-omega * l1).at[9].set(-omega * m)
                .at[10].set(-omega * m).at[11].set(-omega * l2))
    return a_re, a_im, jnp.zeros(2), jnp.zeros(2)


COUPLED_INDUCTORS = register(ModelDef(
    name="Coupled Inductors", id_name="KL", device_class=DeviceClass.LINEAR,
    pins=("P1", "P2", "S1", "S2"),
    defaults={"L1": 1e-3, "L2": 1e-3, "k": 0.999},
    param_order=("L1", "L2", "k"), nbranches=2,
    state_vars=(("req11", 0.0), ("req12", 0.0), ("req22", 0.0),
                ("ueq1", 0.0), ("ueq2", 0.0)),
    pattern=_kl_pattern, rhs_pattern=lambda p, b: list(b),
    stamp=_kl_stamp, ac_stamp=_kl_ac, step_update=_kl_step,
    attrs=("L1", "L2", "k"),
))
