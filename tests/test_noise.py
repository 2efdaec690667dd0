"""Small-signal noise analysis (engine/noise.py — SPICE .NOISE class).

The reference has NO noise analysis (bsim3v32.h:28-29 lists the
infrastructure as missing), so there is no cross-engine oracle; these
tests use closed-form physics oracles instead (SURVEY §4 tier-a
pattern):

* resistor divider  -> flat 4kT(R1||R2) output PSD,
* RC lowpass        -> integrated output noise = kT/C,
* biased diode      -> (2q·Id + 4kT/R)·Z², Z = rd||R (+ kf/f flicker),
* adjoint method    -> brute-force per-source direct solves,
* BSIM3 channel     -> 8/3·kT·gm/gm² input-referred floor vs FD-gm.
"""

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.engine.circuit import ACSettings, ACSweepType
from phy_engine_tpu.models import RESISTANCE, CAPACITOR, VDC, PN_JUNCTION

K_B = 1.380649e-23
Q_E = 1.602176634e-19
T0 = 300.15          # env default 27 C


def _vdc_chain(r1, r2=None, cap=None):
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 1.0})
    top = netops.create_node(nl)
    out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    ra = netops.add_model(nl, RESISTANCE, {"r": r1})
    netops.add_to_node(nl, ra, 0, top)
    netops.add_to_node(nl, ra, 1, out)
    if r2 is not None:
        rb = netops.add_model(nl, RESISTANCE, {"r": r2})
        netops.add_to_node(nl, rb, 0, out)
        netops.add_to_node(nl, rb, 1, nl.ground_node)
    if cap is not None:
        cl = netops.add_model(nl, CAPACITOR, {"C": cap})
        netops.add_to_node(nl, cl, 0, out)
        netops.add_to_node(nl, cl, 1, nl.ground_node)
    return c, v, out


def test_divider_thermal_psd():
    """Two-resistor divider: onoise = 4kT(R1||R2), flat in f;
    inoise = onoise/gain² with gain = R2/(R1+R2)."""
    r1, r2 = 4.7e3, 1.2e3
    c, v, out = _vdc_chain(r1, r2=r2)
    c.ac = ACSettings(sweep=ACSweepType.LOG, omega_start=2 * np.pi * 10,
                      omega_stop=2 * np.pi * 1e6, points=7)
    res = c.noise(out, src=v)
    rp = r1 * r2 / (r1 + r2)
    want = 4.0 * K_B * T0 * rp
    assert np.allclose(res.onoise_psd, want, rtol=1e-9)
    gain = r2 / (r1 + r2)
    assert np.allclose(res.gain2, gain * gain, rtol=1e-9)
    assert np.allclose(res.inoise_psd, want / gain ** 2, rtol=1e-9)
    # both resistors contribute through one family record
    assert np.allclose(res.contribs["R"], want, rtol=1e-9)


def test_rc_integrated_kT_over_C():
    """RC lowpass: total integrated output noise = kT/C regardless
    of R (the classic sampled-noise result)."""
    R, C = 1e3, 1e-9
    c, v, out = _vdc_chain(R, cap=C)
    f3 = 1.0 / (2 * np.pi * R * C)
    c.ac = ACSettings(sweep=ACSweepType.LOG,
                      omega_start=2 * np.pi * (f3 * 1e-3),
                      omega_stop=2 * np.pi * (f3 * 1e4),
                      points=801)
    res = c.noise(out)
    # PSD matches the lorentzian at the corner
    k = np.argmin(np.abs(res.freqs - f3))
    lor = 4 * K_B * T0 * R / (1.0 + (res.freqs[k] / f3) ** 2)
    assert np.isclose(res.onoise_psd[k], lor, rtol=1e-6)
    total = res.onoise_total()
    assert np.isclose(total, K_B * T0 / C, rtol=0.02), (
        total, K_B * T0 / C)


def test_diode_shot_and_flicker():
    """VDC -> R -> diode: onoise = (4kT/R + 2q·Id + kf·Id/f)·Z²,
    Z = rd||R with rd = Ut/(Id+Is)."""
    R = 2.2e3
    kf = 1e-16
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 2.0})
    top = netops.create_node(nl)
    out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    r = netops.add_model(nl, RESISTANCE, {"r": R})
    netops.add_to_node(nl, r, 0, top)
    netops.add_to_node(nl, r, 1, out)
    d = netops.add_model(nl, PN_JUNCTION, {"kf": kf, "af": 1.0})
    netops.add_to_node(nl, d, 0, out)
    netops.add_to_node(nl, d, 1, nl.ground_node)
    c.ac = ACSettings(sweep=ACSweepType.LOG, omega_start=2 * np.pi * 1.0,
                      omega_stop=2 * np.pi * 1e6, points=13)
    res = c.noise(out, src=v)

    vd = c.node_voltage(out).real
    i_d = (2.0 - vd) / R
    # reference constants of the diode model (nonlinear.py)
    ut = 1.380650524e-23 * 300.15 / 1.6021765314e-19
    gd = (i_d + 1e-14) / ut
    z = 1.0 / (gd + 1.0 / R)
    want = (4 * K_B * T0 / R + 2 * Q_E * i_d +
            kf * i_d / res.freqs) * z * z
    assert np.allclose(res.onoise_psd, want, rtol=1e-3), (
        res.onoise_psd, want)
    # flicker dominates at 1 Hz, shot at 1 MHz: PSD must fall
    assert res.onoise_psd[0] > 5.0 * res.onoise_psd[-1]
    # family breakdown adds up
    tot = sum(res.contribs.values())
    assert np.allclose(tot, res.onoise_psd, rtol=1e-9)


def test_adjoint_matches_direct_solves():
    """The adjoint transfer |y_p - y_q|² equals the brute-force
    direct transfer (solve A·x = e_p - e_q, read x_out) for every
    source in a random resistive mesh with a capacitor."""
    import jax.numpy as jnp
    from phy_engine_tpu.engine import analog
    from phy_engine_tpu.engine.noise import noise_sweep

    rng = np.random.default_rng(3)
    c = pe.Circuit()
    nl = c.nl
    nodes = [netops.create_node(nl) for _ in range(7)]
    v = netops.add_model(nl, VDC, {"V": 1.0})
    netops.add_to_node(nl, v, 0, nodes[0])
    netops.add_to_node(nl, v, 1, nl.ground_node)
    rs = []
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
                 (6, 0), (1, 4), (2, 5)]:
        r = netops.add_model(nl, RESISTANCE,
                             {"r": float(rng.uniform(100, 10e3))})
        netops.add_to_node(nl, r, 0, nodes[a])
        netops.add_to_node(nl, r, 1, nodes[b])
        rs.append(r)
    r_g = netops.add_model(nl, RESISTANCE, {"r": 3.3e3})
    netops.add_to_node(nl, r_g, 0, nodes[3])
    netops.add_to_node(nl, r_g, 1, nl.ground_node)
    rs.append(r_g)
    cl = netops.add_model(nl, CAPACITOR, {"C": 2e-9})
    netops.add_to_node(nl, cl, 0, nodes[5])
    netops.add_to_node(nl, cl, 1, nl.ground_node)

    assert c.analyze()
    ir = c.prepare()
    out = nodes[4]
    out_idx = c._node_index(out)
    w = 2 * np.pi * 50e3
    onoise, _g2, _cn = noise_sweep(
        ir, c._params(), c._x, c._states, np.array([w]), out_idx,
        None, c._env_scalars())

    # brute force: complex dense solve per source
    Ar, Ai, _Zr, _Zi = analog.assemble_ac(
        ir, c._params(), c._states, jnp.asarray(w))
    A = np.asarray(Ar) + 1j * np.asarray(Ai)
    n = ir.n_unknowns
    idx = {id(nd): i for i, nd in enumerate(ir.node_list)}
    want = 0.0
    for r in rs:
        p = idx[id(r.pins[0].node)] if not r.pins[0].node.is_ground \
            else None
        q = idx[id(r.pins[1].node)] if not r.pins[1].node.is_ground \
            else None
        e = np.zeros(n, complex)
        if p is not None:
            e[p] += 1.0
        if q is not None:
            e[q] -= 1.0
        x = np.linalg.solve(A, e)
        want += abs(x[out_idx]) ** 2 * 4 * K_B * T0 / r.params["r"]
    assert np.isclose(float(onoise[0]), want, rtol=1e-8), (
        float(onoise[0]), want)


def test_bsim3_channel_noise():
    """Common-source stage: input-referred white floor ≈ 8kT/(3·gm)
    (+ RL referred); gm cross-checked by finite differences of the
    bias point.  Flicker follows 1/f^ef."""
    from phy_engine_tpu.models import BSIM3V32_NMOS

    RL = 10e3
    VDD, VG = 3.0, 1.2

    def build(vg, kf=0.0):
        c = pe.Circuit()
        nl = c.nl
        vdd = netops.add_model(nl, VDC, {"V": VDD})
        vgs = netops.add_model(nl, VDC, {"V": vg})
        nvdd = netops.create_node(nl)
        ng = netops.create_node(nl)
        nd = netops.create_node(nl)
        netops.add_to_node(nl, vdd, 0, nvdd)
        netops.add_to_node(nl, vdd, 1, nl.ground_node)
        netops.add_to_node(nl, vgs, 0, ng)
        netops.add_to_node(nl, vgs, 1, nl.ground_node)
        rl = netops.add_model(nl, RESISTANCE, {"r": RL})
        netops.add_to_node(nl, rl, 0, nvdd)
        netops.add_to_node(nl, rl, 1, nd)
        m = netops.add_model(nl, BSIM3V32_NMOS, {
            "W": 10e-6, "L": 1e-6, "Vth0": 0.7, "Kp": 120e-6,
            "kf": kf})
        netops.add_to_node(nl, m, 0, nd)   # D
        netops.add_to_node(nl, m, 1, ng)   # G
        netops.add_to_node(nl, m, 2, nl.ground_node)  # S
        netops.add_to_node(nl, m, 3, nl.ground_node)  # B
        return c, vgs, nd

    # FD gm from two bias points
    dv = 1e-4
    c1, _, n1 = build(VG - dv)
    assert c1.analyze()
    c2, _, n2 = build(VG + dv)
    assert c2.analyze()
    id1 = (VDD - c1.node_voltage(n1).real) / RL
    id2 = (VDD - c2.node_voltage(n2).real) / RL
    gm_fd = (id2 - id1) / (2 * dv)
    assert gm_fd > 1e-5   # the stage is actually on

    c, vg_src, nd = build(VG)
    c.ac = ACSettings(sweep=ACSweepType.SINGLE, omega=2 * np.pi * 1e5)
    res = c.noise(nd, src=vg_src)
    # input-referred channel floor: contribs / gain² ≈ 8kT(gm+gds+gmb)
    # / (3 gm²) >= 8kT/(3 gm); RL contributes 4kT·RL/(gain²·RL²)·RL²...
    ch_in = float(res.contribs["BSIM3_NMOS"][0] / res.gain2[0])
    floor = 8.0 * K_B * T0 / (3.0 * gm_fd)
    assert ch_in > 0.8 * floor
    assert ch_in < 3.0 * floor, (ch_in, floor)   # gds+gmb are small

    # flicker: 1/f between 10 Hz and 1 kHz once kf dominates
    ckf, vs, ndk = build(VG, kf=1e-24)
    ckf.ac = ACSettings(sweep=ACSweepType.LOG,
                        omega_start=2 * np.pi * 10,
                        omega_stop=2 * np.pi * 1e3, points=3)
    r2 = ckf.noise(ndk, src=vs)
    s10, s1k = r2.contribs["BSIM3_NMOS"][0], r2.contribs["BSIM3_NMOS"][-1]
    c0, _, nd0 = build(VG, kf=0.0)
    c0.ac = ACSettings(sweep=ACSweepType.SINGLE, omega=2 * np.pi * 10)
    th = float(c0.noise(nd0).contribs["BSIM3_NMOS"][0])
    assert (s10 - th) / (s1k - th) == pytest.approx(100.0, rel=0.05)


def test_tf_divider():
    """SPICE .TF on the divider: gain = R2/(R1+R2), rin = R1+R2,
    rout = R1||R2 (extension past parity, like noise)."""
    r1, r2 = 4.7e3, 1.2e3
    c, v, out = _vdc_chain(r1, r2=r2)
    g, rin, rout = c.tf(out, v)
    assert np.isclose(g, r2 / (r1 + r2), rtol=1e-9)
    assert np.isclose(rin, r1 + r2, rtol=1e-9)
    assert np.isclose(rout, r1 * r2 / (r1 + r2), rtol=1e-9)


def test_tf_nonlinear_bias():
    """.TF linearizes at the OP: VDC -> R -> diode; gain = rd/(R+rd)
    with rd = Ut/(Id+Is) from the converged bias."""
    R = 2.2e3
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 2.0})
    top = netops.create_node(nl)
    out = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    r = netops.add_model(nl, RESISTANCE, {"r": R})
    netops.add_to_node(nl, r, 0, top)
    netops.add_to_node(nl, r, 1, out)
    d = netops.add_model(nl, PN_JUNCTION, {})
    netops.add_to_node(nl, d, 0, out)
    netops.add_to_node(nl, d, 1, nl.ground_node)
    g, rin, rout = c.tf(out, v)
    vd = c.node_voltage(out).real
    i_d = (2.0 - vd) / R
    ut = 1.380650524e-23 * 300.15 / 1.6021765314e-19
    rd = 1.0 / ((i_d + 1e-14) / ut)
    # 2%: the captured linearization is the penultimate Newton
    # iterate's (save_op semantics, circuit.h:967-979) and the V
    # tolerance allows ~3e-4 V of bias slack -> ~1% in exp-law gd
    assert np.isclose(g, rd / (R + rd), rtol=0.02)
    assert np.isclose(rin, R + rd, rtol=0.02)
    assert np.isclose(rout, R * rd / (R + rd), rtol=0.02)


def test_pz_rc_lowpass():
    """.PZ (extension past parity): RC lowpass has one pole at
    -1/(RC) and no finite zeros."""
    R, C = 1e3, 1e-9
    c, v, out = _vdc_chain(R, cap=C)
    poles, zeros = c.pz(out, v)
    assert len(poles) == 1
    assert np.isclose(poles[0].real, -1.0 / (R * C), rtol=1e-9)
    assert abs(poles[0].imag) < 1e-3
    assert len(zeros) == 0


def test_pz_zero_and_rlc_pair():
    """Shelving network R1 -> out, out -> (R2 + C) -> gnd,
    out -> R3 -> gnd: zero at -1/(R2·C), pole at
    -(R1+R3)/(C·(R1R2+R1R3+R2R3)).  Series RLC: complex pole pair at
    -R/2L ± j·sqrt(1/LC - (R/2L)²)."""
    from phy_engine_tpu.models import CAPACITOR, INDUCTOR

    R1, R2, R3, C = 1e3, 4.7e3, 10e3, 2e-9
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 1.0})
    top = netops.create_node(nl)
    out = netops.create_node(nl)
    mid = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, top)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    r1 = netops.add_model(nl, RESISTANCE, {"r": R1})
    netops.add_to_node(nl, r1, 0, top)
    netops.add_to_node(nl, r1, 1, out)
    r2 = netops.add_model(nl, RESISTANCE, {"r": R2})
    netops.add_to_node(nl, r2, 0, out)
    netops.add_to_node(nl, r2, 1, mid)
    cc = netops.add_model(nl, CAPACITOR, {"C": C})
    netops.add_to_node(nl, cc, 0, mid)
    netops.add_to_node(nl, cc, 1, nl.ground_node)
    r3 = netops.add_model(nl, RESISTANCE, {"r": R3})
    netops.add_to_node(nl, r3, 0, out)
    netops.add_to_node(nl, r3, 1, nl.ground_node)
    poles, zeros = c.pz(out, v)
    p_want = -(R1 + R3) / (C * (R1 * R2 + R1 * R3 + R2 * R3))
    z_want = -1.0 / (R2 * C)
    assert len(poles) == 1 and len(zeros) == 1
    assert np.isclose(poles[0].real, p_want, rtol=1e-9)
    assert np.isclose(zeros[0].real, z_want, rtol=1e-9)

    # series RLC to a capacitor output: complex pole pair
    R, L, C2 = 100.0, 1e-3, 1e-9
    c2 = pe.Circuit()
    nl = c2.nl
    v2 = netops.add_model(nl, VDC, {"V": 1.0})
    a = netops.create_node(nl)
    b = netops.create_node(nl)
    o = netops.create_node(nl)
    netops.add_to_node(nl, v2, 0, a)
    netops.add_to_node(nl, v2, 1, nl.ground_node)
    rr = netops.add_model(nl, RESISTANCE, {"r": R})
    netops.add_to_node(nl, rr, 0, a)
    netops.add_to_node(nl, rr, 1, b)
    ll = netops.add_model(nl, INDUCTOR, {"L": L})
    netops.add_to_node(nl, ll, 0, b)
    netops.add_to_node(nl, ll, 1, o)
    c2c = netops.add_model(nl, CAPACITOR, {"C": C2})
    netops.add_to_node(nl, c2c, 0, o)
    netops.add_to_node(nl, c2c, 1, nl.ground_node)
    poles2, _zeros2 = c2.pz(o, v2)
    assert len(poles2) == 2
    alpha = R / (2 * L)
    wd = np.sqrt(1.0 / (L * C2) - alpha ** 2)
    got = sorted(poles2, key=lambda s: s.imag)
    assert np.isclose(got[1].real, -alpha, rtol=1e-6)
    assert np.isclose(abs(got[1].imag), wd, rtol=1e-6)
    assert np.isclose(got[0].imag, -got[1].imag, rtol=1e-6)


def test_bjt_shot_noise():
    """Common-emitter NPN with ideal V-source base drive: the base
    shot source sees zero transfer impedance (both terminals held by
    ideal sources), so onoise = (2q·Ic + 4kT/RL)·RL² exactly."""
    from phy_engine_tpu.models import BJT_NPN

    RL, VCC, VB = 4.7e3, 5.0, 0.65
    c = pe.Circuit()
    nl = c.nl
    vcc = netops.add_model(nl, VDC, {"V": VCC})
    vb = netops.add_model(nl, VDC, {"V": VB})
    ncc = netops.create_node(nl)
    nb = netops.create_node(nl)
    nc = netops.create_node(nl)
    netops.add_to_node(nl, vcc, 0, ncc)
    netops.add_to_node(nl, vcc, 1, nl.ground_node)
    netops.add_to_node(nl, vb, 0, nb)
    netops.add_to_node(nl, vb, 1, nl.ground_node)
    rl = netops.add_model(nl, RESISTANCE, {"r": RL})
    netops.add_to_node(nl, rl, 0, ncc)
    netops.add_to_node(nl, rl, 1, nc)
    q = netops.add_model(nl, BJT_NPN, {})
    netops.add_to_node(nl, q, 0, nb)            # B
    netops.add_to_node(nl, q, 1, nc)            # C
    netops.add_to_node(nl, q, 2, nl.ground_node)  # E
    c.ac = ACSettings(sweep=ACSweepType.SINGLE, omega=2 * np.pi * 1e4)
    res = c.noise(nc)
    i_c = (VCC - c.node_voltage(nc).real) / RL
    assert i_c > 1e-6          # stage is on
    want = (2 * Q_E * i_c + 4 * K_B * T0 / RL) * RL * RL
    assert np.allclose(res.onoise_psd, want, rtol=1e-6), (
        res.onoise_psd, want)
    assert np.allclose(res.contribs["QNP"], 2 * Q_E * i_c * RL * RL,
                       rtol=1e-6)


def test_mosfet_channel_noise():
    """Square-law common-source stage: onoise = (8kT(gm+gds)/3 +
    4kT/RL)·Z² with Z = RL || 1/gds, gm/gds from the same square law."""
    from phy_engine_tpu.models import NMOSFET

    RL, VDD, VG = 10e3, 5.0, 1.6
    KP, LAM, VTH = 2e-3, 0.05, 1.0
    c = pe.Circuit()
    nl = c.nl
    vdd = netops.add_model(nl, VDC, {"V": VDD})
    vg = netops.add_model(nl, VDC, {"V": VG})
    nvdd = netops.create_node(nl)
    ng = netops.create_node(nl)
    nd = netops.create_node(nl)
    netops.add_to_node(nl, vdd, 0, nvdd)
    netops.add_to_node(nl, vdd, 1, nl.ground_node)
    netops.add_to_node(nl, vg, 0, ng)
    netops.add_to_node(nl, vg, 1, nl.ground_node)
    rl = netops.add_model(nl, RESISTANCE, {"r": RL})
    netops.add_to_node(nl, rl, 0, nvdd)
    netops.add_to_node(nl, rl, 1, nd)
    m = netops.add_model(nl, NMOSFET,
                         {"Kp": KP, "lambda": LAM, "Vth": VTH})
    netops.add_to_node(nl, m, 0, nd)
    netops.add_to_node(nl, m, 1, ng)
    netops.add_to_node(nl, m, 2, nl.ground_node)
    c.ac = ACSettings(sweep=ACSweepType.SINGLE, omega=2 * np.pi * 1e4)
    res = c.noise(nd, src=vg)
    vds = c.node_voltage(nd).real
    vov = VG - VTH
    assert 0.0 < vov < vds                      # saturation
    gm = KP * vov * (1.0 + LAM * vds)
    gds = 0.5 * KP * vov * vov * LAM
    z = 1.0 / (gds + 1.0 / RL)
    want = (8.0 / 3.0 * K_B * T0 * (gm + gds) + 4 * K_B * T0 / RL) \
        * z * z
    assert np.allclose(res.onoise_psd, want, rtol=1e-6), (
        res.onoise_psd, want)
    # gain sanity: |A| = gm·Z, inoise = onoise/A²
    assert np.isclose(float(res.gain2[0]), (gm * z) ** 2, rtol=1e-6)


def test_bsim3_induced_gate_noise():
    """Wave 8 (induced gate noise + correlation — the reference TODO's
    last clause).  Oracle: brute-force direct complex solves combined
    with the model hooks must reproduce the adjoint sweep exactly, at
    a frequency where omega*Cgs ~ gm so the correlated terms matter;
    and the hook itself must scale as omega^2 with +Im cross-PSD."""
    import jax.numpy as jnp
    from phy_engine_tpu.engine import analog
    from phy_engine_tpu.models import BSIM3V32_NMOS

    RL, RG, VDD, VG = 10e3, 50e3, 3.0, 1.2
    c = pe.Circuit()
    nl = c.nl
    vdd = netops.add_model(nl, VDC, {"V": VDD})
    vg = netops.add_model(nl, VDC, {"V": VG})
    nvdd = netops.create_node(nl)
    ngs = netops.create_node(nl)     # source side of RG
    ng = netops.create_node(nl)      # gate node proper
    nd = netops.create_node(nl)
    netops.add_to_node(nl, vdd, 0, nvdd)
    netops.add_to_node(nl, vdd, 1, nl.ground_node)
    netops.add_to_node(nl, vg, 0, ngs)
    netops.add_to_node(nl, vg, 1, nl.ground_node)
    rl = netops.add_model(nl, RESISTANCE, {"r": RL})
    netops.add_to_node(nl, rl, 0, nvdd)
    netops.add_to_node(nl, rl, 1, nd)
    rg = netops.add_model(nl, RESISTANCE, {"r": RG})
    netops.add_to_node(nl, rg, 0, ngs)
    netops.add_to_node(nl, rg, 1, ng)
    m = netops.add_model(nl, BSIM3V32_NMOS, {
        "W": 10e-6, "L": 1e-6, "Vth0": 0.7, "Kp": 120e-6})
    netops.add_to_node(nl, m, 0, nd)
    netops.add_to_node(nl, m, 1, ng)
    netops.add_to_node(nl, m, 2, nl.ground_node)
    netops.add_to_node(nl, m, 3, nl.ground_node)

    w = 2 * np.pi * 2e10            # omega*Cgs ~ gm scale
    c.ac = ACSettings(sweep=ACSweepType.SINGLE, omega=w)
    res = c.noise(nd)
    assert np.isfinite(res.onoise_psd).all()

    # ---- brute force: direct solves + the hooks themselves ----------
    ir = c.prepare()
    A_parts = analog.assemble_ac(ir, c._params(), c._states,
                                 jnp.asarray(w))
    A = np.asarray(A_parts[0]) + 1j * np.asarray(A_parts[1])
    n = ir.n_unknowns
    out_idx = c._node_index(nd)

    def transfer(p_node, q_node):
        e = np.zeros(n, complex)
        if p_node >= 0:
            e[p_node] += 1.0
        if q_node >= 0:
            e[q_node] -= 1.0
        return np.linalg.solve(A, e)[out_idx]

    env = c._env_scalars()
    x_ext = np.concatenate([np.asarray(c._x), [0.0]])
    want = 0.0
    for fam in ir.families:
        pins = np.asarray(fam.pin_nodes)
        P = np.asarray(c._params()[fam.mdef.id_name])
        st_all = c._states.get(fam.mdef.id_name, {})
        for k in range(pins.shape[0]):
            Pk = jnp.asarray(P[k])
            vk = x_ext[pins[k]]
            bk = x_ext[np.asarray(fam.br_idx)[k]]
            stk = {kk: np.asarray(a)[k] for kk, a in st_all.items()}

            def node(pin_i):
                idx = pins[k][pin_i]
                return idx if idx < n else -1

            if fam.mdef.noise is not None:
                psd = np.asarray(fam.mdef.noise(
                    Pk, vk, bk, stk, env, w / (2 * np.pi)))
                for s_i, (i, j) in enumerate(fam.mdef.noise_pairs):
                    G = transfer(node(i), node(j))
                    want += max(float(psd[s_i]), 0.0) * abs(G) ** 2
            if fam.mdef.noise_corr is not None:
                S = np.asarray(fam.mdef.noise_corr(
                    Pk, vk, bk, stk, env, w / (2 * np.pi), w))
                for gi, (pa, pb) in enumerate(
                        fam.mdef.noise_corr_pairs):
                    Ga = transfer(node(pa[0]), node(pa[1]))
                    Gb = transfer(node(pb[0]), node(pb[1]))
                    sab = S[gi, 2] + 1j * S[gi, 3]
                    want += (max(S[gi, 0], 0.0) * abs(Ga) ** 2 +
                             max(S[gi, 1], 0.0) * abs(Gb) ** 2 +
                             2.0 * np.real(Ga * np.conj(Gb) * sab))
    assert np.isclose(float(res.onoise_psd[0]), want, rtol=1e-6), (
        float(res.onoise_psd[0]), want)

    # ---- hook physics: omega^2 scaling, +Im cross, zero S_bb --------
    fam = [f for f in ir.families if f.mdef.id_name == "BSIM3_NMOS"][0]
    Pk = jnp.asarray(np.asarray(c._params()["BSIM3_NMOS"])[0])
    vk = x_ext[np.asarray(fam.pin_nodes)[0]]
    stk = {kk: np.asarray(a)[0]
           for kk, a in c._states.get("BSIM3_NMOS", {}).items()}
    S1 = np.asarray(fam.mdef.noise_corr(Pk, vk, 0.0, stk, env,
                                        1e9, 2 * np.pi * 1e9))[0]
    S2 = np.asarray(fam.mdef.noise_corr(Pk, vk, 0.0, stk, env,
                                        2e9, 2 * np.pi * 2e9))[0]
    assert S2[0] == pytest.approx(4.0 * S1[0], rel=1e-6)   # omega^2
    assert S1[1] == 0.0                                    # no S_bb
    assert S1[3] > 0.0 and S1[2] == 0.0                    # +j cross
    assert S2[3] == pytest.approx(2.0 * S1[3], rel=1e-6)   # ~omega
    # correlation coefficient magnitude: |c| = 0.395
    sid0 = S1[3] ** 2 / (0.395 ** 2 * S1[0])
    assert sid0 > 0.0


def test_bsim3_rc_terminal_resistor_noise():
    """The *_RC variant adds 4kT·g thermal sources for real terminal
    resistances and treats floored shorts as noiseless."""
    from phy_engine_tpu.models import BSIM3V32_NMOS_RC

    def build(rd):
        c = pe.Circuit()
        nl = c.nl
        vdd = netops.add_model(nl, VDC, {"V": 3.0})
        vg = netops.add_model(nl, VDC, {"V": 1.5})
        nvdd = netops.create_node(nl)
        ng = netops.create_node(nl)
        nd = netops.create_node(nl)
        netops.add_to_node(nl, vdd, 0, nvdd)
        netops.add_to_node(nl, vdd, 1, nl.ground_node)
        netops.add_to_node(nl, vg, 0, ng)
        netops.add_to_node(nl, vg, 1, nl.ground_node)
        rl = netops.add_model(nl, RESISTANCE, {"r": 10e3})
        netops.add_to_node(nl, rl, 0, nvdd)
        netops.add_to_node(nl, rl, 1, nd)
        m = netops.add_model(nl, BSIM3V32_NMOS_RC, {
            "W": 10e-6, "L": 1e-6, "Vth0": 0.7, "Kp": 120e-6,
            "rd": rd})
        netops.add_to_node(nl, m, 0, nd)
        netops.add_to_node(nl, m, 1, ng)
        netops.add_to_node(nl, m, 2, nl.ground_node)
        netops.add_to_node(nl, m, 3, nl.ground_node)
        c.ac = ACSettings(sweep=ACSweepType.SINGLE, omega=2 * np.pi * 1e5)
        return c, nd

    c0, n0 = build(0.0)
    r0 = c0.noise(n0)
    c1, n1 = build(500.0)
    r1 = c1.noise(n1)
    assert np.isfinite(r0.onoise_psd).all()
    assert np.isfinite(r1.onoise_psd).all()
    key = "BSIM3_NMOS_RC"
    # rd both adds its own thermal source and shifts the bias/transfer
    # (net sign is circuit-dependent), so the robust oracle is the
    # model's noise hook itself at the converged bias point:
    # pairs are (ch, rd, rg, rs, rb); a real rd emits exactly 4kT/rd
    # and the floored-to-short rg/rb terminals are noiseless
    for c_, rd_ in ((c0, 0.0), (c1, 500.0)):
        ir = c_.prepare()
        fam = [f for f in ir.families if f.mdef.id_name == key][0]
        import jax.numpy as jnp
        P = jnp.asarray(np.asarray(c_._params()[key])[0])
        x_ext = np.concatenate([np.asarray(c_._x), [0.0]])
        v = x_ext[np.asarray(fam.pin_nodes)[0]]
        ib = x_ext[np.asarray(fam.br_idx)[0]]
        st = {k: np.asarray(a)[0]
              for k, a in c_._states.get(key, {}).items()}
        psd = np.asarray(fam.mdef.noise(
            P, v, ib, st, c_._env_scalars(), 1e5))
        assert psd[0] > 0.0                       # channel thermal
        if rd_ > 0.0:
            assert psd[1] == pytest.approx(4 * K_B * T0 / rd_,
                                           rel=1e-9)
        else:
            assert psd[1] == 0.0                  # floored short
        assert psd[2] == 0.0 and psd[4] == 0.0    # rg/rb disabled
        assert psd[3] == 0.0                      # rs floored short
    # and the rd=500 device is distinguishable at the output
    assert not np.isclose(float(r1.contribs[key][0]),
                          float(r0.contribs[key][0]),
                          rtol=1e-3, atol=0.0)
