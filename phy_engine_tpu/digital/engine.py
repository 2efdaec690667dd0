"""Synchronous bit-packed digital engine.

Replaces the reference's event-driven update-table worklist
(circuits/circuit.h:298-354 + per-model ``update_digital_clk``) with a
jitted tick over uint32 bit-planes (32 stimulus lanes/word):

    tick = sample analog pins -> force INPUT values -> transport delays
           -> sequential devices (edge-triggered, d_ff.h:59-66 semantics)
           -> levelled combinational sweeps
           -> bounded fixpoint for latch/feedback groups (budget idea of
              circuit.h:317) -> analog drive extraction.

Behavioural notes vs the reference:
* gates never output Z; Z at a gate input behaves as X (node.h tables);
* toggling an X flip-flop yields L — the reference's enum->bool cast does
  exactly this (t_ff.h / jk_ff.h: ``!static_cast<bool>(q)`` with X==2);
* analog->digital sampling is plain Ll/Hl thresholding per net (the
  Tsu/Th unsteady-state automaton of and.h:161-363 is tracked per tick
  granularity, not yet per TR-substep);
* digital->analog drives: H -> Hl volts, L/X -> Ll (and.h:365-398 "UB"
  comment), Z -> no drive (slot inactive).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import logic
from .ir import DigitalIR, Segment, lower_digital, bind_analog_indices
from ..netlist.netlist import Netlist

U32 = jnp.uint32
FULL = 0xFFFFFFFF


def _eff(v, u):
    """Z -> X mapping at device inputs (read_dn in every seq model)."""
    return v & ~u, u


def _is_h(v, u):
    return v & ~u


def _is_l(v, u):
    return ~v & ~u


def _bcast(mask_bool):
    """bool (n,) -> uint32 plane with all lanes equal."""
    return jnp.where(mask_bool, jnp.uint32(FULL), jnp.uint32(0))


# ---------------------------------------------------------------------------
# combinational opcode kernels: (planes...) -> (v, u) per output
# ---------------------------------------------------------------------------

_COMB2 = {
    "AND": logic.op_and, "OR": logic.op_or, "XOR": logic.op_xor,
    "XNOR": logic.op_xnor, "NAND": logic.op_nand, "NOR": logic.op_nor,
    "IMP": logic.op_imp, "NIMP": logic.op_nimp,
    "CASE_EQ": logic.op_case_eq, "RESOLVE2": logic.op_resolve2,
}
_COMB1 = {"NOT": logic.op_not, "YES": logic.op_yes,
          "IS_UNKNOWN": logic.op_is_unknown}


# ---------------------------------------------------------------------------
# fused level evaluation: every basic 1/2-input gate in a level becomes
# one gather -> (conditional input inversion) -> {AND,OR,XOR} cores ->
# (conditional output inversion) -> scatter kernel.  This collapses the
# per-level kernel count from one-per-opcode to one, which dominates
# tick latency for deep netlists (a 32-bit CPU has 150+ levels).
# ---------------------------------------------------------------------------

# op -> (invert_a, invert_b, invert_out, core) with core 0=AND 1=OR 2=XOR
_GEN2_ENC = {
    "AND": (0, 0, 0, 0), "NAND": (0, 0, 1, 0),
    "OR": (0, 0, 0, 1), "NOR": (0, 0, 1, 1),
    "XOR": (0, 0, 0, 2), "XNOR": (0, 0, 1, 2),
    "IMP": (1, 0, 0, 1), "NIMP": (0, 1, 0, 0),
    # 1-input gates with b aliased to a
    "NOT": (0, 0, 1, 0), "YES": (0, 0, 0, 0),
}


class _FusedLevel:
    __slots__ = ("inp", "out", "inv_a", "inv_b", "inv_o",
                 "m_or", "m_xor")

    def __init__(self, gates):
        import numpy as _np
        n = len(gates)
        inp = _np.zeros((n, 2), _np.int32)
        out = _np.zeros(n, _np.int32)
        masks = _np.zeros((5, n), _np.uint32)
        for k, (op, a, b, o) in enumerate(gates):
            ia, ib, io, core = _GEN2_ENC[op]
            inp[k, 0] = a
            inp[k, 1] = b
            out[k] = o
            masks[0, k] = FULL if ia else 0
            masks[1, k] = FULL if ib else 0
            masks[2, k] = FULL if io else 0
            masks[3, k] = FULL if core == 1 else 0
            masks[4, k] = FULL if core == 2 else 0
        self.inp = jnp.asarray(inp)
        self.out = jnp.asarray(out)
        self.inv_a = jnp.asarray(masks[0])
        self.inv_b = jnp.asarray(masks[1])
        self.inv_o = jnp.asarray(masks[2])
        self.m_or = jnp.asarray(masks[3])
        self.m_xor = jnp.asarray(masks[4])

    def eval(self, sv, su):
        va, ua = sv[self.inp[:, 0]], su[self.inp[:, 0]]
        vb, ub = sv[self.inp[:, 1]], su[self.inp[:, 1]]
        # conditional Kleene inversion (op_not: v' = ~v & ~u)
        va = (va & ~self.inv_a) | (~va & ~ua & self.inv_a)
        vb = (vb & ~self.inv_b) | (~vb & ~ub & self.inv_b)
        and_v, and_u = logic.op_and(va, ua, vb, ub)
        or_v, or_u = logic.op_or(va, ua, vb, ub)
        xor_v, xor_u = logic.op_xor(va, ua, vb, ub)
        keep = ~self.m_or & ~self.m_xor
        v = (and_v & keep) | (or_v & self.m_or) | (xor_v & self.m_xor)
        u = (and_u & keep) | (or_u & self.m_or) | (xor_u & self.m_xor)
        v = (v & ~self.inv_o) | (~v & ~u & self.inv_o)
        return sv.at[self.out].set(v), su.at[self.out].set(u)


def _fuse_levels(levels):
    """[[Segment]] -> [(fused|None, [leftover Segment])] per level."""
    out = []
    for level in levels:
        gates = []
        rest = []
        for seg in level:
            if seg.op in _GEN2_ENC:
                inp = seg.inputs
                for k in range(len(seg.outputs)):
                    a = int(inp[k, 0])
                    b = int(inp[k, 1]) if inp.shape[1] > 1 else a
                    gates.append((seg.op, a, b, int(seg.outputs[k, 0])))
            else:
                rest.append(seg)
        out.append((_FusedLevel(gates) if gates else None, rest))
    return out


def _eval_comb_segment(seg: Segment, sv, su):
    """Evaluate one opcode segment; returns updated (sv, su)."""
    op = seg.op
    inp = jnp.asarray(seg.inputs)
    out = jnp.asarray(seg.outputs)
    va, ua = sv[inp[:, 0]], su[inp[:, 0]]
    if op in _COMB1:
        v, u = _COMB1[op](va, ua)
        return sv.at[out[:, 0]].set(v), su.at[out[:, 0]].set(u)
    vb, ub = sv[inp[:, 1]], su[inp[:, 1]]
    if op in _COMB2:
        v, u = _COMB2[op](va, ua, vb, ub)
        return sv.at[out[:, 0]].set(v), su.at[out[:, 0]].set(u)
    if op == "TRI":
        v, u = logic.op_tri_state(va, ua, vb, ub)
        return sv.at[out[:, 0]].set(v), su.at[out[:, 0]].set(u)
    if op == "HALF_ADDER":
        s_v, s_u = logic.op_xor(va, ua, vb, ub)
        c_v, c_u = logic.op_and(va, ua, vb, ub)
        sv = sv.at[out[:, 0]].set(s_v).at[out[:, 1]].set(c_v)
        su = su.at[out[:, 0]].set(s_u).at[out[:, 1]].set(c_u)
        return sv, su
    if op == "FULL_ADDER":
        vc, uc = sv[inp[:, 2]], su[inp[:, 2]]
        xv, xu = logic.op_xor(va, ua, vb, ub)
        s_v, s_u = logic.op_xor(xv, xu, vc, uc)
        g1v, g1u = logic.op_and(va, ua, vb, ub)
        g2v, g2u = logic.op_and(vc, uc, xv, xu)
        c_v, c_u = logic.op_or(g1v, g1u, g2v, g2u)
        sv = sv.at[out[:, 0]].set(s_v).at[out[:, 1]].set(c_v)
        su = su.at[out[:, 0]].set(s_u).at[out[:, 1]].set(c_u)
        return sv, su
    if op == "HALF_SUBTRACTOR":
        d_v, d_u = logic.op_xor(va, ua, vb, ub)
        nav, nau = logic.op_not(va, ua)
        b_v, b_u = logic.op_and(nav, nau, vb, ub)
        sv = sv.at[out[:, 0]].set(d_v).at[out[:, 1]].set(b_v)
        su = su.at[out[:, 0]].set(d_u).at[out[:, 1]].set(b_u)
        return sv, su
    if op == "FULL_SUBTRACTOR":
        vc, uc = sv[inp[:, 2]], su[inp[:, 2]]
        xv, xu = logic.op_xor(va, ua, vb, ub)
        d_v, d_u = logic.op_xor(xv, xu, vc, uc)
        nav, nau = logic.op_not(va, ua)
        nxv, nxu = logic.op_not(xv, xu)
        g1v, g1u = logic.op_and(nav, nau, vb, ub)
        g2v, g2u = logic.op_and(nxv, nxu, vc, uc)
        b_v, b_u = logic.op_or(g1v, g1u, g2v, g2u)
        sv = sv.at[out[:, 0]].set(d_v).at[out[:, 1]].set(b_v)
        su = su.at[out[:, 0]].set(d_u).at[out[:, 1]].set(b_u)
        return sv, su
    if op == "MUL2":
        a0v, a0u = va, ua
        a1v, a1u = sv[inp[:, 1]], su[inp[:, 1]]
        b0v, b0u = sv[inp[:, 2]], su[inp[:, 2]]
        b1v, b1u = sv[inp[:, 3]], su[inp[:, 3]]
        p0v, p0u = logic.op_and(a0v, a0u, b0v, b0u)
        t1v, t1u = logic.op_and(a1v, a1u, b0v, b0u)
        t2v, t2u = logic.op_and(a0v, a0u, b1v, b1u)
        p1v, p1u = logic.op_xor(t1v, t1u, t2v, t2u)
        c1v, c1u = logic.op_and(t1v, t1u, t2v, t2u)
        t3v, t3u = logic.op_and(a1v, a1u, b1v, b1u)
        p2v, p2u = logic.op_xor(t3v, t3u, c1v, c1u)
        p3v, p3u = logic.op_and(t3v, t3u, c1v, c1u)
        for k, (pv, pu) in enumerate(((p0v, p0u), (p1v, p1u),
                                      (p2v, p2u), (p3v, p3u))):
            sv = sv.at[out[:, k]].set(pv)
            su = su.at[out[:, k]].set(pu)
        return sv, su
    raise ValueError(f"unknown comb op {op}")


def _latch_eval(seg: Segment, sv, su, st):
    """DLATCH (d_latch.h:57-70): en H -> q=d(eff), en X -> X, en L hold."""
    inp = jnp.asarray(seg.inputs)
    out = jnp.asarray(seg.outputs)
    dv, du = _eff(sv[inp[:, 0]], su[inp[:, 0]])
    ev, eu = _eff(sv[inp[:, 1]], su[inp[:, 1]])
    en_h = _is_h(ev, eu)
    en_x = eu
    qv, qu = st["q_v"], st["q_u"]
    qv = (qv & ~en_h & ~en_x) | (dv & en_h)
    qu = (qu & ~en_h & ~en_x) | (du & en_h) | en_x
    st2 = {"q_v": qv, "q_u": qu}
    return sv.at[out[:, 0]].set(qv), su.at[out[:, 0]].set(qu), st2


def _edge_and_hist(sv, su, inp_col, st):
    cv, cu = _eff(sv[inp_col], su[inp_col])
    rise = _is_l(st["lc_v"], st["lc_u"]) & _is_h(cv, cu)
    known = ~cu
    lc_v = (st["lc_v"] & ~known) | (cv & known)
    lc_u = st["lc_u"] & ~known
    return rise, lc_v, lc_u


def _eval_seq_segment(seg: Segment, sv, su, st, analog_v):
    """One sequential segment; returns (sv, su, new_state)."""
    op = seg.op
    inp = jnp.asarray(seg.inputs)
    out = jnp.asarray(seg.outputs)

    if op == "SCHMITT":
        fp = jnp.asarray(seg.fparams)
        an = jnp.asarray(seg.anodes)
        av_ext = jnp.concatenate([analog_v, jnp.zeros(1, analog_v.dtype)])
        volts = av_ext[an[:, 0]]
        go_h = volts >= fp[:, 2]
        go_l = volts <= fp[:, 1]
        prev_v, prev_u = st["q_v"], st["q_u"]
        raw_v = jnp.where(go_h, jnp.uint32(FULL),
                          jnp.where(go_l, jnp.uint32(0), prev_v))
        raw_u = jnp.where(go_h | go_l, jnp.uint32(0), prev_u)
        inv = fp[:, 0] > 0.5
        out_v = jnp.where(inv, ~raw_v & ~raw_u, raw_v)
        out_u = raw_u
        st2 = {"q_v": raw_v, "q_u": raw_u}
        return (sv.at[out[:, 0]].set(out_v),
                su.at[out[:, 0]].set(out_u), st2)

    if op == "CMP":
        an = jnp.asarray(seg.anodes)
        av_ext = jnp.concatenate([analog_v, jnp.zeros(1, analog_v.dtype)])
        va_ = av_ext[an[:, 0]]
        vb_ = av_ext[an[:, 1]]
        h = va_ >= vb_
        v = jnp.where(h, jnp.uint32(FULL), jnp.uint32(0))
        u = jnp.zeros_like(v)
        return sv.at[out[:, 0]].set(v), su.at[out[:, 0]].set(u), st

    rise, lc_v, lc_u = _edge_and_hist(sv, su, inp[:, -1] if op in
                                      ("JKFF",) else inp[:, 1], st)
    # NOTE: clock column per op: DFF/DFF_ARSTN/TFF/TBARFF -> col 1;
    # JKFF -> col 2; COUNTER4/RANDOM4 -> col 0.
    if op in ("COUNTER4", "RANDOM4"):
        rise, lc_v, lc_u = _edge_and_hist(sv, su, inp[:, 0], st)
    elif op == "JKFF":
        rise, lc_v, lc_u = _edge_and_hist(sv, su, inp[:, 2], st)

    qv, qu = st.get("q_v"), st.get("q_u")

    if op == "DFF" or op == "DFF_ARSTN":
        dv, du = _eff(sv[inp[:, 0]], su[inp[:, 0]])
        qv = (qv & ~rise) | (dv & rise)
        qu = (qu & ~rise) | (du & rise)
        if op == "DFF_ARSTN":
            av, au = _eff(sv[inp[:, 2]], su[inp[:, 2]])
            a_l = _is_l(av, au)
            a_x = au
            qv = qv & ~a_l & ~a_x
            qu = (qu & ~a_l) | a_x
        st2 = {"q_v": qv, "q_u": qu, "lc_v": lc_v, "lc_u": lc_u}
        return sv.at[out[:, 0]].set(qv), su.at[out[:, 0]].set(qu), st2

    if op == "JKFF":
        jv, ju = _eff(sv[inp[:, 0]], su[inp[:, 0]])
        kv, ku = _eff(sv[inp[:, 1]], su[inp[:, 1]])
        s_ = _is_h(jv, ju) & _is_l(kv, ku)
        r_ = _is_l(jv, ju) & _is_h(kv, ku)
        t_ = _is_h(jv, ju) & _is_h(kv, ku)
        h_ = _is_l(jv, ju) & _is_l(kv, ku)
        x_ = ~(s_ | r_ | t_ | h_)
        tog = _is_l(qv, qu)          # enum->bool cast: toggling X gives L
        nv = s_ | (t_ & tog) | (h_ & qv)
        nu = (h_ & qu) | x_
        qv = (qv & ~rise) | (nv & rise)
        qu = (qu & ~rise) | (nu & rise)
        st2 = {"q_v": qv, "q_u": qu, "lc_v": lc_v, "lc_u": lc_u}
        return sv.at[out[:, 0]].set(qv), su.at[out[:, 0]].set(qu), st2

    if op in ("TFF", "TBARFF"):
        tv, tu = _eff(sv[inp[:, 0]], su[inp[:, 0]])
        act = _is_h(tv, tu) if op == "TFF" else _is_l(tv, tu)
        t_x = tu
        tog = _is_l(qv, qu)
        nv = (act & tog) | (~act & ~t_x & qv)
        nu = (~act & ~t_x & qu) | t_x
        qv = (qv & ~rise) | (nv & rise)
        qu = (qu & ~rise) | (nu & rise)
        st2 = {"q_v": qv, "q_u": qu, "lc_v": lc_v, "lc_u": lc_u}
        return sv.at[out[:, 0]].set(qv), su.at[out[:, 0]].set(qu), st2

    if op == "COUNTER4":
        # inputs: clk(0), en(1); outputs q3..q0 (counter4.h:112-160)
        env_, enu = sv[inp[:, 1]], su[inp[:, 1]]
        en_h = env_                    # H or Z count as enabled
        en_x = ~env_ & enu             # X only
        bits = st["bits"]              # (n, 4) planes b0..b3
        un = st["un"]
        carry = rise & en_h & ~un
        new_bits = []
        for b in range(4):
            nb = bits[:, b] ^ carry
            carry = bits[:, b] & carry
            new_bits.append(nb)
        bits = jnp.stack(new_bits, axis=1)
        un = un | (rise & en_x)
        st2 = {"bits": bits, "un": un, "lc_v": lc_v, "lc_u": lc_u}
        # outputs: q3, q2, q1, q0
        for k in range(4):
            bit = 3 - k
            sv = sv.at[out[:, k]].set(bits[:, bit] & ~un)
            su = su.at[out[:, k]].set(un)
        return sv, su, st2

    if op == "RANDOM4":
        # inputs: clk(0), reset_n(1) (random_generator4.h:114-160)
        rv, ru = sv[inp[:, 1]], su[inp[:, 1]]
        rst_l = _is_l(rv, ru)
        rst_x = ~rv & ru               # X (Z counts as released)
        bits = st["bits"]
        un = st["un"]
        b3, b2 = bits[:, 3], bits[:, 2]
        feedback = ~(b3 ^ b2)          # (b3^b2)^1
        step = rise & ~rst_l & ~rst_x & ~un
        shifted = jnp.stack([
            (feedback & step) | (bits[:, 0] & ~step),
            (bits[:, 0] & step) | (bits[:, 1] & ~step),
            (bits[:, 1] & step) | (bits[:, 2] & ~step),
            (bits[:, 2] & step) | (bits[:, 3] & ~step),
        ], axis=1)
        bits = jnp.where(rst_l[:, None], jnp.uint32(0), shifted)
        un = (un | rst_x) & ~rst_l
        st2 = {"bits": bits, "un": un, "lc_v": lc_v, "lc_u": lc_u}
        for k in range(4):
            bit = 3 - k
            sv = sv.at[out[:, k]].set(bits[:, bit] & ~un)
            su = su.at[out[:, k]].set(un)
        return sv, su, st2

    raise ValueError(f"unknown seq op {op}")


# ---------------------------------------------------------------------------
# tick builder
# ---------------------------------------------------------------------------

def _input_cone_levels(ir: DigitalIR):
    """Per level, the subset of comb gates in the forward cone of the
    tick's mutable sources (forced INPUTs, analog-sampled nets,
    transport-delay outputs).  The pre-sequential settle only needs
    these: everything else is already settled from the previous tick's
    final pass."""
    dirty = set()
    for inst, out_sigs in ir.inputs:
        dirty.update(int(s) for s in out_sigs)
    dirty.update(int(s) for s in np.asarray(ir.samp_sig).ravel())
    if ir.tick_delays is not None:
        dirty.update(int(s) for s in ir.tick_delays.outputs[:, 0])
    for vm in ir.vmods:            # embedded-module outputs are forced
        for s in vm[4]:
            dirty.update(int(x) for x in np.asarray(s).ravel())

    out = []
    for level in ir.levels:
        lvl = []
        for seg in level:
            keep = []
            for k in range(len(seg.outputs)):
                if any(int(x) in dirty for x in seg.inputs[k]
                       if int(x) >= 0):
                    keep.append(k)
                    for x in seg.outputs[k]:
                        if int(x) >= 0:
                            dirty.add(int(x))
            if keep:
                lvl.append(Segment(
                    op=seg.op,
                    inputs=seg.inputs[keep],
                    outputs=seg.outputs[keep],
                    instances=[seg.instances[k] for k in keep]
                    if seg.instances else [],
                    anodes=(seg.anodes[keep]
                            if seg.anodes is not None else None),
                    fparams=(seg.fparams[keep]
                             if seg.fparams is not None else None)))
        out.append(lvl)
    return out


def build_tick(ir: DigitalIR, n_analog_nodes: int):
    latch_segs = [s for s in ir.seq if s.op == "DLATCH"]
    seq_segs = [s for s in ir.seq if s.op != "DLATCH"]
    has_fixpoint = bool(ir.cyclic) or bool(latch_segs)
    fused = _fuse_levels(ir.levels)
    # pre-sequential settle shrinks to the input cone when no latch /
    # feedback fixpoint is involved (then the full pass must run anyway)
    pre_fused = (fused if has_fixpoint
                 else _fuse_levels(_input_cone_levels(ir)))

    def comb_pass(sv, su, latch_st, levels=None):
        for fl, rest in (fused if levels is None else levels):
            if fl is not None:
                sv, su = fl.eval(sv, su)
            for seg in rest:
                sv, su = _eval_comb_segment(seg, sv, su)
        new_latch = []
        for i, seg in enumerate(latch_segs):
            sv, su, st2 = _latch_eval(seg, sv, su, latch_st[i])
            new_latch.append(st2)
        for seg in ir.cyclic:
            sv, su = _eval_comb_segment(seg, sv, su)
        return sv, su, new_latch

    def tick(sv, su, seq_state, forced_sig, forced_v, forced_u, analog_v):
        # 1. analog->digital sampling (threshold per net)
        if ir.samp_sig.size:
            av_ext = jnp.concatenate(
                [analog_v, jnp.zeros(1, analog_v.dtype)])
            volts = av_ext[jnp.asarray(ir.samp_node)]
            h = volts >= jnp.asarray(ir.samp_hl)
            l = volts <= jnp.asarray(ir.samp_ll)
            v = _bcast(h)
            u = jnp.where(h | l, jnp.uint32(0), jnp.uint32(FULL))
            sv = sv.at[jnp.asarray(ir.samp_sig)].set(v)
            su = su.at[jnp.asarray(ir.samp_sig)].set(u)

        # 2. forced INPUT values (before_all_clk, input.h:94+)
        if forced_sig.size:
            sv = sv.at[forced_sig].set(forced_v)
            su = su.at[forced_sig].set(forced_u)

        # 3. transport delays (tick_delay.h: out <- held; held <- in)
        if ir.tick_delays is not None:
            seg = ir.tick_delays
            inp = jnp.asarray(seg.inputs)
            out = jnp.asarray(seg.outputs)
            held_v, held_u = seq_state["TICK_DELAY"]["h_v"], \
                seq_state["TICK_DELAY"]["h_u"]
            in_v, in_u = _eff(sv[inp[:, 0]], su[inp[:, 0]])
            sv = sv.at[out[:, 0]].set(held_v)
            su = su.at[out[:, 0]].set(held_u)
            seq_state = dict(seq_state)
            seq_state["TICK_DELAY"] = {"h_v": in_v, "h_u": in_u}

        # 4a. pre-sequential comb settle: clock/reset/enable nets that
        # pass through gates must reflect this tick's inputs before the
        # FFs sample them (the worklist engine interleaves naturally;
        # the behavioral simulator pushes inputs down first — same here).
        # Only the forced-input cone can have changed since the previous
        # tick's final settle, so only that static subset is evaluated.
        latch_st = [seq_state[f"DLATCH{i}"] for i in range(len(latch_segs))]
        sv, su, latch_st = comb_pass(sv, su, latch_st, levels=pre_fused)

        # 4b. sequential devices
        seq_state = dict(seq_state)
        for seg in seq_segs:
            key = seg.op
            sv, su, st2 = _eval_seq_segment(seg, sv, su,
                                            seq_state.get(key, {}), analog_v)
            seq_state[key] = st2

        # 5/6. combinational settle
        if not has_fixpoint:
            sv, su, latch_st = comb_pass(sv, su, latch_st)
        else:
            def cond(c):
                sv, su, ls, prev_v, prev_u, it = c
                changed = jnp.any(sv != prev_v) | jnp.any(su != prev_u)
                return (changed | (it == 0)) & (it < ir.cyclic_budget)

            def body(c):
                sv, su, ls, _pv, _pu, it = c
                nv, nu, nls = comb_pass(sv, su, ls)
                return (nv, nu, nls, sv, su, it + 1)

            init = (sv, su, latch_st, sv + jnp.uint32(1), su,
                    jnp.int32(0))
            sv, su, latch_st, _, _, _ = jax.lax.while_loop(cond, body, init)
        for i in range(len(latch_segs)):
            seq_state[f"DLATCH{i}"] = latch_st[i]

        # 7. drive extraction (lane 0)
        if ir.drv_sig.size:
            dsig = jnp.asarray(ir.drv_sig)
            v0 = sv[dsig] & jnp.uint32(1)
            u0 = su[dsig] & jnp.uint32(1)
            is_z = (v0 == 1) & (u0 == 1)
            is_h = (v0 == 1) & (u0 == 0)
            volt = jnp.where(is_h, jnp.asarray(ir.drv_hl),
                             jnp.asarray(ir.drv_ll))
            active = jnp.where(is_z, 0.0, 1.0)
            drives = {"node": jnp.asarray(ir.drv_node),
                      "active": active, "v": volt}
        else:
            drives = None
        return sv, su, seq_state, drives

    return tick


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

class DigitalEngine:
    """Owns the digital IR, planes, and sequential state across ticks."""

    def __init__(self, nl: Netlist, env):
        self.nl = nl
        self.env = env
        self.ir: Optional[DigitalIR] = lower_digital(nl)
        self.n_drive_slots = (len(self.ir.drv_sig)
                              if self.ir is not None else 0)
        self._tick_jit = None
        self.sv = None
        self.su = None
        self.seq_state = None
        self._n_analog = 0
        self._us_code = None     # Tsu/Th unsteady-state automata

    def bind(self, n_analog_nodes: int):
        """Resolve analog node indices; must follow analog lowering."""
        if self.ir is None:
            return
        bind_analog_indices(self.ir)
        self._n_analog = n_analog_nodes
        self._tick_fn = build_tick(self.ir, n_analog_nodes)
        self._tick_jit = jax.jit(self._tick_fn)
        self._run_jit = None
        self.reset_state()

    def reset_state(self):
        ir = self.ir
        n = ir.n_signals
        self.sv = jnp.zeros(n, U32)
        self.su = jnp.full(n, jnp.uint32(FULL))       # everything starts X
        st: Dict[str, Dict] = {}
        if ir.tick_delays is not None:
            k = len(ir.tick_delays.instances)
            st["TICK_DELAY"] = {"h_v": jnp.zeros(k, U32),
                                "h_u": jnp.full(k, jnp.uint32(FULL))}
        li = 0
        for seg in ir.seq:
            k = len(seg.instances)
            if seg.op == "DLATCH":
                st[f"DLATCH{li}"] = {"q_v": jnp.zeros(k, U32),
                                     "q_u": jnp.full(k, jnp.uint32(FULL))}
                li += 1
            elif seg.op in ("COUNTER4", "RANDOM4"):
                bits = jnp.zeros((k, 4), U32)
                if seg.op == "RANDOM4" and seg.fparams is not None:
                    seeds = seg.fparams[:, 0].astype(np.uint32)
                    b = np.zeros((k, 4), np.uint32)
                    for i in range(k):
                        for j in range(4):
                            if (int(seeds[i]) >> j) & 1:
                                b[i, j] = FULL
                    bits = jnp.asarray(b)
                st[seg.op] = {"bits": bits, "un": jnp.zeros(k, U32),
                              "lc_v": jnp.zeros(k, U32),
                              "lc_u": jnp.full(k, jnp.uint32(FULL))}
            elif seg.op == "SCHMITT":
                st[seg.op] = {"q_v": jnp.zeros(k, U32),
                              "q_u": jnp.full(k, jnp.uint32(FULL))}
            elif seg.op == "CMP":
                pass
            else:
                st[seg.op] = {"q_v": jnp.zeros(k, U32),
                              "q_u": jnp.full(k, jnp.uint32(FULL)),
                              "lc_v": jnp.zeros(k, U32),
                              "lc_u": jnp.full(k, jnp.uint32(FULL))}
        self.seq_state = st

    # -- Tsu/Th unsteady-state automata (and.h:161-363) ----------------------

    def has_unsteady(self) -> bool:
        ir = self.ir
        return (ir is not None and ir.samp_sig.size > 0 and
                ir.samp_tsu is not None and
                bool(np.any((ir.samp_tsu > 0) | (ir.samp_th > 0))))

    def observe_analog(self, analog_v, t: float) -> None:
        """Advance the setup/hold unsteady-state automata for
        threshold-sampled nets at time ``t`` (and.h:161-363: a crossing
        puts the input in X with the target latched in USR; the target
        commits only after it has held for Tsu/Th of *transient* time,
        and reverts if the voltage falls back).  Called at every
        digital tick and — the per-TR-substep upgrade over the
        reference's per-tick sampling — at every accepted transient
        substep, so short X windows and early commits follow the
        analog trajectory rather than tick endpoints."""
        if not self.has_unsteady():
            return
        ir = self.ir
        if self._us_code is None:
            k = ir.samp_sig.size
            self._us_code = np.full(k, 2, np.int8)   # starts X
            self._us_usr = np.full(k, 2, np.int8)
            self._us_mark = np.zeros(k, np.float64)
        av = np.asarray(analog_v)
        for i in range(ir.samp_sig.size):
            tsu = float(ir.samp_tsu[i])
            th = float(ir.samp_th[i])
            if tsu <= 0.0 and th <= 0.0:
                continue                 # plain thresholding (in-jit)
            nidx = int(ir.samp_node[i])
            v = float(av[nidx]) if 0 <= nidx < len(av) else 0.0
            hl = float(ir.samp_hl[i])
            ll = float(ir.samp_ll[i])
            if t <= 0.0:
                # no transient time axis yet (OP interleave): setup/
                # hold windows are transient-time phenomena, so track
                # the raw threshold; the automaton takes over from this
                # settled state once TR advances the clock
                self._us_code[i] = 1 if v >= hl else (
                    0 if v <= ll else 2)
                self._us_usr[i] = 2
                self._us_mark[i] = 0.0
                continue
            code = int(self._us_code[i])
            usr = int(self._us_usr[i])
            mark = float(self._us_mark[i])
            if code == 0:                              # L
                if v >= hl:
                    if tsu > 0.0:
                        code, usr, mark = 2, 1, t
                    else:
                        code = 1
            elif code == 1:                            # H
                if v <= ll:
                    if th > 0.0:
                        code, usr, mark = 2, 0, t
                    else:
                        code = 0
            else:                                      # X
                if usr == 0:                           # pending L
                    if v <= ll:
                        if t - mark >= tsu:
                            code = 0
                    else:
                        code = 1                       # revert
                elif usr == 1:                         # pending H
                    if v >= hl:
                        if t - mark >= th:
                            code = 1
                    else:
                        code = 0                       # revert
                else:                                  # initial X
                    if v >= hl:
                        if t - mark >= th:
                            code = 1
                    elif v <= ll:
                        if t - mark >= tsu:
                            code = 0
                    else:
                        mark = t
            self._us_code[i] = code
            self._us_usr[i] = usr
            self._us_mark[i] = mark

    def _unsteady_forced(self):
        """(sigs, v, u) overriding the in-jit raw thresholding with the
        automaton codes for Tsu/Th-active sampled nets."""
        if self._us_code is None:
            return None
        ir = self.ir
        act = (ir.samp_tsu > 0) | (ir.samp_th > 0)
        if not act.any():
            return None
        code = self._us_code[act]
        v = np.where(code == 1, np.uint32(FULL), np.uint32(0))
        u = np.where(code == 2, np.uint32(FULL), np.uint32(0))
        return (ir.samp_sig[act].astype(np.int32),
                v.astype(np.uint32), u.astype(np.uint32))

    def _forced_arrays(self):
        """Pack INPUT/INPUT8 attribute values into forced-signal arrays."""
        fs, fv, fu = self._forced_arrays_np()
        return jnp.asarray(fs), jnp.asarray(fv), jnp.asarray(fu)

    def _forced_arrays_np(self):
        """Numpy variant of `_forced_arrays` — the per-tick native path
        must stay off the device (each jnp.asarray is a ~100us
        device_put, dominating small-circuit tick latency through the
        C ABI)."""
        sigs, vs, us = [], [], []
        for inst, out_sigs in self.ir.inputs:
            if inst.mdef.digital_op == "INPUT":
                code = int(inst.params.get("boolean", 2)) & 3
                v = FULL if (code & 1) else 0
                u = FULL if (code & 2) else 0
                sigs.append(out_sigs[0])
                vs.append(v)
                us.append(u)
            else:  # INPUT8: pins b7..b0, value bit per pin
                val = int(inst.params.get("value", 0)) & 0xFF
                for k, s in enumerate(out_sigs):
                    bit = 7 - k
                    sigs.append(s)
                    vs.append(FULL if (val >> bit) & 1 else 0)
                    us.append(0)
        return (np.array(sigs, np.int32), np.array(vs, np.uint32),
                np.array(us, np.uint32))

    def _samp_map(self):
        """sig -> (analog node index, ll, hl) for threshold-sampled nets."""
        if not hasattr(self, "_smap"):
            self._smap = {int(s): (int(n), float(ll), float(hl))
                          for s, n, ll, hl in zip(
                              self.ir.samp_sig, self.ir.samp_node,
                              self.ir.samp_ll, self.ir.samp_hl)}
        return self._smap

    def _run_vmods(self, analog_v: np.ndarray, forced=None):
        """Host pre-pass: run embedded Verilog modules one behavioral
        tick (verilog_module.h:212-303) and return their outputs as
        forced-signal triples.  INPUT devices conceptually run first in
        the before-phase, so their forced values overlay the snapshot
        the module samples."""
        from ..verilog.simulate import simulate as bsim
        from ..verilog.fourstate import Val
        sigs, vs, us = [], [], []
        sv = np.asarray(self.sv).copy()
        su = np.asarray(self.su).copy()
        if forced is not None:
            f_sig, f_v, f_u = forced
            sv[np.asarray(f_sig)] = np.asarray(f_v)
            su[np.asarray(f_sig)] = np.asarray(f_u)
        smap = self._samp_map()
        for inst, in_ports, in_sigs, out_ports, out_sigs in self.ir.vmods:
            rt = inst.runtime["rt"]
            inst.runtime["tick"] += 1
            tick = inst.runtime["tick"]
            for pname, sig in zip(in_ports, in_sigs):
                if sig in smap:
                    nidx, ll, hl = smap[sig]
                    volt = analog_v[nidx] if 0 <= nidx < len(analog_v) \
                        else 0.0
                    code = 1 if volt >= hl else (0 if volt <= ll else 2)
                else:
                    code = int((sv[sig] & 1) | ((su[sig] & 1) << 1))
                w = rt.values[pname].width
                if code == 0:
                    rt.values[pname] = Val.from_int(0, w)
                elif code == 1:
                    rt.values[pname] = Val.from_int(1, w)
                else:
                    rt.values[pname] = Val.all_x(w)
            bsim(rt, tick)
            for pname, sig in zip(out_ports, out_sigs):
                val = rt.values[pname]
                code = val.bit(0)
                sigs.append(sig)
                vs.append(0xFFFFFFFF if (code & 1) else 0)
                us.append(0xFFFFFFFF if (code & 2) else 0)
        return sigs, vs, us

    def tick(self, analog_v: np.ndarray):
        """One digital_clk(); returns drive dict (or None)."""
        if self.ir is None:
            return None
        if self._native_tick_ok():
            fs, fv, fu = self._forced_arrays_np()
            self._run_ticks_native(fs, fv[None], fu[None])
            return None
        fs, fv, fu = self._forced_arrays()
        us = self._unsteady_forced()
        if us is not None:
            # the automaton's 4-state codes supersede the jitted raw
            # thresholding for Tsu/Th-active sampled nets
            fs = jnp.concatenate([fs, jnp.asarray(us[0])])
            fv = jnp.concatenate([fv, jnp.asarray(us[1])])
            fu = jnp.concatenate([fu, jnp.asarray(us[2])])
        if self.ir.vmods:
            vsig, vv, vu = self._run_vmods(np.asarray(analog_v),
                                           (fs, fv, fu))
            if vsig:
                fs = jnp.concatenate([fs, jnp.asarray(
                    np.array(vsig, np.int32))])
                fv = jnp.concatenate([fv, jnp.asarray(
                    np.array(vv, np.uint32))])
                fu = jnp.concatenate([fu, jnp.asarray(
                    np.array(vu, np.uint32))])
        av = jnp.asarray(analog_v, jnp.float64)
        self.sv, self.su, self.seq_state, drives = self._tick_jit(
            self.sv, self.su, self.seq_state, fs, fv, fu, av)
        self._writeback()
        return drives

    def run_ticks(self, forced_sig, forced_v, forced_u, analog_v=None):
        """Run T ticks entirely on device (lax.scan over the tick
        kernel) with a per-tick forced-input schedule — the TPU-native
        replacement for calling digital_clk() in a host loop when no
        analog alternation or VERILOG_MODULE is involved.

        ``forced_sig``: int32[S] signal indices (fixed across ticks);
        ``forced_v``/``forced_u``: uint32[T, S] per-tick bit planes.
        Returns the per-tick (sv, su) history stacked [T, n_signals]
        (lane semantics unchanged); final state is committed.
        """
        if self.ir is None:
            raise ValueError("no digital IR")
        if self.ir.vmods:
            raise ValueError("run_ticks: VERILOG_MODULE devices need "
                             "per-tick host interaction; use tick()")
        if analog_v is None:
            analog_v = np.zeros(self._n_analog, np.float64)

        from . import turbo
        mode = turbo.backend()
        if mode == "auto":
            mode = turbo.pick_auto(self.ir)
        if mode in ("native", "turbo", "turbo_xla"):
            ok = turbo.eligible(self.ir)
            if mode == "native" and \
                    turbo.eligible(self.ir, allow_cyclic=True):
                from . import native_run
                if native_run.available():
                    return self._run_ticks_native(forced_sig, forced_v,
                                                  forced_u)
                mode = "turbo"       # toolchain missing: MXU fallback
            if ok:
                return self._run_ticks_turbo(forced_sig, forced_v,
                                             forced_u, mode)
            import os as _os
            if _os.environ.get("PE_TPU_DIGITAL") in ("native", "turbo",
                                                     "turbo_xla"):
                raise ValueError(
                    "PE_TPU_DIGITAL forces the turbo/native path but "
                    "the design is not eligible")

        av = jnp.asarray(analog_v, jnp.float64)
        fs = jnp.asarray(np.asarray(forced_sig, np.int32))
        FV = jnp.asarray(np.asarray(forced_v, np.uint32))
        FU = jnp.asarray(np.asarray(forced_u, np.uint32))

        if self._run_jit is None:
            tick_fn = self._tick_fn

            def run(sv, su, st, fs, FV, FU, av):
                def step(carry, xs):
                    sv, su, st = carry
                    fv, fu = xs
                    sv, su, st, _drv = tick_fn(sv, su, st, fs, fv, fu,
                                               av)
                    return (sv, su, st), (sv, su)
                (sv, su, st), hist = jax.lax.scan(
                    step, (sv, su, st), (FV, FU))
                return sv, su, st, hist

            self._run_jit = jax.jit(run)

        self.sv, self.su, self.seq_state, hist = self._run_jit(
            self.sv, self.su, self.seq_state, fs, FV, FU, av)
        self._writeback()
        return hist

    def _native_tick_ok(self) -> bool:
        """tick() may use the host sweep engine only for pure-digital
        designs (no analog sampling, drives, or VERILOG_MODULE) when
        the backend policy selects it."""
        cached = getattr(self, "_native_tick_flag", None)
        if cached is not None:
            return cached
        from . import turbo
        ok = False
        mode = turbo.backend()
        if mode == "auto":
            mode = turbo.pick_auto(self.ir)
        if mode == "native" and not self.ir.vmods and \
                not self.ir.samp_sig.size and not self.ir.drv_sig.size \
                and turbo.eligible(self.ir, allow_cyclic=True):
            from . import native_run
            ok = native_run.available()
        self._native_tick_flag = ok
        return ok

    def _run_ticks_native(self, forced_sig, FV, FU):
        """Host C++ sweep engine (digital/native_run.py) — the
        latency-optimal single-trace backend."""
        from . import native_run
        plan = getattr(self, "_native_plan", None)
        if plan is None:
            plan = self._native_plan = native_run.NativePlan(self.ir)
        st = plan.pack_state(np.asarray(self.sv), np.asarray(self.su),
                             self.seq_state)
        HV, HU = plan.run(st, np.asarray(forced_sig, np.int32),
                          np.asarray(FV, np.uint32),
                          np.asarray(FU, np.uint32))
        # keep planes/seq-state as numpy: consumers (jit args, turbo
        # pack, persistence) accept either, and device_put per tick
        # would dominate the C-ABI per-tick latency
        self.sv = (st[:plan.S] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        self.su = (st[:plan.S] >> np.uint64(32)).astype(np.uint32)
        self.seq_state = plan.commit_seq_state(st, self.seq_state,
                                               as_numpy=True)
        self._writeback()
        return (HV, HU)

    def _run_ticks_turbo(self, forced_sig, FV, FU, mode):
        """Whole-tick MXU path (digital/turbo.py); falls in here only
        when turbo.eligible(ir) holds."""
        from . import turbo
        fs = np.asarray(forced_sig, np.int32)
        key = (fs.tobytes(),)
        plans = getattr(self, "_turbo_plans", None)
        if plans is None:
            plans = self._turbo_plans = {}
        plan = plans.get(key)
        if plan is None:
            plan = plans[key] = turbo.TurboPlan(self.ir, fs)
        state0 = plan.pack_state(np.asarray(self.sv),
                                 np.asarray(self.su), self.seq_state)
        FV = np.ascontiguousarray(np.asarray(FV, np.uint32))
        FU = np.ascontiguousarray(np.asarray(FU, np.uint32))
        if mode == "turbo":
            hv, hu = turbo.run_pallas(plan, state0, FV, FU)
        else:
            hv, hu = turbo.run_xla(plan, state0, FV, FU)
        v, u = plan.unpack_hist(hv, hu)
        self.sv = jnp.asarray(v[-1, :plan.S].copy())
        self.su = jnp.asarray(u[-1, :plan.S].copy())
        self.seq_state = plan.commit_seq_state(v[-1], u[-1],
                                               self.seq_state)
        self._writeback()
        return (v[:, :plan.S], u[:, :plan.S])

    def run_ticks_batched(self, forced_sig, FV, FU, watch=None,
                          mesh=None, axis: str = "batch"):
        """Run B independent instances of the design for T ticks each —
        vmapped over the instance axis and (optionally) sharded over a
        ``jax.sharding.Mesh`` axis, so Monte-Carlo/stimulus-corner
        digital simulation scales across chips (the reference's closest
        analogue is its multi-GPU synthesis fan-out; the runtime itself
        has no such axis).

        ``FV``/``FU``: uint32[B, T, S] per-instance schedules over the
        shared ``forced_sig`` signal list.  Every instance starts from
        the engine's CURRENT state (replicated).  ``watch``: list of
        signal indices whose per-tick planes are recorded (bounds the
        history memory).  Returns (hist_v, hist_u) of shape
        [B, T, len(watch)] (all signals when watch is None).
        """
        if self.ir is None:
            raise ValueError("no digital IR")
        if self.ir.vmods:
            raise ValueError("run_ticks_batched: VERILOG_MODULE devices "
                             "need per-tick host interaction")
        import numpy as _np

        # batched-instance backend policy (measured, BASELINE round 3):
        # deep designs (RV32-class) run FASTEST as the native host
        # engine looped over instances (27-35M aggregate gate-evals/s
        # vs the vmapped turbo core's flat ~8M); the turbo core keeps
        # the shallow-design/batched niche and every mesh-sharded run.
        from . import turbo
        mode = turbo.backend()
        if mode == "auto":
            mode = turbo.pick_auto_batch(self.ir,
                                         int(_np.shape(FV)[0]))
        if mode == "native" and mesh is None and not self.ir.vmods \
                and turbo.eligible(self.ir, allow_cyclic=True):
            from . import native_run
            if native_run.available():
                plan = getattr(self, "_native_plan", None)
                if plan is None:
                    plan = self._native_plan = native_run.NativePlan(
                        self.ir)
                fs_np = _np.asarray(forced_sig, _np.int32)
                FVn = _np.asarray(FV, _np.uint32)
                FUn = _np.asarray(FU, _np.uint32)
                B = FVn.shape[0]
                sv0 = _np.asarray(self.sv)
                su0 = _np.asarray(self.su)
                hv, hu = [], []
                for b in range(B):
                    # every instance starts from the engine's current
                    # state; nothing is committed back
                    st = plan.pack_state(sv0, su0, self.seq_state)
                    HV, HU = plan.run(st, fs_np, FVn[b], FUn[b])
                    if watch is not None:
                        w = _np.asarray(watch, _np.int32)
                        HV, HU = HV[:, w], HU[:, w]
                    hv.append(HV)
                    hu.append(HU)
                return _np.stack(hv), _np.stack(hu)
            mode = "flash"       # toolchain missing: device fallback
        if mode == "native":
            mode = "flash"       # mesh/vmods: device path required
        if mode == "flash" \
                and turbo.eligible(self.ir, allow_cyclic=True) \
                and watch is not None:
            from . import flash
            fs_np = _np.asarray(forced_sig, _np.int32)
            key = ("flash", fs_np.tobytes())
            plans = getattr(self, "_turbo_plans", None)
            if plans is None:
                plans = self._turbo_plans = {}
            plan = plans.get(key)
            if plan is None:
                plan = plans[key] = flash.FlashPlan(self.ir, fs_np)
            return flash.run_batched(
                plan, self.sv, self.su, self.seq_state,
                _np.asarray(FV, _np.uint32), _np.asarray(FU, _np.uint32),
                watch, mesh=mesh, axis=axis)
        if mode == "flash":
            mode = "turbo_xla"   # ineligible/full-history: older paths
        if mode in ("turbo", "turbo_xla") and turbo.eligible(self.ir) \
                and watch is not None:
            fs_np = _np.asarray(forced_sig, _np.int32)
            key = (fs_np.tobytes(),)
            plans = getattr(self, "_turbo_plans", None)
            if plans is None:
                plans = self._turbo_plans = {}
            plan = plans.get(key)
            if plan is None:
                plan = plans[key] = turbo.TurboPlan(self.ir, fs_np)
            state0 = plan.pack_state(_np.asarray(self.sv),
                                     _np.asarray(self.su),
                                     self.seq_state)
            return turbo.run_xla_batch(
                plan, state0, _np.asarray(FV, _np.uint32),
                _np.asarray(FU, _np.uint32), watch, mesh=mesh,
                axis=axis)

        fs = jnp.asarray(_np.asarray(forced_sig, _np.int32))
        FV = jnp.asarray(_np.asarray(FV, _np.uint32))
        FU = jnp.asarray(_np.asarray(FU, _np.uint32))
        B = FV.shape[0]
        av = jnp.zeros(self._n_analog, jnp.float64)
        widx = (jnp.asarray(_np.asarray(watch, _np.int32))
                if watch is not None else None)
        tick_fn = self._tick_fn

        def one(sv, su, st, FV1, FU1):
            def step(carry, xs):
                sv, su, st = carry
                fv, fu = xs
                sv, su, st, _ = tick_fn(sv, su, st, fs, fv, fu, av)
                out = (sv, su) if widx is None else (sv[widx], su[widx])
                return (sv, su, st), out
            (_sv, _su, _st), hist = jax.lax.scan(
                step, (sv, su, st), (FV1, FU1))
            return hist

        sv0 = jnp.broadcast_to(self.sv, (B,) + self.sv.shape)
        su0 = jnp.broadcast_to(self.su, (B,) + self.su.shape)
        st0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)),
            self.seq_state)
        run = jax.jit(jax.vmap(one))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P(axis))
            sv0 = jax.device_put(sv0, sh)
            su0 = jax.device_put(su0, sh)
            st0 = jax.tree.map(lambda x: jax.device_put(x, sh), st0)
            FV = jax.device_put(FV, sh)
            FU = jax.device_put(FU, sh)
        hv, hu = run(sv0, su0, st0, FV, FU)
        return hv, hu

    def _writeback(self):
        """Lane-0 readback into netlist nodes and OUTPUT devices."""
        sv = np.asarray(self.sv)
        su = np.asarray(self.su)
        code = (sv & 1) | ((su & 1) << 1)
        # write digital node states
        for node, sig in self._node_sig_objs():
            node.digital = int(code[sig])
        # OUTPUT devices capture their input value (output.h:83+)
        for inst, in_sigs in self.ir.outputs:
            if inst.mdef.digital_op == "OUTPUT":
                inst.params["value"] = int(code[in_sigs[0]])
            else:  # OUTPUT8
                val = 0
                unk = 0
                for k, s in enumerate(in_sigs):
                    bit = 7 - k
                    c = int(code[s])
                    if c == 1:
                        val |= (1 << bit)
                    elif c >= 2:
                        unk |= (1 << bit)
                inst.params["value"] = float(val)
                inst.params["unknown_mask"] = float(unk)

    def _node_sig_objs(self):
        if not hasattr(self, "_nso"):
            by_id = {}
            for node in self.nl.all_nodes():
                if id(node) in self.ir.node_sig:
                    by_id[id(node)] = node
            self._nso = [(by_id[k], s) for k, s in self.ir.node_sig.items()
                         if k in by_id]
        return self._nso

    def signal_code(self, node) -> int:
        """Current 4-state code of a digital net (lane 0)."""
        sig = self.ir.node_sig.get(id(node))
        if sig is None:
            return logic.X
        v = int(np.asarray(self.sv[sig])) & 1
        u = int(np.asarray(self.su[sig])) & 1
        return v | (u << 1)
