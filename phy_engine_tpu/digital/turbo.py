"""Whole-tick digital engine as one MXU program ("turbo" path).

Role parity: the reference clocks digital circuits through an
event-driven worklist (circuits/circuit.h:307-337) and accelerates bulk
truth-table work with u64-packed CUDA cones
(src/pe_synth_cuda_u64_cones.cu:47-113).  The levelled XLA engine in
``digital/engine.py`` already replaces the worklist, but a deep design
(a 32-bit CPU is ~160 logic levels) costs ~320 small gather/scatter
kernels per tick — per-op dispatch latency, not compute, dominates and
a scalar interpreter wins.

This module recasts the *entire tick* as a handful of MXU matmuls per
level with all state resident on-chip:

* the 4-state planes (V, U — 32 stimulus lanes per signal, see
  digital/logic.py) are stored as one f32 slab ``(Khi, 512)``: four
  128-lane blocks holding the lo/hi 16-bit halves of each plane
  (u16 halves are exactly representable in f32, and one-hot matmuls
  against them are exact under ``precision=HIGHEST``);
* every netlist **gather** becomes two static-index one-hot contractions
  (row one-hot over Khi sublanes picks the 128-lane row group, lane
  one-hot selects the lane) — the per-gate index vectors are the only
  data, the one-hots are generated in-register by iota compares;
* every **scatter** is the transposed pair: one matmul produces both the
  written half-words and the clear mask, then
  ``state = state*(1-clear) + contrib`` overwrites exactly the driven
  signals (each signal has a single driver per level, so the one-hot
  sums are exact);
* gate logic itself runs bitwise on reconstructed int32 words (32 lanes)
  between gather and scatter — same Kleene kernels as digital/logic.py;
* flip-flop state (q is the output signal itself, last-clock planes get
  appended signal slots) flows through the same gather/scatter
  machinery, so a tick is just a static list of stages.

The tick core is pure jnp and runs two ways: inside a Pallas kernel on
TPU — grid over ticks, the state slab lives in VMEM scratch across the
whole run, per-tick forced inputs / history ride the block pipeline —
or as plain XLA ops under ``lax.scan`` elsewhere (CPU tests, identical
semantics).

Eligible designs: all combinational gates in the fused basic set
(AND/OR/XOR/NAND/NOR/XNOR/IMP/NIMP/NOT/YES), sequential devices only
DFF/DFF_ARSTN, no latches, no feedback cycles, no TICK_DELAY, no
VERILOG_MODULE, no analog sampling.  Everything a synthesized netlist
at -O1 produces qualifies; anything else falls back to the levelled
engine.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ir import DigitalIR, Segment

F32 = jnp.float32
I32 = jnp.int32
_HP = jax.lax.Precision.HIGHEST

# op -> (invert_a, invert_b, invert_out, core) with core 0=AND 1=OR 2=XOR
# (mirrors engine._GEN2_ENC; 1-input gates alias b to a)
_GEN2_ENC = {
    "AND": (0, 0, 0, 0), "NAND": (0, 0, 1, 0),
    "OR": (0, 0, 0, 1), "NOR": (0, 0, 1, 1),
    "XOR": (0, 0, 0, 2), "XNOR": (0, 0, 1, 2),
    "IMP": (1, 0, 0, 1), "NIMP": (0, 1, 0, 0),
    "NOT": (0, 0, 1, 0), "YES": (0, 0, 0, 0),
}
_TURBO_SEQ = ("DFF", "DFF_ARSTN")

# block/special comb ops: op -> (n_inputs, n_outputs); logic lives in
# _block_logic below (mirrors engine._eval_comb_segment)
_BLOCK_ARITY = {
    "HALF_ADDER": (2, 2), "FULL_ADDER": (3, 2),
    "HALF_SUBTRACTOR": (2, 2), "FULL_SUBTRACTOR": (3, 2),
    "MUL2": (4, 4), "TRI": (2, 1), "RESOLVE2": (2, 1),
    "CASE_EQ": (2, 1), "IS_UNKNOWN": (1, 1),
}


def eligible(ir: DigitalIR) -> bool:
    if ir.vmods or ir.cyclic or ir.tick_delays is not None:
        return False
    if ir.samp_sig.size:
        return False
    for seg in ir.seq:
        if seg.op not in _TURBO_SEQ:
            return False
    for level in ir.levels:
        for seg in level:
            if seg.op not in _GEN2_ENC and seg.op not in _BLOCK_ARITY:
                return False
    for inst, _sigs in ir.inputs:
        if inst.mdef.digital_op != "INPUT":
            return False
    return True


def _pad128(n: int) -> int:
    return max(128, ((n + 127) // 128) * 128)


class _CombStage:
    """One fused level: per-gate index rows + behaviour masks."""

    __slots__ = ("g", "a_hi", "a_lo", "b_hi", "b_lo", "o_hi", "o_lo",
                 "inv_a", "inv_b", "inv_o", "m_or", "m_xor", "valid")

    def __init__(self, gates, trash: int):
        g = _pad128(len(gates))
        self.g = g
        self.valid = np.zeros(g, np.int32)
        self.valid[:len(gates)] = -1
        arr = {k: np.zeros(g, np.int32) for k in
               ("a", "b", "o", "inv_a", "inv_b", "inv_o", "m_or", "m_xor")}
        arr["a"][:] = trash
        arr["b"][:] = trash
        arr["o"][:] = trash
        for k, (op, a, b, o) in enumerate(gates):
            ia, ib, io, core = _GEN2_ENC[op]
            arr["a"][k] = a
            arr["b"][k] = b
            arr["o"][k] = o
            arr["inv_a"][k] = -ia
            arr["inv_b"][k] = -ib
            arr["inv_o"][k] = -io
            arr["m_or"][k] = -(core == 1)
            arr["m_xor"][k] = -(core == 2)
        # padded gates write trash with value 0 (inv masks stay 0, so
        # they compute AND(trash,trash)=L -> v=0,u=0: harmless)
        self.a_hi = arr["a"] >> 7
        self.a_lo = arr["a"] & 127
        self.b_hi = arr["b"] >> 7
        self.b_lo = arr["b"] & 127
        self.o_hi = arr["o"] >> 7
        self.o_lo = arr["o"] & 127
        self.inv_a = arr["inv_a"]
        self.inv_b = arr["inv_b"]
        self.inv_o = arr["inv_o"]
        self.m_or = arr["m_or"]
        self.m_xor = arr["m_xor"]


class _BlockStage:
    """One block/special opcode group within a level."""

    __slots__ = ("op", "g", "in_hi", "in_lo", "out_hi", "out_lo", "valid")

    def __init__(self, op: str, inputs: np.ndarray, outputs: np.ndarray,
                 trash: int):
        ni, no = _BLOCK_ARITY[op]
        n = len(outputs)
        g = _pad128(n)
        self.op = op
        self.g = g
        self.valid = np.zeros(g, np.int32)
        self.valid[:n] = -1
        ins = np.full((ni, g), trash, np.int32)
        outs = np.full((no, g), trash, np.int32)
        ins[:, :n] = inputs[:, :ni].T
        outs[:, :n] = outputs[:, :no].T
        # per-role rows (1-D each, so they can register in the tab)
        self.in_hi = [np.ascontiguousarray(r) for r in ins >> 7]
        self.in_lo = [np.ascontiguousarray(r) for r in ins & 127]
        flat_out = outs.reshape(-1)
        self.out_hi = np.ascontiguousarray(flat_out >> 7)
        self.out_lo = np.ascontiguousarray(flat_out & 127)


class _FFStage:
    """One flip-flop group (DFF or DFF_ARSTN)."""

    __slots__ = ("op", "g", "d_hi", "d_lo", "c_hi", "c_lo", "r_hi",
                 "r_lo", "q_hi", "q_lo", "lc_hi", "lc_lo", "valid",
                 "out_hi", "out_lo")

    def __init__(self, op: str, d, c, r, q, lc, trash: int):
        self.op = op
        n = len(q)
        g = _pad128(n)
        self.g = g

        def pad_idx(v):
            out = np.full(g, trash, np.int32)
            out[:n] = v
            return out

        d = pad_idx(d)
        c = pad_idx(c)
        r = pad_idx(r if r is not None else np.full(n, trash, np.int32))
        q = pad_idx(q)
        lc = pad_idx(lc)
        self.d_hi, self.d_lo = d >> 7, d & 127
        self.c_hi, self.c_lo = c >> 7, c & 127
        self.r_hi, self.r_lo = r >> 7, r & 127
        self.q_hi, self.q_lo = q >> 7, q & 127
        self.lc_hi, self.lc_lo = lc >> 7, lc & 127
        self.out_hi = np.concatenate([self.q_hi, self.lc_hi])
        self.out_lo = np.concatenate([self.q_lo, self.lc_lo])
        self.valid = np.zeros(g, np.int32)
        self.valid[:n] = -1


class TurboPlan:
    """Static compilation of a DigitalIR + forced-signal list."""

    def __init__(self, ir: DigitalIR, forced_sig: np.ndarray):
        from .engine import _input_cone_levels

        S = ir.n_signals
        # appended slots: per-FF last-clock planes, then one trash slot
        self.lc_slots: List[np.ndarray] = []
        extra = S
        self.ff_meta = []      # (op, q_sigs, lc_slots) for state commit
        ffs = []
        for seg in ir.seq:
            n = len(seg.instances)
            lc = np.arange(extra, extra + n, dtype=np.int32)
            extra += n
            q = seg.outputs[:, 0].astype(np.int32)
            d = seg.inputs[:, 0].astype(np.int32)
            c = seg.inputs[:, 1].astype(np.int32)
            r = (seg.inputs[:, 2].astype(np.int32)
                 if seg.op == "DFF_ARSTN" else None)
            ffs.append((seg.op, d, c, r, q, lc))
            self.ff_meta.append((seg.op, q, lc))
        self.trash = extra
        self.S = S
        self.K = _pad128(extra + 1)
        self.Khi = self.K // 128

        def conv_levels(levels):
            out = []
            for level in levels:
                gates = []
                stages = []
                for seg in level:
                    if seg.op in _GEN2_ENC:
                        for k in range(len(seg.outputs)):
                            a = int(seg.inputs[k, 0])
                            b = (int(seg.inputs[k, 1])
                                 if seg.inputs.shape[1] > 1 else a)
                            gates.append((seg.op, a, b,
                                          int(seg.outputs[k, 0])))
                    else:
                        stages.append(_BlockStage(
                            seg.op, seg.inputs.astype(np.int32),
                            seg.outputs.astype(np.int32), self.trash))
                if gates:
                    stages.insert(0, _CombStage(gates, self.trash))
                if stages:
                    out.append(stages)
            return out

        self.cone = conv_levels(_input_cone_levels(ir))
        self.full = conv_levels(ir.levels)
        self.ffs = [_FFStage(op, d, c, r, q, lc, self.trash)
                    for op, d, c, r, q, lc in ffs]
        # forced-input scatter rows
        nf = len(forced_sig)
        self.nf = nf
        self.nf_pad = _pad128(max(nf, 1))
        f = np.full(self.nf_pad, self.trash, np.int32)
        f[:nf] = forced_sig
        self.f_hi, self.f_lo = f >> 7, f & 127
        self._build_tab()

    def _iter_arrays(self):
        for stages in list(self.cone) + list(self.full):
            for st in stages:
                if isinstance(st, _CombStage):
                    yield from (st.a_hi, st.a_lo, st.b_hi, st.b_lo,
                                st.o_hi, st.o_lo, st.inv_a, st.inv_b,
                                st.inv_o, st.m_or, st.m_xor, st.valid)
                else:
                    yield from st.in_hi
                    yield from st.in_lo
                    yield from (st.out_hi, st.out_lo, st.valid)
        for ff in self.ffs:
            yield from (ff.d_hi, ff.d_lo, ff.c_hi, ff.c_lo, ff.r_hi,
                        ff.r_lo, ff.q_hi, ff.q_lo, ff.lc_hi, ff.lc_lo,
                        ff.out_hi, ff.out_lo, ff.valid)
        yield self.f_hi
        yield self.f_lo

    def _build_tab(self):
        """Concatenate every static index/mask array into one (1, W)
        int32 table so the Pallas kernel receives them as an input
        instead of baked constants; offsets stay 128-aligned because
        every registered array has length % 128 == 0."""
        self.offs: Dict[int, Tuple[int, int]] = {}
        chunks = []
        w = 0
        for arr in self._iter_arrays():
            assert arr.dtype == np.int32 and arr.ndim == 1
            assert len(arr) % 128 == 0, len(arr)
            self.offs[id(arr)] = (w, len(arr))
            chunks.append(arr)
            w += len(arr)
        self.tab = (np.concatenate(chunks)[None, :] if chunks
                    else np.zeros((1, 128), np.int32))
        self.tab_w = self.tab.shape[1]

    # -- state packing --------------------------------------------------------
    def pack_state(self, sv: np.ndarray, su: np.ndarray,
                   seq_state: Dict) -> np.ndarray:
        """uint32 planes + engine seq_state -> (Khi, 512) f32 slab."""
        v = np.zeros(self.K, np.uint32)
        u = np.zeros(self.K, np.uint32)
        v[:self.S] = np.asarray(sv, np.uint32)
        u[:self.S] = np.asarray(su, np.uint32)
        for op, q, lc in self.ff_meta:
            st = seq_state.get(op, {})
            if "lc_v" in st:
                v[lc] = np.asarray(st["lc_v"], np.uint32)
                u[lc] = np.asarray(st["lc_u"], np.uint32)
        slab = np.zeros((self.Khi, 512), np.float32)
        for blk, arr in ((0, v & 0xFFFF), (1, v >> 16),
                         (2, u & 0xFFFF), (3, u >> 16)):
            slab[:, 128 * blk:128 * (blk + 1)] = \
                arr.astype(np.float32).reshape(self.Khi, 128)
        return slab

    def unpack_hist(self, hv: np.ndarray, hu: np.ndarray):
        """(T, Khi, 128) int32 pair -> (T, S) uint32 planes + extras."""
        T = hv.shape[0]
        v = hv.reshape(T, self.K).view(np.uint32)
        u = hu.reshape(T, self.K).view(np.uint32)
        return v, u

    def commit_seq_state(self, v_last: np.ndarray, u_last: np.ndarray,
                         seq_state: Dict) -> Dict:
        out = dict(seq_state)
        for op, q, lc in self.ff_meta:
            out[op] = {"q_v": jnp.asarray(v_last[q]),
                       "q_u": jnp.asarray(u_last[q]),
                       "lc_v": jnp.asarray(v_last[lc]),
                       "lc_u": jnp.asarray(u_last[lc])}
        return out


# ---------------------------------------------------------------------------
# tick core (pure jnp; runs under XLA or inside the Pallas kernel)
# ---------------------------------------------------------------------------

def _gather(state, hi, lo, khi: int):
    """state (Khi,512) f32, hi/lo (1,G) int32 -> (v, u) int32 (1,G)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (khi, 1), 0)
    ohT = (sub == hi).astype(F32)                       # (Khi, G)
    rows = jax.lax.dot_general(state, ohT, (((0,), (0,)), ((), ())),
                               preferred_element_type=F32,
                               precision=_HP)           # (512, G)
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    ohL = (lane == lo).astype(F32)                      # (128, G)

    def sel(c):
        return jnp.sum(rows[128 * c:128 * (c + 1)] * ohL, axis=0,
                       keepdims=True).astype(I32)       # (1, G)

    v = jnp.bitwise_or(sel(0), jnp.left_shift(sel(1), jnp.int32(16)))
    u = jnp.bitwise_or(sel(2), jnp.left_shift(sel(3), jnp.int32(16)))
    return v, u


def _scatter(state, hi, lo, v, u, khi: int):
    """Overwrite signals hi/lo with int32 planes v,u (1,G)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (khi, 1), 0)
    ohT = (sub == hi).astype(F32)                       # (Khi, G)
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    ohL = (lane == lo).astype(F32)                      # (128, G)
    low16 = jnp.int32(0xFFFF)

    def half(x, s):
        h = jnp.bitwise_and(
            jax.lax.shift_right_logical(x, jnp.int32(s)), low16)
        return h.astype(F32)

    tmp = jnp.concatenate([
        ohL * half(v, 0), ohL * half(v, 16),
        ohL * half(u, 0), ohL * half(u, 16), ohL], axis=0)  # (640, G)
    contrib = jax.lax.dot_general(ohT, tmp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=F32,
                                  precision=_HP)        # (Khi, 640)
    clear = jnp.minimum(contrib[:, 512:640], F32(1))
    clear4 = jnp.concatenate([clear] * 4, axis=1)       # (Khi, 512)
    return state * (F32(1) - clear4) + contrib[:, :512]


def _kleene_fused(st: _CombStage, va, ua, vb, ub, row):
    """Fused basic-gate logic on int32 planes (1,G)."""
    inv_a, inv_b = row(st.inv_a), row(st.inv_b)
    inv_o = row(st.inv_o)
    m_or, m_xor = row(st.m_or), row(st.m_xor)
    va = (va & ~inv_a) | (~va & ~ua & inv_a)
    vb = (vb & ~inv_b) | (~vb & ~ub & inv_b)
    h_a, l_a = va & ~ua, ~va & ~ua
    h_b, l_b = vb & ~ub, ~vb & ~ub
    and_v = h_a & h_b
    and_u = ~(and_v | l_a | l_b)
    or_v = h_a | h_b
    or_u = ~(or_v | (l_a & l_b))
    known = ~ua & ~ub
    xor_v = (va ^ vb) & known
    xor_u = ~known
    keep = ~m_or & ~m_xor
    v = (and_v & keep) | (or_v & m_or) | (xor_v & m_xor)
    u = (and_u & keep) | (or_u & m_or) | (xor_u & m_xor)
    v = (v & ~inv_o) | (~v & ~u & inv_o)
    return v, u


def _eff(v, u):
    return v & ~u, u


def _block_logic(op: str, ins):
    """ins: list of (v, u) int32 plane pairs; returns list of (v, u)
    outputs.  Mirrors engine._eval_comb_segment via logic.py kernels
    (all pure bitwise, dtype-generic)."""
    from . import logic
    if op == "HALF_ADDER":
        (va, ua), (vb, ub) = ins
        return [logic.op_xor(va, ua, vb, ub),
                logic.op_and(va, ua, vb, ub)]
    if op == "FULL_ADDER":
        (va, ua), (vb, ub), (vc, uc) = ins
        xv, xu = logic.op_xor(va, ua, vb, ub)
        s = logic.op_xor(xv, xu, vc, uc)
        g1v, g1u = logic.op_and(va, ua, vb, ub)
        g2v, g2u = logic.op_and(vc, uc, xv, xu)
        return [s, logic.op_or(g1v, g1u, g2v, g2u)]
    if op == "HALF_SUBTRACTOR":
        (va, ua), (vb, ub) = ins
        nav, nau = logic.op_not(va, ua)
        return [logic.op_xor(va, ua, vb, ub),
                logic.op_and(nav, nau, vb, ub)]
    if op == "FULL_SUBTRACTOR":
        (va, ua), (vb, ub), (vc, uc) = ins
        xv, xu = logic.op_xor(va, ua, vb, ub)
        d = logic.op_xor(xv, xu, vc, uc)
        nav, nau = logic.op_not(va, ua)
        nxv, nxu = logic.op_not(xv, xu)
        g1v, g1u = logic.op_and(nav, nau, vb, ub)
        g2v, g2u = logic.op_and(nxv, nxu, vc, uc)
        return [d, logic.op_or(g1v, g1u, g2v, g2u)]
    if op == "MUL2":
        (a0v, a0u), (a1v, a1u), (b0v, b0u), (b1v, b1u) = ins
        p0 = logic.op_and(a0v, a0u, b0v, b0u)
        t1v, t1u = logic.op_and(a1v, a1u, b0v, b0u)
        t2v, t2u = logic.op_and(a0v, a0u, b1v, b1u)
        p1 = logic.op_xor(t1v, t1u, t2v, t2u)
        c1v, c1u = logic.op_and(t1v, t1u, t2v, t2u)
        t3v, t3u = logic.op_and(a1v, a1u, b1v, b1u)
        p2 = logic.op_xor(t3v, t3u, c1v, c1u)
        p3 = logic.op_and(t3v, t3u, c1v, c1u)
        return [p0, p1, p2, p3]
    if op == "TRI":
        (vd, ud), (ve, ue) = ins
        return [logic.op_tri_state(vd, ud, ve, ue)]
    if op == "RESOLVE2":
        (va, ua), (vb, ub) = ins
        return [logic.op_resolve2(va, ua, vb, ub)]
    if op == "CASE_EQ":
        (va, ua), (vb, ub) = ins
        return [logic.op_case_eq(va, ua, vb, ub)]
    if op == "IS_UNKNOWN":
        (va, ua), = ins
        return [logic.op_is_unknown(va, ua)]
    raise ValueError(f"unknown block op {op}")


def _tick_core(plan: TurboPlan, state, fv_row, fu_row, tabget):
    """One tick over the state slab; fv/fu rows (1, nf_pad) int32 and
    ``tabget(off, n) -> (1, n)`` fetching from the static table (a
    constant slice under XLA, a ref-level load under Pallas so each
    row materializes with a clean offset-0 layout)."""
    khi = plan.Khi

    def row(arr):
        off, n = plan.offs[id(arr)]
        return tabget(off, n)

    def comb(state, levels):
        for stages in levels:
            for st in stages:
                if isinstance(st, _CombStage):
                    va, ua = _gather(state, row(st.a_hi),
                                     row(st.a_lo), khi)
                    vb, ub = _gather(state, row(st.b_hi),
                                     row(st.b_lo), khi)
                    v, u = _kleene_fused(st, va, ua, vb, ub, row)
                    valid = row(st.valid)
                    state = _scatter(state, row(st.o_hi),
                                     row(st.o_lo), v & valid,
                                     u & valid, khi)
                else:
                    ins = [_gather(state, row(st.in_hi[r]),
                                   row(st.in_lo[r]), khi)
                           for r in range(len(st.in_hi))]
                    outs = _block_logic(st.op, ins)
                    valid = row(st.valid)
                    v_cat = jnp.concatenate(
                        [v & valid for v, _ in outs], axis=1)
                    u_cat = jnp.concatenate(
                        [u & valid for _, u in outs], axis=1)
                    state = _scatter(state, row(st.out_hi),
                                     row(st.out_lo), v_cat, u_cat, khi)
        return state

    # 1. forced INPUT values
    state = _scatter(state, row(plan.f_hi), row(plan.f_lo),
                     fv_row, fu_row, khi)
    # 2. pre-sequential settle of the forced-input cone
    state = comb(state, plan.cone)
    # 3. flip-flops (d_ff.h:59-66 semantics via engine._eval_seq_segment)
    for ff in plan.ffs:
        dv, du = _eff(*_gather(state, row(ff.d_hi), row(ff.d_lo), khi))
        cv, cu = _eff(*_gather(state, row(ff.c_hi), row(ff.c_lo), khi))
        qv, qu = _gather(state, row(ff.q_hi), row(ff.q_lo), khi)
        lcv, lcu = _gather(state, row(ff.lc_hi), row(ff.lc_lo), khi)
        rise = (~lcv & ~lcu) & (cv & ~cu)
        known = ~cu
        lcv2 = (lcv & ~known) | (cv & known)
        lcu2 = lcu & ~known
        qv = (qv & ~rise) | (dv & rise)
        qu = (qu & ~rise) | (du & rise)
        if ff.op == "DFF_ARSTN":
            av, au = _eff(*_gather(state, row(ff.r_hi), row(ff.r_lo),
                                   khi))
            a_l = ~av & ~au
            qv = qv & ~a_l & ~au
            qu = (qu & ~a_l) | au
        valid = row(ff.valid)
        v_cat = jnp.concatenate([qv & valid, lcv2 & valid], axis=1)
        u_cat = jnp.concatenate([qu & valid, lcu2 & valid], axis=1)
        state = _scatter(state, row(ff.out_hi), row(ff.out_lo),
                         v_cat, u_cat, khi)
    # 4. full combinational settle
    state = comb(state, plan.full)
    return state


def _hist_planes(plan: TurboPlan, state):
    """state slab -> (v, u) int32 (Khi, 128) full-word planes."""
    s = state.astype(I32)
    v = jnp.bitwise_or(s[:, 0:128],
                       jnp.left_shift(s[:, 128:256], jnp.int32(16)))
    u = jnp.bitwise_or(s[:, 256:384],
                       jnp.left_shift(s[:, 384:512], jnp.int32(16)))
    return v, u


# ---------------------------------------------------------------------------
# runners
# ---------------------------------------------------------------------------

def run_xla(plan: TurboPlan, state0: np.ndarray, FV: np.ndarray,
            FU: np.ndarray):
    """lax.scan over the tick core (CPU / virtual-mesh path)."""
    fvp = np.zeros((FV.shape[0], plan.nf_pad), np.int32)
    fup = np.zeros_like(fvp)
    fvp[:, :plan.nf] = FV.view(np.int32)
    fup[:, :plan.nf] = FU.view(np.int32)

    tab = jnp.asarray(plan.tab)

    def step(state, xs):
        fv, fu = xs
        state = _tick_core(plan, state, fv[None, :], fu[None, :],
                           lambda off, n: tab[:, off:off + n])
        return state, _hist_planes(plan, state)

    def run(state0, FVj, FUj):
        _state, (hv, hu) = jax.lax.scan(step, state0, (FVj, FUj))
        return hv, hu

    hv, hu = jax.jit(run)(jnp.asarray(state0), jnp.asarray(fvp),
                          jnp.asarray(fup))
    return np.asarray(hv), np.asarray(hu)


def run_pallas(plan: TurboPlan, state0: np.ndarray, FV: np.ndarray,
               FU: np.ndarray, interpret: bool = False):
    """Pallas kernel: grid over ticks, state slab in VMEM scratch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = FV.shape[0]
    khi = plan.Khi
    fvp = np.zeros((T, plan.nf_pad), np.int32)
    fup = np.zeros_like(fvp)
    fvp[:, :plan.nf] = FV.view(np.int32)
    fup[:, :plan.nf] = FU.view(np.int32)

    def kernel(s0_ref, fv_ref, fu_ref, tab_ref, hv_ref, hu_ref,
               state_sc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            state_sc[...] = s0_ref[...]

        state = _tick_core(plan, state_sc[...], fv_ref[...][0],
                           fu_ref[...][0],
                           lambda off, n: tab_ref[:, off:off + n])
        state_sc[...] = state
        hv, hu = _hist_planes(plan, state)
        hv_ref[...] = hv[None]
        hu_ref[...] = hu[None]

    z = lambda t: jnp.zeros((), jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((khi, 512), lambda t: (z(t), z(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, plan.nf_pad), lambda t: (t, z(t), z(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, plan.nf_pad), lambda t: (t, z(t), z(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, plan.tab_w), lambda t: (z(t), z(t)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, khi, 128), lambda t: (t, z(t), z(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, khi, 128), lambda t: (t, z(t), z(t)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, khi, 128), jnp.int32),
            jax.ShapeDtypeStruct((T, khi, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((khi, 512), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )
    hv, hu = jax.jit(out)(jnp.asarray(state0),
                          jnp.asarray(fvp[:, None, :]),
                          jnp.asarray(fup[:, None, :]),
                          jnp.asarray(plan.tab))
    return np.asarray(hv), np.asarray(hu)


def backend() -> str:
    """PE_TPU_DIGITAL: auto (pallas on TPU, levels elsewhere),
    turbo (force pallas), turbo_xla, levels."""
    mode = os.environ.get("PE_TPU_DIGITAL", "auto")
    if mode in ("turbo", "turbo_xla", "levels"):
        return mode
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    return "turbo" if plat == "tpu" else "levels"
