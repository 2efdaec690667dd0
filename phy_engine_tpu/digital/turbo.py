"""Whole-tick digital engine as one MXU program ("turbo" path).

Role parity: the reference clocks digital circuits through an
event-driven worklist (circuits/circuit.h:307-337) and accelerates bulk
truth-table work with u64-packed CUDA cones
(src/pe_synth_cuda_u64_cones.cu:47-113).  The levelled XLA engine in
``digital/engine.py`` already replaces the worklist, but a deep design
(a 32-bit CPU is ~160 logic levels) costs ~320 small gather/scatter
kernels per tick — per-op dispatch latency, not compute, dominates and
a scalar interpreter wins.

This module recasts the *entire tick* as a small, depth-independent
MXU program:

* the 4-state planes (V, U — 32 stimulus lanes per signal, see
  digital/logic.py) live in one f32 slab ``(Khi, 512)``: four 128-lane
  blocks holding the lo/hi 16-bit halves of each plane (u16 halves are
  exact in f32, and one-hot matmuls against them are exact under
  ``precision=HIGHEST``);
* the gate graph is levelled, block macros (FULL_ADDER, MUL2, ...) are
  expanded into basic gates across sub-levels with fresh temp slots,
  and every sub-level is cut into **uniform 128-gate chunks**.  A chunk
  is 16 static int32 rows (indices, inversion masks, core-select
  masks, validity) in one table;
* the tick core is a single ``fori_loop`` over chunks: generate the
  chunk's one-hot matrices by iota-compare, **gather** operand words
  with one MXU contraction + lane select, evaluate all Kleene cores
  bitwise on int32 (32 lanes), and **scatter** results + clear mask
  back into the slab with a second contraction.  Program size is
  constant in design depth — Mosaic compiles it in seconds where a
  fully unrolled 200-level kernel took tens of minutes;
* flip-flops (q is its output signal; last-clock planes get appended
  slots) run as their own uniform chunk loop with an ``rst_en`` mask
  unifying DFF and DFF_ARSTN (d_ff.h:59-66 / d_ff_arstn.h semantics).

The identical core runs two ways: inside a Pallas kernel on TPU (grid
over ticks, the state slab persists in VMEM scratch, per-tick forced
inputs / history ride the block pipeline) or as plain XLA under
``lax.scan`` elsewhere (CPU tests, bit-identical semantics).

Eligible designs: comb ops in the fused basic set or the expandable
block/special set, sequential devices only DFF/DFF_ARSTN, no latches,
no feedback cycles, no TICK_DELAY, no VERILOG_MODULE, no analog
sampling.  Everything a synthesized netlist produces qualifies;
anything else falls back to the levelled engine.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ir import DigitalIR

F32 = jnp.float32
I32 = jnp.int32
_HP = jax.lax.Precision.HIGHEST
CHUNK = 128

# basic fused gates: op -> (invert_a, invert_b, invert_out, core)
# cores: 0=AND 1=OR 2=XOR 3=CASE_EQ 4=TRI 5=RESOLVE2 6=IS_UNKNOWN
_GEN2_ENC = {
    "AND": (0, 0, 0, 0), "NAND": (0, 0, 1, 0),
    "OR": (0, 0, 0, 1), "NOR": (0, 0, 1, 1),
    "XOR": (0, 0, 0, 2), "XNOR": (0, 0, 1, 2),
    "IMP": (1, 0, 0, 1), "NIMP": (0, 1, 0, 0),
    "NOT": (0, 0, 1, 0), "YES": (0, 0, 0, 0),
    "CASE_EQ": (0, 0, 0, 3), "TRI": (0, 0, 0, 4),
    "RESOLVE2": (0, 0, 0, 5), "IS_UNKNOWN": (0, 0, 0, 6),
}
_N_CORES = 7
# block macros expandable into basic gates (engine._eval_comb_segment)
_BLOCK_OPS = ("HALF_ADDER", "FULL_ADDER", "HALF_SUBTRACTOR",
              "FULL_SUBTRACTOR", "MUL2")
_TURBO_SEQ = ("DFF", "DFF_ARSTN")

# chunk table row indices
_R_AHI, _R_ALO, _R_BHI, _R_BLO, _R_OHI, _R_OLO = range(6)
_R_INVA, _R_INVB, _R_INVO, _R_VALID = 6, 7, 8, 9
_R_CORE0 = 10                       # rows 10..15: core one-hot masks 1..6
_N_ROWS = _R_CORE0 + (_N_CORES - 1)

# FF table rows
(_F_DHI, _F_DLO, _F_CHI, _F_CLO, _F_RHI, _F_RLO, _F_QHI, _F_QLO,
 _F_LHI, _F_LLO, _F_VALID, _F_RSTEN) = range(12)


def eligible(ir: DigitalIR, allow_cyclic: bool = False) -> bool:
    """``allow_cyclic``: the native sweep engine (native_run.py)
    iterates comb-feedback segments to fixpoint (gate-level latches,
    matching the levels engine's while_loop), so it may accept cyclic
    IRs; the Pallas/XLA turbo programs are strictly feed-forward."""
    if ir.vmods or ir.tick_delays is not None:
        return False
    if ir.cyclic:
        if not allow_cyclic:
            return False
        for seg in ir.cyclic:
            # no block macros inside the fixpoint: each cyclic segment
            # must be a plain 2-input gate row for Jacobi evaluation
            if seg.op not in _GEN2_ENC:
                return False
    if ir.samp_sig.size:
        return False
    for seg in ir.seq:
        if seg.op not in _TURBO_SEQ:
            return False
    for level in ir.levels:
        for seg in level:
            if seg.op not in _GEN2_ENC and seg.op not in _BLOCK_OPS:
                return False
    for inst, _sigs in ir.inputs:
        if inst.mdef.digital_op != "INPUT":
            return False
    return True


def _pad128(n: int) -> int:
    return max(CHUNK, ((n + CHUNK - 1) // CHUNK) * CHUNK)


def _expand_level(segs, alloc_temp):
    """One IR level -> list of sub-levels of (op, a, b, o) basic gates.

    Block macros expand with fresh temp slots; a temp is always
    produced in an earlier sub-level than its consumer so sequential
    chunk execution preserves dataflow."""
    subs: List[List[Tuple[str, int, int, int]]] = [[], [], []]
    extra: List[List[Tuple[str, int, int, int]]] = []

    def emit(k, op, a, b, o):
        while len(subs) <= k:
            subs.append([])
        subs[k].append((op, a, b, o))

    for seg in segs:
        op = seg.op
        for g in range(len(seg.outputs)):
            i = [int(x) for x in seg.inputs[g]]
            o = [int(x) for x in seg.outputs[g]]
            if op in _GEN2_ENC:
                a = i[0]
                b = i[1] if len(i) > 1 and seg.inputs.shape[1] > 1 else a
                if op in ("NOT", "YES", "IS_UNKNOWN"):
                    b = a
                emit(0, op, a, b, o[0])
            elif op == "HALF_ADDER":
                emit(0, "XOR", i[0], i[1], o[0])
                emit(0, "AND", i[0], i[1], o[1])
            elif op == "FULL_ADDER":
                x, g1, g2 = alloc_temp(), alloc_temp(), alloc_temp()
                emit(0, "XOR", i[0], i[1], x)
                emit(0, "AND", i[0], i[1], g1)
                emit(1, "XOR", x, i[2], o[0])
                emit(1, "AND", i[2], x, g2)
                emit(2, "OR", g1, g2, o[1])
            elif op == "HALF_SUBTRACTOR":
                emit(0, "XOR", i[0], i[1], o[0])
                emit(0, "NIMP", i[1], i[0], o[1])      # b & ~a
            elif op == "FULL_SUBTRACTOR":
                x, g1, g2 = alloc_temp(), alloc_temp(), alloc_temp()
                emit(0, "XOR", i[0], i[1], x)
                emit(0, "NIMP", i[1], i[0], g1)
                emit(1, "XOR", x, i[2], o[0])
                emit(1, "NIMP", i[2], x, g2)
                emit(2, "OR", g1, g2, o[1])
            elif op == "MUL2":
                a0, a1, b0, b1 = i[:4]
                t1, t2, t3, c1 = (alloc_temp(), alloc_temp(),
                                  alloc_temp(), alloc_temp())
                emit(0, "AND", a0, b0, o[0])
                emit(0, "AND", a1, b0, t1)
                emit(0, "AND", a0, b1, t2)
                emit(0, "AND", a1, b1, t3)
                emit(1, "XOR", t1, t2, o[1])
                emit(1, "AND", t1, t2, c1)
                emit(2, "XOR", t3, c1, o[2])
                emit(2, "AND", t3, c1, o[3])
            else:  # pragma: no cover — guarded by eligible()
                raise ValueError(op)
    _ = extra
    return [s for s in subs if s]


class TurboPlan:
    """Static compilation of a DigitalIR + forced-signal list into
    uniform chunk tables."""

    def __init__(self, ir: DigitalIR, forced_sig: np.ndarray):
        from .engine import _input_cone_levels

        S = ir.n_signals
        self.S = S
        extra = S
        # per-FF last-clock slots
        self.ff_meta = []
        ff_rows = []
        for seg in ir.seq:
            n = len(seg.instances)
            lc = np.arange(extra, extra + n, dtype=np.int32)
            extra += n
            q = seg.outputs[:, 0].astype(np.int32)
            d = seg.inputs[:, 0].astype(np.int32)
            c = seg.inputs[:, 1].astype(np.int32)
            if seg.op == "DFF_ARSTN":
                r = seg.inputs[:, 2].astype(np.int32)
                ren = np.full(n, -1, np.int32)
            else:
                r = None
                ren = np.zeros(n, np.int32)
            ff_rows.append((d, c, r, q, lc, ren))
            self.ff_meta.append((seg.op, q, lc))

        # temp slots for block expansion
        self._next_temp = [extra]

        def alloc_temp():
            t = self._next_temp[0]
            self._next_temp[0] += 1
            return t

        def lower_levels(levels):
            gates = []     # flat, chunk-boundary-safe order
            for level in levels:
                for sub in _expand_level(level, alloc_temp):
                    # each sub-level starts at a fresh chunk boundary
                    while len(gates) % CHUNK:
                        gates.append(None)
                    gates.extend(sub)
            while len(gates) % CHUNK:
                gates.append(None)
            return gates

        cone_gates = lower_levels(_input_cone_levels(ir))
        full_gates = lower_levels(ir.levels)

        self.trash = self._next_temp[0]
        self.K = _pad128(self.trash + 1)
        self.Khi = self.K // CHUNK

        def build_tab(gates):
            C = max(1, len(gates) // CHUNK)
            tab = np.zeros((_N_ROWS, C * CHUNK), np.int32)
            for r in (_R_AHI, _R_BHI, _R_OHI):
                tab[r, :] = self.trash >> 7
            for r in (_R_ALO, _R_BLO, _R_OLO):
                tab[r, :] = self.trash & 127
            for k, gate in enumerate(gates):
                if gate is None:
                    continue
                op, a, b, o = gate
                ia, ib, io, core = _GEN2_ENC[op]
                tab[_R_AHI, k] = a >> 7
                tab[_R_ALO, k] = a & 127
                tab[_R_BHI, k] = b >> 7
                tab[_R_BLO, k] = b & 127
                tab[_R_OHI, k] = o >> 7
                tab[_R_OLO, k] = o & 127
                tab[_R_INVA, k] = -ia
                tab[_R_INVB, k] = -ib
                tab[_R_INVO, k] = -io
                tab[_R_VALID, k] = -1
                if core > 0:
                    tab[_R_CORE0 + core - 1, k] = -1
            return tab, C

        self.cone_tab, self.n_cone = build_tab(cone_gates)
        if not any(g is not None for g in cone_gates):
            self.n_cone = 0
        self.full_tab, self.n_full = build_tab(full_gates)
        if not any(g is not None for g in full_gates):
            self.n_full = 0

        # FF chunks — one chunk range per IR segment so the engine's
        # simultaneous-within-segment / sequential-across-segments
        # semantics can be reproduced (each segment reads a frozen
        # pre-segment state)
        self.ff_ranges: List[Tuple[int, int]] = []
        chunks_total = sum((len(d) + CHUNK - 1) // CHUNK
                           for d, *_ in ff_rows)
        W = max(1, chunks_total) * CHUNK
        ff = np.zeros((12, W), np.int32)
        for r in (_F_DHI, _F_CHI, _F_RHI, _F_QHI, _F_LHI):
            ff[r, :] = self.trash >> 7
        for r in (_F_DLO, _F_CLO, _F_RLO, _F_QLO, _F_LLO):
            ff[r, :] = self.trash & 127
        k = 0
        for d, c, r, q, lc, ren in ff_rows:
            n = len(d)
            c0 = k // CHUNK
            sl = slice(k, k + n)
            ff[_F_DHI, sl], ff[_F_DLO, sl] = d >> 7, d & 127
            ff[_F_CHI, sl], ff[_F_CLO, sl] = c >> 7, c & 127
            if r is not None:
                ff[_F_RHI, sl], ff[_F_RLO, sl] = r >> 7, r & 127
            ff[_F_QHI, sl], ff[_F_QLO, sl] = q >> 7, q & 127
            ff[_F_LHI, sl], ff[_F_LLO, sl] = lc >> 7, lc & 127
            ff[_F_VALID, sl] = -1
            ff[_F_RSTEN, sl] = ren
            k = (k + n + CHUNK - 1) // CHUNK * CHUNK
            self.ff_ranges.append((c0, k // CHUNK))
        self.ff_tab = ff

        # forced-input scatter rows (static; values arrive per tick)
        nf = len(forced_sig)
        self.nf = nf
        self.nf_pad = _pad128(max(nf, 1))
        f = np.full(self.nf_pad, self.trash, np.int32)
        f[:nf] = forced_sig
        self.f_hi = (f >> 7)[None, :]
        self.f_lo = (f & 127)[None, :]

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
        """(T, Khi, 128) int32 pair -> (T, K) uint32 planes."""
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


def _eff(v, u):
    return v & ~u, u


def _chunk_logic(rows, va, ua, vb, ub):
    """All Kleene cores + per-gate select; rows[r] -> (1,128) int32."""
    inv_a, inv_b = rows[_R_INVA], rows[_R_INVB]
    inv_o = rows[_R_INVO]
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
    ceq_v = ~(va ^ vb) & ~(ua ^ ub)
    ceq_u = jnp.zeros_like(ceq_v)
    # TRI: a=data, b=en (logic.op_tri_state)
    eh, el = h_b, l_b
    tbv, tbu = h_a, ua                        # buffered data (op_yes)
    tri_v = (eh & tbv) | el
    tri_u = (eh & tbu) | el | ub
    # RESOLVE2 (logic.op_resolve2)
    az = ua & va
    bz = ub & vb
    eq = ~(va ^ vb) & ~(ua ^ ub)
    sel_b = az
    sel_a = ~az & bz
    sel_e = ~az & ~bz & eq
    conflict = ~az & ~bz & ~eq
    res_v = (sel_b & vb) | (sel_a & va) | (sel_e & va)
    res_u = (sel_b & ub) | (sel_a & ua) | (sel_e & ua) | conflict
    unk_v = ua
    unk_u = jnp.zeros_like(ua)

    v, u = and_v, and_u
    for core, (cv, cu) in enumerate(((or_v, or_u), (xor_v, xor_u),
                                     (ceq_v, ceq_u), (tri_v, tri_u),
                                     (res_v, res_u), (unk_v, unk_u)),
                                    start=1):
        m = rows[_R_CORE0 + core - 1]
        v = (v & ~m) | (cv & m)
        u = (u & ~m) | (cu & m)
    v = (v & ~inv_o) | (~v & ~u & inv_o)
    return v, u


def _tick_core(plan: TurboPlan, state, fetch_forced, fetch_comb,
               fetch_ff):
    """One tick over the state slab.

    ``fetch_forced(c0)`` -> (fv, fu) (1,128) int32 of this tick's
    forced planes at lane offset c0; ``fetch_comb(which, li)``: rows
    [ _N_ROWS x (1,128) ] of chunk li from the cone (0) / full (1)
    table; ``fetch_ff(li)`` same for the FF table.  Fetchers use
    static slices under XLA and ref-level dynamic slices under Pallas
    (loads materialize with clean layouts, which value-slicing at a
    lane offset does not).
    """
    khi = plan.Khi

    def comb_chunk(state, rows):
        va, ua = _gather(state, rows[_R_AHI], rows[_R_ALO], khi)
        vb, ub = _gather(state, rows[_R_BHI], rows[_R_BLO], khi)
        v, u = _chunk_logic(rows, va, ua, vb, ub)
        valid = rows[_R_VALID]
        return _scatter(state, rows[_R_OHI], rows[_R_OLO],
                        v & valid, u & valid, khi)

    def comb_loop(state, which, n):
        if n == 0:
            return state

        def body(li, st):
            return comb_chunk(st, fetch_comb(which, li))
        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, state)

    def ff_chunk(state, state_pre, rows):
        """Gathers read the frozen pre-segment state; scatters write
        the live state (engine's simultaneous-within-segment rule)."""
        dv, du = _eff(*_gather(state_pre, rows[_F_DHI], rows[_F_DLO],
                               khi))
        cv, cu = _eff(*_gather(state_pre, rows[_F_CHI], rows[_F_CLO],
                               khi))
        qv, qu = _gather(state_pre, rows[_F_QHI], rows[_F_QLO], khi)
        lcv, lcu = _gather(state_pre, rows[_F_LHI], rows[_F_LLO], khi)
        rise = (~lcv & ~lcu) & (cv & ~cu)
        known = ~cu
        lcv2 = (lcv & ~known) | (cv & known)
        lcu2 = lcu & ~known
        qv = (qv & ~rise) | (dv & rise)
        qu = (qu & ~rise) | (du & rise)
        # async reset-low overlay, gated per-gate by rst_en
        av, au = _eff(*_gather(state_pre, rows[_F_RHI], rows[_F_RLO],
                               khi))
        ren = rows[_F_RSTEN]
        a_l = ~av & ~au & ren
        a_x = au & ren
        qv = qv & ~a_l & ~a_x
        qu = (qu & ~a_l) | a_x
        valid = rows[_F_VALID]
        state = _scatter(state, rows[_F_QHI], rows[_F_QLO],
                         qv & valid, qu & valid, khi)
        return _scatter(state, rows[_F_LHI], rows[_F_LLO],
                        lcv2 & valid, lcu2 & valid, khi)

    # 1. forced INPUT values (static rows, per-tick planes)
    for c0 in range(0, plan.nf_pad, CHUNK):
        fhi, flo, fv, fu = fetch_forced(c0)
        state = _scatter(state, fhi, flo, fv, fu, khi)
    # 2. pre-sequential settle of the forced-input cone
    state = comb_loop(state, 0, plan.n_cone)
    # 3. flip-flops, one frozen snapshot per IR segment
    for (c0, c1) in plan.ff_ranges:
        state_pre = state

        def ffbody(li, st, _pre=state_pre):
            return ff_chunk(st, _pre, fetch_ff(li))
        state = jax.lax.fori_loop(jnp.int32(c0), jnp.int32(c1),
                                  ffbody, state)
    # 4. full combinational settle
    state = comb_loop(state, 1, plan.n_full)
    return state


def _hist_planes(plan: TurboPlan, state):
    """state slab -> (v, u) int32 (Khi, 128) full-word planes."""
    s = state.astype(I32)
    v = jnp.bitwise_or(s[:, 0:128],
                       jnp.left_shift(s[:, 128:256], jnp.int32(16)))
    u = jnp.bitwise_or(s[:, 256:384],
                       jnp.left_shift(s[:, 384:512], jnp.int32(16)))
    return v, u


def _pad_forced(plan, FV, FU):
    fvp = np.zeros((FV.shape[0], plan.nf_pad), np.int32)
    fup = np.zeros_like(fvp)
    fvp[:, :plan.nf] = FV.view(np.int32)
    fup[:, :plan.nf] = FU.view(np.int32)
    return fvp, fup


# ---------------------------------------------------------------------------
# runners
# ---------------------------------------------------------------------------

def run_xla(plan: TurboPlan, state0: np.ndarray, FV: np.ndarray,
            FU: np.ndarray):
    """lax.scan over the tick core (CPU / virtual-mesh path)."""
    fvp, fup = _pad_forced(plan, FV, FU)
    cone = jnp.asarray(plan.cone_tab)
    full = jnp.asarray(plan.full_tab)
    fftab = jnp.asarray(plan.ff_tab)
    f_hi = jnp.asarray(plan.f_hi)
    f_lo = jnp.asarray(plan.f_lo)

    def fetch_comb(which, li):
        tab = cone if which == 0 else full
        blk = jax.lax.dynamic_slice(
            tab, (jnp.int32(0), li * jnp.int32(CHUNK)),
            (_N_ROWS, CHUNK))
        return [blk[r:r + 1] for r in range(_N_ROWS)]

    def fetch_ff(li):
        blk = jax.lax.dynamic_slice(
            fftab, (jnp.int32(0), li * jnp.int32(CHUNK)), (12, CHUNK))
        return [blk[r:r + 1] for r in range(12)]

    def step(state, xs):
        fv, fu = xs

        def fetch_forced(c0):
            return (f_hi[:, c0:c0 + CHUNK], f_lo[:, c0:c0 + CHUNK],
                    fv[None, c0:c0 + CHUNK], fu[None, c0:c0 + CHUNK])
        state = _tick_core(plan, state, fetch_forced, fetch_comb,
                           fetch_ff)
        return state, _hist_planes(plan, state)

    def run(state0, FVj, FUj):
        _state, (hv, hu) = jax.lax.scan(step, state0, (FVj, FUj))
        return hv, hu

    hv, hu = jax.jit(run)(jnp.asarray(state0), jnp.asarray(fvp),
                          jnp.asarray(fup))
    return np.asarray(hv), np.asarray(hu)


def run_xla_batch(plan: TurboPlan, state0: np.ndarray, FV: np.ndarray,
                  FU: np.ndarray, watch, mesh=None,
                  axis: str = "batch"):
    """Vmapped-instance run of the turbo tick core — the batched
    niche of the MXU program (the reference's closest analogue is the
    multi-cone fan-out of pe_synth_cuda_u64_cones.cu:671-1860): the
    per-chunk one-hot gather/scatter matmuls batch over instances, so
    the MXU amortizes the per-chunk latency that makes single traces
    dispatch-bound.

    ``FV``/``FU``: uint32 (B, T, nf) per-instance schedules over the
    plan's forced-signal list; ``state0``: (Khi, 512) start slab
    (replicated per instance); ``watch``: int32 signal indices whose
    32-lane words are recorded per tick.  Optionally shards the
    instance axis over ``mesh``.  Returns (hv, hu) uint32 (B, T, W).
    """
    B, T, _nf = FV.shape
    fvp = np.zeros((B, T, plan.nf_pad), np.int32)
    fup = np.zeros_like(fvp)
    fvp[:, :, :plan.nf] = FV.view(np.int32)
    fup[:, :, :plan.nf] = FU.view(np.int32)
    cone = jnp.asarray(plan.cone_tab)
    full = jnp.asarray(plan.full_tab)
    fftab = jnp.asarray(plan.ff_tab)
    f_hi = jnp.asarray(plan.f_hi)
    f_lo = jnp.asarray(plan.f_lo)
    w = np.asarray(watch, np.int32)
    wr = jnp.asarray(w // 128)
    wc = jnp.asarray(w % 128)

    def fetch_comb(which, li):
        tab = cone if which == 0 else full
        blk = jax.lax.dynamic_slice(
            tab, (jnp.int32(0), li * jnp.int32(CHUNK)),
            (_N_ROWS, CHUNK))
        return [blk[r:r + 1] for r in range(_N_ROWS)]

    def fetch_ff(li):
        blk = jax.lax.dynamic_slice(
            fftab, (jnp.int32(0), li * jnp.int32(CHUNK)), (12, CHUNK))
        return [blk[r:r + 1] for r in range(12)]

    def one(state0, FVj, FUj):
        def step(state, xs):
            fv, fu = xs

            def fetch_forced(c0):
                return (f_hi[:, c0:c0 + CHUNK],
                        f_lo[:, c0:c0 + CHUNK],
                        fv[None, c0:c0 + CHUNK],
                        fu[None, c0:c0 + CHUNK])
            state = _tick_core(plan, state, fetch_forced, fetch_comb,
                               fetch_ff)
            hv, hu = _hist_planes(plan, state)
            return state, (hv[wr, wc], hu[wr, wc])
        _state, (hv, hu) = jax.lax.scan(step, state0, (FVj, FUj))
        return hv, hu

    runb = jax.jit(jax.vmap(one, in_axes=(None, 0, 0)))
    fvj = jnp.asarray(fvp)
    fuj = jnp.asarray(fup)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P(axis))
        fvj = jax.device_put(fvj, sh)
        fuj = jax.device_put(fuj, sh)
    hv, hu = runb(jnp.asarray(state0), fvj, fuj)
    return (np.asarray(hv).view(np.uint32),
            np.asarray(hu).view(np.uint32))


def run_pallas(plan: TurboPlan, state0: np.ndarray, FV: np.ndarray,
               FU: np.ndarray, interpret: bool = False):
    """Pallas kernel: grid over ticks, state slab in VMEM scratch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = FV.shape[0]
    khi = plan.Khi
    fvp, fup = _pad_forced(plan, FV, FU)
    cone_w = plan.cone_tab.shape[1]
    full_w = plan.full_tab.shape[1]
    ff_w = plan.ff_tab.shape[1]

    def kernel(s0_ref, fv_ref, fu_ref, fhi_ref, flo_ref, cone_ref,
               full_ref, ff_ref, hv_ref, hu_ref, state_sc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            state_sc[...] = s0_ref[...]

        def fetch_comb(which, li):
            ref = cone_ref if which == 0 else full_ref
            off = pl.multiple_of(li * CHUNK, CHUNK)
            return [ref[r:r + 1, pl.ds(off, CHUNK)]
                    for r in range(_N_ROWS)]

        def fetch_ff(li):
            off = pl.multiple_of(li * CHUNK, CHUNK)
            return [ff_ref[r:r + 1, pl.ds(off, CHUNK)]
                    for r in range(12)]

        def fetch_forced(c0):
            return (fhi_ref[:, c0:c0 + CHUNK],
                    flo_ref[:, c0:c0 + CHUNK],
                    fv_ref[0, :, c0:c0 + CHUNK],
                    fu_ref[0, :, c0:c0 + CHUNK])

        state = _tick_core(plan, state_sc[...], fetch_forced,
                           fetch_comb, fetch_ff)
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
            pl.BlockSpec((1, plan.nf_pad), lambda t: (z(t), z(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, plan.nf_pad), lambda t: (z(t), z(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_ROWS, cone_w), lambda t: (z(t), z(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_N_ROWS, full_w), lambda t: (z(t), z(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, ff_w), lambda t: (z(t), z(t)),
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
                          jnp.asarray(plan.f_hi),
                          jnp.asarray(plan.f_lo),
                          jnp.asarray(plan.cone_tab),
                          jnp.asarray(plan.full_tab),
                          jnp.asarray(plan.ff_tab))
    return np.asarray(hv), np.asarray(hu)


def backend() -> str:
    """PE_TPU_DIGITAL backend select.

    ``native`` (host C++ sweep — the latency-optimal single-trace
    path), ``turbo`` (Pallas MXU whole-tick program), ``turbo_xla``
    (same core as plain XLA), ``flash`` (batched fast-gather engine,
    digital/flash.py), ``levels`` (levelled XLA engine), or
    ``auto``: native on TPU-attached hosts (sequential single-trace
    clocking is dispatch-latency-bound, so the host engine wins; the
    TPU carries the batched axes via run_ticks_batched), levels
    elsewhere (CPU tests exercise the XLA path)."""
    mode = os.environ.get("PE_TPU_DIGITAL", "auto")
    if mode in ("native", "turbo", "turbo_xla", "flash", "levels"):
        return mode
    return "auto"


def pick_auto_batch(ir, batch: int) -> str:
    """auto policy for the batched-instances axis, from the measured
    round-4 crossover (bench_digital.py turbo_batch / BASELINE): the
    fast-gather 'flash' engine (digital/flash.py) pads its column
    count to the XLA vectorized-gather threshold, so its wall-time is
    flat in batch — on TPU it wins the aggregate from B>=8 at any
    design depth (2-3.7 G gate-evals/s at B=128-256 on RV32 vs the
    native host engine's 27-35M looped).  Tiny batches stay on the
    native loop (per-row gather latency isn't amortized); CPU hosts
    keep the levelled vmap engine for test coverage."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    if plat == "tpu" and eligible(ir, allow_cyclic=True):
        if batch >= 8:
            return "flash"
        return "native"
    return "levels"


def pick_auto(ir) -> str:
    """auto policy: native on TPU-attached hosts (single-trace clocking
    is dispatch-latency-bound — the host engine wins while the TPU
    carries the batched axes); native also for DEEP designs on CPU,
    where the unrolled XLA tick program's compile time explodes (a
    200-level netlist takes minutes to build); levels otherwise so the
    XLA path keeps broad test coverage."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    if plat == "tpu":
        return "native"
    deep = ir is not None and (len(ir.levels) >= 48 or
                               ir.n_signals >= 4096)
    return "native" if deep else "levels"
