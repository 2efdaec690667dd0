"""Batched digital engine on the XLA fast-gather path ("flash").

Role parity: the reference accelerates bulk gate evaluation with
u64-packed CUDA cone sweeps (src/pe_synth_cuda_u64_cones.cu:47-113) and
clocks the runtime engine through an event-driven worklist
(circuits/circuit.h:307-337).  The round-3 MXU "turbo" program
(digital/turbo.py) replaced the worklist with one-hot gather/scatter
matmuls — dense O(G*K) contractions against a 2-nonzero-per-row
selection matrix, which capped it at ~8M gate-evals/s regardless of
batch.  This module is the measured-on-chip redesign:

* **State = (K, W) int32**: row k is signal k, columns are
  ``[v-plane words | u-plane words]`` for B instances (each word packs
  32 stimulus lanes, digital/logic.py).  One row fetch returns every
  instance's both planes.
* **SSA slot renumbering**: forced INPUTs first, then per-FF-segment
  q / last-clock slots, then unproduced sources, then every expanded
  comb gate output in (level, sub-level) order with in-cone gates
  sorted first — so every *write* in the tick is a contiguous
  ``dynamic_update_slice`` and only operand *reads* are gathers.
* **Operand reads are plain ``jnp.take``**: measured on TPU v5e, row
  gathers from an (K>=22k, W) slab are latency-bound (~21 ns/row) and
  XLA switches to a fast vectorized path at W >= 256 — so the plan
  always pads W up to 256 columns (padding is free) and a full RV32
  tick costs ~1.4 ms for ANY batch, i.e. 2-3.7 G gate-evals/s
  aggregate at B=128-256 vs the host AVX-512 engine's 118 M.
* **Op-runs**: within a sub-level gates are sorted by opcode, so each
  Kleene core compiles branch-free over a static row range; no
  per-gate masks.

Semantics are bit-identical to the levelled engine
(digital/engine.py): forced-input write, input-cone settle, per-segment
flip-flop update against a frozen pre-segment state, full settle.
Eligibility is ``turbo.eligible(ir, allow_cyclic=True)`` — the
feed-forward comb set + DFF/DFF_ARSTN, plus gate-level latch feedback
(``ir.cyclic``): cyclic gates keep per-segment contiguous (non-SSA)
slots and settle under a bounded on-device ``lax.while_loop`` fixpoint
mirroring the native sweep engine's Jacobi schedule
(native/pe_digital.cpp jacobi_segments + the update-table worklist role,
circuit.h:307-337).  Because the topological leveller classifies every
gate downstream of a cycle as cyclic too, the SSA (levelled) outputs
cannot change during the fixpoint — so only the Jacobi pass iterates,
which is bit-exact with the native engine's full re-sweep and cheaper.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ir import DigitalIR
from .turbo import _expand_level, _GEN2_ENC

I32 = jnp.int32
MIN_W = 256          # XLA gather fast-path threshold (measured v5e)

# ops sorted key (stable run grouping)
_OP_ID = {op: i for i, op in enumerate(_GEN2_ENC)}
_UNARY = ("NOT", "YES", "IS_UNKNOWN")


def _core_fn(op: str):
    """Kleene core for one opcode: (va, ua, vb, ub) -> (v, u).

    Formulas mirror digital/logic.py (and turbo._chunk_logic), operating
    bitwise on int32 lane words."""
    def eff(v, u):
        return v & ~u, ~v & ~u          # (high, low) known masks

    if op in ("AND", "NAND", "NIMP"):
        def f(va, ua, vb, ub, _inv=(op == "NAND"), _nb=(op == "NIMP")):
            if _nb:                      # a & ~b
                vb, ub = ~vb & ~ub, ub
            ha, la = eff(va, ua)
            hb, lb = eff(vb, ub)
            v = ha & hb
            u = ~(v | la | lb)
            if _inv:
                v = ~v & ~u
            return v, u
        return f
    if op in ("OR", "NOR", "IMP"):
        def f(va, ua, vb, ub, _inv=(op == "NOR"), _na=(op == "IMP")):
            if _na:                      # ~a | b
                va, ua = ~va & ~ua, ua
            ha, la = eff(va, ua)
            hb, lb = eff(vb, ub)
            v = ha | hb
            u = ~(v | (la & lb))
            if _inv:
                v = ~v & ~u
            return v, u
        return f
    if op in ("XOR", "XNOR"):
        def f(va, ua, vb, ub, _inv=(op == "XNOR")):
            known = ~ua & ~ub
            v = (va ^ vb) & known
            u = ~known
            if _inv:
                v = ~v & ~u
            return v, u
        return f
    if op in ("NOT", "YES"):
        def f(va, ua, vb, ub, _inv=(op == "NOT")):
            v = va & ~ua
            if _inv:
                v = ~va & ~ua
            return v, ua
        return f
    if op == "CASE_EQ":
        def f(va, ua, vb, ub):
            return ~(va ^ vb) & ~(ua ^ ub), jnp.zeros_like(va)
        return f
    if op == "IS_UNKNOWN":
        def f(va, ua, vb, ub):
            return ua, jnp.zeros_like(ua)
        return f
    if op == "TRI":
        def f(va, ua, vb, ub):           # a = data, b = enable
            eh, el = vb & ~ub, ~vb & ~ub
            tbv = va & ~ua
            v = (eh & tbv) | el
            u = (eh & ua) | el | ub
            return v, u
        return f
    if op == "RESOLVE2":
        def f(va, ua, vb, ub):
            az = ua & va
            bz = ub & vb
            eq = ~(va ^ vb) & ~(ua ^ ub)
            sel_b = az
            sel_a = ~az & bz
            sel_e = ~az & ~bz & eq
            conflict = ~az & ~bz & ~eq
            v = (sel_b & vb) | (sel_a & va) | (sel_e & va)
            u = (sel_b & ub) | (sel_a & ua) | (sel_e & ua) | conflict
            return v, u
        return f
    raise ValueError(op)                  # pragma: no cover


_CORES = {op: _core_fn(op) for op in _GEN2_ENC}


class FlashPlan:
    """Static compilation of a DigitalIR + forced-signal list into
    SSA-renumbered slots, per-sub-level op-runs, and FF segment maps."""

    def __init__(self, ir: DigitalIR, forced_sig: np.ndarray):
        forced_sig = np.asarray(forced_sig, np.int32)
        S = ir.n_signals
        self.S = S
        self.nf = len(forced_sig)

        # ---- expand comb levels to basic gates (temps appended) -----
        next_temp = [S]

        def alloc_temp():
            t = next_temp[0]
            next_temp[0] += 1
            return t

        sublevels: List[List[Tuple[str, int, int, int]]] = []
        for level in ir.levels:
            sublevels.extend(_expand_level(level, alloc_temp))
        n_tot = next_temp[0]

        # ---- dirty-cone marking over expanded gates ------------------
        dirty = np.zeros(n_tot, bool)
        for inst, out_sigs in ir.inputs:
            for s in out_sigs:
                dirty[int(s)] = True
        in_cone: List[np.ndarray] = []
        for sub in sublevels:
            m = np.zeros(len(sub), bool)
            for k, (op, a, b, o) in enumerate(sub):
                if dirty[a] or (op not in _UNARY and dirty[b]):
                    m[k] = True
                    dirty[o] = True
            in_cone.append(m)

        # ---- slot renumbering ----------------------------------------
        # [forced][per-seg q][per-seg lc][sources][sub-level outputs...]
        NEW = np.full(n_tot, -1, np.int64)
        nxt = 0
        for s in forced_sig:
            if NEW[s] < 0:
                NEW[s] = nxt
                nxt += 1
        self.ff_segs = []          # (d_new, c_new, r_new|None, q0, lc0, n)
        ff_fill = []               # (q_old_sigs, lc_rows) for pack/commit
        for seg in ir.seq:
            q = seg.outputs[:, 0].astype(np.int64)
            n = len(q)
            for s in q:
                assert NEW[s] < 0, "FF q driven twice"
                NEW[s] = nxt
                nxt += 1
            q0 = nxt - n
            lc0 = nxt
            nxt += n               # lc slots live only in new space
            ff_fill.append((seg.op, q, q0, lc0, n))
        # cyclic (gate-level latch feedback) records: one Jacobi unit
        # per IR segment — within a segment all gates read pre-segment
        # state; segments apply sequentially (native_run.py cy tables)
        cyc_records: List[List[Tuple[str, int, int, int]]] = []
        for seg in ir.cyclic:
            two = seg.inputs.shape[1] > 1 and seg.op not in _UNARY
            gates = []
            for g in range(len(seg.outputs)):
                a = int(seg.inputs[g][0])
                b = int(seg.inputs[g][1]) if two else a
                gates.append((seg.op, a, b, int(seg.outputs[g][0])))
            cyc_records.append(gates)
        self.fix_budget = int(ir.cyclic_budget) if ir.cyclic else 0

        # sources: anything unproduced (non-forced INPUTs, consts, ...)
        produced = np.zeros(n_tot, bool)
        for sub in sublevels:
            for op, a, b, o in sub:
                produced[o] = True
        for seg in ir.seq:
            for s in seg.outputs[:, 0]:
                produced[int(s)] = True
        for gates in cyc_records:
            for _op, _a, _b, o in gates:
                produced[o] = True
        for s in range(S):
            if NEW[s] < 0 and not produced[s]:
                NEW[s] = nxt
                nxt += 1
        # cyclic outputs: a contiguous block (change detection slices
        # it) with per-segment contiguous sub-ranges (each Jacobi write
        # is one dynamic_update_slice)
        self.cyc0 = nxt
        cyc_passes_old = []
        for gates in cyc_records:
            o0 = nxt
            for _op, _a, _b, o in gates:
                assert NEW[o] < 0, "cyclic output driven twice"
                NEW[o] = nxt
                nxt += 1
            cyc_passes_old.append((gates, o0))
        self.n_cyc = nxt - self.cyc0
        # comb outputs, cone-first, op-sorted
        self.cone_passes = []      # per sub-level: (a,b idx, runs, o0, g)
        self.full_passes = []
        order_key = lambda g: _OP_ID[g[0]]
        for sub, cm in zip(sublevels, in_cone):
            cone = sorted((g for g, m in zip(sub, cm) if m), key=order_key)
            rest = sorted((g for g, m in zip(sub, cm) if not m),
                          key=order_key)
            gates = cone + rest
            o0 = nxt
            for op, a, b, o in gates:
                assert NEW[o] < 0, "comb output driven twice"
                NEW[o] = nxt
                nxt += 1
            self.full_passes.append((gates, o0))
            if cone:
                self.cone_passes.append((cone, o0))
        assert nxt == n_tot + sum(n for *_x, n in ff_fill)
        self.K = nxt
        self.NEW = NEW

        # finalize pass tables in new numbering
        def build_pass(gates, o0):
            a_idx = np.array([NEW[g[1]] for g in gates], np.int32)
            b_idx = np.array([NEW[g[2]] for g in gates], np.int32)
            runs = []
            i = 0
            while i < len(gates):
                j = i
                while j < len(gates) and gates[j][0] == gates[i][0]:
                    j += 1
                runs.append((gates[i][0], i, j - i))
                i = j
            return (jnp.asarray(a_idx), jnp.asarray(b_idx), runs,
                    int(o0), len(gates))

        self.cone_passes = [build_pass(g, o0) for g, o0 in
                            self.cone_passes]
        self.full_passes = [build_pass(g, o0) for g, o0 in
                            self.full_passes]
        self.cyclic_passes = [build_pass(g, o0) for g, o0 in
                              cyc_passes_old]

        # FF segment tables
        self.ff_meta = []          # (op, q_old, q0, lc0, n) for commit
        for seg, (op, q_old, q0, lc0, n) in zip(ir.seq, ff_fill):
            d = jnp.asarray(NEW[seg.inputs[:, 0].astype(np.int64)]
                            .astype(np.int32))
            c = jnp.asarray(NEW[seg.inputs[:, 1].astype(np.int64)]
                            .astype(np.int32))
            r = (jnp.asarray(NEW[seg.inputs[:, 2].astype(np.int64)]
                             .astype(np.int32))
                 if op == "DFF_ARSTN" else None)
            self.ff_segs.append((d, c, r, q0, lc0, n))
            self.ff_meta.append((op, q_old, q0, lc0, n))
        self.forced_sig = forced_sig

    # ---- state packing ---------------------------------------------------
    def pack_state(self, sv: np.ndarray, su: np.ndarray,
                   seq_state: Dict, B: int) -> np.ndarray:
        """(S,) uint32 planes + engine seq_state, replicated to B
        instance columns -> (K, 2B) int32 slab."""
        v = np.zeros(self.K, np.uint32)
        u = np.zeros(self.K, np.uint32)
        old = np.arange(self.S)
        NEW = self.NEW[:self.S].astype(np.int64)
        v[NEW] = np.asarray(sv, np.uint32)[old]
        u[NEW] = np.asarray(su, np.uint32)[old]
        for op, q_old, q0, lc0, n in self.ff_meta:
            st = seq_state.get(op, {})
            if "lc_v" in st:
                v[lc0:lc0 + n] = np.asarray(st["lc_v"], np.uint32)
                u[lc0:lc0 + n] = np.asarray(st["lc_u"], np.uint32)
        col = np.concatenate([np.repeat(v[:, None], B, 1),
                              np.repeat(u[:, None], B, 1)],
                             axis=1).view(np.int32)
        return col

    # ---- tick core ---------------------------------------------------------
    def _comb_pass(self, st, passes, B):
        for a_idx, b_idx, runs, o0, g in passes:
            ra = jnp.take(st, a_idx, axis=0)
            rb = jnp.take(st, b_idx, axis=0)
            va, ua = ra[:, :B], ra[:, B:]
            vb, ub = rb[:, :B], rb[:, B:]
            outs_v, outs_u = [], []
            for op, i, nrun in runs:
                v, u = _CORES[op](va[i:i + nrun], ua[i:i + nrun],
                                  vb[i:i + nrun], ub[i:i + nrun])
                outs_v.append(v)
                outs_u.append(u)
            blk = jnp.concatenate(
                [jnp.concatenate(outs_v, axis=0),
                 jnp.concatenate(outs_u, axis=0)], axis=1)
            st = jax.lax.dynamic_update_slice(st, blk, (o0, 0))
        return st

    def _ff_pass(self, st, B):
        for d_i, c_i, r_i, q0, lc0, n in self.ff_segs:
            rd = jnp.take(st, d_i, axis=0)
            rc = jnp.take(st, c_i, axis=0)
            dv, du = rd[:, :B] & ~rd[:, B:], rd[:, B:]
            cv, cu = rc[:, :B] & ~rc[:, B:], rc[:, B:]
            q = jax.lax.dynamic_slice(st, (q0, 0), (n, 2 * B))
            lc = jax.lax.dynamic_slice(st, (lc0, 0), (n, 2 * B))
            qv, qu = q[:, :B], q[:, B:]
            lcv, lcu = lc[:, :B], lc[:, B:]
            rise = (~lcv & ~lcu) & (cv & ~cu)
            known = ~cu
            lcv2 = (lcv & ~known) | (cv & known)
            lcu2 = lcu & ~known
            qv = (qv & ~rise) | (dv & rise)
            qu = (qu & ~rise) | (du & rise)
            if r_i is not None:
                rr = jnp.take(st, r_i, axis=0)
                av, au = rr[:, :B] & ~rr[:, B:], rr[:, B:]
                a_l = ~av & ~au
                a_x = au
                qv = qv & ~a_l & ~a_x
                qu = (qu & ~a_l) | a_x
            st = jax.lax.dynamic_update_slice(
                st, jnp.concatenate([qv, qu], axis=1), (q0, 0))
            st = jax.lax.dynamic_update_slice(
                st, jnp.concatenate([lcv2, lcu2], axis=1), (lc0, 0))
        return st

    def _fixpoint(self, st, B):
        """Bounded Jacobi settle over the cyclic block (pe_digital.cpp
        step 4): iterate the cyclic pass until the [cyc0, cyc0+n_cyc)
        slot block stops changing or ``fix_budget`` passes ran.  The
        SSA outputs are frozen during the settle (no level gate reads a
        cyclic output), so comparing the cyclic block alone — and not
        re-running the full pass — is exact."""
        nc, c0 = self.n_cyc, self.cyc0
        budget = jnp.int32(self.fix_budget)

        def cur(s):
            return jax.lax.dynamic_slice(s, (c0, 0), (nc, 2 * B))

        prev0 = cur(st)
        st = self._comb_pass(st, self.cyclic_passes, B)   # pass 1

        def cond(c):
            s, prev, it = c
            return jnp.any(cur(s) != prev) & (it < budget)

        def body(c):
            s, _, it = c
            prev = cur(s)
            return self._comb_pass(s, self.cyclic_passes, B), prev, \
                it + 1

        st, _, _ = jax.lax.while_loop(cond, body,
                                      (st, prev0, jnp.int32(1)))
        return st

    def tick(self, st, forced_blk, B: int):
        """forced_blk: (nf, 2B) int32 this tick's INPUT planes."""
        if self.nf:
            st = jax.lax.dynamic_update_slice(st, forced_blk, (0, 0))
        if self.cyclic_passes:
            # with feedback, the pre-sequential settle is the FULL
            # program + one Jacobi pass (engine.py pre_fused comb_pass
            # when has_fixpoint; pe_digital.cpp step 2)
            st = self._comb_pass(st, self.full_passes, B)
            st = self._comb_pass(st, self.cyclic_passes, B)
            st = self._ff_pass(st, B)
            st = self._comb_pass(st, self.full_passes, B)
            st = self._fixpoint(st, B)
            return st
        st = self._comb_pass(st, self.cone_passes, B)
        st = self._ff_pass(st, B)
        st = self._comb_pass(st, self.full_passes, B)
        return st


def _run_core(plan: FlashPlan, state0, xs, watch_new, B: int,
              presettle: bool):
    """jit-able: state0 (K, 2B) int32, xs (T, nf, 2B) int32 ->
    history (T, nw, 2B) int32."""
    if presettle:
        # materialize macro temp slots (stale-temp reads in later cone
        # passes must see settled values)
        state0 = plan._comb_pass(state0, plan.full_passes, B)

    def step(st, fb):
        st = plan.tick(st, fb, B)
        return st, jnp.take(st, watch_new, axis=0)

    st, hist = jax.lax.scan(step, state0, xs)
    return st, hist


def run_batched(plan: FlashPlan, sv, su, seq_state, FV, FU, watch,
                mesh=None, axis: str = "batch"):
    """B-instance batched run.

    FV/FU: uint32 (B, T, nf); watch: old-numbering signal indices.
    Returns (hv, hu) uint32 (B, T, nw).  Column count is padded up to
    MIN_W so XLA's vectorized gather path engages at any batch size.
    """
    FV = np.ascontiguousarray(np.asarray(FV, np.uint32))
    FU = np.ascontiguousarray(np.asarray(FU, np.uint32))
    B, T, nf = FV.shape
    assert nf == plan.nf
    ndev = 1
    if mesh is not None:
        ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    Bp = B
    min_b = max(MIN_W // 2, ndev)
    if Bp % ndev or Bp < min_b:
        Bp = max(min_b, ((B + ndev - 1) // ndev) * ndev)
        # pad to a per-device multiple that keeps W_loc >= MIN_W
        per = (Bp + ndev - 1) // ndev
        per = max(per, MIN_W // 2)
        Bp = per * ndev
    if Bp != B:
        pad = np.zeros((Bp - B, T, nf), np.uint32)
        FV = np.concatenate([FV, pad], axis=0)
        FU = np.concatenate([FU, pad], axis=0)

    watch_old = np.asarray(watch, np.int64)
    watch_new = jnp.asarray(plan.NEW[watch_old].astype(np.int32))
    nw = len(watch_old)

    state0 = jnp.asarray(plan.pack_state(np.asarray(sv), np.asarray(su),
                                         seq_state, 1))   # (K, 2)

    # xs layout (T, nf, 2B): v columns then u columns
    xs = np.concatenate([FV.transpose(1, 2, 0),
                         FU.transpose(1, 2, 0)], axis=2).view(np.int32)
    xsj = jnp.asarray(xs)

    if mesh is None:
        key = ("local", Bp, xs.shape, watch_old.tobytes())
        cache = plan.__dict__.setdefault("_runners", {})
        run = cache.get(key)
        if run is None:
            def run_fn(s0, xs):
                s = jnp.concatenate([jnp.repeat(s0[:, :1], Bp, 1),
                                     jnp.repeat(s0[:, 1:], Bp, 1)],
                                    axis=1)
                _st, hist = _run_core(plan, s, xs, watch_new, Bp,
                                      not plan.cyclic_passes)
                return hist
            run = cache[key] = jax.jit(run_fn)
        hist = run(state0, xsj)
        hist = np.asarray(hist)
        hv = np.ascontiguousarray(hist[:, :, :Bp].transpose(2, 0, 1)[:B])
        hu = np.ascontiguousarray(hist[:, :, Bp:].transpose(2, 0, 1)[:B])
        return hv.view(np.uint32), hu.view(np.uint32)

    # mesh path: shard_map over the instance axis; each device runs the
    # identical program on its local column block.
    try:
        from jax import shard_map
    except ImportError:                   # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    B_loc = Bp // ndev
    # xs reorganized to (ndev, T, nf, 2*B_loc) so one leading shard axis
    xs4 = np.concatenate(
        [FV.reshape(ndev, B_loc, T, nf).transpose(0, 2, 3, 1),
         FU.reshape(ndev, B_loc, T, nf).transpose(0, 2, 3, 1)],
        axis=3).view(np.int32)

    key = ("mesh", id(mesh), axis, B_loc, xs4.shape, watch_old.tobytes())
    cache = plan.__dict__.setdefault("_runners", {})
    fn_jit = cache.get(key)
    if fn_jit is None:
        def local(s0, xs):
            xs = xs[0]                   # strip the shard axis
            s = jnp.concatenate([jnp.repeat(s0[:, :1], B_loc, 1),
                                 jnp.repeat(s0[:, 1:], B_loc, 1)],
                                axis=1)
            try:    # mark the replicated start state device-varying so
                    # the scan carry type matches (jax >= 0.7 vma check)
                s = jax.lax.pcast(s, (axis,), to="varying")
            except AttributeError:
                try:
                    s = jax.lax.pvary(s, (axis,))   # older jax
                except AttributeError:
                    pass
            _st, hist = _run_core(plan, s, xs, watch_new, B_loc,
                                  not plan.cyclic_passes)
            return hist[None]

        fn_jit = cache[key] = jax.jit(shard_map(
            local, mesh=mesh, in_specs=(P(), P(axis)),
            out_specs=P(axis)))
    xs_sh = jax.device_put(
        jnp.asarray(xs4), NamedSharding(mesh, P(axis)))
    hist = np.asarray(fn_jit(state0, xs_sh))        # (ndev, T, nw, 2B_loc)
    hv = np.ascontiguousarray(
        hist[:, :, :, :B_loc].transpose(0, 3, 1, 2).reshape(Bp, T, nw)[:B])
    hu = np.ascontiguousarray(
        hist[:, :, :, B_loc:].transpose(0, 3, 1, 2).reshape(Bp, T, nw)[:B])
    return hv.view(np.uint32), hu.view(np.uint32)
