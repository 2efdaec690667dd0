"""Traced analog engine: MNA assembly, masked Newton, transient scan,
batched AC sweep.

The reference's hot path (circuit.h:892-1527: per-model vtable stamping
into btree-map MNA + fresh SparseLU per solve) becomes:

* ``assemble``      — segmented vmapped device evaluation + one fused
  scatter-add into a dense (N+1)x(N+1) target (row/col N is the ground
  dummy).  All patterns are static; XLA sees pure gather/scatter + math.
* ``newton_solve``  — ``lax.while_loop`` with the reference's V/I abs+rel
  convergence rule (circuit.h:900-948), max 64 iterations, NaN guard.
* ``transient``     — ``lax.scan`` over fixed steps; companion-model
  recurrences (``step_update``) run between steps exactly like
  ``update_tr_step`` (circuit.h:363-374).
* ``ac_sweep``      — one *batched* complex solve vmapped over the omega
  grid (the reference's serial loop circuit.h:399-428).

Everything is pure: device state lives in a ``{family: {var: (n,)}}``
pytree, so the whole engine vmaps over circuit batches (Monte-Carlo /
corners) and shards over device meshes.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.base import StampCtx
from .lower import AnalogIR
from ..ops.linsolve import dense_solve

MAX_NEWTON_ITER = 64      # circuit.h:898


# ---------------------------------------------------------------------------
# parameter/state pytree helpers
# ---------------------------------------------------------------------------

def initial_params(ir: AnalogIR, dtype=jnp.float64) -> Dict[str, Any]:
    return {f.mdef.id_name: jnp.asarray(f.P, dtype) for f in ir.families}


def initial_state(ir: AnalogIR, dtype=jnp.float64) -> Dict[str, Any]:
    return {f.mdef.id_name: {k: jnp.asarray(v, dtype)
                             for k, v in f.state0.items()}
            for f in ir.families}


def initial_x(ir: AnalogIR, dtype=jnp.float64):
    return jnp.zeros(ir.n_unknowns, dtype)


def _gather(x_ext, idx):
    return x_ext[idx]


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

def assemble(ir: AnalogIR, params, x, states, ctx: StampCtx,
             drives=None, dtype=jnp.float64):
    """Build (A, Z) and the updated device states.

    ``drives``: optional dict with 'node' (k,) int32, 'active' (k,) float,
    'v' (k,) float — the digital->analog branch constraints regenerated
    per tick (circuit.h:1015-1022).
    """
    n = ir.n_unknowns
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    A = jnp.zeros((n + 1, n + 1), dtype)
    Z = jnp.zeros(n + 1, dtype)
    new_states = {}
    for fam in ir.families:
        key = fam.mdef.id_name
        P = params[key]
        st = states.get(key, {})
        vp = x_ext[jnp.asarray(fam.pin_nodes)]
        vb = x_ext[jnp.asarray(fam.br_idx)]

        def one(Pr, vr, br, sr, _stamp=fam.mdef.stamp):
            return _stamp(Pr, vr, br, sr, ctx)

        a_vals, z_vals, st2 = jax.vmap(one)(P, vp, vb, st)
        # optional per-instance mask (sharding padding / soft delete)
        msk = getattr(fam, "mask", None)
        if msk is not None:
            m = jnp.asarray(msk, dtype)
            a_vals = a_vals * m[:, None]
            if fam.z_rows.size:
                z_vals = z_vals * m[:, None]
        A = A.at[jnp.asarray(fam.a_rows), jnp.asarray(fam.a_cols)].add(
            a_vals.astype(dtype))
        if fam.z_rows.size:
            Z = Z.at[jnp.asarray(fam.z_rows)].add(z_vals.astype(dtype))
        new_states[key] = st2

    # Gmin conditioning on analog-node diagonal (circuit.h:1107-1110)
    gmin = ctx.env.get("g_min", 0.0)
    diag = jnp.arange(ir.n_nodes)
    A = A.at[diag, diag].add(jnp.full(ir.n_nodes, gmin, dtype))

    # hybrid drive slots: active -> ideal V source row, inactive -> i_k = 0
    if ir.n_drive_slots:
        k = ir.n_drive_slots
        base = ir.n_nodes + ir.n_branches
        rows = jnp.arange(base, base + k)
        if drives is None:
            node = jnp.full(k, n, jnp.int32)
            active = jnp.zeros(k, dtype)
            dv = jnp.zeros(k, dtype)
        else:
            active = drives["active"].astype(dtype)
            node = jnp.where(drives["active"] > 0.5, drives["node"], n)
            dv = drives["v"].astype(dtype)
        A = A.at[node, rows].add(active)              # B quadrant
        A = A.at[rows, node].add(active)              # C quadrant
        A = A.at[rows, rows].add(1.0 - active)        # D identity if off
        Z = Z.at[rows].add(active * dv)               # E value

    return A[:n, :n], Z[:n], new_states


# ---------------------------------------------------------------------------
# sparse (COO) assembly for large systems — same stamps, no dense matrix
# ---------------------------------------------------------------------------

def _sparse_pattern(ir: AnalogIR):
    """Concatenated static COO pattern (cached on the IR)."""
    if getattr(ir, "_sp_pat", None) is None:
        import numpy as _np
        rows = [f.a_rows.reshape(-1) for f in ir.families
                if f.a_rows.size]
        cols = [f.a_cols.reshape(-1) for f in ir.families
                if f.a_cols.size]
        diag = _np.arange(ir.n_nodes, dtype=_np.int32)
        rows.append(diag)
        cols.append(diag)
        ir._sp_pat = (_np.concatenate(rows).astype(_np.int32),
                      _np.concatenate(cols).astype(_np.int32))
    return ir._sp_pat


def assemble_sparse(ir: AnalogIR, params, x, states, ctx: StampCtx,
                    drives=None, dtype=jnp.float64):
    """COO values + RHS (same device kernels as `assemble`)."""
    n = ir.n_unknowns
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    Z = jnp.zeros(n + 1, dtype)
    val_parts = []
    new_states = {}
    for fam in ir.families:
        key = fam.mdef.id_name
        P = params[key]
        st = states.get(key, {})
        vp = x_ext[jnp.asarray(fam.pin_nodes)]
        vb = x_ext[jnp.asarray(fam.br_idx)]

        def one(Pr, vr, br, sr, _stamp=fam.mdef.stamp):
            return _stamp(Pr, vr, br, sr, ctx)

        a_vals, z_vals, st2 = jax.vmap(one)(P, vp, vb, st)
        msk = getattr(fam, "mask", None)
        if msk is not None:
            m = jnp.asarray(msk, dtype)
            a_vals = a_vals * m[:, None]
            if fam.z_rows.size:
                z_vals = z_vals * m[:, None]
        if fam.a_rows.size:
            val_parts.append(a_vals.astype(dtype).reshape(-1))
        if fam.z_rows.size:
            Z = Z.at[jnp.asarray(fam.z_rows)].add(z_vals.astype(dtype))
        new_states[key] = st2
    gmin = ctx.env.get("g_min", 0.0)
    val_parts.append(jnp.full(ir.n_nodes, gmin, dtype))
    s_rows, s_cols = _sparse_pattern(ir)
    rows = jnp.asarray(s_rows)
    cols = jnp.asarray(s_cols)
    vals = jnp.concatenate(val_parts)

    if ir.n_drive_slots:
        k = ir.n_drive_slots
        base = ir.n_nodes + ir.n_branches
        drows = jnp.arange(base, base + k, dtype=jnp.int32)
        if drives is None:
            node = jnp.full(k, n, jnp.int32)
            active = jnp.zeros(k, dtype)
            dv = jnp.zeros(k, dtype)
        else:
            active = drives["active"].astype(dtype)
            node = jnp.where(drives["active"] > 0.5,
                             drives["node"].astype(jnp.int32),
                             jnp.int32(n))
            dv = drives["v"].astype(dtype)
        rows = jnp.concatenate([rows, node, drows, drows])
        cols = jnp.concatenate([cols, drows, node, drows])
        vals = jnp.concatenate([vals, active, active, 1.0 - active])
        Z = Z.at[drows].add(active * dv)
    return rows, cols, vals, Z[:n], new_states


# ---------------------------------------------------------------------------
# Newton-Raphson (masked, jit-friendly)
# ---------------------------------------------------------------------------

def _device_converged(ir: AnalogIR, params, x, states):
    """AND of per-family check_conv vetos (circuit.h:950-965)."""
    ok = jnp.bool_(True)
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    for fam in ir.families:
        if fam.mdef.check_conv is None:
            continue
        key = fam.mdef.id_name
        vp = x_ext[jnp.asarray(fam.pin_nodes)]

        def one(Pr, vr, sr, _f=fam.mdef.check_conv):
            return _f(Pr, vr, sr)

        flags = jax.vmap(one)(params[key], vp, states.get(key, {}))
        ok = ok & jnp.all(flags)
    return ok


def _converged(x_old, x_new, n_nodes, env):
    va, vr = env["v_abstol"], env["v_reltol"]
    ia_, ir_ = env["i_abstol"], env["i_reltol"]
    dv = jnp.abs(x_new[:n_nodes] - x_old[:n_nodes])
    tol_v = va + vr * jnp.maximum(jnp.abs(x_new[:n_nodes]),
                                  jnp.abs(x_old[:n_nodes]))
    di = jnp.abs(x_new[n_nodes:] - x_old[n_nodes:])
    tol_i = ia_ + ir_ * jnp.maximum(jnp.abs(x_new[n_nodes:]),
                                    jnp.abs(x_old[n_nodes:]))
    ok_v = jnp.all(dv <= tol_v) if x_new[:n_nodes].size else jnp.bool_(True)
    ok_i = jnp.all(di <= tol_i) if x_new[n_nodes:].size else jnp.bool_(True)
    return ok_v & ok_i


def newton_solve(ir: AnalogIR, params, x0, states0, ctx: StampCtx,
                 drives=None, dtype=jnp.float64,
                 max_iter: int = MAX_NEWTON_ITER,
                 method: str = "dense"):
    """Newton outer loop (circuit.h:892-985).

    Returns (x, states, ok).  Linear circuits take the single-solve fast
    path exactly like ``if(!has_nonlinear_device()) return solve_once()``.
    ``method``: 'dense' (batched LU) or 'sparse' (COO BiCGStab, for
    large systems — the CUDA-solver threshold policy of
    circuit.h:115-121 lives in the Circuit driver).
    """
    if method == "sparse":
        from ..ops.sparse import bicgstab

        def solve_once(x, st):
            rows, cols, vals, Z, st2 = assemble_sparse(
                ir, params, x, st, ctx, drives, dtype)
            x_new, ok, _it = bicgstab(rows, cols, vals, Z,
                                      ir.n_unknowns, x0=x)
            ok = ok & jnp.all(jnp.isfinite(x_new))
            return x_new, st2, ok
    else:
        def solve_once(x, st):
            A, Z, st2 = assemble(ir, params, x, st, ctx, drives, dtype)
            x_new = dense_solve(A, Z)
            ok = jnp.all(jnp.isfinite(x_new))
            return x_new, st2, ok

    if not ir.nonlinear:
        x, st, ok = solve_once(x0, states0)
        return x, st, ok

    def cond(c):
        _x, _st, it, conv, ok = c
        return (~conv) & ok & (it < max_iter)

    def body(c):
        x, st, it, _conv, _ok = c
        x_new, st2, ok = solve_once(x, st)
        conv = _converged(x, x_new, ir.n_nodes, ctx.env) & ok
        conv = conv & _device_converged(ir, params, x_new, st2)
        x_safe = jnp.where(ok, x_new, x)
        return (x_safe, st2, it + 1, conv, ok)

    init = (x0, states0, jnp.int32(0), jnp.bool_(False), jnp.bool_(True))
    x, st, it, conv, ok = jax.lax.while_loop(cond, body, init)
    return x, st, conv & ok


# ---------------------------------------------------------------------------
# explicit-batch Newton (the MXU path)
#
# ``jax.vmap(newton_solve)`` batches the per-lane Gauss loop; this variant
# instead assembles the whole (B, n, n) batch and hands it to the batched
# blocked Gauss-Jordan kernel (ops/gj.py) — the TPU-native replacement
# for the reference's per-system SparseLU (circuit.h:1484-1524).  All
# lanes iterate together under one while_loop; converged/failed lanes
# are frozen by masking, mirroring the reference's per-circuit loop.
# ---------------------------------------------------------------------------

def _equil_dense32(rows, cols, vals, n: int, npad: int):
    """Per-lane power-of-two row/col equilibration + scaled dense-f32
    scatter (shared by the delta and frozen Newton paths).  Returns
    (A32 (npad, npad), rs (n,) f32, cs (n,) f32)."""
    v32 = jnp.abs(vals).astype(jnp.float32)
    tiny = jnp.float32(1e-30)
    rmax = jnp.maximum(jnp.zeros(n + 1, jnp.float32).at[rows].max(v32),
                       tiny)
    rs = jnp.exp2(-jnp.floor(jnp.log2(rmax)))            # (n+1,)
    v32r = (vals.astype(jnp.float32)) * rs[rows]
    cmax = jnp.maximum(
        jnp.zeros(n + 1, jnp.float32).at[cols].max(jnp.abs(v32r)), tiny)
    cs = jnp.exp2(-jnp.floor(jnp.log2(cmax)))            # (n+1,)
    v32rc = v32r * cs[cols]
    rows_p = jnp.where(rows >= n, jnp.int32(npad), rows.astype(jnp.int32))
    cols_p = jnp.where(cols >= n, jnp.int32(npad), cols.astype(jnp.int32))
    A32 = jnp.zeros((npad + 1, npad + 1), jnp.float32)
    A32 = A32.at[rows_p, cols_p].add(v32rc)
    pad_d = jnp.arange(n, npad)
    A32 = A32.at[pad_d, pad_d].set(1.0)
    return A32[:npad, :npad], rs[:n], cs[:n]


def _delta_solve_prep(ir: AnalogIR, params, x, states, ctx, drives,
                      dtype, npad: int):
    """Per-lane (vmapped) prep: sparse assembly, f64 residual, power-of-2
    equilibration, and the scaled dense-f32 scatter for the GJ kernel.

    The f64 work stays O(nnz) (TPU-emulated f64 is ~50x slower than f32,
    so dense f64 passes are forbidden on the hot path); the dense array
    is built only in f32.  Returns (A32 (npad,npad), r32 (npad,),
    cscale_f64 (n,), resid_inf, states2).
    """
    n = ir.n_unknowns
    rows, cols, vals, Z, st2 = assemble_sparse(
        ir, params, x, states, ctx, drives, dtype)
    # f64 sparse residual r = Z - A x  (x gathered with ground dummy = 0)
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    ax = jnp.zeros(n + 1, dtype).at[rows].add(vals * x_ext[cols])
    r = Z - ax[:n]
    # power-of-two row/col equilibration computed on f32 magnitudes
    v32 = jnp.abs(vals).astype(jnp.float32)
    tiny = jnp.float32(1e-30)
    rmax = jnp.maximum(jnp.zeros(n + 1, jnp.float32).at[rows].max(v32),
                       tiny)
    rs = jnp.exp2(-jnp.floor(jnp.log2(rmax)))            # (n+1,)
    v32r = (vals.astype(jnp.float32)) * rs[rows]
    cmax = jnp.maximum(
        jnp.zeros(n + 1, jnp.float32).at[cols].max(jnp.abs(v32r)), tiny)
    cs = jnp.exp2(-jnp.floor(jnp.log2(cmax)))            # (n+1,)
    v32rc = v32r * cs[cols]
    # scaled dense f32 target (ground dummy at npad; identity padding)
    rows_p = jnp.where(rows >= n, jnp.int32(npad), rows.astype(jnp.int32))
    cols_p = jnp.where(cols >= n, jnp.int32(npad), cols.astype(jnp.int32))
    A32 = jnp.zeros((npad + 1, npad + 1), jnp.float32)
    A32 = A32.at[rows_p, cols_p].add(v32rc)
    pad_d = jnp.arange(n, npad)
    A32 = A32.at[pad_d, pad_d].set(1.0)
    r32 = jnp.zeros(npad, jnp.float32).at[:n].set(
        (r * rs[:n].astype(dtype)).astype(jnp.float32))
    resid_inf = jnp.max(jnp.abs(r))
    return A32[:npad, :npad], r32, cs[:n].astype(dtype), resid_inf, st2


def newton_solve_batched(ir: AnalogIR, params_b, x0_b, states0_b,
                         ctx: StampCtx, drives_b=None, dtype=jnp.float64,
                         max_iter: int = MAX_NEWTON_ITER,
                         solver: str = "hybrid"):
    """Batched Newton: (B, ...) pytrees in, (x (B,n), states, ok (B,)) out.

    ``solver``:
      'gauss'  — per-lane f64 Gauss solves (reference-accurate, slow).
      'delta'  — delta-form Newton: each iteration solves
                 J(x)·δ = -F(x) with the f32 batched GJ kernel and an
                 O(nnz) f64 sparse residual.  Because the *residual* is
                 f64, the fixpoint is f64-accurate even though the
                 Jacobian solve is f32 (inexact-Newton + iterative
                 refinement fused into one loop).
      'hybrid' — 'delta', then a whole-batch 'gauss' rerun if any lane
                 failed (f32 cannot factor equilibrated cond > ~1e7).
    """
    from ..ops.gj import gj_solve32, NB

    dr_axes = None if drives_b is None else 0
    B = x0_b.shape[0]
    n = ir.n_unknowns
    npad = max(NB, ((n + NB - 1) // NB) * NB)

    def gauss_path():
        def asm(p, x, s, d):
            return assemble(ir, p, x, s, ctx, d, dtype)

        assemble_b = jax.vmap(asm, in_axes=(0, 0, 0, dr_axes))

        def solve_once(x_b, st_b):
            A, Z, st2 = assemble_b(params_b, x_b, st_b, drives_b)
            x_new = jax.vmap(dense_solve)(A, Z)
            ok = jnp.all(jnp.isfinite(x_new), axis=1)
            return x_new, st2, ok

        return _newton_loop_batched(ir, params_b, x0_b, states0_b, ctx,
                                    solve_once, max_iter, linear_iters=1)

    if solver == "gauss":
        return gauss_path()

    prep_b = jax.vmap(
        lambda p, x, s, d: _delta_solve_prep(ir, p, x, s, ctx, d, dtype,
                                             npad),
        in_axes=(0, 0, 0, dr_axes))

    def solve_once(x_b, st_b):
        A32, r32, cs, _resid, st2 = prep_b(params_b, x_b, st_b, drives_b)
        d32 = gj_solve32(A32, r32)
        delta = d32[:, :n].astype(dtype) * cs
        x_new = x_b + delta
        ok = jnp.all(jnp.isfinite(x_new), axis=1)
        return x_new, st2, ok

    # linear circuits still need 2 delta iterations (solve + refinement)
    out = _newton_loop_batched(ir, params_b, x0_b, states0_b, ctx,
                               solve_once, max_iter, linear_iters=2)
    if solver == "delta":
        return out
    x, st, ok = out
    return jax.lax.cond(jnp.all(ok), lambda: (x, st, ok),
                        lambda: gauss_path())


FROZEN_STALL = 16    # frozen-preconditioner refactor cadence (iters)
FROZEN_RATE = 0.85   # refactor when residual contraction is worse
                     # (one refactor costs ~13 stale iterations)
FROZEN_GROW_FRAC = 0.25   # refresh when > this fraction of active
                          # lanes contracts worse than FROZEN_RATE
# bench experiment knobs (defaults = the shipped v2 policy; see
# BASELINE.md round-5 MXU utilization record for the measured costs)
#   PE_TPU_FROZEN_NS_PREC=default : NS refresh GEMMs at DEFAULT
#       precision (one bf16 MXU pass, ~4-5x cheaper than the 6-pass
#       f32 HIGHEST emulation).  Safe-by-construction: the basin
#       guard e and the f64 residual gate are unchanged, so a sloppier
#       refreshed factor can only cost extra cheap iterations — the
#       round-4 v3 regression came from the POLICY change (capped
#       steps off cross-step stale factors), not the precision.
#   PE_TPU_FROZEN_INV=block : refactor with the blocked right-looking
#       ops.lu_block kernel (within-diagonal-block pivoting; GEMM
#       panel updates) instead of the global-pivot one-hot GJ.
#       Experiment only: a singular leading block NaNs the lane.
FROZEN_NS_PREC = os.environ.get("PE_TPU_FROZEN_NS_PREC", "highest")
FROZEN_INV = os.environ.get("PE_TPU_FROZEN_INV", "gj")
FROZEN_BAD_FRAC = 0.1     # escalate refresh -> full refactor when >
                          # this fraction sits outside the NS basin


def frozen_fac_init(B: int, n: int, npad: int, dtype=jnp.float64):
    """Empty factor carry for `newton_solve_frozen` (valid=False)."""
    return (jnp.zeros((B, npad, npad), jnp.float32),
            jnp.ones((B, n), jnp.float32),
            jnp.ones((B, n), jnp.float32),
            jnp.full((B, n), jnp.inf, dtype),
            jnp.bool_(False))


def _frozen_resid(ir: AnalogIR, params, x, states, ctx, drives, dtype):
    """Per-lane stamps + O(nnz) f64 residual (NO dense build).

    Must stay a single per-lane function so the batched caller vmaps
    assembly and scatter together — splitting them hands the scatter
    per-lane-varying index arrays and XLA falls off the shared-index
    segment-sum path (measured 30x slower on TPU)."""
    n = ir.n_unknowns
    rows, cols, vals, Z, st2 = assemble_sparse(
        ir, params, x, states, ctx, drives, dtype)
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    ax = jnp.zeros(n + 1, dtype).at[rows].add(vals * x_ext[cols])
    return Z - ax[:n], st2


def _frozen_cache(ir: AnalogIR, params, x, states, ctx, drives, dtype):
    """Per-lane, once per Newton call: everything that is constant
    across the call's iterations — LINEAR family stamp values (their
    stamps are pure in (P, state, ctx) by the engine's linear-device
    contract: newton_solve single-solves linear circuits), the gmin
    diagonal, the drive-slot extension, and the static part of Z.

    Returns (parts: {family: flat A vals}, Z_stat (n,), tail_vals)
    mirroring assemble_sparse's value ordering exactly.  The ROW/COL
    index pattern is deliberately NOT part of this cache — when drives
    are absent it is lane-invariant and must stay unbatched so the
    residual scatter keeps XLA's shared-index fast path (see
    `_frozen_resid`)."""
    n = ir.n_unknowns
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    Z = jnp.zeros(n + 1, dtype)
    parts = {}
    for fam in ir.families:
        if fam.mdef.nonlinear:
            continue
        key = fam.mdef.id_name
        P = params[key]
        st = states.get(key, {})
        vp = x_ext[jnp.asarray(fam.pin_nodes)]
        vb = x_ext[jnp.asarray(fam.br_idx)]

        def one(Pr, vr, br, sr, _stamp=fam.mdef.stamp):
            return _stamp(Pr, vr, br, sr, ctx)

        a_vals, z_vals, _st2 = jax.vmap(one)(P, vp, vb, st)
        msk = getattr(fam, "mask", None)
        if msk is not None:
            m = jnp.asarray(msk, dtype)
            a_vals = a_vals * m[:, None]
            if fam.z_rows.size:
                z_vals = z_vals * m[:, None]
        if fam.a_rows.size:
            parts[key] = a_vals.astype(dtype).reshape(-1)
        if fam.z_rows.size:
            Z = Z.at[jnp.asarray(fam.z_rows)].add(z_vals.astype(dtype))
    gmin = ctx.env.get("g_min", 0.0)
    parts["__gmin__"] = jnp.full(ir.n_nodes, gmin, dtype)
    tail_vals = jnp.zeros(0, dtype)
    if ir.n_drive_slots:
        k = ir.n_drive_slots
        base = ir.n_nodes + ir.n_branches
        drows = jnp.arange(base, base + k, dtype=jnp.int32)
        if drives is None:
            active = jnp.zeros(k, dtype)
            dv = jnp.zeros(k, dtype)
        else:
            active = drives["active"].astype(dtype)
            dv = drives["v"].astype(dtype)
        tail_vals = jnp.concatenate([active, active, 1.0 - active])
        Z = Z.at[drows].add(active * dv)
    return parts, Z[:n], tail_vals


def _frozen_pattern(ir: AnalogIR, drives, dtype):
    """COO index pattern incl. the drive-slot extension.  Lane-invariant
    when ``drives`` is None (the caller then keeps it unbatched)."""
    n = ir.n_unknowns
    s_rows, s_cols = _sparse_pattern(ir)
    rows = jnp.asarray(s_rows)
    cols = jnp.asarray(s_cols)
    if ir.n_drive_slots:
        k = ir.n_drive_slots
        base = ir.n_nodes + ir.n_branches
        drows = jnp.arange(base, base + k, dtype=jnp.int32)
        if drives is None:
            node = jnp.full(k, n, jnp.int32)
        else:
            node = jnp.where(drives["active"] > 0.5,
                             drives["node"].astype(jnp.int32),
                             jnp.int32(n))
        rows = jnp.concatenate([rows, node, drows, drows])
        cols = jnp.concatenate([cols, drows, node, drows])
    return rows, cols


def _frozen_resid_cached(ir: AnalogIR, params, x, states, ctx, dtype,
                         rows, cols, cache):
    """Per-lane per-iteration work with the static cache: re-stamp only
    NONLINEAR families, splice their values into the cached pattern,
    and accumulate the O(nnz) f64 residual."""
    parts, Z_stat, tail_vals = cache
    n = ir.n_unknowns
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    Z = jnp.zeros(n + 1, dtype)
    val_parts = []
    new_states = {}
    for fam in ir.families:
        key = fam.mdef.id_name
        if not fam.mdef.nonlinear:
            if key in parts:
                val_parts.append(parts[key])
            new_states[key] = states.get(key, {})
            continue
        P = params[key]
        st = states.get(key, {})
        vp = x_ext[jnp.asarray(fam.pin_nodes)]
        vb = x_ext[jnp.asarray(fam.br_idx)]

        def one(Pr, vr, br, sr, _stamp=fam.mdef.stamp):
            return _stamp(Pr, vr, br, sr, ctx)

        a_vals, z_vals, st2 = jax.vmap(one)(P, vp, vb, st)
        msk = getattr(fam, "mask", None)
        if msk is not None:
            m = jnp.asarray(msk, dtype)
            a_vals = a_vals * m[:, None]
            if fam.z_rows.size:
                z_vals = z_vals * m[:, None]
        if fam.a_rows.size:
            val_parts.append(a_vals.astype(dtype).reshape(-1))
        if fam.z_rows.size:
            Z = Z.at[jnp.asarray(fam.z_rows)].add(z_vals.astype(dtype))
        new_states[key] = st2
    val_parts.append(parts["__gmin__"])
    if tail_vals.shape[0]:
        val_parts.append(tail_vals)
    vals = jnp.concatenate(val_parts)
    Zf = Z[:n] + Z_stat
    ax = jnp.zeros(n + 1, dtype).at[rows].add(vals * x_ext[cols])
    return Zf - ax[:n], new_states, vals, Zf


def _frozen_factor(ir: AnalogIR, params, x, states, ctx, drives, dtype,
                   npad: int):
    """Per-lane stamps + equilibrated dense f32 target + the row-wise
    f64 residual tolerances frozen alongside the factor."""
    n = ir.n_unknowns
    rows, cols, vals, Z, st2 = assemble_sparse(
        ir, params, x, states, ctx, drives, dtype)
    A32, rs, cs = _equil_dense32(rows, cols, vals, n, npad)
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    sc = jnp.zeros(n + 1, dtype).at[rows].add(
        jnp.abs(vals * x_ext[cols]))
    ia_ = ctx.env["i_abstol"]
    ir_ = ctx.env["i_reltol"]
    tol = ia_ + ir_ * (sc[:n] + jnp.abs(Z))
    return A32, rs, cs, tol


def newton_solve_frozen(ir: AnalogIR, params_b, x0_b, states0_b,
                        ctx: StampCtx, drives_b=None, dtype=jnp.float64,
                        fac=None, max_iter: int = MAX_NEWTON_ITER,
                        stall: int = FROZEN_STALL,
                        return_iters: bool = False):
    """Frozen-preconditioner Newton (the round-4 TPU hot path).

    Each iteration prices only O(nnz) f64 work (device stamps + sparse
    residual) plus ONE batched f32 matvec against a stored explicit
    inverse M^-1 = J(x_f)^-1 computed by `ops.gj.gj_inverse32` at
    refactor points (first iteration without a valid carry, then every
    ``stall`` iterations while unconverged).  Because the residual is
    f64, the fixpoint is f64-accurate regardless of how stale M is —
    stale factors only cost extra (cheap) iterations, exactly the
    inexact-Newton / Shamanskii trade.  The factor carry ``fac``
    survives across transient steps (threaded by transient_batched
    solver='frozen'), so slowly-varying Jacobians refactor every few
    steps instead of every Newton iteration — the reference refactors
    SparseLU every iteration of every step (circuit.h:1484-1524).

    Returns (x, states, ok, fac).
    """
    from ..ops.gj import gj_inverse32, gj_solve32, NB

    dr_axes = None if drives_b is None else 0
    B = x0_b.shape[0]
    n = ir.n_unknowns
    npad = max(NB, ((n + NB - 1) // NB) * NB)
    if fac is None:
        fac = frozen_fac_init(B, n, npad)

    cache_b = jax.vmap(
        lambda p, x, s, d: _frozen_cache(ir, p, x, s, ctx, d, dtype),
        in_axes=(0, 0, 0, dr_axes))
    cache = cache_b(params_b, x0_b, states0_b, drives_b)
    if drives_b is None:
        rows, cols = _frozen_pattern(ir, None, dtype)
        pat_axes = (None, None)
    else:
        rows, cols = jax.vmap(
            lambda d: _frozen_pattern(ir, d, dtype))(drives_b)
        pat_axes = (0, 0)
    resid_b = jax.vmap(
        lambda p, x, s, r_, c_, c: _frozen_resid_cached(
            ir, p, x, s, ctx, dtype, r_, c_, c),
        in_axes=(0, 0, 0) + pat_axes + (0,))
    ia_ = ctx.env["i_abstol"]
    ir_ = ctx.env["i_reltol"]

    def _tol1(v_, Z_, x_, r_, c_):
        x_ext = jnp.concatenate([x_, jnp.zeros(1, x_.dtype)])
        sc = jnp.zeros(n + 1, dtype).at[r_].add(
            jnp.abs(v_ * x_ext[c_]))
        return ia_ + ir_ * (sc[:n] + jnp.abs(Z_))

    def _dense1(v_, rs_, cs_, r_, c_):
        """Dense f32 scatter with GIVEN (stale) equilibration scales —
        the Newton-Schulz refresh must build A in the SAME scaled basis
        the stored inverse lives in."""
        rsx = jnp.concatenate([rs_, jnp.ones(1, rs_.dtype)])
        csx = jnp.concatenate([cs_, jnp.ones(1, cs_.dtype)])
        v32 = (v_.astype(jnp.float32) * rsx[jnp.minimum(r_, n)]
               * csx[jnp.minimum(c_, n)])
        rows_p = jnp.where(r_ >= n, jnp.int32(npad), r_.astype(jnp.int32))
        cols_p = jnp.where(c_ >= n, jnp.int32(npad), c_.astype(jnp.int32))
        A32 = jnp.zeros((npad + 1, npad + 1), jnp.float32)
        A32 = A32.at[rows_p, cols_p].add(v32)
        pad_d = jnp.arange(n, npad)
        A32 = A32.at[pad_d, pad_d].set(1.0)
        return A32[:npad, :npad]

    if drives_b is None:
        equil_b = jax.vmap(lambda v: _equil_dense32(rows, cols, v, n,
                                                    npad))
        tol_b = jax.vmap(lambda v, Z, x: _tol1(v, Z, x, rows, cols),
                         in_axes=(0, 0, 0))
        dense_b = jax.vmap(
            lambda v, rs_, cs_: _dense1(v, rs_, cs_, rows, cols),
            in_axes=(0, 0, 0))
    else:
        equil_b = jax.vmap(
            lambda r_, c_, v: _equil_dense32(r_, c_, v, n, npad),
            in_axes=(0, 0, 0))
        tol_b = jax.vmap(_tol1, in_axes=(0, 0, 0, 0, 0))
        dense_b = jax.vmap(_dense1, in_axes=(0, 0, 0, 0, 0))
    conv_fn = jax.vmap(lambda xo, xn: _converged(xo, xn, ir.n_nodes,
                                                 ctx.env))
    devconv_fn = jax.vmap(lambda p, x, s: _device_converged(ir, p, x, s))

    hp = jax.lax.Precision.HIGHEST
    ns_prec = (jax.lax.Precision.DEFAULT
               if FROZEN_NS_PREC == "default" else hp)
    if FROZEN_INV == "block":
        from ..ops.lu_block import lu_block_inverse32_auto as _inv32
    else:
        _inv32 = gj_inverse32

    def _ns_refresh(Minv, A32, steps: int = 2):
        """Newton-Schulz inverse refresh: X <- X(2I - A X), quadratic.
        Two batched MXU GEMM pairs (~0.6 ms at B=256/n=256) replace the
        ~7 ms serial re-inversion whenever the stale inverse is still
        in the contraction basin (||I - A X|| < 1)."""
        eye = jnp.eye(npad, dtype=jnp.float32)
        X = Minv
        e = None
        for _ in range(steps):
            AX = jax.lax.dot_general(
                A32, X, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=ns_prec)
            if e is None:
                # per-lane basin guard: ||I - A X||_inf >= 1 means NS
                # would square a divergent error (measured: corrupts
                # the factor at diode switching) — those lanes keep
                # the old inverse; the caller escalates to a full
                # refactor when too many lanes are outside the basin
                e = jnp.max(jnp.sum(jnp.abs(eye - AX), axis=2), axis=1)
            X = jax.lax.dot_general(
                X, 2.0 * eye - AX, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=ns_prec)
        return jnp.where((e < 0.9)[:, None, None], X, Minv), e

    def cond(c):
        _x, _st, it, conv, ok, *_f = c
        return jnp.any((~conv) & ok) & (it < max_iter)

    def body(c):
        x, st, it, conv, ok, Minv, rs, cs, tol, valid, last, prev_rn = c
        active = (~conv) & ok
        r, st2, vals, Zf = resid_b(params_b, x, st, rows, cols, cache)
        rn = jnp.max(jnp.abs(r), axis=1)
        # refresh policy: an active lane's residual contraction worse
        # than FROZEN_RATE (or the stall cadence) triggers a refresh.
        # A refresh is normally the cheap Newton-Schulz GEMM pair on
        # the stored inverse — valid only inside its contraction basin
        # (||I - A X|| < 1, i.e. the residual still SHRANK) — while
        # outright residual GROWTH forces the full serial re-inversion
        # (fresh Newton).
        grew = active & (rn > FROZEN_RATE * prev_rn)
        n_act = jnp.maximum(jnp.sum(active), 1)
        # population trigger, not any-lane: with hundreds of MC lanes
        # one straggler would otherwise fire a refresh every iteration
        frac_grew = jnp.sum(grew) / n_act
        # per-step hygiene: always NS-refresh on entry with a carried
        # factor — the Jacobian moved a whole time step; paying the
        # GEMM pair up front beats rediscovering staleness two (f64
        # stamp) iterations later
        need = (~valid) | (valid & (it == 0)) | \
            (it - last >= jnp.int32(stall)) | \
            (frac_grew > FROZEN_GROW_FRAC)
        # outright residual GROWTH = outside every stale/NS basin:
        # run a fresh full-Newton iteration (direct solve, ~half an
        # inversion) and invalidate the carry; the first
        # converging-again iteration re-inverts once at burst exit
        burst = jnp.any(active & (rn > prev_rn))
        need_full = (~valid) & ~burst

        def refac(_):
            # reuse THIS iteration's stamped values — no second
            # assembly pass for the factor
            if drives_b is None:
                A32, rs2, cs2 = equil_b(vals)
            else:
                A32, rs2, cs2 = equil_b(rows, cols, vals)
            tol2 = tol_b(vals, Zf, x)
            return _inv32(A32), rs2, cs2, tol2, it

        def refresh(_):
            # stale-scaled dense rebuild + 2 guarded Newton-Schulz
            # steps; when too many active lanes sit OUTSIDE the NS
            # basin (||I - A X||_inf >= 0.9 — the Jacobian moved a lot,
            # e.g. diode switching), escalate to the full refactor:
            # one inversion beats ~10 slow-contracting stale iterations
            if drives_b is None:
                A32 = dense_b(vals, rs, cs)
            else:
                A32 = dense_b(vals, rs, cs, rows, cols)
            X2, e = _ns_refresh(Minv, A32)
            frac_bad = jnp.sum((e >= 0.9) & active) / n_act
            return jax.lax.cond(
                frac_bad > FROZEN_BAD_FRAC, refac,
                lambda _: (X2, rs, cs, tol, it), 0)

        def keep(_):
            return Minv, rs, cs, tol, last

        Minv2, rs2, cs2, tol2, last2 = jax.lax.cond(
            need_full, refac,
            lambda _: jax.lax.cond(need & ~burst, refresh, keep, 0), 0)
        # row-wise f64 residual criterion (KCL): the delta-x rule alone
        # is unsafe for inexact Newton — a diverged stale-factor step
        # inflates |x| and with it the relative tolerance
        resid_ok = jnp.all(jnp.abs(r) <= tol2, axis=1)

        def delta_solve(_):
            # burst iteration: fresh Jacobian, direct factor-solve
            if drives_b is None:
                A32, rs2, cs2 = equil_b(vals)
            else:
                A32, rs2, cs2 = equil_b(rows, cols, vals)
            rr = jnp.zeros((B, npad), jnp.float32).at[:, :n].set(
                (r * rs2.astype(dtype)).astype(jnp.float32))
            d = gj_solve32(A32, rr)
            return d[:, :n].astype(dtype) * cs2.astype(dtype)

        def delta_apply(_):
            rr = jnp.zeros((B, npad), jnp.float32).at[:, :n].set(
                (r * rs2.astype(dtype)).astype(jnp.float32))
            d32 = jnp.einsum("bij,bj->bi", Minv2, rr,
                             precision=jax.lax.Precision.HIGHEST)
            return d32[:, :n].astype(dtype) * cs2.astype(dtype)

        delta = jax.lax.cond(burst, delta_solve, delta_apply, 0)
        x_new = x + delta
        ok_new = jnp.all(jnp.isfinite(x_new), axis=1)
        # fresh-Jacobian iterations use the classical delta-x rule (the
        # delta solver's criterion); stale iterations additionally
        # require the f64 residual gate
        conv_new = conv_fn(x, x_new) & ok_new & (resid_ok | burst)
        conv_new = conv_new & devconv_fn(params_b, x_new, st2)
        take = active & ok_new
        x_next = jnp.where(take[:, None], x_new, x)

        def merge(a, b):
            m = take.reshape((B,) + (1,) * (a.ndim - 1))
            return jnp.where(m, b, a)

        st_next = jax.tree_util.tree_map(merge, st, st2)
        conv = jnp.where(active, conv_new, conv)
        ok = ok & (ok_new | ~active)
        return (x_next, st_next, it + 1, conv, ok,
                Minv2, rs2, cs2, tol2, ~burst, last2,
                jnp.where(active, rn, prev_rn))

    init = (x0_b, states0_b, jnp.int32(0), jnp.zeros(B, bool),
            jnp.ones(B, bool)) + tuple(fac[:4]) + (
                jnp.asarray(fac[4], bool), jnp.int32(0),
                jnp.full(B, jnp.inf, dtype))
    out = jax.lax.while_loop(cond, body, init)
    x, st, _it, conv, ok, Minv, rs, cs, tol, valid, _last, _rn = out
    fac_out = (Minv, rs, cs, tol, valid)
    if return_iters:
        return x, st, conv & ok, fac_out, _it
    return x, st, conv & ok, fac_out


def _newton_loop_batched(ir, params_b, x0_b, states0_b, ctx, solve_once,
                         max_iter, linear_iters: int):
    """Shared masked batched Newton outer loop."""
    B = x0_b.shape[0]

    if not ir.nonlinear:
        x, st, ok = x0_b, states0_b, jnp.ones(B, bool)
        for _ in range(linear_iters):
            x, st, ok2 = solve_once(x, st)
            ok = ok & ok2
        return x, st, ok

    conv_fn = jax.vmap(lambda xo, xn: _converged(xo, xn, ir.n_nodes,
                                                 ctx.env))
    devconv_fn = jax.vmap(lambda p, x, s: _device_converged(ir, p, x, s))

    def cond(c):
        _x, _st, it, conv, ok = c
        return jnp.any((~conv) & ok) & (it < max_iter)

    def body(c):
        x, st, it, conv, ok = c
        active = (~conv) & ok
        x_new, st2, ok_new = solve_once(x, st)
        conv_new = conv_fn(x, x_new) & ok_new
        conv_new = conv_new & devconv_fn(params_b, x_new, st2)
        take = active & ok_new
        x_next = jnp.where(take[:, None], x_new, x)

        def merge(a, b):
            m = take.reshape((B,) + (1,) * (a.ndim - 1))
            return jnp.where(m, b, a)

        st_next = jax.tree_util.tree_map(merge, st, st2)
        conv = jnp.where(active, conv_new, conv)
        ok = ok & (ok_new | ~active)
        return (x_next, st_next, it + 1, conv, ok)

    init = (x0_b, states0_b, jnp.int32(0),
            jnp.zeros(B, bool), jnp.ones(B, bool))
    x, st, it, conv, ok = jax.lax.while_loop(cond, body, init)
    return x, st, conv & ok


def transient_batched(ir: AnalogIR, params_b, x0_b, states0_b, env, t0,
                      dt, num_steps, drives_b=None, dtype=jnp.float64,
                      solver: str = "hybrid", keep_trace: bool = False,
                      max_iter: int = MAX_NEWTON_ITER):
    """Batched fixed-step transient over the explicit-batch Newton path.

    Returns (x (B,n), states, ok (B,), xs) — xs is (num_steps, B, n)
    when keep_trace else the final x.

    ``max_iter`` bounds the per-step Newton loop (default mirrors the
    reference's 64, circuit.h:898).  High-gain workloads legitimately
    need more: a 31-stage BSIM3 inverter chain driven rail-to-rail
    converges at ~75 frozen iterations per early step (bench_bsim3) —
    stale-factor iterations are O(nnz)+GEMV, so a larger cap costs
    nothing on steps that converge early (masked loop exits)."""
    step_update_b = jax.vmap(step_update_all,
                             in_axes=(None, 0, 0, 0, None, None))

    if solver == "frozen":
        # frozen-preconditioner Newton with the factor carry threaded
        # across steps: slowly-varying Jacobians refactor every few
        # STEPS, not every iteration (see newton_solve_frozen)
        from ..ops.gj import NB
        B = x0_b.shape[0]
        n = ir.n_unknowns
        npad = max(NB, ((n + NB - 1) // NB) * NB)

        def step_f(carry, i):
            x, st, ok_all, fac = carry
            t = t0 + (i + 1.0) * dt
            st = step_update_b(ir, params_b, x, st, dt, t)
            ctx = StampCtx(mode="tr", t=t, dt=dt, env=env)
            # warm start = previous solution, NO extrapolation: a
            # linear predictor overshoots exponential-device knees
            # into the vlimit walk (measured: mean Newton iterations
            # 5.5 -> 4.4 and the per-step spikes 15-20 -> 6-10 on the
            # diode-ladder bench when extrapolation is dropped)
            x_new, st2, ok, fac = newton_solve_frozen(
                ir, params_b, x, st, ctx, drives_b, dtype,
                fac=fac, max_iter=max_iter)

            # per-step rescue ladder: lanes the frozen policy stalls on
            # (measured on the 31-stage BSIM3 chain: a rail transition
            # can defeat the stale-factor walk at ANY iteration budget)
            # rerun the step with the fresh-factor delta solver, and —
            # via 'hybrid' — a whole-batch f64 gauss pass for lanes
            # whose Jacobian the f32 factor cannot resolve (one lane's
            # transition step here measures exactly that).  The carry
            # is invalidated so rescued lanes refactor next step.
            # lax.cond skips the whole branch when every lane converged
            # — the fast path pays nothing at runtime.
            def rescue(_):
                x_r, st_r, ok_r = newton_solve_batched(
                    ir, params_b, x, st, ctx, drives_b, dtype,
                    max_iter=max_iter, solver="hybrid")
                take = (~ok) & ok_r

                def merge_l(a, b):
                    m = take.reshape((B,) + (1,) * (a.ndim - 1))
                    return jnp.where(m, b, a)

                st_m = jax.tree_util.tree_map(merge_l, st2, st_r)
                x_m = jnp.where(take[:, None], x_r, x_new)
                return (x_m, st_m, ok | ok_r,
                        fac[:4] + (jnp.bool_(False),))

            def keep(_):
                return x_new, st2, ok, fac

            x_new, st2, ok, fac = jax.lax.cond(
                jnp.all(ok), keep, rescue, 0)
            x_keep = jnp.where(ok[:, None], x_new, x)
            out = x_keep if keep_trace else 0
            return (x_keep, st2, ok_all & ok, fac), out

        idx = jnp.arange(num_steps, dtype=dtype)
        init = (x0_b, states0_b, jnp.ones(B, bool),
                frozen_fac_init(B, n, npad, dtype))
        (x, st, ok, _fac), xs = jax.lax.scan(step_f, init, idx)
        return x, st, ok, (xs if keep_trace else x)

    def step(carry, i):
        x, st, ok_all = carry
        t = t0 + (i + 1.0) * dt
        st = step_update_b(ir, params_b, x, st, dt, t)
        ctx = StampCtx(mode="tr", t=t, dt=dt, env=env)
        x_new, st2, ok = newton_solve_batched(
            ir, params_b, x, st, ctx, drives_b, dtype,
            max_iter=max_iter, solver=solver)
        x_keep = jnp.where(ok[:, None], x_new, x)
        out = x_keep if keep_trace else 0
        return (x_keep, st2, ok_all & ok), out

    idx = jnp.arange(num_steps, dtype=dtype)
    init = (x0_b, states0_b, jnp.ones(x0_b.shape[0], bool))
    (x, st, ok), xs = jax.lax.scan(step, init, idx)
    return x, st, ok, (xs if keep_trace else x)


# ---------------------------------------------------------------------------
# companion-model step update (update_tr_step, circuit.h:363-374)
# ---------------------------------------------------------------------------

def step_update_all(ir: AnalogIR, params, x, states, dt, t):
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    out = {}
    for fam in ir.families:
        key = fam.mdef.id_name
        st = states.get(key, {})
        if fam.mdef.step_update is None:
            out[key] = st
            continue
        vp = x_ext[jnp.asarray(fam.pin_nodes)]
        vb = x_ext[jnp.asarray(fam.br_idx)]

        def one(Pr, vr, br, sr, _f=fam.mdef.step_update):
            return _f(Pr, vr, br, sr, dt, t)

        out[key] = jax.vmap(one)(params[key], vp, vb, st)
    return out


# ---------------------------------------------------------------------------
# transient analysis (circuit.h:233-256): fixed-step scan
# ---------------------------------------------------------------------------

def transient(ir: AnalogIR, params, x0, states0, env, t0, dt, num_steps,
              drives=None, dtype=jnp.float64, method: str = "dense"):
    """Run ``num_steps`` fixed TR steps from (x0, states0) at time t0.

    Returns (x_final, states_final, ok_all, xs) where xs is the (num_steps,
    N) trajectory of unknown vectors (node voltages + branch currents).
    """
    def step(carry, i):
        x, st, ok_all = carry
        t = t0 + (i + 1.0) * dt
        st = step_update_all(ir, params, x, st, dt, t)
        ctx = StampCtx(mode="tr", t=t, dt=dt, env=env)
        x_new, st2, ok = newton_solve(ir, params, x, st, ctx, drives,
                                      dtype, method=method)
        # failed step: keep previous solution (reference rolls back
        # tr_duration, circuit.h:249-253)
        x_keep = jnp.where(ok, x_new, x)
        return (x_keep, st2, ok_all & ok), x_keep

    idx = jnp.arange(num_steps, dtype=dtype)
    (x, st, ok), xs = jax.lax.scan(step, (x0, states0, jnp.bool_(True)), idx)
    return x, st, ok, xs


def transient_adaptive(ir: AnalogIR, params, x0, states0, env, t0, dt0,
                       t_stop, max_attempts, dt_min, drives=None,
                       dtype=jnp.float64, method: str = "dense"):
    """Adaptive transient: step-halving on Newton failure, step growth
    back toward dt0 on success (the reference declares ``adapt_step``
    in its TR settings but never wires it, circuit.h analyze members —
    this is the TPU-native fixed-shape realization: one lax.scan over a
    bounded attempt budget; finished lanes no-op).

    Returns (x, states, ok, ts, xs, acc) where ts/xs/acc are the
    per-attempt time stamps, solution snapshots and acceptance flags
    (hosts filter accepted rows for the trace); ok means t reached
    t_stop without the step underflowing dt_min on a failure.
    """
    def attempt(carry, _):
        x, st, t, dt, failed, done = carry
        rem = t_stop - t
        dt_eff = jnp.minimum(dt, jnp.maximum(rem, dt_min))
        t_new = t + dt_eff
        st2 = step_update_all(ir, params, x, st, dt_eff, t_new)
        ctx = StampCtx(mode="tr", t=t_new, dt=dt_eff, env=env)
        x_new, st3, ok = newton_solve(ir, params, x, st2, ctx, drives,
                                      dtype, method=method)
        accept = ok & ~done
        x2 = jnp.where(accept, x_new, x)
        st4 = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                           st3, st)
        t2 = jnp.where(accept, t_new, t)
        # halve on a rejected attempt, grow toward dt0 on success
        dt2 = jnp.where(done, dt,
                        jnp.where(accept,
                                  jnp.minimum(dt * 2.0, dt0),
                                  dt * 0.5))
        failed2 = failed | (~ok & ~done & (dt * 0.5 < dt_min))
        done2 = done | (t2 >= t_stop * (1.0 - 1e-12)) | failed2
        return ((x2, st4, t2, dt2, failed2, done2),
                (t2, x2, accept))

    init = (x0, states0, jnp.asarray(t0, dtype),
            jnp.asarray(dt0, dtype), jnp.bool_(False), jnp.bool_(False))
    (x, st, t, dt, failed, done), (ts, xs, acc) = jax.lax.scan(
        attempt, init, None, length=max_attempts)
    return x, st, done & ~failed, ts, xs, acc


# ---------------------------------------------------------------------------
# AC small-signal sweep: batched complex solve over the omega grid.
#
# TPU has NO complex128 support at all, so the complex system
# (Ar + jAi)(xr + jxi) = (Zr + jZi) is solved in split real form as the
# 2Nx2N block system [[Ar, -Ai], [Ai, Ar]] [xr; xi] = [Zr; Zi], all f64.
# Device ac_stamp kernels return (a_re, a_im, z_re, z_im) real arrays.
# ---------------------------------------------------------------------------

def assemble_ac(ir: AnalogIR, params, states, omega, dtype=jnp.float64):
    n = ir.n_unknowns
    Ar = jnp.zeros((n + 1, n + 1), dtype)
    Ai = jnp.zeros((n + 1, n + 1), dtype)
    Zr = jnp.zeros(n + 1, dtype)
    Zi = jnp.zeros(n + 1, dtype)
    for fam in ir.families:
        key = fam.mdef.id_name
        if fam.mdef.ac_stamp is None:
            continue
        st = states.get(key, {})

        def one(Pr, sr, _f=fam.mdef.ac_stamp):
            return _f(Pr, sr, omega)

        a_re, a_im, z_re, z_im = jax.vmap(one)(params[key], st)
        rows, cols = jnp.asarray(fam.a_rows), jnp.asarray(fam.a_cols)
        Ar = Ar.at[rows, cols].add(a_re.astype(dtype))
        Ai = Ai.at[rows, cols].add(a_im.astype(dtype))
        if fam.z_rows.size:
            zr = jnp.asarray(fam.z_rows)
            Zr = Zr.at[zr].add(z_re.astype(dtype))
            Zi = Zi.at[zr].add(z_im.astype(dtype))
    if ir.n_drive_slots:
        # keep drive rows well-posed (identity) during AC
        k = ir.n_drive_slots
        base = ir.n_nodes + ir.n_branches
        rows = jnp.arange(base, base + k)
        Ar = Ar.at[rows, rows].add(jnp.ones(k, dtype))
    return Ar[:n, :n], Ai[:n, :n], Zr[:n], Zi[:n]


def ac_sweep(ir: AnalogIR, params, states, omegas, dtype=jnp.float64):
    """Solve the complex MNA at every omega in one batched call.

    Returns (xs_re, xs_im): each (n_omega, N).
    """
    n = ir.n_unknowns

    def solve_at(w):
        Ar, Ai, Zr, Zi = assemble_ac(ir, params, states, w, dtype)
        M = jnp.block([[Ar, -Ai], [Ai, Ar]])
        rhs = jnp.concatenate([Zr, Zi])
        x = dense_solve(M, rhs)
        return x[:n], x[n:]

    return jax.vmap(solve_at)(omegas)


def env_scalars(env) -> Dict[str, Any]:
    """Pack the Environment into traced scalars for StampCtx.env."""
    return {
        "v_abstol": env.v_abstol, "v_reltol": env.v_reltol,
        "i_abstol": env.i_abstol, "i_reltol": env.i_reltol,
        "g_min": env.g_min, "r_open": env.r_open,
        "temperature": env.temperature,
    }
