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
