"""Fully-distributed Newton for ONE huge circuit.

Combines the two distributed axes that previously existed separately:

* **instance-sharded stamping** (``tp_pad_ir`` mask padding; the vmapped
  device-family kernels evaluate only each chip's instance slice, XLA
  psum-reduces the COO scatter — `parallel/mesh.py` tp path), and
* **cooperative column-sharded factorization** (``dist_gj``): the dense
  delta system is built block-cyclic per device and factored with one
  psum broadcast per 128-column panel — no device materializes the
  full matrix.

The outer loop is the reference's Newton recipe (circuit.h:892-985 —
V/I abs+rel convergence + per-model veto) in delta form: each iteration
assembles the sparse COO system at the current x, computes the f64
residual r = Z - A·x in O(nnz), equilibrates with exact powers of two,
and solves A·dx = r cooperatively in f32 (engine/analog.py
``_delta_solve_prep`` semantics, distributed) — the delta iteration
itself provides the f64 refinement.

``transient_dist`` extends the same machinery to fixed-step TR: the
per-step companion updates (``analog.step_update_all``) run on the
sharded padded state, and the jitted delta-step takes (t, dt) as
traced scalars so every step of every timepoint reuses ONE compiled
executable (the cooperative solver is cached per mesh/shape in
``dist_gj._DELTA_CACHE``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import analog
from ..engine.lower import AnalogIR
from ..models.base import StampCtx
from ..ops.gj import NB
from .mesh import tp_pad_ir
from .dist_gj import make_dist_delta_solver


def _shard_problem(ir: AnalogIR, mesh: Mesh, params, states0, dtype):
    """Common prologue: pad the IR to the mesh, shard params/state,
    build the cooperative solver."""
    D = int(mesh.devices.size)
    axes = tuple(mesh.axis_names)
    shard = NamedSharding(mesh, P(axes))
    repl = NamedSharding(mesh, P())
    n = ir.n_unknowns
    npad = -(-n // (NB * D)) * (NB * D)

    ir2, pad_params = tp_pad_ir(ir, D)
    params_s = {k: jax.device_put(jnp.asarray(v), shard)
                for k, v in pad_params(params).items()}
    states_s = {}
    for fam in ir2.families:
        key = fam.mdef.id_name
        st = states0.get(key, {})
        padded = {}
        for k, v in st.items():
            v = np.asarray(v)
            if v.shape[0] < len(fam.P):
                v = np.concatenate([v, np.repeat(
                    v[-1:], len(fam.P) - v.shape[0], axis=0)])
            padded[k] = jax.device_put(jnp.asarray(v), shard)
        states_s[key] = padded

    solver = make_dist_delta_solver(mesh, n, npad)
    return ir2, params_s, states_s, solver, repl, n, npad


def _make_delta_step(ir: AnalogIR, ir2: AnalogIR, solver, env,
                     mode: str, dtype, n: int, npad: int):
    """One jitted delta-Newton iteration: sparse assembly at x, f64
    residual, power-of-two equilibration, cooperative f32 solve.
    ``t``/``dt`` are traced so TR reuses the executable per step."""

    @jax.jit
    def step(p, x, st, t, dt):
        ctx = StampCtx(mode=mode, t=t, dt=dt, env=env)
        rows, cols, vals, Z, st2 = analog.assemble_sparse(
            ir2, p, x, st, ctx, None, dtype)
        # work-dtype residual in O(nnz) (ground dummy gathers 0)
        x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        ax = jnp.zeros(n + 1, dtype).at[rows].add(vals * x_ext[cols])
        r = Z - ax[:n]
        # exact power-of-two equilibration (lossless in any binary fp)
        tiny = jnp.asarray(1e-300 if dtype == jnp.float64 else 1e-30,
                           dtype)
        rmax = jnp.maximum(
            jnp.zeros(n + 1, dtype).at[rows].max(jnp.abs(vals)), tiny)
        rs = jnp.exp2(-jnp.floor(jnp.log2(rmax)))
        vr = vals * rs[rows]
        cmax = jnp.maximum(
            jnp.zeros(n + 1, dtype).at[cols].max(jnp.abs(vr)), tiny)
        cs = jnp.exp2(-jnp.floor(jnp.log2(cmax)))
        vrc = vr * cs[cols]
        rp = jnp.zeros(npad, dtype).at[:n].set(r * rs[:n])
        dxs, rel = solver(rows.astype(jnp.int32), cols.astype(jnp.int32),
                          vrc, rp)
        dx = dxs[:n] * cs[:n]
        # validated reject: a mis-solved linear system (f32 element
        # growth, near-singular iterate) must not produce a dx that
        # masquerades as a Newton step — treat like non-finite
        ok = jnp.all(jnp.isfinite(dx)) & (rel < 1e-3)
        x_new = jnp.where(ok, x + dx, x)
        conv = analog._converged(x, x_new, ir.n_nodes, env) & ok
        conv = conv & analog._device_converged(ir2, p, x_new, st2)
        return x_new, st2, conv, ok

    return step


def newton_solve_dist(ir: AnalogIR, mesh: Mesh, params, x0, states0,
                      env, mode: str = "op", max_iter: int = 64,
                      dtype=jnp.float64):
    """Solve the operating point of one circuit with BOTH the stamping
    and the factorization distributed over ``mesh``.

    Returns (x, states, ok) with x replicated, like
    ``analog.newton_solve``.  ``env`` is the traced scalar dict from
    ``analog.env_scalars``.  Linear circuits converge in 2-3 delta
    iterations (f32 solve + f64 residual), nonlinear ones follow the
    usual Newton trajectory.
    """
    ir2, params_s, states_s, solver, repl, n, npad = _shard_problem(
        ir, mesh, params, states0, dtype)
    step = _make_delta_step(ir, ir2, solver, env, mode, dtype, n, npad)
    zero = jnp.zeros((), dtype)

    x = jax.device_put(jnp.asarray(x0, dtype), repl)
    st = states_s
    ok = True
    for _ in range(max_iter):
        x, st, conv, okj = step(params_s, x, st, zero, zero)
        ok = bool(okj)
        if bool(conv) or not ok:
            break
    else:
        conv = False
    return x, st, bool(conv) and ok


def transient_dist(ir: AnalogIR, mesh: Mesh, params, x0, states0, env,
                   t0: float, dt: float, num_steps: int,
                   max_iter: int = 64, dtype=jnp.float64):
    """Fixed-step transient of ONE huge circuit, fully distributed
    (sharded stamping + cooperative factorization per Newton
    iteration) — the TR counterpart of ``newton_solve_dist``, closing
    the reference's scale axis for time-domain runs (its TR loop is
    circuit.h:233-256 on a single host).

    Returns (x, states, ok, xs) with xs the (num_steps, n) trajectory
    (host numpy; each accepted step's replicated solution).  A failed
    step aborts and returns ok=False with the trajectory so far.
    """
    ir2, params_s, states_s, solver, repl, n, npad = _shard_problem(
        ir, mesh, params, states0, dtype)
    step = _make_delta_step(ir, ir2, solver, env, "tr", dtype, n, npad)

    @jax.jit
    def companions(p, x, st, dtj, tj):
        return analog.step_update_all(ir2, p, x, st, dtj, tj)

    x = jax.device_put(jnp.asarray(x0, dtype), repl)
    st = states_s
    dtj = jnp.asarray(dt, dtype)
    hist = []
    for k in range(num_steps):
        tj = jnp.asarray(t0 + (k + 1) * dt, dtype)
        st = companions(params_s, x, st, dtj, tj)
        conv = False
        for _ in range(max_iter):
            x, st, convj, okj = step(params_s, x, st, tj, dtj)
            if not bool(okj):
                return x, st, False, np.asarray(hist)
            if bool(convj):
                conv = True
                break
        if not conv:
            return x, st, False, np.asarray(hist)
        hist.append(np.asarray(x))
    return x, st, True, np.asarray(hist)


def ac_solve_dist(ir: AnalogIR, mesh: Mesh, params, states, omegas,
                  dtype=jnp.float64):
    """Cooperative single-system AC: each omega's complex MNA is solved
    as the 2n-real block system [[Ar, -Ai], [Ai, Ar]] with its columns
    block-cyclic over ``mesh`` (dist_gj.dist_solve, validated residual
    + work-dtype fallback).  This is the scale path for AC on circuits
    too large for one chip — the grid-sharded path
    (Circuit._analyze_ac mesh branch) covers the embarrassingly
    parallel many-omega regime instead; the reference's AC loop is
    serial on one host (circuit.h:399-428).

    Assembly is replicated (dense (n, n) per omega — the current
    limit; a tp-sharded AC assembly would mirror mesh.tp_assemble) and
    the factorization is what distributes.  Returns (n_omega, n)
    complex solutions.
    """
    from .dist_gj import dist_solve

    n = ir.n_unknowns
    D = int(mesh.devices.size)
    m = 2 * n
    mpad = -(-m // (NB * D)) * (NB * D)
    outs = []
    for w in np.asarray(omegas):
        Ar, Ai, Zr, Zi = analog.assemble_ac(
            ir, params, states, jnp.asarray(w, dtype), dtype)
        M = jnp.zeros((mpad, mpad), dtype)
        M = M.at[:n, :n].set(Ar)
        M = M.at[:n, n:m].set(-Ai)
        M = M.at[n:m, :n].set(Ai)
        M = M.at[n:m, n:m].set(Ar)
        pad = jnp.arange(m, mpad)
        M = M.at[pad, pad].set(1.0)
        rhs = jnp.zeros(mpad, dtype).at[:n].set(Zr).at[n:m].set(Zi)
        x = np.asarray(dist_solve(mesh, M, rhs, refine=2))
        outs.append(x[:n] + 1j * x[n:m])
    return np.stack(outs)
