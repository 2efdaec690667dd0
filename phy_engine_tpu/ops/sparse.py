"""Sparse MNA solving for large circuits.

The reference solves big systems with Eigen SparseLU on CPU and
cuSOLVER QR / ILU0-BiCGStab on a single GPU (cuda_sparse_lu.h;
policy + 100k-node threshold in circuit.h:115-121).  The TPU-native
equivalent keeps the matrix in COO form — the stamp patterns are already
static COO — and runs **Jacobi-preconditioned BiCGStab** where the only
kernels are gather / multiply / scatter-add (``segment_sum`` matvec) and
dot products: all bandwidth-bound VPU ops that XLA fuses well, with no
sequential factorization at all.

MNA-specific conditioning mirrors the reference's tricks:
* structural-zero diagonals (ideal source rows) get a |diag| floor in
  the Jacobi preconditioner (the diagonal-boost idea of
  cuda_sparse_lu.h:1617-1620);
* the caller supplies a dense fallback decision (dense for small n).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def coo_matvec(rows, cols, vals, x, n: int):
    """y = A x with A in COO (duplicates sum).  rows/cols may contain
    the dummy index n (ground) — those entries land in a discarded slot."""
    y = jnp.zeros(n + 1, x.dtype)
    x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    y = y.at[rows].add(vals * x_ext[cols])
    return y[:n]


def coo_diagonal(rows, cols, vals, n: int):
    d = jnp.zeros(n + 1, vals.dtype)
    isdiag = (rows == cols)
    d = d.at[jnp.where(isdiag, rows, n)].add(jnp.where(isdiag, vals, 0.0))
    return d[:n]


def bicgstab(rows, cols, vals, b, n: int, x0=None, tol: float = 1e-10,
             max_iter: int = 400, diag_floor: float = 1e-9):
    """Jacobi-preconditioned BiCGStab on a COO system.

    Returns (x, converged, iterations).
    """
    dtype = b.dtype
    mv = lambda v: coo_matvec(rows, cols, vals, v, n)
    d = coo_diagonal(rows, cols, vals, n)
    # row-max-scaled Jacobi: use the diagonal where it carries the row's
    # weight; otherwise (structural-zero source rows) fall back to the
    # row's max |entry| — the reference's diag-boost idea
    # (cuda_sparse_lu.h:1617-1620) without the 1/eps blow-up.
    row_max = jnp.zeros(n + 1, vals.dtype).at[rows].max(
        jnp.abs(vals))[:n]
    row_max = jnp.maximum(row_max, 1e-300)
    use_diag = jnp.abs(d) > 1e-3 * row_max
    d_safe = jnp.where(use_diag, d, row_max)
    minv = 1.0 / d_safe

    x = x0 if x0 is not None else jnp.zeros(n, dtype)
    r = b - mv(x)
    # Shadow residual: a fixed generic (pseudo-random) direction instead
    # of r itself — MNA saddle structure makes <r, A M^-1 r> exactly zero
    # for source-only RHS vectors, which breaks the textbook choice.
    i_ = jnp.arange(n, dtype=dtype)
    h = jnp.sin((i_ + 1.0) * 12.9898) * 43758.5453
    h = (h - jnp.floor(h)) + 0.5
    r_hat = h * jnp.maximum(jnp.linalg.norm(r), 1e-300) / \
        jnp.linalg.norm(h)
    rho = jnp.vdot(r_hat, r)
    p = r
    b_norm = jnp.maximum(jnp.linalg.norm(b), 1e-300)

    def cond(c):
        x, r, p, rho, it, done, ok = c
        return (~done) & ok & (it < max_iter)

    def body(c):
        x, r, p, rho, it, _done, _ok = c
        p_hat = minv * p
        v = mv(p_hat)
        denom = jnp.vdot(r_hat, v)
        alpha = rho / jnp.where(denom == 0, 1e-300, denom)
        s = r - alpha * v
        s_hat = minv * s
        t = mv(s_hat)
        tt = jnp.vdot(t, t)
        omega = jnp.vdot(t, s) / jnp.where(tt == 0, 1e-300, tt)
        x_new = x + alpha * p_hat + omega * s_hat
        r_new = s - omega * t
        rho_new = jnp.vdot(r_hat, r_new)
        beta = (rho_new / jnp.where(rho == 0, 1e-300, rho)) * \
            (alpha / jnp.where(omega == 0, 1e-300, omega))
        p_new = r_new + beta * (p - omega * v)
        res = jnp.linalg.norm(r_new) / b_norm
        done = res < tol
        ok = jnp.all(jnp.isfinite(x_new))
        return (x_new, r_new, p_new, rho_new, it + 1, done, ok)

    init = (x, r, p, rho, jnp.int32(0), jnp.bool_(False), jnp.bool_(True))
    x, r, p, rho, it, done, ok = jax.lax.while_loop(cond, body, init)
    res = jnp.linalg.norm(b - mv(x)) / b_norm
    return x, (res < jnp.asarray(tol * 10.0)) & ok, it
