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


# ---------------------------------------------------------------------------
# ELLPACK layout: scatter-free matvec for static patterns
#
# TPU scatter-add with arbitrary indices is slow (~10ms for 88k f64 nnz
# measured on v5e) while gathers are fast.  The stamp pattern is static,
# so we pad rows to the max degree once on host; the matvec becomes
# gather + elementwise + row-sum.  Values still change per solve — they
# are placed with ONE static scatter per solve, amortized over all
# Krylov iterations.
# ---------------------------------------------------------------------------

class ELL:
    """Host-built padded-row (ELLPACK) pattern for a static COO graph."""

    def __init__(self, rows, cols, n: int):
        import numpy as np
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        self.n = n
        order = np.argsort(rows, kind="stable")
        r_s = rows[order]
        c_s = cols[order]
        # slot index within each row
        counts = np.bincount(r_s, minlength=n + 1)
        self.k = int(counts.max()) if len(r_s) else 1
        slot = np.arange(len(r_s)) - np.repeat(
            np.cumsum(np.concatenate([[0], counts[:-1]])), counts)
        self.pos = (r_s.astype(np.int64) * self.k + slot).astype(np.int32)
        self.perm = order.astype(np.int32)
        colmat = np.full((n + 1) * self.k, n, np.int32)   # ghost col
        colmat[self.pos] = c_s
        self.colmat = colmat.reshape(n + 1, self.k)

    def values(self, vals):
        """Place COO values into the padded layout (one static scatter)."""
        flat = jnp.zeros((self.n + 1) * self.k, vals.dtype)
        flat = flat.at[jnp.asarray(self.pos)].set(vals[jnp.asarray(self.perm)])
        return flat.reshape(self.n + 1, self.k)

    def matvec(self, valmat, x):
        x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        y = jnp.sum(valmat * x_ext[jnp.asarray(self.colmat)], axis=1)
        return y[:self.n]

    def diag_and_rowmax(self, valmat):
        n = self.n
        colmat = jnp.asarray(self.colmat[:n])
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, colmat.shape, 0)
        diag = jnp.sum(jnp.where(colmat == rows_iota, valmat[:n], 0.0),
                       axis=1)
        row_max = jnp.max(jnp.abs(valmat[:n]), axis=1)
        return diag, row_max


class BandedCOO:
    """Diagonal-offset storage + small COO remainder (TPU-native SpMV).

    Scalar gathers/scatters are slow on TPU; circuit matrices are
    mostly *local* (chains, grids, companion stamps on the diagonal).
    Frequent offsets d = col-row become dense diagonal arrays whose
    matvec contribution is a shift+multiply on the VPU (no gather at
    all); the leftover far entries stay COO.  Duck-types the ELL
    interface (values()/matvec()) for bicgstab_ell.
    """

    def __init__(self, rows, cols, n: int, min_frac: float = 0.02,
                 max_diags: int = 16):
        import numpy as np
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        self.n = n
        offs = cols - rows
        uniq, counts = np.unique(offs, return_counts=True)
        keep = uniq[np.argsort(-counts)][:max_diags]
        keep = [int(o) for o in keep
                if counts[list(uniq).index(o)] >= min_frac * n
                and abs(o) < n]
        self.offsets = sorted(keep)
        in_band = np.isin(offs, self.offsets)
        # band placement: value slot = (band index, row)
        off_pos = {o: i for i, o in enumerate(self.offsets)}
        bi = np.array([off_pos.get(int(o), 0) for o in offs])
        self.band_pos = np.where(in_band,
                                 bi * (n + 1) + rows, 0).astype(np.int64)
        self.in_band = in_band
        self.rem_rows = rows[~in_band].astype(np.int32)
        self.rem_cols = cols[~in_band].astype(np.int32)
        self.nnz = len(rows)
        self._rem_sel = np.where(~in_band)[0].astype(np.int32)
        self._band_sel = np.where(in_band)[0].astype(np.int32)

    def values(self, vals):
        """(bands (ndiag, n+1), rem_vals) from COO values."""
        nb = len(self.offsets)
        bands = jnp.zeros(nb * (self.n + 1), vals.dtype)
        if len(self._band_sel):
            bands = bands.at[jnp.asarray(self.band_pos[self.in_band])].add(
                vals[jnp.asarray(self._band_sel)])
        rem = vals[jnp.asarray(self._rem_sel)] if len(self._rem_sel) \
            else jnp.zeros(0, vals.dtype)
        return bands.reshape(nb, self.n + 1), rem

    def matvec(self, valpack, x):
        bands, rem = valpack
        n = self.n
        x_ext = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        y = jnp.zeros(n, x.dtype)
        for i, off in enumerate(self.offsets):
            d = bands[i, :n]
            # y[r] += d[r] * x[r + off]  (static shift via pad+slice)
            if off == 0:
                y = y + d * x
            elif off > 0:
                xs = jnp.concatenate([x[off:], jnp.zeros(off, x.dtype)])
                y = y + d * xs
            else:
                xs = jnp.concatenate([jnp.zeros(-off, x.dtype), x[:off]])
                y = y + d * xs
        if len(self._rem_sel):
            rr = jnp.asarray(self.rem_rows)
            cc = jnp.asarray(self.rem_cols)
            y = y + jnp.zeros(n + 1, x.dtype).at[rr].add(
                rem * x_ext[cc])[:n]
        return y

    def diag_and_rowmax(self, valpack):
        bands, rem = valpack
        n = self.n
        diag = jnp.zeros(n, bands.dtype)
        row_max = jnp.zeros(n, bands.dtype)
        for i, off in enumerate(self.offsets):
            d = bands[i, :n]
            if off == 0:
                diag = diag + d
            row_max = jnp.maximum(row_max, jnp.abs(d))
        if len(self._rem_sel):
            rr = jnp.asarray(self.rem_rows)
            cc = jnp.asarray(self.rem_cols)
            isdiag = rr == cc
            diag = diag + jnp.zeros(n + 1, bands.dtype).at[
                jnp.where(isdiag, rr, n)].add(
                jnp.where(isdiag, rem, 0.0))[:n]
            row_max = jnp.maximum(
                row_max,
                jnp.zeros(n + 1, bands.dtype).at[rr].max(jnp.abs(rem))[:n])
        return diag, row_max


def bicgstab_ell(ell: ELL, vals, b, x0=None, tol: float = 1e-10,
                 max_iter: int = 400, inner_tol: float = 1e-6,
                 refine: int = 5):
    """Mixed-precision BiCGStab on an ELL pattern.

    Krylov iterations run entirely in f32 (fast gathers + VPU); an
    outer loop recomputes the residual in f64 and re-solves for the
    correction until ``tol`` — same refinement discipline as the dense
    GJ kernel (ops/gj.py).  Returns (x, converged, total_iters).
    """
    n = ell.n
    f64 = jnp.float64
    vals64 = vals.astype(f64)
    vm64 = ell.values(vals64)
    vm32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), vm64)
    b64 = b.astype(f64)
    bnorm = jnp.maximum(jnp.linalg.norm(b64), 1e-300)
    x = (x0.astype(f64) if x0 is not None else jnp.zeros(n, f64))

    # f32 Jacobi preconditioner with row-max floor (see bicgstab)
    diag, row_max = ell.diag_and_rowmax(vm32)
    row_max = jnp.maximum(row_max, 1e-30)
    d_safe = jnp.where(jnp.abs(diag) > 1e-3 * row_max, diag, row_max)
    minv = (1.0 / d_safe).astype(jnp.float32)

    mv32 = lambda v: ell.matvec(vm32, v)

    def krylov(r0):
        """f32 BiCGStab for A dx = r0; returns (dx, iters)."""
        r = r0
        i_ = jnp.arange(n, dtype=jnp.float32)
        h = jnp.sin((i_ + 1.0) * 12.9898) * 43758.5453
        h = (h - jnp.floor(h)) + 0.5
        r_hat = h * jnp.maximum(jnp.linalg.norm(r), 1e-30) / \
            jnp.linalg.norm(h)
        rho = jnp.vdot(r_hat, r)
        p = r
        x = jnp.zeros(n, jnp.float32)
        r0n = jnp.maximum(jnp.linalg.norm(r0), 1e-30)

        def cond(c):
            x, r, p, rho, it, done, ok = c
            return (~done) & ok & (it < max_iter)

        def body(c):
            x, r, p, rho, it, _d, _o = c
            p_hat = minv * p
            v = mv32(p_hat)
            den = jnp.vdot(r_hat, v)
            alpha = rho / jnp.where(den == 0, 1e-30, den)
            s = r - alpha * v
            s_hat = minv * s
            t = mv32(s_hat)
            tt = jnp.vdot(t, t)
            omega = jnp.vdot(t, s) / jnp.where(tt == 0, 1e-30, tt)
            x_new = x + alpha * p_hat + omega * s_hat
            r_new = s - omega * t
            rho_new = jnp.vdot(r_hat, r_new)
            beta = (rho_new / jnp.where(rho == 0, 1e-30, rho)) * \
                (alpha / jnp.where(omega == 0, 1e-30, omega))
            p_new = r_new + beta * (p - omega * v)
            done = jnp.linalg.norm(r_new) / r0n < inner_tol
            ok = jnp.all(jnp.isfinite(x_new))
            return (x_new, r_new, p_new, rho_new, it + 1, done, ok)

        init = (x, r, p, rho, jnp.int32(0), jnp.bool_(False),
                jnp.bool_(True))
        x, r, p, rho, it, done, ok = jax.lax.while_loop(cond, body, init)
        return jnp.where(ok, x, jnp.zeros_like(x)), it, ok

    total_it = jnp.int32(0)
    for _ in range(refine):
        r64 = b64 - ell.matvec(vm64, x)
        # a pass that goes non-finite (e.g. residual already ~0 makes
        # BiCGStab's rho/alpha 0/0) contributes dx = 0; the final f64
        # residual check below is the sole convergence verdict
        dx32, it, _ok = krylov(r64.astype(jnp.float32))
        x = x + dx32.astype(f64)
        total_it = total_it + it
    res = jnp.linalg.norm(b64 - ell.matvec(vm64, x)) / bnorm
    ok = (res < tol * 10.0) & jnp.all(jnp.isfinite(x))
    return x, ok, total_it


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
