"""Dense linear solvers for MNA systems.

The reference leans on Eigen SparseLU with partial pivoting
(circuit.h:1484-1524); its CUDA path uses cuSOLVER QR/LU
(cuda_sparse_lu.h).  On TPU, XLA's native LuDecomposition supports only
F32/C64, while SPICE-grade accuracy (<=1e-6 waveform error vs analytic)
wants f64 — so we provide:

* ``lu_solve_gauss`` — partial-pivoted Gaussian elimination written in
  pure jnp (rank-1 updates under ``lax.fori_loop``), dtype-generic: runs
  in f64/c128 on TPU (XLA software-emulated f64) and vmaps/shards
  cleanly for batched systems.
* ``dense_solve`` — dispatcher: native ``jnp.linalg.solve`` for
  f32/c64 (fast MXU path), Gaussian elimination otherwise.

MNA caveats handled: voltage-source rows have structural-zero diagonals,
so pivoting is mandatory (plain diagonal elimination would divide by
zero); a singular system yields NaN/Inf which the Newton driver detects
via its isfinite guard rather than raising.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lu_solve_gauss(A, b):
    """Solve A x = b by partial-pivoted Gauss-Jordan elimination.

    Works for real and complex dtypes.  O(n^3) with n rank-1 updates —
    each update is a fused outer-product on the VPU/MXU, so the
    sequential depth is n but each step is fully vectorized.
    """
    n = A.shape[-1]
    dtype = A.dtype
    neg_inf = jnp.asarray(-jnp.inf, jnp.float64)

    def body(k, carry):
        A, b = carry
        # pivot: largest |A[i, k]| among i >= k
        col = jnp.abs(A[:, k])
        col = jnp.where(jnp.arange(n) < k, neg_inf, col)
        p = jnp.argmax(col)
        # swap rows k <-> p (gather-based, no branches)
        idx = jnp.arange(n)
        idx = idx.at[k].set(p).at[p].set(k)
        A = A[idx]
        b = b[idx]
        pivot = A[k, k]
        factors = A[:, k] / pivot
        factors = factors.at[k].set(jnp.zeros((), dtype))
        A = A - factors[:, None] * A[k][None, :]
        b = b - factors * b[k]
        return A, b

    A, b = jax.lax.fori_loop(0, n, body, (A, b))
    return b / jnp.diagonal(A)


def dense_solve(A, b):
    """Dtype-dispatching dense solve (see module docstring)."""
    if A.dtype in (jnp.float32, jnp.complex64):
        return jnp.linalg.solve(A, b)
    return lu_solve_gauss(A, b)
