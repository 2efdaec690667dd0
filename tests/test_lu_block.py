"""Blocked right-looking inverse prototype (ops/lu_block.py).

Contract under test: matches the one-hot GJ inverse (and f64 truth)
on well-conditioned batches, survives zero diagonal ENTRIES when the
pivot lives inside the same 32-block (MNA voltage rows after the
static interleave), and fails LOUDLY (NaN/Inf, never silent garbage)
on a singular leading diagonal block — the contract the frozen
solver's residual gate and dist_gj's validated reject rely on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phy_engine_tpu.ops.lu_block import lu_block_inverse32, NB_BLOCK
from phy_engine_tpu.ops.gj import gj_inverse32


def _rand_wellcond(B, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A += n * np.eye(n, dtype=np.float32)
    return jnp.asarray(A)


def test_matches_f64_truth_and_gj():
    B, n = 8, 256
    A = _rand_wellcond(B, n)
    X = lu_block_inverse32(A)
    truth = np.linalg.inv(np.asarray(A, np.float64))
    err = np.max(np.abs(np.asarray(X, np.float64) - truth)) \
        / np.max(np.abs(truth))
    assert err < 5e-5, err
    Xg = gj_inverse32(A)
    errg = np.max(np.abs(np.asarray(Xg, np.float64) - truth)) \
        / np.max(np.abs(truth))
    # same accuracy class as the shipped kernel (both f32).  The
    # G = (C-S)Dinv + S composition routes every entry through one
    # extra HIGHEST GEMM vs the direct GJ step, costing ~1 bit
    # (measured 15x vs 10x on this seed) — fine for a factor that is
    # always residual-gated downstream.
    assert err < 30 * max(errg, 1e-7), (err, errg)


def test_zero_diagonal_entry_in_block_pivots():
    """An MNA voltage-source row has a structural-zero diagonal; as
    long as its pivot partner sits within the same diagonal block the
    within-block one-hot pivoting must handle it exactly like the
    global-pivot GJ."""
    B, n = 4, 128
    A = np.array(_rand_wellcond(B, n, seed=1))
    # voltage-source-like 2x2 saddle structure inside block 0 and 2
    for (i, j) in ((3, 17), (70, 90)):
        A[:, i, i] = 0.0
        A[:, i, j] = 1.0
        A[:, j, i] = 1.0
    A = jnp.asarray(A)
    X = lu_block_inverse32(A)
    truth = np.linalg.inv(np.asarray(A, np.float64))
    err = np.max(np.abs(np.asarray(X, np.float64) - truth)) \
        / np.max(np.abs(truth))
    assert err < 5e-4, err


def test_singular_leading_block_fails_loud():
    """A structurally singular leading diagonal block (all voltage
    rows landing together — the case within-block pivoting cannot
    fix) must produce NaN/Inf or a catastrophic residual, NEVER a
    silently-wrong finite inverse."""
    B, n = 2, 128
    nb = NB_BLOCK
    A = np.array(_rand_wellcond(B, n, seed=2))
    A[:, :nb, :nb] = 0.0          # leading block entirely zero...
    A[:, :nb, nb:2 * nb] = np.eye(nb)   # ...but A itself nonsingular
    A[:, nb:2 * nb, :nb] += np.eye(nb)
    A = jnp.asarray(A)
    X = np.asarray(lu_block_inverse32(A))
    if np.all(np.isfinite(X)):
        R = np.einsum("bij,bjk->bik", np.asarray(A, np.float64),
                      X.astype(np.float64))
        resid = np.max(np.abs(R - np.eye(n)))
        assert resid > 1e-2, ("silent wrong inverse", resid)


@pytest.mark.parametrize("nb", [32, 64])
def test_block_sizes(nb):
    B, n = 4, 128
    A = _rand_wellcond(B, n, seed=3)
    X = lu_block_inverse32(A, nb=nb)
    truth = np.linalg.inv(np.asarray(A, np.float64))
    err = np.max(np.abs(np.asarray(X, np.float64) - truth)) \
        / np.max(np.abs(truth))
    assert err < 5e-5, err
