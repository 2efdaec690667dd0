"""Blocked right-looking batched inverse (the MXU-panel LU prototype).

VERDICT r4 item 6 asked: if `gj_inverse32`'s achieved FLOP/s stays
under ~1% of peak, prototype a blocked right-looking factorization
whose panel updates are MXU GEMMs and report whether it beats the
one-hot Gauss-Jordan at n=256-1024.

Why `gj_inverse32` is slow: its serial pivot steps each sweep a
(B, mb, n) micro-slab — full-width rows, because GLOBAL partial
pivoting needs |column| over every unfinished row.  n serial steps x
O(B*mb*n) traffic is the bottleneck; the GEMMs are an afterthought.

This prototype trades pivoting strength for locality:

* **Within-diagonal-block pivoting only.**  Each nb x nb diagonal
  block is inverted with one-hot row selection confined to the block
  (`_block_inv32` — nb serial steps on (B, nb, 2nb) tiles, ~n/nb x
  less serial traffic than the GJ micro-panel).  The caller must
  pre-order the matrix so every leading diagonal block is
  nonsingular — MNA needs voltage-source rows interleaved, the same
  static-ordering contract as `parallel/dist_gj.py`'s panels.
* **Everything else is GEMM.**  Per block step: compose the
  elimination/normalization transform G = (C*rmask - S)Dinv + S (a
  (B, n, nb) x (B, nb, nb) GEMM) and apply it full-width,
  W -= G @ Wb — ~4n^3 FLOPs total on the MXU, zero full-width serial
  work, and no scatter/offset-concat/pad (none of which Mosaic
  lowers).
* **Same failure contract as `gj_inverse32`**: a singular (or
  catastrophically pivoted) block yields NaN/Inf in the result; the
  frozen-Newton caller already residual-gates every factor
  (engine/analog.py resid_ok) and the distributed solver
  validated-rejects, so a weak pivot never silently corrupts a solve.

Reference anchor: the role is cuda_sparse_lu.h:599-631 (batched
dense factorization feeding the matrix engine); the blocked
right-looking shape is the classic LAPACK getrf panel/update split,
re-cast as Gauss-Jordan so the explicit inverse the frozen path wants
falls out without a second triangular-solve pass.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

NB_BLOCK = 32     # diagonal block = pivot scope (tuned: 32 ~= 64 > 16)


def _block_inv32(D):
    """Explicit inverse of (B, nb, nb) blocks via one-hot-pivot GJ.

    Pivoting is partial within the block: nb serial steps, each a
    masked reduce + rank-1 update on the (B, nb, 2nb) working tile.
    Singular blocks produce NaN/Inf (caller gates)."""
    B, nb, _ = D.shape
    f32 = jnp.float32
    eye = jnp.broadcast_to(
        (jax.lax.broadcasted_iota(jnp.int32, (1, nb, nb), 1) ==
         jax.lax.broadcasted_iota(jnp.int32, (1, nb, nb), 2)
         ).astype(f32), (B, nb, nb))
    W = jnp.concatenate([D, eye], axis=2)            # (B, nb, 2nb)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, nb), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * nb), 2)
    krow = jnp.full((B, nb), -1, jnp.int32)
    pivd = jnp.ones((B, nb), f32)

    def step(j, carry):
        W, krow, pivd = carry
        col = jnp.sum(jnp.where(lane_iota == j, W, f32(0)), axis=2,
                      dtype=f32)                     # (B, nb)
        m = jnp.where(krow < 0, jnp.abs(col), f32(-3e38))
        mmax = jnp.max(m, axis=1, keepdims=True)
        cand = jnp.where(m == mmax, rows_iota, jnp.int32(2**30))
        r = jnp.min(cand, axis=1, keepdims=True)
        onehot = (rows_iota == r).astype(f32)
        pivval = jnp.sum(onehot * col, axis=1, dtype=f32)
        pivrow = jnp.sum(onehot[:, :, None] * W, axis=1, dtype=f32)
        f = col / pivval[:, None] * (f32(1) - onehot)
        W = W - f[:, :, None] * pivrow[:, None, :]
        krow = jnp.where(onehot > f32(0.5), j, krow)
        pivd = pivd + onehot * (pivval[:, None] - f32(1))
        return W, krow, pivd

    W, krow, pivd = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb),
                                      step, (W, krow, pivd))
    # Dinv[k, :] = W[r, nb:] / pivd[r]  where krow[r] == k
    Y = W[:, :, nb:] / pivd[:, :, None]
    ks = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    P = (ks == krow[:, None, :]).astype(f32)         # (B, k, r)
    return jax.lax.dot_general(
        P, Y, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _lu_block_core(A32, nb: int):
    B, n, _ = A32.shape
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST

    def bdot(x, y):
        return jax.lax.dot_general(
            x, y, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=hp)

    ri = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
    eye = jnp.broadcast_to((ri == ci).astype(f32), (B, n, n))
    W = jnp.concatenate([A32, eye], axis=2)          # (B, n, 2n)

    # Each block step is ONE full-width GEMM update  W -= G @ Wb  with
    #   G = (C*rmask - S) @ Dinv + S
    # where Wb = the block's rows, C = the block's columns, S the
    # one-hot row-placement matrix, rmask zeroing the block's own
    # rows.  Other rows get  W - C@Dinv@Wb  (elimination); block rows
    # get  W - (I - Dinv)@Wb = Dinv@Wb  (normalization) — the whole
    # Gauss-Jordan step without any scatter / offset-concat / pad,
    # none of which Mosaic can lower (found the hard way: scatter-add
    # unimplemented, "offset mismatch on non-concat dimension", and a
    # lanes-1 astype recursing the convert helper forever).
    rit = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    cit = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    for kb in range(n // nb):
        k0 = kb * nb
        Wb = W[:, k0:k0 + nb, :]                     # (B, nb, 2n)
        Dinv = _block_inv32(Wb[:, :, k0:k0 + nb])
        C = W[:, :, k0:k0 + nb]                      # (B, n, nb)
        rmask = ((rit < k0) | (rit >= k0 + nb)).astype(f32)
        S = (rit[:, :, None] == k0 + cit).astype(f32)   # (1, n, nb)
        G = bdot(C * rmask[:, :, None] - S, Dinv) + S
        W = W - bdot(G, Wb)
    return W[:, :, n:]


@functools.partial(jax.jit, static_argnames=("nb",))
def lu_block_inverse32(A32, nb: int = NB_BLOCK):
    """Batched f32 inverse, blocked right-looking GJ; A (B, n, n),
    n % nb == 0.  Pivoting is within-diagonal-block only — callers
    must pre-order so leading blocks are nonsingular, and MUST
    residual-gate the result (NaN/Inf or garbage on a zero in-block
    pivot).  Prototype comparator for `ops.gj.gj_inverse32`."""
    return _lu_block_core(A32, nb)


@functools.partial(jax.jit, static_argnames=("nb", "bt"))
def _lu_block_pallas(A32, nb: int, bt: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = A32.shape

    def kernel(a_ref, x_ref):
        x_ref[...] = _lu_block_core(a_ref[...], nb)

    z = lambda i: jnp.zeros((), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, n, n), lambda i: (i, z(i), z(i)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, n, n), lambda i: (i, z(i), z(i)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n * n * n, transcendentals=0,
            bytes_accessed=2 * B * n * n * 4),
    )(A32)


def lu_block_inverse32_auto(A32, nb: int = NB_BLOCK):
    """Platform chooser mirroring `ops.gj._backend`: VMEM-resident
    Pallas on TPU, plain XLA elsewhere."""
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    if plat == "tpu":
        return lu_block_inverse32_pallas(A32, nb)
    return lu_block_inverse32(A32, nb)


def lu_block_inverse32_pallas(A32, nb: int = NB_BLOCK):
    """VMEM-resident variant (same tiling policy as `gj_inverse32`)."""
    B, n, _ = A32.shape
    cap_mb = int(os.environ.get("PE_TPU_GJ_VMEM_MB", "16"))
    slab = 4 * n * n * 4          # A + W(2n) + out
    bt = max(1, (cap_mb << 20) // max(slab, 1))
    bt = 1 << (bt.bit_length() - 1)
    while B % bt:
        bt //= 2
    return _lu_block_pallas(A32, nb, max(bt, 1))
