"""Batched blocked Gauss-Jordan dense solver (the MXU LU replacement).

Role parity: the reference factors each MNA system with Eigen SparseLU
(circuit.h:1484-1524) or cuSOLVER QR/LU (cuda_sparse_lu.h:289-465).  On
TPU the equivalent SURVEY §2.7-item-2 kernel is a *batched* dense
factorization that keeps each system resident in VMEM and feeds the MXU:

* **One-hot pivoting, no row swaps.**  Partial pivoting is mandatory for
  MNA (voltage-source rows have structural-zero diagonals), but dynamic
  row swaps do not batch.  We run Gauss-Jordan elimination where the
  pivot row is *selected* with a one-hot mask (masked argmax over rows)
  instead of swapped — every step is a branch-free broadcast/reduce that
  vectorizes across the batch.
* **Blocked panels.**  Columns are eliminated NB=128 at a time.  Within
  the panel, each eliminated column slot is overwritten with its factor
  column; the panel updates applied to those stored columns make them
  exactly the accumulated transform G with M = I - G·Oᵀ (O = the panel's
  one-hot pivot selectors).  The trailing matrix then updates with two
  batched matmuls (R = Oᵀ·T; T -= G·R) — that is where the n³ FLOPs go,
  on the MXU.
* **f32 factorization + f64 iterative refinement.**  TPU has no native
  f64 MXU path, so we equilibrate (exact power-of-two row/col scaling),
  factor-solve in f32, and run fixed-count refinement with f64
  residuals, mirroring the plan in SURVEY §7 "Hard parts".

The same core (`_gj_core`) runs two ways: wrapped in a Pallas kernel
(whole slab held in VMEM for the full factorization — no HBM round
trips between panels) on TPU, or as plain XLA ops elsewhere (CPU tests,
shard_map on virtual meshes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

NB = 128          # panel width = MXU tile
_RHS_PAD = 128    # the b column rides in a 128-wide lane block


def panel_factor(panel, krow, pivd, k0: int):
    """One-hot-pivot elimination of one (B, n, nb) column panel.

    Eliminates the panel's nb columns in sequence; each eliminated lane
    slot is overwritten with its factor column so the returned panel is
    the accumulated transform G (M = I - G·Oᵀ).  ``krow``/``pivd`` are
    the (B, n) pivot bookkeeping arrays shared across panels.  ``k0``
    may be a Python int or a traced int32 (the distributed caller
    passes a traced global column offset).

    Shared by the single-device cores below and the mesh-distributed
    solver (parallel/dist_gj.py), which broadcasts the factored panel
    instead of the raw one.
    """
    B, n, nb = panel.shape
    dt = panel.dtype        # accumulation dtype follows the panel (f32
    # fast path; the dist validated-reject fallback factors in f64)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    k0 = jnp.asarray(k0, jnp.int32)

    def step(j, carry):
        panel, krow, pivd = carry
        mask_j = lane_iota == j
        col = jnp.sum(jnp.where(mask_j, panel, dt.type(0)), axis=2,
                      dtype=dt)
        avail = krow < 0
        m = jnp.where(avail, jnp.abs(col), dt.type(-3e38))
        mmax = jnp.max(m, axis=1, keepdims=True)
        cand = jnp.where(m == mmax, rows_iota, jnp.int32(2**30))
        r = jnp.min(cand, axis=1, keepdims=True)
        onehot = (rows_iota == r).astype(dt)
        pivval = jnp.sum(onehot * col, axis=1, dtype=dt)
        pivrow = jnp.sum(onehot[:, :, None] * panel, axis=1, dtype=dt)
        f = col / pivval[:, None] * (dt.type(1) - onehot)
        panel = panel - f[:, :, None] * pivrow[:, None, :]
        panel = jnp.where(mask_j, f[:, :, None], panel)
        krow = jnp.where(onehot > dt.type(0.5), k0 + j, krow)
        pivd = pivd + onehot * (pivval[:, None] - dt.type(1))
        return panel, krow, pivd

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), step,
                             (panel, krow, pivd))


def trailing_update(O, G, T):
    """MXU rank-nb update  T -= G · (Oᵀ · T)  for one trailing block.

    O: (B, n, nb) one-hot pivot selectors, G: (B, n, nb) factor panel,
    T: (B, n, m) trailing column block (or RHS block).  Accumulation
    follows T's dtype (f32 MXU fast path; f64 validated-reject
    fallback in dist_gj)."""
    acc = T.dtype
    R = jax.lax.dot_general(O, T, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=acc,
                            precision=jax.lax.Precision.HIGHEST)
    upd = jax.lax.dot_general(G.astype(acc), R,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=acc,
                              precision=jax.lax.Precision.HIGHEST)
    return T - upd.astype(T.dtype)


def _gj_core(blocks, n: int, nb: int = NB):
    """Blocked one-hot-pivot Gauss-Jordan over a list of column blocks.

    ``blocks``: n//nb A-column blocks of shape (B, n, nb) followed by
    one RHS block with b in lane 0.  Mosaic-friendly: no slice /
    dynamic_slice primitives anywhere — the within-panel column is
    selected with a lane mask, and blocks are plain Python-list entries
    (static structure).  Returns x: (B, n) f32; singular systems yield
    NaN/Inf (callers guard with isfinite like the Newton driver).
    """
    blocks = list(blocks)
    B = blocks[0].shape[0]
    dt = blocks[0].dtype
    f32 = jnp.float32
    # strict 32-bit hygiene: Mosaic cannot lower int64/f64, and x64-mode
    # tracing promotes python-int fori bounds and weak literals — every
    # literal and loop bound below is explicitly 32-bit.
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    krow = jnp.full((B, n), -1, jnp.int32)   # row r -> pivot step k
    pivd = jnp.ones((B, n), dt)              # row r -> its pivot value
    n_ablk = n // nb

    for kb in range(n_ablk):
        def step(j, carry, _k0=kb * nb):
            panel, krow, pivd = carry
            mask_j = lane_iota == j
            col = jnp.sum(jnp.where(mask_j, panel, f32(0)), axis=2,
                          dtype=f32)
            avail = krow < 0
            m = jnp.where(avail, jnp.abs(col), f32(-3e38))
            # one-hot argmax without int64 (Mosaic-safe under x64):
            # max value, then smallest row index attaining it
            mmax = jnp.max(m, axis=1, keepdims=True)
            cand = jnp.where(m == mmax, rows_iota, jnp.int32(2**30))
            r = jnp.min(cand, axis=1, keepdims=True)
            onehot = (rows_iota == r).astype(dt)
            pivval = jnp.sum(onehot * col, axis=1, dtype=f32)
            # pivot row restricted to the panel (trailing goes blocked)
            pivrow = jnp.sum(onehot[:, :, None] * panel, axis=1, dtype=f32)
            f = col / pivval[:, None] * (f32(1) - onehot)
            panel = panel - f[:, :, None] * pivrow[:, None, :]
            # store the factor column in the eliminated slot -> G
            panel = jnp.where(mask_j, f[:, :, None], panel)
            krow = jnp.where(onehot > f32(0.5), jnp.int32(_k0) + j, krow)
            pivd = pivd + onehot * (pivval[:, None] - f32(1))
            return panel, krow, pivd

        panel, krow, pivd = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nb), step, (blocks[kb], krow, pivd))
        blocks[kb] = panel

        # trailing update on the MXU: T -= G @ (O^T T)
        ks = kb * nb + jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
        O = (krow[:, :, None] == ks).astype(dt)            # (B, n, nb)
        for tb in range(kb + 1, len(blocks)):
            T = blocks[tb]
            R = jax.lax.dot_general(O, T, (((1,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            upd = jax.lax.dot_general(
                panel, R, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            blocks[tb] = T - upd.astype(dt)

    # x[k] = b_final[r] / pivval  where krow[r] == k
    rhs_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, blocks[n_ablk].shape[2]), 2)
    bfin = jnp.sum(jnp.where(rhs_iota == jnp.int32(0),
                             blocks[n_ablk], f32(0)), axis=2, dtype=f32)
    y = bfin / pivd
    ks_all = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    P = (krow[:, :, None] == ks_all).astype(dt)            # (B, n, n)
    x = jax.lax.dot_general(P, y[:, :, None],
                            (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return x[:, :, 0].astype(dt)


MB = 32           # micro-panel width (tuned on v5e: 32 beats 8/16/64)


def _gj_core_T(ablocks, rhs, n: int, nb: int = NB, mb: int = MB):
    """Transposed micro-panel Gauss-Jordan (the fast TPU layout).

    Same algorithm as ``_gj_core`` but with *rows on lanes*: each A
    block is (B, nb, n) holding nb columns as sublanes; ``rhs`` is
    (B, mb, n) with b in sublane 0.  Columns are eliminated in mb-wide
    micro-panels: a left-looking MXU expand applies the accumulated
    panel transform M = I - G·Oᵀ to the next mb columns, then mb
    sequential steps touch only the (B, mb, n) micro-slab — per-step
    traffic drops from O(B·n·nb) to O(B·n·mb), which is what makes the
    serial pivot loop fast.  Trailing blocks update with two batched
    MXU matmuls per panel:  Tᵀ -= (Tᵀ·O)·Gᵀ.
    """
    ablocks = list(ablocks)
    B = ablocks[0].shape[0]
    dt = ablocks[0].dtype
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    rows_lane = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, mb, 1), 1)
    krow = jnp.full((B, n), -1, jnp.int32)
    pivd = jnp.ones((B, n), dt)
    n_ablk = n // nb
    nmicro = nb // mb

    def bdot(x, y, cx, cy):
        return jax.lax.dot_general(
            x, y, (((cx,), (cy,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=hp)

    for kb in range(n_ablk):
        k0 = kb * nb
        done = []    # per-micro (O_i, G_i): M_i = I - G_i·O_iᵀ, exact
        for mi in range(nmicro):
            c0 = ablocks[kb][:, mi * mb:(mi + 1) * mb, :]
            # left-looking expand: apply completed micro transforms in
            # order (M_total = M_{mi-1}···M_0 — sequential application
            # avoids cross-updating stored G blocks)
            for ot_i, g_i in done:
                sel = bdot(c0, ot_i, 2, 2)                 # (B, mb, mb)
                c0 = c0 - bdot(sel, g_i, 2, 1).astype(dt)

            def step(j2, carry, _kbase=k0 + mi * mb):
                c, krow, pivd = carry
                smask = sub_iota == j2
                col = jnp.sum(jnp.where(smask, c, f32(0)), axis=1,
                              dtype=f32)                   # (B, n)
                m = jnp.where(krow < 0, jnp.abs(col), f32(-3e38))
                mmax = jnp.max(m, axis=1, keepdims=True)
                cand = jnp.where(m == mmax, rows_lane, jnp.int32(2**30))
                r = jnp.min(cand, axis=1, keepdims=True)
                onehot = (rows_lane == r).astype(dt)
                pivval = jnp.sum(onehot * col, axis=1, dtype=f32)
                pivrow = jnp.sum(c * onehot[:, None, :], axis=2,
                                 dtype=f32)                # (B, mb)
                f = col / pivval[:, None] * (f32(1) - onehot)
                c = c - pivrow[:, :, None] * f[:, None, :]
                c = jnp.where(smask, f[:, None, :], c)
                krow = jnp.where(onehot > f32(0.5),
                                 jnp.int32(_kbase) + j2, krow)
                pivd = pivd + onehot * (pivval[:, None] - f32(1))
                return c, krow, pivd

            c0, krow, pivd = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(mb), step, (c0, krow, pivd))
            ks = (k0 + mi * mb) + jax.lax.broadcasted_iota(
                jnp.int32, (1, mb, 1), 1)
            ot_i = (ks == krow[:, None, :]).astype(dt)     # (B, mb, n)
            done.append((ot_i, c0))

        # trailing blocks + rhs: apply the panel's micro transforms in
        # order (same sequential composition as the expand)
        def apply_panel(t):
            for ot_i, g_i in done:
                sel = bdot(t, ot_i, 2, 2)
                t = t - bdot(sel, g_i, 2, 1).astype(dt)
            return t

        for tb in range(kb + 1, n_ablk):
            ablocks[tb] = apply_panel(ablocks[tb])
        rhs = apply_panel(rhs)

    # x[k] = b_final[r] / pivval  where krow[r] == k  (per panel)
    y = rhs[:, 0, :] / pivd                               # (B, n)
    xs = []
    for kb in range(n_ablk):
        ks = kb * nb + jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
        ot = (ks == krow[:, None, :]).astype(dt)
        xs.append(bdot(ot, y[:, :, None], 2, 1)[:, :, 0].astype(dt))
    return jnp.concatenate(xs, axis=1)


def _gj_core_T_multi(ablocks, rhs, n: int, nb: int = NB, mb: int = MB):
    """`_gj_core_T` generalized to an (B, m, n) RHS block; returns the
    full (B, n, m) solution matrix.  With RHS = I this yields A^-1 —
    the frozen-preconditioner Newton path (engine/analog.py 'frozen')
    factors once into an explicit batched inverse so every subsequent
    iteration is a single MXU matvec."""
    ablocks = list(ablocks)
    B = ablocks[0].shape[0]
    dt = ablocks[0].dtype
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    rows_lane = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, mb, 1), 1)
    krow = jnp.full((B, n), -1, jnp.int32)
    pivd = jnp.ones((B, n), dt)
    n_ablk = n // nb
    nmicro = nb // mb

    def bdot(x, y, cx, cy):
        return jax.lax.dot_general(
            x, y, (((cx,), (cy,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=hp)

    for kb in range(n_ablk):
        k0 = kb * nb
        done = []
        for mi in range(nmicro):
            c0 = ablocks[kb][:, mi * mb:(mi + 1) * mb, :]
            for ot_i, g_i in done:
                sel = bdot(c0, ot_i, 2, 2)
                c0 = c0 - bdot(sel, g_i, 2, 1).astype(dt)

            def step(j2, carry, _kbase=k0 + mi * mb):
                c, krow, pivd = carry
                smask = sub_iota == j2
                col = jnp.sum(jnp.where(smask, c, f32(0)), axis=1,
                              dtype=f32)
                m = jnp.where(krow < 0, jnp.abs(col), f32(-3e38))
                mmax = jnp.max(m, axis=1, keepdims=True)
                cand = jnp.where(m == mmax, rows_lane, jnp.int32(2**30))
                r = jnp.min(cand, axis=1, keepdims=True)
                onehot = (rows_lane == r).astype(dt)
                pivval = jnp.sum(onehot * col, axis=1, dtype=f32)
                pivrow = jnp.sum(c * onehot[:, None, :], axis=2,
                                 dtype=f32)
                f = col / pivval[:, None] * (f32(1) - onehot)
                c = c - pivrow[:, :, None] * f[:, None, :]
                c = jnp.where(smask, f[:, None, :], c)
                krow = jnp.where(onehot > f32(0.5),
                                 jnp.int32(_kbase) + j2, krow)
                pivd = pivd + onehot * (pivval[:, None] - f32(1))
                return c, krow, pivd

            c0, krow, pivd = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(mb), step, (c0, krow, pivd))
            ks = (k0 + mi * mb) + jax.lax.broadcasted_iota(
                jnp.int32, (1, mb, 1), 1)
            ot_i = (ks == krow[:, None, :]).astype(dt)
            done.append((ot_i, c0))

        def apply_panel(t):
            for ot_i, g_i in done:
                sel = bdot(t, ot_i, 2, 2)
                t = t - bdot(sel, g_i, 2, 1).astype(dt)
            return t

        for tb in range(kb + 1, n_ablk):
            ablocks[tb] = apply_panel(ablocks[tb])
        rhs = apply_panel(rhs)

    y = rhs / pivd[:, None, :]                            # (B, m, n)
    xs = []
    for kb in range(n_ablk):
        ks = kb * nb + jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
        ot = (ks == krow[:, None, :]).astype(dt)
        xs.append(bdot(ot, y, 2, 2).astype(dt))           # (B, nb, m)
    return jnp.concatenate(xs, axis=1)                    # (B, n, m)


@functools.partial(jax.jit, static_argnames=("bt",))
def _gj_inv_pallas(A32, bt: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = A32.shape
    mb = int(os.environ.get("PE_TPU_GJ_MB", str(MB)))

    def kernel(a_ref, x_ref):
        At = jnp.swapaxes(a_ref[...], 1, 2)
        blocks = [At[:, k0:k0 + NB, :] for k0 in range(0, n, NB)]
        # identity via int32 iota (jnp.eye builds int64 iotas under
        # x64 mode, which Mosaic cannot lower)
        ri = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (1, n, n), 2)
        eye = jnp.broadcast_to((ri == ci).astype(jnp.float32),
                               (At.shape[0], n, n))
        x_ref[...] = _gj_core_T_multi(blocks, eye, n, mb=mb)

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


def gj_inverse32(A32):
    """Batched f32 inverse via one-hot-pivot GJ; A (B, n, n), n % 128 == 0.

    Singular lanes yield NaN/Inf entries (callers residual-check)."""
    B, n, _ = A32.shape
    if _backend() == "pallas":
        cap_mb = int(os.environ.get("PE_TPU_GJ_VMEM_MB", "16"))
        slab = 3 * n * n * 4            # A + I/RHS + out
        bt = max(1, (cap_mb << 20) // max(slab, 1))
        bt = 1 << (bt.bit_length() - 1)
        while B % bt:
            bt //= 2
        return _gj_inv_pallas(A32, max(bt, 1))
    At = jnp.swapaxes(A32, 1, 2)
    blocks = [At[:, k0:k0 + NB, :] for k0 in range(0, n, NB)]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (B, n, n))
    return _gj_core_T_multi(blocks, eye, n)


def _to_blocks_T(A32, b32, nb: int = NB, mb: int = MB):
    """Transposed block layout for `_gj_core_T`."""
    B, n, _ = A32.shape
    At = jnp.swapaxes(A32, 1, 2)                           # (B, cols, rows)
    blocks = [At[:, k0:k0 + nb, :] for k0 in range(0, n, nb)]
    rhs = jnp.concatenate(
        [b32[:, None, :], jnp.zeros((B, mb - 1, n), A32.dtype)], axis=1)
    return blocks, rhs


def _gj_xla_T(A32, b32):
    n = A32.shape[1]
    blocks, rhs = _to_blocks_T(A32, b32)
    return _gj_core_T(blocks, rhs, n)


def _to_blocks(A32, b32, nb: int = NB):
    B, n, _ = A32.shape
    blocks = [A32[:, :, k0:k0 + nb] for k0 in range(0, n, nb)]
    rhs = jnp.concatenate(
        [b32[:, :, None], jnp.zeros((B, n, _RHS_PAD - 1), A32.dtype)],
        axis=2)
    blocks.append(rhs)
    return blocks


def _gj_xla(A32, b32):
    n = A32.shape[1]
    return _gj_core(_to_blocks(A32, b32), n)


def _pick_tile(B: int, n: int) -> int:
    """Batch tile so the VMEM slab stays under the cap (default 16 MB;
    tune with PE_TPU_GJ_VMEM_MB).  Bigger tiles amortize the serial
    per-column pivot latency over more lanes, which is the dominant
    cost at n<=512 — the slab just has to fit VMEM alongside the
    working micro-panels."""
    cap_mb = int(os.environ.get("PE_TPU_GJ_VMEM_MB", "16"))
    slab_bytes = n * (n + _RHS_PAD) * 4
    bt = max(1, (cap_mb << 20) // max(slab_bytes, 1))
    bt = 1 << (bt.bit_length() - 1)          # power of two
    while B % bt:
        bt //= 2
    return max(bt, 1)


@functools.partial(jax.jit, static_argnames=("bt",))
def _gj_pallas(A32, b32, bt: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = A32.shape

    mb = int(os.environ.get("PE_TPU_GJ_MB", str(MB)))

    def kernel(a_ref, b_ref, x_ref):
        blocks, rhs = _to_blocks_T(a_ref[...], b_ref[...], mb=mb)
        x_ref[...] = _gj_core_T(blocks, rhs, n, mb=mb)

    # index maps return traced zeros: under x64, literal 0 becomes an
    # int64 constant in the lowered index function, which Mosaic rejects
    z = lambda i: jnp.zeros((), jnp.int32)
    grid = (B // bt,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, n, n), lambda i: (i, z(i), z(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n), lambda i: (i, z(i)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, n), lambda i: (i, z(i)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * n * n, transcendentals=0,
            bytes_accessed=B * n * n * 4),
    )(A32, b32)


def _backend() -> str:
    mode = os.environ.get("PE_TPU_GJ", "auto")
    if mode in ("xla", "pallas"):
        return mode
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    return "pallas" if plat == "tpu" else "xla"


def gj_solve32(A32, b32):
    """f32 batched solve A x = b; A (B,n,n), b (B,n); n % 128 == 0."""
    if _backend() == "pallas":
        bt = _pick_tile(A32.shape[0], A32.shape[1])
        return _gj_pallas(A32, b32, bt)
    return _gj_xla(A32, b32)


def solve_batched(A, b, refine: int = 2, check: bool = True,
                  check_rtol: float = 1e-6):
    """Batched dense solve with equilibration + f64 refinement.

    A: (B, n, n), b: (B, n) — any float dtype; returns x in A.dtype.
    Pads n up to a multiple of 128 with identity rows.  ``refine``
    fixed-count f64-residual refinement passes recover ~f64 accuracy
    from the f32 factorization for equilibrated-condition <= ~1e7.

    ``check``: lanes whose final relative residual exceeds
    ``check_rtol`` are replaced with NaN so callers (the Newton driver's
    isfinite guard, or the hybrid f64 fallback in
    ``engine.analog.newton_solve_batched``) detect the failure — the
    f32 factorization cannot handle equilibrated condition > ~1e7.
    """
    B, n, _ = A.shape
    out_dtype = A.dtype
    work = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    A = A.astype(work)
    b = b.astype(work)

    # exact power-of-two row then column equilibration
    tiny = jnp.asarray(1e-300 if work == jnp.float64 else 1e-30, work)
    rmax = jnp.maximum(jnp.max(jnp.abs(A), axis=2), tiny)
    r = jnp.exp2(-jnp.floor(jnp.log2(rmax)))
    A = A * r[:, :, None]
    cmax = jnp.maximum(jnp.max(jnp.abs(A), axis=1), tiny)
    c = jnp.exp2(-jnp.floor(jnp.log2(cmax)))
    A = A * c[:, None, :]
    b = b * r

    npad = max(NB, ((n + NB - 1) // NB) * NB)
    if npad != n:
        eye_tail = jnp.zeros((B, npad - n, npad), work)
        eye_tail = eye_tail.at[
            :, jnp.arange(npad - n), n + jnp.arange(npad - n)].set(1.0)
        A = jnp.concatenate([
            jnp.concatenate([A, jnp.zeros((B, n, npad - n), work)], axis=2),
            eye_tail], axis=1)
        b = jnp.concatenate([b, jnp.zeros((B, npad - n), work)], axis=1)

    A32 = A.astype(jnp.float32)
    x = gj_solve32(A32, b.astype(jnp.float32)).astype(work)
    for _ in range(refine):
        resid = b - jnp.einsum("bij,bj->bi", A, x)
        dx = gj_solve32(A32, resid.astype(jnp.float32)).astype(work)
        x = x + dx
    if check:
        resid = b - jnp.einsum("bij,bj->bi", A, x)
        scale = jnp.maximum(
            jnp.max(jnp.abs(b), axis=1),
            jnp.max(jnp.abs(A), axis=(1, 2)) * jnp.max(jnp.abs(x), axis=1))
        bad = jnp.max(jnp.abs(resid), axis=1) > check_rtol * jnp.maximum(
            scale, jnp.asarray(1e-30, work))
        x = jnp.where(bad[:, None], jnp.asarray(jnp.nan, work), x)
    x = x[:, :n] * c
    return x.astype(out_dtype)
