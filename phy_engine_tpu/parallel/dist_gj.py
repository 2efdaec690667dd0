"""Cooperative single-system Gauss-Jordan factorization over the mesh.

The last scale axis (SURVEY §2.5 / §5): ONE system too large (or too
expensive) for a single chip, factored cooperatively with the columns
of A distributed over the mesh.  The reference has no analogue — its
largest solves (`benchmark/0001.models/1000000xR.cpp:55-60`) run on one
host; this is the ICI-sharded replacement for the dense/border-dense
regime (the sparse regime is covered by ops/sparse.py + ops/pcr.py).

Design — column-block-cyclic GJ under ``shard_map``:

* Columns are split into 128-wide panels; global panel ``p`` lives on
  device ``p % D`` (block-cyclic, so late panels do not pile onto one
  device).  Each device holds an (B, n, n/D) shard — **no device ever
  holds the full matrix**.
* At step ``p`` every device runs the (cheap, O(B·n·128²)) serial-pivot
  ``panel_factor`` on its local candidate panel; only the owner's
  result is kept and broadcast with ONE ``psum`` per step (non-owner
  contributions are zeroed — the `where` selects, so non-owner NaNs
  cannot leak).  Pivot bookkeeping (krow/pivd) stays replicated the
  same way.
* The O(B·n²·128) trailing updates — where the n³ FLOPs go — run
  shard-local on the MXU via ``trailing_update``; a ``lax.cond`` per
  local panel skips columns already eliminated, so aggregate trailing
  work is the sequential n³ divided by D.
* The factored G panels stay shard-local.  Refinement re-applies them
  to a fresh RHS with one psum broadcast per panel and computes the
  f64 residual as a *distributed matvec* (each device multiplies its
  column shard, psum reduces) — at no point is a full (n, n) array
  materialized per device.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.gj import NB, panel_factor, trailing_update

_RW = 128   # RHS rides in one 128-lane block, b in lane 0


def _block_cyclic_perm(n: int, D: int) -> np.ndarray:
    """Column permutation: device d's shard = panels [d, d+D, ...]."""
    npan = n // NB
    order = [p for d in range(D) for p in range(d, npan, D)]
    return np.concatenate(
        [np.arange(p * NB, (p + 1) * NB) for p in order])


def _x_from(krow, pivd, rhs, n: int):
    """Recover x (original index space) blockwise: x[k] = y[r] with
    krow[r] == k, y = b_final / pivot."""
    fdt = rhs.dtype
    bfin = rhs[:, :, 0]
    y = bfin / pivd
    xs = []
    for kb in range(n // NB):
        ks = kb * NB + jax.lax.broadcasted_iota(jnp.int32, (1, 1, NB), 2)
        ot = (krow[:, :, None] == ks).astype(fdt)        # (B, n, NB)
        xs.append(jax.lax.dot_general(
            ot, y[:, :, None], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=fdt))
    return jnp.concatenate([x[:, :, 0] for x in xs], axis=1)


def _dist_local(Aloc, b, axis: str, D: int, refine: int,
                factor_dtype=jnp.float32, validate: bool = False):
    """Shard-local body. Aloc: (B, n, n/D) work-dtype block-cyclic
    column shard; b: (B, n) replicated. Returns x replicated — or
    (x, rel) when ``validate``, rel the per-lane relative residual
    max|b - A x| / (max|A||x| + max|b|) computed distributed in the
    work dtype.  ``factor_dtype`` is f32 for the MXU fast path; the
    validated-reject fallback refactors in the work dtype."""
    B, n, nloc = Aloc.shape
    work = Aloc.dtype
    f32 = factor_dtype
    d = jax.lax.axis_index(axis)
    npl = nloc // NB
    npan = n // NB

    panels = [Aloc[:, :, i * NB:(i + 1) * NB].astype(f32)
              for i in range(npl)]
    rhs = jnp.concatenate(
        [b.astype(f32)[:, :, None], jnp.zeros((B, n, _RW - 1), f32)],
        axis=2)
    krow = jnp.full((B, n), -1, jnp.int32)
    pivd = jnp.ones((B, n), f32)

    def bcast(val, is_owner, zero_like):
        return jax.lax.psum(
            jnp.where(is_owner, val, jnp.zeros_like(zero_like)), axis)

    def one_pass(panels, rhs, krow, pivd, factor: bool):
        for p in range(npan):
            owner, li = p % D, p // D
            is_owner = d == jnp.int32(owner)
            if factor:
                Gp, krow2, pivd2 = panel_factor(
                    panels[li], krow, pivd, p * NB)
                G = bcast(Gp, is_owner, Gp)
                krow = jax.lax.psum(
                    jnp.where(is_owner, krow2 + 1, 0), axis) - 1
                pivd = bcast(pivd2, is_owner, pivd2)
                panels[li] = jnp.where(is_owner, G, panels[li])
            else:
                G = bcast(panels[li], is_owner, panels[li])
            ks = p * NB + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, NB), 2)
            O = (krow[:, :, None] == ks).astype(f32)
            if factor:
                for lj in range(npl):
                    g_lj = jnp.int32(lj * D) + d
                    panels[lj] = jax.lax.cond(
                        g_lj > jnp.int32(p),
                        lambda T: trailing_update(O, G, T),
                        lambda T: T, panels[lj])
            rhs = trailing_update(O, G, rhs)
        return panels, rhs, krow, pivd

    panels, rhs, krow, pivd = one_pass(panels, rhs, krow, pivd, True)
    x = _x_from(krow, pivd, rhs, n).astype(work)

    if refine:
        # global column indices of this shard (traced in d)
        li_iota = jnp.repeat(jnp.arange(npl, dtype=jnp.int32), NB)
        off = jnp.tile(jnp.arange(NB, dtype=jnp.int32), npl)
        gcols = (li_iota * jnp.int32(D) + d) * jnp.int32(NB) + off

    for _ in range(refine):
        xloc = jnp.take(x, gcols, axis=1)                # (B, nloc)
        contrib = jnp.einsum("bnj,bj->bn", Aloc, xloc)
        r = b - jax.lax.psum(contrib, axis)
        rrhs = jnp.concatenate(
            [r.astype(f32)[:, :, None],
             jnp.zeros((B, n, _RW - 1), f32)], axis=2)
        _, rrhs, _, _ = one_pass(panels, rrhs, krow, pivd, False)
        dx = _x_from(krow, pivd, rrhs, n).astype(work)
        x = x + dx
    if not validate:
        return x
    # validated reject (cuda_sparse_lu.h:1617-1620 diag-boost role):
    # the distributed work-dtype residual exposes silent f32-factor
    # failures (element growth, near-singular lanes) that refinement
    # cannot repair — callers reject and refactor in the work dtype
    if not refine:
        li_iota = jnp.repeat(jnp.arange(npl, dtype=jnp.int32), NB)
        off = jnp.tile(jnp.arange(NB, dtype=jnp.int32), npl)
        gcols = (li_iota * jnp.int32(D) + d) * jnp.int32(NB) + off
    xloc = jnp.take(x, gcols, axis=1)
    contrib = jnp.einsum("bnj,bj->bn", Aloc, xloc)
    r = b - jax.lax.psum(contrib, axis)
    anorm = jax.lax.psum(jnp.max(jnp.abs(Aloc), axis=(1, 2)), axis)
    xnorm = jnp.max(jnp.abs(x), axis=1)
    scale = anorm * xnorm + jnp.max(jnp.abs(b), axis=1)
    rel = jnp.max(jnp.abs(r), axis=1) / jnp.maximum(
        scale, jnp.asarray(1e-300 if work == jnp.float64 else 1e-30,
                           work))
    # a NaN/Inf lane must read as rejected, not slip through a NaN
    # comparison
    rel = jnp.where(jnp.isfinite(rel), rel, jnp.inf)
    return x, rel


_DELTA_CACHE = {}


def make_dist_delta_solver(mesh: Mesh, n: int, npad: int, axis=None,
                           refine: int = 2):
    """Jitted cooperative COO solver: (rows, cols, vals, b) -> x.

    The COO system (replicated, pre-equilibrated, ground dummy at index
    >= n) is scattered column-sharded: each device keeps ONLY the
    entries whose block-cyclic column panel it owns and builds an
    (npad, npad/D) local panel in the work dtype — no device ever
    materializes the full dense matrix.  The factorization runs in f32
    on the MXU exactly as in ``dist_solve``; ``refine`` distributed
    iterative-refinement passes against the work-dtype panels recover
    full precision (ops/gj solve_batched's f32-factor + f64-residual
    recipe, distributed).

    Returns ``(x, rel)`` — ``rel`` is the work-dtype relative residual
    of the linear solve (inf on NaN lanes).  Newton callers gate on it
    (the validated-reject path): a dx whose linear system was
    mis-solved must not masquerade as a converged iteration.

    Cached per (mesh, axes, n, npad, refine); Newton callers hit the
    same compiled executable every iteration.
    """
    axes = tuple(mesh.axis_names) if axis is None else (
        (axis,) if isinstance(axis, str) else tuple(axis))
    key = (mesh, axes, n, npad, refine)
    if key in _DELTA_CACHE:
        return _DELTA_CACHE[key]
    D = int(np.prod([mesh.shape[a] for a in axes]))
    if npad % (NB * D):
        raise ValueError(f"npad={npad} must be a multiple of {NB * D}")
    nloc = npad // D
    perm = _block_cyclic_perm(npad, D).astype(np.int32)
    invperm = np.argsort(perm).astype(np.int32)
    aname = axes[0] if len(axes) == 1 else axes

    def local(rows, cols, vals, b):
        work = vals.dtype
        d = jax.lax.axis_index(aname)
        pos = jnp.take(jnp.asarray(invperm),
                       jnp.clip(cols, 0, npad - 1).astype(jnp.int32))
        pan = pos // NB
        owner = pan % jnp.int32(D)
        loc = (pan // jnp.int32(D)) * NB + (pos % NB)
        mine = (rows < n) & (cols < n) & (owner == d)
        lr = jnp.where(mine, rows.astype(jnp.int32), jnp.int32(npad))
        lc = jnp.where(mine, loc, jnp.int32(0))
        Aloc = jnp.zeros((1, npad, nloc), work)
        Aloc = Aloc.at[0, lr, lc].add(
            jnp.where(mine, vals, jnp.zeros((), work)), mode="drop")
        # identity on the padding diagonal (original cols n..npad),
        # restricted to the columns this device owns
        lpos = jnp.arange(nloc, dtype=jnp.int32)
        gpos = (lpos // NB * jnp.int32(D) + d) * NB + (lpos % NB)
        gcol = jnp.take(jnp.asarray(perm), gpos)
        prow = jnp.where(gcol >= n, gcol, jnp.int32(npad))
        Aloc = Aloc.at[0, prow, lpos].add(
            jnp.where(gcol >= n, 1.0, 0.0).astype(work), mode="drop")
        x, rel = _dist_local(Aloc, b[None].astype(work),
                             axis=aname, D=D, refine=refine,
                             validate=True)
        return x[0], rel[0]

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False))
    _DELTA_CACHE[key] = fn
    return fn


def dist_solve(mesh: Mesh, A, b, axis=None, refine: int = 2,
               validate: bool = True, tol: float = None):
    """Solve A x = b with A's columns sharded over ``mesh``.

    A: (B, n, n) or (n, n); n must be a multiple of 128·D.  ``axis``
    defaults to all mesh axes (flattened).  The matrix is permuted into
    block-cyclic column order, placed with its column axis sharded
    (each device holds (B, n, n/D)), factored cooperatively in f32, and
    refined with work-dtype residuals.  Returns x replicated, shaped
    like b.

    ``validate`` (default on): the distributed work-dtype residual is
    checked against ``tol`` (relative; default 1e-9 under x64, 1e-4
    else).  Lanes the f32 factor mis-solved — f32 element growth can
    silently corrupt the factor without any NaN (e.g. Wilkinson-type
    growth matrices; the MNA analogue is the structural-zero-diagonal
    voltage-source regime outside equilibration's reach) — trigger ONE
    fallback refactorization in the work dtype (f64 under x64; the
    cuda_sparse_lu.h:1617-1620 diag-boost role).  Raises
    ``RuntimeError`` if the fallback still fails validation.
    """
    squeeze = A.ndim == 2
    A = jnp.asarray(A)[None] if squeeze else jnp.asarray(A)
    b = jnp.asarray(b)[None] if squeeze else jnp.asarray(b)
    axes = tuple(mesh.axis_names) if axis is None else (
        (axis,) if isinstance(axis, str) else tuple(axis))
    D = int(np.prod([mesh.shape[a] for a in axes]))
    B, n, _ = A.shape
    if n % (NB * D):
        raise ValueError(f"n={n} must be a multiple of {NB * D}")
    work = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if tol is None:
        tol = 1e-9 if work == jnp.float64 else 1e-4
    A = A.astype(work)
    b = b.astype(work)

    # exact power-of-two equilibration (matches ops.gj.solve_batched)
    tiny = jnp.asarray(1e-300 if work == jnp.float64 else 1e-30, work)
    rmax = jnp.maximum(jnp.max(jnp.abs(A), axis=2), tiny)
    rs = jnp.exp2(-jnp.floor(jnp.log2(rmax)))
    A = A * rs[:, :, None]
    cmax = jnp.maximum(jnp.max(jnp.abs(A), axis=1), tiny)
    cs = jnp.exp2(-jnp.floor(jnp.log2(cmax)))
    A = A * cs[:, None, :]
    b = b * rs

    perm = _block_cyclic_perm(n, D)
    A_bc = jnp.take(A, jnp.asarray(perm), axis=2)
    if len(axes) == 1:
        shard_axes = axes[0]
    else:
        shard_axes = axes
    col_sharding = NamedSharding(mesh, P(None, None, shard_axes))
    repl = NamedSharding(mesh, P())
    A_bc = jax.device_put(A_bc, col_sharding)
    b = jax.device_put(b, repl)

    aname = axes[0] if len(axes) == 1 else axes

    def run(factor_dtype):
        local = functools.partial(_dist_local, axis=aname, D=D,
                                  refine=refine,
                                  factor_dtype=factor_dtype,
                                  validate=validate)
        fn = jax.shard_map(local, mesh=mesh,
                           in_specs=(P(None, None, shard_axes), P()),
                           out_specs=(P(), P()) if validate else P(),
                           check_vma=False)
        return jax.jit(fn)(A_bc, b)

    if not validate:
        x = run(jnp.float32)
        return (x * cs)[0] if squeeze else x * cs
    x, rel = run(jnp.float32)
    if bool(jnp.any(rel > tol)):
        x2, rel2 = run(work)
        keep = (rel2 < rel)[:, None]
        x = jnp.where(keep, x2, x)
        rel = jnp.minimum(rel, rel2)
        if bool(jnp.any(rel > tol)):
            raise RuntimeError(
                f"dist_solve: validated reject — relative residual "
                f"{float(jnp.max(rel)):.3e} > tol {tol:.1e} after the "
                f"work-dtype fallback (singular or pathological lane)")
    x = x * cs
    return x[0] if squeeze else x
