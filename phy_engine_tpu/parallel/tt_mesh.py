"""Mesh-sharded u64 truth-table evaluation (SURVEY §2.7.9).

Role parity: the reference fans its synthesis truth-table inner loops
out across multiple GPUs by device bitmask
(/root/reference/src/pe_synth_cuda_u64_cones.cu:671-1860).  Here the
embarrassingly-parallel axis is the PATTERN WORDS: every device
evaluates the same topologically-ordered gate graph over its shard of
the packed u64 pattern matrix under ``shard_map``, with zero
collectives (the caller reduces).

The graph walk is a ``lax.fori_loop`` over nodes with a gather of the
two fanin rows and a one-row dynamic update — O(n_nodes) sequential
steps of (n_words/D)-wide vector work, the same schedule as the native
OpenMP backend (native/pe_tt.cpp) but scaled across the mesh.  JAX has
no u64 on TPU, so words travel as two u32 planes (lo/hi) and the
bitwise cores act on each plane independently (AND/OR/XOR/NOT are
bitwise — the split is exact).

Used by ``opt_graph.graphs_equivalent(..., mesh=...)`` deep-verify:
Omax equivalence checking with 2^20+ random patterns sharded over the
mesh at the wall-clock of a single-device 2^17 run.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..native import (OP_LEAF, OP_NOT, OP_AND, OP_OR, OP_XOR,
                      OP_CONST0, OP_CONST1)

_FN_CACHE: Dict = {}


def _local_eval(op, f0, f1, words):
    """words: (n_nodes, W_loc) u32 plane; sequential node walk."""
    n = op.shape[0]

    def body(i, w):
        a = jax.lax.dynamic_index_in_dim(w, f0[i], 0, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(w, f1[i], 0, keepdims=False)
        o = op[i]
        out = jnp.where(
            o == OP_NOT, ~a,
            jnp.where(o == OP_AND, a & b,
                      jnp.where(o == OP_OR, a | b,
                                jnp.where(o == OP_XOR, a ^ b,
                                          jnp.where(o == OP_CONST0,
                                                    jnp.zeros_like(a),
                                                    ~jnp.zeros_like(a))))))
        keep = jax.lax.dynamic_index_in_dim(w, i, 0, keepdims=False)
        out = jnp.where(o == OP_LEAF, keep, out)
        return jax.lax.dynamic_update_index_in_dim(w, out, i, 0)

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, words)


def eval_graph_mesh(op: np.ndarray, f0: np.ndarray, f1: np.ndarray,
                    words: np.ndarray, mesh: Mesh,
                    axis: str = None) -> np.ndarray:
    """Evaluate a topo-ordered gate graph over u64 pattern words with
    the word axis sharded over ``mesh``.

    Same contract as ``native.eval_graph``: ``words`` is
    (n_nodes, n_words) uint64 with leaf rows pre-filled; returns the
    fully evaluated matrix.  n_words is padded up to a multiple of the
    device count (padding words evaluate garbage and are dropped).
    """
    axes = tuple(mesh.axis_names) if axis is None else (axis,)
    D = int(np.prod([mesh.shape[a] for a in axes]))
    n_nodes, n_words = words.shape
    wp = -(-n_words // D) * D
    if wp != n_words:
        words = np.concatenate(
            [words, np.zeros((n_nodes, wp - n_words), np.uint64)],
            axis=1)
    lo = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (words >> np.uint64(32)).astype(np.uint32)
    planes = np.stack([lo, hi], axis=0).view(np.int32)  # (2, n, wp)

    aname = axes[0] if len(axes) == 1 else axes
    key = (id(mesh), aname, n_nodes, wp)
    fn = _FN_CACHE.get(key)
    if fn is None:
        def local(op_, f0_, f1_, pl):
            out = jax.vmap(lambda w: _local_eval(op_, f0_, f1_, w))(pl)
            return out

        fn = _FN_CACHE[key] = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, None, aname)),
            out_specs=P(None, None, aname), check_vma=False))
    out = np.asarray(fn(jnp.asarray(op.astype(np.int32)),
                        jnp.asarray(f0.astype(np.int32)),
                        jnp.asarray(f1.astype(np.int32)),
                        jnp.asarray(planes))).view(np.uint32)
    lo2 = out[0].astype(np.uint64)
    hi2 = out[1].astype(np.uint64)
    return ((hi2 << np.uint64(32)) | lo2)[:, :n_words]
