"""Batched (vmapped) circuit analysis.

The engine in ``engine.analog`` is pure over a pytree of parameter and
state arrays, so a *batch of circuits with shared topology* (Monte-Carlo,
corners, parameter sweeps — the workload class the reference covers with
independent process runs) is a single ``jax.vmap``: one batched MNA
assembly and one batched dense LU that tiles onto the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..engine import analog
from ..engine.lower import AnalogIR
from ..models.base import StampCtx


def batch_params(ir: AnalogIR, n: int, jitter: Optional[Dict] = None,
                 key=None, dtype=jnp.float64):
    """Tile the IR's parameters into a batch of n circuits.

    ``jitter``: optional {family_id: {param_name: rel_sigma}} lognormal
    perturbation for Monte-Carlo batches.
    """
    base = analog.initial_params(ir, dtype)
    out = {}
    if key is None:
        key = jax.random.PRNGKey(0)
    for fam in ir.families:
        k = fam.mdef.id_name
        P = jnp.broadcast_to(base[k], (n,) + base[k].shape)
        if jitter and k in jitter:
            for pname, sigma in jitter[k].items():
                col = fam.mdef.param_order.index(pname)
                key, sub = jax.random.split(key)
                factor = jnp.exp(sigma * jax.random.normal(
                    sub, (n, P.shape[1])))
                P = P.at[:, :, col].multiply(factor)
        out[k] = P
    return out


def batch_state(ir: AnalogIR, n: int, dtype=jnp.float64):
    st = analog.initial_state(ir, dtype)
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape), st)


def batch_x(ir: AnalogIR, n: int, dtype=jnp.float64):
    return jnp.zeros((n, ir.n_unknowns), dtype)


def batched_op(ir: AnalogIR, params_b, x_b, states_b, env, mode="op",
               t=0.0, dtype=jnp.float64):
    """Batched operating-point solve: (B, ...) in, (B, N) out."""
    def one(params, x, st):
        ctx = StampCtx(mode=mode, t=jnp.asarray(t, dtype),
                       dt=jnp.zeros((), dtype), env=env)
        return analog.newton_solve(ir, params, x, st, ctx, None, dtype)

    return jax.vmap(one)(params_b, x_b, states_b)


def batched_transient(ir: AnalogIR, params_b, x_b, states_b, env, t0, dt,
                      num_steps, dtype=jnp.float64, keep_trace=False):
    """Batched fixed-step transient: every circuit in the batch advances
    num_steps with its own masked Newton loop."""
    def one(params, x, st):
        x2, st2, ok, xs = analog.transient(
            ir, params, x, st, env, t0, dt, num_steps, None, dtype)
        if keep_trace:
            return x2, st2, ok, xs
        return x2, st2, ok, xs[-1]

    return jax.vmap(one)(params_b, x_b, states_b)
