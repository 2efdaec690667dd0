"""Multi-chip scaling via jax.sharding over a device Mesh.

The reference has **no distributed backend at all** (SURVEY.md §2.5/§5:
its only parallel axes are OpenMP threads and single-GPU CUDA batching).
The TPU-native scale-out replaces that with SPMD over an ICI mesh:

* axis ``"batch"`` — independent circuits (Monte-Carlo/corners), the
  data-parallel axis; zero communication in the hot loop;
* axis ``"sweep"`` — AC frequency points / parameter sweeps / transient
  ensembles, a second embarrassingly-parallel axis (the reference runs
  these as a serial loop, circuit.h:399-428);
* global health/convergence flags are combined with ``psum`` over both
  axes — the only collective the workload fundamentally needs; it rides
  ICI inside a slice.

Instance-sharded ("tensor parallel") MNA assembly with psum-reduced
stamp accumulation is the planned third axis for huge single circuits
(mask support in the assembler already allows padded instance shards).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import analog
from ..engine.lower import AnalogIR


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """Create a ('batch', 'sweep') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        # largest even split: batch gets the bigger factor
        s = 1
        while n % (s * 2) == 0 and (s * 2) * (s * 2) <= n:
            s *= 2
        shape = (n // s, s)
    arr = np.array(devices[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, ("batch", "sweep"))


def sharded_batched_transient(ir: AnalogIR, mesh: Mesh, params_b, x_b,
                              states_b, env, t0, dt, num_steps,
                              dtype=jnp.float64):
    """Run a batch of transients sharded over the mesh's 'batch' axis,
    with the sweep axis folded into the batch dimension.

    Returns (x_final, states, ok_global) where ok_global is the
    psum-combined all-circuits-converged flag (a real cross-device
    collective so failure detection is global, not per-shard).
    """
    n_dev = mesh.devices.size
    batch_sharding = NamedSharding(mesh, P(("batch", "sweep")))
    repl = NamedSharding(mesh, P())

    # place the batch sharded over all devices
    params_b = jax.device_put(params_b, batch_sharding)
    x_b = jax.device_put(x_b, batch_sharding)
    states_b = jax.device_put(states_b, batch_sharding)

    from .batch import batched_transient

    def step(params, x, st):
        x2, st2, ok, _last = batched_transient(
            ir, params, x, st, env, t0, dt, num_steps, dtype)
        # global convergence: every lane on every device must be ok
        ok_global = jnp.all(ok)
        return x2, st2, ok_global

    fn = jax.jit(step, out_shardings=(batch_sharding,
                                      batch_sharding, repl))
    return fn(params_b, x_b, states_b)


def tp_solve_op(ir: AnalogIR, mesh: Mesh, params, x0, states0, env,
                mode: str = "op", dtype=jnp.float64):
    """Tensor-parallel operating point for ONE huge circuit: device
    *instances* are sharded across the mesh, so each chip evaluates and
    stamps its slice of the device population while the MNA system and
    solution stay replicated — XLA inserts the cross-device reduction
    for the scatter-add (the collective rides ICI).

    Families whose instance count does not divide the device count stay
    replicated (correct, just not distributed).  Returns (x, states, ok)
    with x replicated on every device.
    """
    from ..models.base import StampCtx

    n_dev = mesh.devices.size
    axes = tuple(mesh.axis_names)
    shard = NamedSharding(mesh, P(axes))
    repl = NamedSharding(mesh, P())

    def place(v):
        v = jnp.asarray(v)
        if v.ndim >= 1 and v.shape[0] % n_dev == 0 and v.shape[0] > 0:
            return jax.device_put(v, shard)
        return jax.device_put(v, repl)

    params_s = {k: place(v) for k, v in params.items()}
    states_s = jax.tree.map(place, states0)
    x0 = jax.device_put(jnp.asarray(x0), repl)

    def run(p, x, s, envd):
        ctx = StampCtx(mode=mode, t=jnp.zeros((), dtype),
                       dt=jnp.zeros((), dtype), env=envd)
        return analog.newton_solve(ir, p, x, s, ctx, None, dtype)

    fn = jax.jit(run, out_shardings=(repl, None, repl))
    return fn(params_s, x0, states_s, env)
