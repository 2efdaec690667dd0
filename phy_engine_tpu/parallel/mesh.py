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


def sharded_batched_transient_shmap(ir: AnalogIR, mesh: Mesh, params_b,
                                    x_b, states_b, env, t0, dt,
                                    num_steps, dtype=jnp.float64,
                                    solver: str = "hybrid"):
    """Batch-sharded transient under ``shard_map``: every device runs
    the full delta-Newton pipeline — sparse residual assembly AND the
    batched Gauss-Jordan factorization — on ONLY its batch shard.  No
    array (A-slabs included) ever holds the full batch on one device,
    unlike the GSPMD path where a custom kernel boundary can force an
    all-gather.  Per-shard Newton loops run independently (different
    iteration counts per device are fine under SPMD); the only
    collective is the final psum that makes the convergence flag
    global.

    Returns (x_final, states, ok_global) with x/states sharded over
    ('batch','sweep') and ok_global replicated."""
    axes = tuple(mesh.axis_names)
    batch_sharding = NamedSharding(mesh, P(axes))
    n_dev = mesh.devices.size

    params_b = jax.device_put(params_b, batch_sharding)
    x_b = jax.device_put(x_b, batch_sharding)
    states_b = jax.device_put(states_b, batch_sharding)

    def local(params, x, st):
        x2, st2, ok, _last = analog.transient_batched(
            ir, params, x, st, env, t0, dt, num_steps, None, dtype,
            solver=solver)
        ok_all = jnp.all(ok).astype(jnp.int32)
        ok_global = jax.lax.psum(ok_all, axes) == n_dev
        return x2, st2, ok_global

    # check_rep off: the GJ kernel builds fresh per-shard arrays
    # (iota/full) whose varying-axes tags differ from the sharded
    # carries; the computation is purely shard-local either way.
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axes), P(axes), P(axes)),
                       out_specs=(P(axes), P(axes), P()),
                       check_vma=False)
    return jax.jit(fn)(params_b, x_b, states_b)


def tp_solve_op(ir: AnalogIR, mesh: Mesh, params, x0, states0, env,
                mode: str = "op", dtype=jnp.float64):
    """Tensor-parallel operating point for ONE huge circuit: device
    *instances* are sharded across the mesh, so each chip evaluates and
    stamps its slice of the device population while the MNA system and
    solution stay replicated — XLA inserts the cross-device reduction
    for the scatter-add (the collective rides ICI).

    EVERY family shards: populations are mask-padded to a multiple of
    the device count (tp_pad_ir), so there is no replication fallback.
    Returns (x, states, ok) with x replicated on every device.
    """
    from ..models.base import StampCtx

    n_dev = mesh.devices.size
    axes = tuple(mesh.axis_names)
    shard = NamedSharding(mesh, P(axes))
    repl = NamedSharding(mesh, P())

    ir2, pad_params = tp_pad_ir(ir, n_dev)
    params_s = {k: jax.device_put(jnp.asarray(v), shard)
                for k, v in pad_params(params).items()}
    states_s = {}
    for fam in ir2.families:
        key = fam.mdef.id_name
        st = states0.get(key, {})
        padded = {}
        for k, v in st.items():
            v = np.asarray(v)
            if v.shape[0] < len(fam.P):
                v = np.concatenate([v, np.repeat(
                    v[-1:], len(fam.P) - v.shape[0], axis=0)])
            padded[k] = jax.device_put(jnp.asarray(v), shard)
        states_s[key] = padded
    x0 = jax.device_put(jnp.asarray(x0), repl)

    def run(p, x, s, envd):
        ctx = StampCtx(mode=mode, t=jnp.zeros((), dtype),
                       dt=jnp.zeros((), dtype), env=envd)
        return analog.newton_solve(ir2, p, x, s, ctx, None, dtype)

    fn = jax.jit(run, out_shardings=(repl, None, repl))
    return fn(params_s, x0, states_s, env)


# ---------------------------------------------------------------------------
# mask-padded tensor parallelism (no replication fallback)
# ---------------------------------------------------------------------------

def tp_pad_ir(ir: AnalogIR, n_dev: int):
    """Pad every family's instance axis to a multiple of ``n_dev`` so
    ALL families shard (the scale axis of SURVEY §5: one huge circuit,
    instances distributed).  Padded instances are copies of the last
    real instance with ``mask=0`` — the assembler multiplies their
    stamp values to zero (engine/analog.py mask support), so their
    scatter targets are harmless.

    Returns (padded_ir, pad_params) where ``pad_params(params)`` pads
    the runtime parameter dict the same way."""
    import dataclasses

    pads = {}
    fams = []
    for fam in ir.families:
        n = len(fam.P)
        pad = (-n) % n_dev

        def rep(a, _p=pad):
            a = np.asarray(a)
            if _p == 0:
                return a
            return np.concatenate([a, np.repeat(a[-1:], _p, axis=0)])

        f2 = dataclasses.replace(
            fam, P=rep(fam.P), pin_nodes=rep(fam.pin_nodes),
            br_idx=rep(fam.br_idx), a_rows=rep(fam.a_rows),
            a_cols=rep(fam.a_cols), z_rows=rep(fam.z_rows),
            state0={k: rep(v) for k, v in fam.state0.items()})
        f2.mask = np.concatenate([np.ones(n), np.zeros(pad)])
        pads[fam.mdef.id_name] = pad
        fams.append(f2)
    ir2 = dataclasses.replace(ir, families=fams)

    def pad_params(params):
        out = {}
        for key, P in params.items():
            p = pads.get(key, 0)
            P = np.asarray(P)
            if p:
                P = np.concatenate([P, np.repeat(P[-1:], p, axis=0)])
            out[key] = P
        return out

    return ir2, pad_params


def tp_assemble_sparse(ir: AnalogIR, mesh: Mesh, params, x, states,
                       env, mode: str = "op", dtype=jnp.float64):
    """Sharded sparse MNA assembly of ONE huge circuit: instance
    populations are mask-padded (tp_pad_ir) and split across every
    device of the mesh; each chip stamps its slice and XLA reduces the
    gathered COO value vector (psum over ICI).  Returns replicated
    (rows, cols, vals, Z) ready for the iterative solver.

    Role: the reference's biggest benchmark netlists
    (benchmark/0001.models 10^6-resistor ladders / 100k-node meshes)
    assemble on one host; this is the multi-chip replacement."""
    from ..models.base import StampCtx
    from ..engine import analog as _analog

    n_dev = mesh.devices.size
    axes = tuple(mesh.axis_names)
    shard = NamedSharding(mesh, P(axes))
    repl = NamedSharding(mesh, P())

    ir2, pad_params = tp_pad_ir(ir, n_dev)
    params_s = {k: jax.device_put(jnp.asarray(v), shard)
                for k, v in pad_params(params).items()}
    states_s = {}
    for fam in ir2.families:
        key = fam.mdef.id_name
        st = states.get(key, fam.state0)
        states_s[key] = {k: jax.device_put(
            jnp.asarray(np.asarray(v) if np.asarray(v).shape[0] ==
                        len(fam.P) else
                        np.concatenate([np.asarray(v), np.repeat(
                            np.asarray(v)[-1:],
                            len(fam.P) - np.asarray(v).shape[0],
                            axis=0)])), shard)
            for k, v in st.items()}
    x = jax.device_put(jnp.asarray(x), repl)

    def run(p, xv, s, envd):
        ctx = StampCtx(mode=mode, t=jnp.zeros((), dtype),
                       dt=jnp.zeros((), dtype), env=envd)
        rows, cols, vals, Z, _st = _analog.assemble_sparse(
            ir2, p, xv, s, ctx, None, dtype)
        return rows, cols, vals, Z

    fn = jax.jit(run, out_shardings=(repl, repl, repl, repl))
    return fn(params_s, x, states_s, env)
