"""Batched + sharded execution tests (virtual 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as g
from phy_engine_tpu.parallel.batch import (batch_params, batch_state,
                                           batch_x, batched_transient,
                                           batched_op)
from phy_engine_tpu.parallel.mesh import make_mesh, \
    sharded_batched_transient


def test_entry_compiles():
    fn, args = g.entry()
    out, ok = jax.jit(fn)(*args)
    assert bool(np.asarray(ok).all())
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    assert len(jax.devices()) == 8
    g.dryrun_multichip(8)


def test_batched_matches_single():
    """Every batch lane with identical params produces the same result."""
    ir = g._build_rectifier()
    env = g._env()
    B = 4
    params_b = batch_params(ir, B)          # no jitter: identical
    x_b = batch_x(ir, B)
    st_b = batch_state(ir, B)
    x2, st2, ok, last = batched_transient(
        ir, params_b, x_b, st_b, env, jnp.asarray(0.0), jnp.asarray(1e-6),
        num_steps=10)
    x2 = np.asarray(x2)
    assert np.asarray(ok).all()
    for i in range(1, B):
        assert np.allclose(x2[0], x2[i])


def test_sharded_transient_runs():
    ir = g._build_rectifier()
    env = g._env()
    mesh = make_mesh(devices=jax.devices())
    B = int(np.prod(mesh.devices.shape)) * 2
    params_b = batch_params(ir, B, jitter={"R": {"r": 0.1}})
    x_b = batch_x(ir, B)
    st_b = batch_state(ir, B)
    x2, st2, ok = sharded_batched_transient(
        ir, mesh, params_b, x_b, st_b, env, jnp.asarray(0.0),
        jnp.asarray(1e-6), num_steps=3)
    assert bool(ok)
    assert np.all(np.isfinite(np.asarray(x2)))
