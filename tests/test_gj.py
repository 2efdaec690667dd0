"""Batched Gauss-Jordan solver + delta-form Newton tests.

Oracle pattern per SURVEY §4: CPU (numpy/LAPACK) vs TPU-kernel
agreement — the axis that replaces the reference's CPU-vs-CUDA checks
(test/0013.cuda/cuda_random_links_correctness.cu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phy_engine_tpu.ops import gj


def npsolve(A, b):
    return np.linalg.solve(A, b[..., None])[..., 0]


def test_solve_batched_random():
    rng = np.random.default_rng(0)
    B, n = 4, 128
    A = rng.standard_normal((B, n, n)) + 5 * np.eye(n)
    b = rng.standard_normal((B, n))
    x = np.asarray(gj.solve_batched(jnp.asarray(A), jnp.asarray(b)))
    xe = npsolve(A, b)
    assert np.max(np.abs(x - xe) / np.maximum(np.abs(xe), 1e-9)) < 1e-7


def test_solve_batched_zero_diagonal_pivoting():
    """Voltage-source rows: structural zeros on the diagonal."""
    rng = np.random.default_rng(1)
    n = 130  # also exercises padding to 256
    A = np.zeros((2, n, n))
    for bi in range(2):
        for i in range(n - 2):
            g = 10 ** rng.uniform(-3, 2)
            j = int(rng.integers(0, n - 2))
            A[bi, i, i] += g
            A[bi, j, j] += g
            A[bi, i, j] -= g
            A[bi, j, i] -= g
        # every node leaks to ground so the system is well-posed
        for i in range(n - 2):
            A[bi, i, i] += 1e-2
        A[bi, n - 2, 0] = 1.0
        A[bi, 0, n - 2] = 1.0
        A[bi, n - 1, 5] = 1.0
        A[bi, 5, n - 1] = 1.0
    b = rng.standard_normal((2, n))
    x = np.asarray(gj.solve_batched(jnp.asarray(A), jnp.asarray(b)))
    xe = npsolve(A, b)
    assert np.max(np.abs(x - xe) / np.maximum(np.abs(xe), 1e-9)) < 1e-6


@pytest.mark.parametrize("n", [4, 60, 128, 200])
def test_solve_batched_padding_sizes(n):
    rng = np.random.default_rng(n)
    A = rng.standard_normal((3, n, n)) + 4 * np.eye(n)
    b = rng.standard_normal((3, n))
    x = np.asarray(gj.solve_batched(jnp.asarray(A), jnp.asarray(b)))
    assert np.max(np.abs(x - npsolve(A, b))) < 1e-6


def test_extreme_scaling_equilibration():
    """Rows/cols spanning 1e-12..1e3 (gmin vs big conductance)."""
    rng = np.random.default_rng(3)
    n = 128
    A = rng.standard_normal((1, n, n)) + 10 * np.eye(n)
    scale_r = 10.0 ** rng.uniform(-12, 3, n)
    scale_c = 10.0 ** rng.uniform(-6, 6, n)
    A = A * scale_r[None, :, None] * scale_c[None, None, :]
    b = rng.standard_normal((1, n)) * scale_r[None, :]
    x = np.asarray(gj.solve_batched(jnp.asarray(A), jnp.asarray(b),
                                    refine=3))
    xe = npsolve(A, b)
    assert np.max(np.abs(x - xe) / np.maximum(np.abs(xe), 1e-12)) < 1e-6


def test_singularity_detected():
    """Residual check turns hopeless lanes into NaN for the Newton
    driver's isfinite guard (one singular lane, one good lane)."""
    rng = np.random.default_rng(4)
    n = 128
    good = rng.standard_normal((n, n)) + 5 * np.eye(n)
    sing = np.zeros((n, n))
    sing[0, :] = 1.0  # rank 1
    A = np.stack([good, sing])
    b = rng.standard_normal((2, n))
    x = np.asarray(gj.solve_batched(jnp.asarray(A), jnp.asarray(b)))
    assert np.all(np.isfinite(x[0]))
    assert not np.all(np.isfinite(x[1]))


def test_transposed_core_matches_fori_core():
    rng = np.random.default_rng(5)
    B, n = 8, 256
    A = (rng.standard_normal((B, n, n)) + 5 * np.eye(n)).astype(np.float32)
    b = rng.standard_normal((B, n)).astype(np.float32)
    x1 = np.asarray(jax.jit(gj._gj_xla)(jnp.asarray(A), jnp.asarray(b)))
    x2 = np.asarray(jax.jit(gj._gj_xla_T)(jnp.asarray(A), jnp.asarray(b)))
    xe = npsolve(A.astype(np.float64), b.astype(np.float64))
    for x in (x1, x2):
        r = np.abs(np.einsum("bij,bj->bi", A.astype(np.float64),
                             x.astype(np.float64)) - b)
        assert r.max() < 0.1  # raw f32 cores; refinement handles the rest
    # both cores pick the same pivots -> bitwise-comparable class
    assert np.max(np.abs(x1 - x2)) < 0.05 * np.max(np.abs(xe))


def test_delta_newton_matches_gauss_rectifier():
    import __graft_entry__ as g
    from phy_engine_tpu.engine import analog
    from phy_engine_tpu.parallel.batch import (batch_params, batch_state,
                                               batch_x)

    ir = g._build_rectifier()
    env = g._env()
    B = 8
    pb = batch_params(ir, B, jitter={"R": {"r": 0.05}})
    xb = batch_x(ir, B)
    sb = batch_state(ir, B)
    t0 = jnp.asarray(0.0, jnp.float64)
    dt = jnp.asarray(5e-7, jnp.float64)
    xr, _, okr, _ = jax.jit(
        lambda p, x, s: analog.transient_batched(
            ir, p, x, s, env, t0, dt, 40, solver="gauss"))(pb, xb, sb)
    xd, _, okd, _ = jax.jit(
        lambda p, x, s: analog.transient_batched(
            ir, p, x, s, env, t0, dt, 40, solver="delta"))(pb, xb, sb)
    assert bool(okr.all()) and bool(okd.all())
    assert float(jnp.max(jnp.abs(xd - xr))) < 1e-9


def test_delta_newton_matches_gauss_mesh():
    import __graft_entry__ as g
    from phy_engine_tpu.engine import analog
    from phy_engine_tpu.parallel.batch import (batch_params, batch_state,
                                               batch_x)

    ir = g._build_diode_ladder(n_stages=63, n_links=32)  # 64 unknowns
    env = g._env()
    B = 4
    pb = batch_params(ir, B, jitter={"R": {"r": 0.05}})
    xb = batch_x(ir, B)
    sb = batch_state(ir, B)
    t0 = jnp.asarray(0.0, jnp.float64)
    dt = jnp.asarray(5e-8, jnp.float64)
    xr, _, okr, _ = jax.jit(
        lambda p, x, s: analog.transient_batched(
            ir, p, x, s, env, t0, dt, 15, solver="gauss"))(pb, xb, sb)
    xd, _, okd, _ = jax.jit(
        lambda p, x, s: analog.transient_batched(
            ir, p, x, s, env, t0, dt, 15, solver="hybrid"))(pb, xb, sb)
    assert bool(okr.all()) and bool(okd.all())
    scale = max(float(jnp.max(jnp.abs(xr))), 1e-12)
    assert float(jnp.max(jnp.abs(xd - xr))) / scale < 1e-9


def test_linear_circuit_delta_path():
    """Linear circuits take the 2-iteration (solve+refine) fast path."""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import RESISTANCE, VDC
    from phy_engine_tpu.engine import analog
    from phy_engine_tpu.engine.lower import lower_analog
    from phy_engine_tpu.models.base import StampCtx

    nl = pe.Netlist()
    v = netops.add_model(nl, VDC, {"V": 3.0})
    r1 = netops.add_model(nl, RESISTANCE, {"r": 1000.0})
    r2 = netops.add_model(nl, RESISTANCE, {"r": 2000.0})
    n1 = netops.create_node(nl)
    n2 = netops.create_node(nl)
    netops.add_to_node(nl, v, 0, n1)
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r1, 0, n1)
    netops.add_to_node(nl, r1, 1, n2)
    netops.add_to_node(nl, r2, 0, n2)
    netops.add_to_node(nl, r2, 1, nl.ground_node)
    ir = lower_analog(nl)
    env = analog.env_scalars(pe.Environment())
    B = 3
    params = {k: jnp.broadcast_to(v2, (B,) + v2.shape)
              for k, v2 in analog.initial_params(ir).items()}
    ctx = StampCtx(mode="op", t=jnp.zeros(()), dt=jnp.zeros(()), env=env)
    x, st, ok = analog.newton_solve_batched(
        ir, params, jnp.zeros((B, ir.n_unknowns)),
        jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape),
            analog.initial_state(ir)), ctx, solver="delta")
    assert bool(ok.all())
    assert np.allclose(np.asarray(x[:, 1]), 2.0, atol=1e-9)


def test_gj_inverse_matches_solve():
    """gj_inverse32 (the frozen-Newton factor) reproduces per-lane
    numpy inverses to f32 accuracy on well-conditioned batches."""
    import numpy as np
    import jax.numpy as jnp
    from phy_engine_tpu.ops.gj import gj_inverse32

    rng = np.random.default_rng(3)
    B, n = 4, 256
    A = rng.standard_normal((B, n, n)).astype(np.float32)
    A += np.eye(n, dtype=np.float32) * 30.0
    Minv = np.asarray(gj_inverse32(jnp.asarray(A)))
    for b in range(B):
        err = np.abs(Minv[b] @ A[b] - np.eye(n)).max()
        assert err < 5e-4, (b, err)


def test_gj_inverse_pivots_structural_zero_diag():
    """MNA voltage-source rows have zero diagonals; the one-hot pivot
    search must still factor them (no-pivot schemes die here)."""
    import numpy as np
    import jax.numpy as jnp
    from phy_engine_tpu.ops.gj import gj_inverse32

    rng = np.random.default_rng(4)
    n = 128
    A = rng.standard_normal((1, n, n)).astype(np.float32)
    A += np.eye(n, dtype=np.float32) * 20.0
    # voltage-source border: zero diagonal at the last row
    A[0, n - 1, :] = 0.0
    A[0, :, n - 1] = 0.0
    A[0, n - 1, 0] = 1.0
    A[0, 0, n - 1] = 1.0
    A[0, n - 1, n - 1] = 0.0
    Minv = np.asarray(gj_inverse32(jnp.asarray(A)))
    err = np.abs(Minv[0] @ A[0] - np.eye(n)).max()
    assert err < 5e-4, err
