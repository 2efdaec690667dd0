"""Cooperative column-sharded GJ solve over the mesh (dist_gj).

The single-system scale axis: ONE dense system factored cooperatively,
columns block-cyclic over the devices — no device ever holds the full
matrix.  Reference analogue: none (its largest solves are single-host,
`benchmark/0001.models/1000000xR.cpp`); SURVEY §2.5 calls for the
ICI-sharded solve this provides.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from phy_engine_tpu.ops.gj import NB
from phy_engine_tpu.parallel.dist_gj import dist_solve, _block_cyclic_perm


def _mesh(d=8):
    devs = np.array(jax.devices()[:d])
    return Mesh(devs, ("d",))


def _rand_system(B, n, seed=0, cond_boost=0.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((B, n, n))
    A += (np.sqrt(n) * 4) * np.eye(n)
    if cond_boost:
        # wildly varying row/col scales to exercise equilibration
        A *= np.exp(rng.uniform(-cond_boost, cond_boost, (B, n, 1)))
        A *= np.exp(rng.uniform(-cond_boost, cond_boost, (B, 1, n)))
    b = rng.standard_normal((B, n))
    return A, b


def _relerr(x, A, b):
    xref = np.linalg.solve(A, b[..., None])[..., 0]
    return np.max(np.abs(np.asarray(x) - xref) / (1 + np.abs(xref)))


def test_block_cyclic_perm_is_permutation():
    for D in (1, 2, 4, 8):
        p = _block_cyclic_perm(8 * NB, D)
        assert sorted(p.tolist()) == list(range(8 * NB))


def test_dist_solve_batched():
    mesh = _mesh()
    A, b = _rand_system(4, 8 * NB, seed=1)
    x = dist_solve(mesh, A, b, refine=2)
    assert _relerr(x, A, b) < 1e-10


def test_dist_solve_single_system():
    mesh = _mesh()
    A, b = _rand_system(1, 8 * NB, seed=2)
    x = dist_solve(mesh, A[0], b[0], refine=2)
    assert x.shape == (8 * NB,)
    assert _relerr(x[None], A, b) < 1e-10


def test_dist_solve_badly_scaled():
    """Power-of-two equilibration keeps wild row/col scales solvable."""
    mesh = _mesh()
    A, b = _rand_system(2, 8 * NB, seed=3, cond_boost=12.0)
    x = dist_solve(mesh, A, b, refine=3)
    assert _relerr(x, A, b) < 1e-8


def test_dist_solve_matches_smaller_mesh():
    """Same answer on a 2-device sub-mesh (different panel ownership)."""
    devs = np.array(jax.devices()[:2])
    mesh2 = Mesh(devs, ("d",))
    A, b = _rand_system(2, 2 * NB, seed=4)
    x2 = dist_solve(mesh2, A, b, refine=2)
    assert _relerr(x2, A, b) < 1e-10


def test_dist_solve_sharding_is_real():
    """Each device holds an (B, n, n/D) column shard, never full A."""
    mesh = _mesh()
    n, D = 8 * NB, 8
    A, b = _rand_system(1, n, seed=5)

    A_bc = jnp.take(jnp.asarray(A), jnp.asarray(_block_cyclic_perm(n, D)),
                    axis=2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    A_bc = jax.device_put(A_bc, NamedSharding(mesh, P(None, None, "d")))
    for s in A_bc.addressable_shards:
        assert s.data.shape == (1, n, n // D)


def test_newton_solve_dist_matches_engine():
    """Distributed Newton (instance-sharded stamping + cooperative
    column-sharded factorization) reproduces the engine's own OP on a
    nonlinear diode-loaded ladder."""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import RESISTANCE, VDC, PN_JUNCTION
    from phy_engine_tpu.engine import analog
    from phy_engine_tpu.parallel.dist_newton import newton_solve_dist

    rng = np.random.default_rng(11)
    c = pe.Circuit()
    c.set_analyze_type(pe.AnalyzeType.OP)
    nl = c.nl
    N = 300
    nds = [netops.create_node(nl) for _ in range(N)]
    gnd = nl.ground_node
    v = netops.add_model(nl, VDC, {"V": 3.0})
    netops.add_to_node(nl, v, 0, nds[0])
    netops.add_to_node(nl, v, 1, gnd)
    for i in range(N - 1):
        r = netops.add_model(nl, RESISTANCE,
                             {"r": float(rng.uniform(20, 200))})
        netops.add_to_node(nl, r, 0, nds[i])
        netops.add_to_node(nl, r, 1, nds[i + 1])
    for i in range(0, N, 23):   # diodes to ground through series Rs
        d = netops.add_model(nl, PN_JUNCTION, {})
        rs_ = netops.add_model(nl, RESISTANCE, {"r": 220.0})
        mid = netops.create_node(nl)
        netops.add_to_node(nl, rs_, 0, nds[i])
        netops.add_to_node(nl, rs_, 1, mid)
        netops.add_to_node(nl, d, 0, mid)
        netops.add_to_node(nl, d, 1, gnd)
    assert c.analyze()
    v_engine = np.array([c.node_voltage(nd).real for nd in nds])

    ir = c.prepare()
    mesh = Mesh(np.array(jax.devices()[:4]), ("d",))
    x0 = analog.initial_x(ir, jnp.float64)
    st0 = analog.initial_state(ir, jnp.float64)
    x, st, ok = newton_solve_dist(ir, mesh, c._params(), x0, st0,
                                  c._env_scalars())
    assert ok
    idx = {id(nd): i for i, nd in enumerate(ir.node_list)}
    v_dist = np.array([np.asarray(x)[idx[id(nd)]] for nd in nds])
    assert np.max(np.abs(v_dist - v_engine)) < 1e-6


def test_circuit_analyze_mesh_autoroute():
    """Circuit(mesh=...) auto-routes OP through the fully-distributed
    Newton path and matches the single-device engine bit-close."""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import RESISTANCE, VDC, PN_JUNCTION

    def build(mesh=None):
        rng = np.random.default_rng(5)
        c = pe.Circuit(mesh=mesh)
        c.set_analyze_type(pe.AnalyzeType.OP)
        nl = c.nl
        nds = [netops.create_node(nl) for _ in range(120)]
        v = netops.add_model(nl, VDC, {"V": 2.5})
        netops.add_to_node(nl, v, 0, nds[0])
        netops.add_to_node(nl, v, 1, nl.ground_node)
        for i in range(len(nds) - 1):
            r = netops.add_model(nl, RESISTANCE,
                                 {"r": float(rng.uniform(30, 300))})
            netops.add_to_node(nl, r, 0, nds[i])
            netops.add_to_node(nl, r, 1, nds[i + 1])
        for i in range(0, len(nds), 17):
            d = netops.add_model(nl, PN_JUNCTION, {})
            netops.add_to_node(nl, d, 0, nds[i])
            netops.add_to_node(nl, d, 1, nl.ground_node)
        return c, nds

    c_ref, nds_ref = build()
    assert c_ref.analyze()
    v_ref = np.array([c_ref.node_voltage(nd).real for nd in nds_ref])

    c_m, nds_m = build(mesh=_mesh())
    assert c_m.analyze()
    v_m = np.array([c_m.node_voltage(nd).real for nd in nds_m])
    assert np.max(np.abs(v_m - v_ref)) < 1e-6

    # the stored solution/state must feed a follow-up single-device
    # analysis (TR falls back to the local path by design)
    c_m.set_analyze_type(pe.AnalyzeType.TR)
    c_m.tr.t_stop = 1e-7
    c_m.tr.t_step = 1e-8
    assert c_m.analyze()


def test_dist_solve_rejects_bad_n():
    mesh = _mesh()
    A = np.eye(100)[None]
    with pytest.raises(ValueError):
        dist_solve(mesh, A, np.ones((1, 100)))


def test_transient_dist_matches_local():
    """Distributed fixed-step TR (sharded stamping + cooperative
    factorization) matches the local engine bit-close on a nonlinear
    RC-diode ladder, through the Circuit(mesh=...) route."""
    import numpy as np
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.engine.circuit import AnalyzeType
    from phy_engine_tpu.models import (RESISTANCE, CAPACITOR, VDC,
                                       PN_JUNCTION)
    from phy_engine_tpu.parallel.mesh import make_mesh

    def build(mesh=None):
        c = pe.Circuit(mesh=mesh)
        nl = c.nl
        v = netops.add_model(nl, VDC, {"V": 3.0})
        top = netops.create_node(nl)
        netops.add_to_node(nl, v, 0, top)
        netops.add_to_node(nl, v, 1, nl.ground_node)
        prev = top
        outs = []
        for k in range(12):
            nxt = netops.create_node(nl)
            r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
            netops.add_to_node(nl, r, 0, prev)
            netops.add_to_node(nl, r, 1, nxt)
            cl = netops.add_model(nl, CAPACITOR, {"C": 1e-9})
            netops.add_to_node(nl, cl, 0, nxt)
            netops.add_to_node(nl, cl, 1, nl.ground_node)
            if k % 3 == 0:
                d = netops.add_model(nl, PN_JUNCTION, {})
                netops.add_to_node(nl, d, 0, nxt)
                netops.add_to_node(nl, d, 1, nl.ground_node)
            outs.append(nxt)
            prev = nxt
        c.tr.t_stop = 2e-6
        c.tr.t_step = 1e-7
        c.set_analyze_type(AnalyzeType.TR)
        return c, outs

    c_local, outs_l = build()
    assert c_local.analyze()
    c_dist, outs_d = build(mesh=make_mesh())
    assert c_dist.analyze()
    assert c_dist.tr_history.shape == c_local.tr_history.shape
    for nl_, nd_ in zip(outs_l, outs_d):
        wl = c_local.tr_waveform(nl_)
        wd = c_dist.tr_waveform(nd_)
        assert np.allclose(wl, wd, rtol=1e-9, atol=1e-12)
    # transient clock advanced identically
    assert np.isclose(c_dist.tr_duration, c_local.tr_duration)


def test_dist_solve_validated_reject_ill_conditioned():
    """cond(A) ~ 1e9 defeats the f32 factor: iterative refinement's
    contraction factor is cond*eps_f32 ~ 64 > 1, so the f32 pass
    returns garbage with no NaN to flag it.  Before the
    validated-reject path dist_solve returned that garbage silently;
    now the work-dtype residual rejects it and the f64 fallback
    (contraction 1e9*eps_f64 ~ 2e-7) recovers the solution.

    (A Wilkinson growth matrix does NOT defeat this solver: the
    one-hot pivot takes the max-|value| row per column, which is
    stronger than partial pivoting and kills the classic 2^(n-1)
    growth construction — verified while building this test.)"""
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("d",))
    n = 2 * NB
    rng = np.random.default_rng(3)
    q1, _ = np.linalg.qr(rng.standard_normal((n, n)))
    q2, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = (q1 * np.logspace(0, -9, n)) @ q2
    b = rng.standard_normal(n) / np.sqrt(n)
    x = dist_solve(mesh, A[None], b[None], refine=2)
    # fallback error floor is cond * eps_f64 * iterations ~ 1e-5
    assert _relerr(x, A[None], b[None]) < 1e-4
    # sanity: the unvalidated f32 path really does mis-solve this
    x_raw = dist_solve(mesh, A[None], b[None], refine=2,
                       validate=False)
    assert _relerr(x_raw, A[None], b[None]) > 1e-2


def test_dist_solve_mna_voltage_source_zero_diag():
    """MNA border blocks: structural-zero diagonals on voltage-source
    branch rows (SURVEY §7 hard-part).  The one-hot pivot search scans
    every available row, so the equilibrated-MNA regime factors without
    cross-panel exchange; validation confirms rather than rejects."""
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("d",))
    n = 2 * NB
    kv = 16           # branch-current unknowns (zero diagonal)
    nn = n - kv
    rng = np.random.default_rng(7)
    A = np.zeros((n, n))
    # node conductance block: diagonally dominant Laplacian-like
    G = rng.uniform(0.5, 2.0, (nn, nn)) * (rng.random((nn, nn)) < 0.05)
    G = G + G.T
    A[:nn, :nn] = np.diag(G.sum(1) + rng.uniform(1e-3, 1.0, nn)) - G
    # incidence columns/rows, zero diagonal border
    for k in range(kv):
        a, bnode = 2 * k, 2 * k + 1
        A[nn + k, a], A[nn + k, bnode] = 1.0, -1.0
        A[a, nn + k], A[bnode, nn + k] = 1.0, -1.0
    b = rng.standard_normal(n)
    x = dist_solve(mesh, A[None], b[None], refine=2)
    assert _relerr(x, A[None], b[None]) < 1e-8


def test_dist_solve_structurally_zero_leading_panel():
    """VERDICT r4 item 7 — the adversarial panel case: ALL 128
    voltage-source branch-current columns land in panel 0 under the
    block-cyclic permutation, and the VS equation rows are rows 0..127,
    so the leading (128, 128) block of the permuted matrix is
    STRUCTURALLY ZERO (A = [[0, I], [I, G]] up to scaling).

    This is the configuration SURVEY §7 flagged as the core numerical
    risk.  It does NOT defeat the factorization: panel_factor's pivot
    search scans every available ROW per column (fixed column order +
    free row choice = partial pivoting), so each zero-diagonal current
    column pivots on its node incidence row — no cross-panel column
    exchange or host pre-ordering is needed for exact-arithmetic
    success on any nonsingular system.  (A zero pivot COLUMN at
    elimination time would mean the leading columns are linearly
    dependent, i.e. the whole matrix is singular.)  The saddle
    structure [[0, I], [I, G]] is also well-conditioned regardless of
    cond(G) — its inverse is [[-G, I], [I, 0]] — so even an
    ill-conditioned node block cannot smuggle a numerical failure in
    through this shape; the ill-conditioned-defeat regime is covered
    by test_dist_solve_validated_reject_ill_conditioned above.  The
    assertion here is full solve SUCCESS at f64 accuracy, not mere
    rejection, incl. row scaling that pushes the equilibrator."""
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("d",))
    n = 2 * NB
    kv = NB           # one full panel of branch-current unknowns
    nn = n - kv
    rng = np.random.default_rng(11)
    q1, _ = np.linalg.qr(rng.standard_normal((nn, nn)))
    G = (q1 * np.logspace(0, -8, nn)) @ q1.T
    A = np.zeros((n, n))
    A[:kv, kv:] = np.eye(kv)          # VS rows: v_k = V_k
    A[kv:, :kv] = np.eye(kv)          # KCL rows: branch currents
    A[kv:, kv:] = G
    # wildly mixed row/col scaling (mA currents vs kV sources)
    dr = np.logspace(-6, 6, n)
    rng.shuffle(dr)
    A = A * dr[:, None]
    b = rng.standard_normal(n) * dr
    assert np.all(A[:kv, :kv] == 0.0), "leading panel block must be 0"
    x = dist_solve(mesh, A[None], b[None], refine=2)
    assert _relerr(x, A[None], b[None]) < 1e-10
