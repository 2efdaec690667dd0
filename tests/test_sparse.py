"""Sparse (COO BiCGStab) solver path tests — the large-circuit story
(reference: cuda_sparse_lu.h iterative paths + 100k random-link bench)."""

import numpy as np
import pytest
import jax.numpy as jnp

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import RESISTANCE, VDC, PN_JUNCTION
from phy_engine_tpu.engine.circuit import AnalyzeType


def random_mesh_circuit(n_nodes=400, n_links=1600, seed=3, solver="auto",
                        threshold=2048):
    rng = np.random.default_rng(seed)
    c = pe.Circuit(solver=solver, sparse_threshold=threshold)
    nl = c.nl
    nodes = [netops.create_node(nl) for _ in range(n_nodes)]
    v = netops.add_model(nl, VDC, {"V": 5.0})
    netops.add_to_node(nl, v, 0, nodes[0])
    netops.add_to_node(nl, v, 1, nl.ground_node)
    # grounding resistor on a few nodes to keep everything connected
    for k in range(0, n_nodes, max(1, n_nodes // 8)):
        r = netops.add_model(nl, RESISTANCE,
                             {"r": float(rng.uniform(10, 1e4))})
        netops.add_to_node(nl, r, 0, nodes[k])
        netops.add_to_node(nl, r, 1, nl.ground_node)
    for _ in range(n_links):
        a, b = rng.integers(0, n_nodes, 2)
        if a == b:
            continue
        r = netops.add_model(nl, RESISTANCE,
                             {"r": float(rng.uniform(10, 1e4))})
        netops.add_to_node(nl, r, 0, nodes[int(a)])
        netops.add_to_node(nl, r, 1, nodes[int(b)])
    c.set_analyze_type(AnalyzeType.DC)
    return c, nodes


def test_sparse_matches_dense():
    """CPU(dense-LU) vs sparse-BiCGStab agreement — the reference's
    CPU-vs-GPU cross-check (0013.cuda/cuda_random_links_correctness)."""
    cd, nodes_d = random_mesh_circuit(solver="dense")
    cs, nodes_s = random_mesh_circuit(solver="sparse")
    assert cd.analyze()
    assert cs.analyze()
    vd = np.array([cd.node_voltage(n).real for n in nodes_d])
    vs = np.array([cs.node_voltage(n).real for n in nodes_s])
    assert np.max(np.abs(vd - vs)) < 1e-6 * max(1.0, np.abs(vd).max())


def test_sparse_nonlinear_newton():
    """Sparse path inside the Newton loop (diode + mesh)."""
    c, nodes = random_mesh_circuit(n_nodes=200, n_links=800, seed=5,
                                   solver="sparse")
    nl = c.nl
    d = netops.add_model(nl, PN_JUNCTION, {})
    netops.add_to_node(nl, d, 0, nodes[1])
    netops.add_to_node(nl, d, 1, nl.ground_node)
    assert c.analyze()
    vd = c.node_voltage(nodes[1]).real
    assert 0.0 < vd < 1.0     # diode clamps its node near a forward drop

    c2, nodes2 = random_mesh_circuit(n_nodes=200, n_links=800, seed=5,
                                     solver="dense")
    nl2 = c2.nl
    d2 = netops.add_model(nl2, PN_JUNCTION, {})
    netops.add_to_node(nl2, d2, 0, nodes2[1])
    netops.add_to_node(nl2, d2, 1, nl2.ground_node)
    assert c2.analyze()
    assert np.isclose(vd, c2.node_voltage(nodes2[1]).real, atol=1e-6)


def test_auto_threshold_picks_sparse():
    c, _ = random_mesh_circuit(n_nodes=100, n_links=300, solver="auto",
                               threshold=50)
    c.prepare()
    assert c._method() == "sparse"
    assert c.analyze()


def test_large_mesh_scipy_agreement():
    """Mid-size random mesh: sparse-path node voltages agree with an
    independent scipy sparse solve (the reference's CPU-vs-GPU
    agreement oracle, with scipy in the reference-CPU role)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    c, nodes = random_mesh_circuit(n_nodes=1500, n_links=6000, seed=11,
                                   solver="sparse")
    assert c.analyze()

    # independent MNA rebuild in scipy from the same netlist
    ir = c.prepare()
    n = ir.n_unknowns
    rows, cols, vals = [], [], []
    rhs = np.zeros(n)
    gmin = c.env.g_min
    for m in c.nl.live_models():
        name = m.mdef.id_name
        if name == "R":
            a, b = (p.node for p in m.pins)
            g = 1.0 / float(m.params["r"])
            ia = a.node_index if not a.is_ground else -1
            ib = b.node_index if not b.is_ground else -1
            for i, j, s in ((ia, ia, g), (ib, ib, g),
                            (ia, ib, -g), (ib, ia, -g)):
                if i >= 0 and j >= 0:
                    rows.append(i)
                    cols.append(j)
                    vals.append(s)
        elif name == "VDC":
            a, b = (p.node for p in m.pins)
            k = m.branches[0].index
            for nd, sgn in ((a, 1.0), (b, -1.0)):
                if not nd.is_ground:
                    rows += [nd.node_index, k]
                    cols += [k, nd.node_index]
                    vals += [sgn, sgn]
            rhs[k] = float(m.params["V"])
    for i in range(ir.n_nodes):
        rows.append(i)
        cols.append(i)
        vals.append(gmin)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    x_ref = spla.spsolve(A, rhs)

    live = [nd for nd in nodes if nd.node_index >= 0]
    assert len(live) > 1400          # nearly all nodes participate
    got = np.array([c.node_voltage(nd).real for nd in live])
    ref = np.array([x_ref[nd.node_index] for nd in live])
    err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-9))
    assert err < 1e-6, err


# ---------------------------------------------------------------------------
# ELL / BandedCOO patterns + mixed-precision BiCGStab (round 2)
# ---------------------------------------------------------------------------

def _random_mesh_coo(n, links, seed=1):
    import numpy as np
    rng = np.random.default_rng(seed)
    g = 1e-3
    rows = [np.array([0])]
    cols = [np.array([0])]
    vals = [np.array([g])]
    i = np.arange(n - 1)
    rows += [i, i + 1, i, i + 1]
    cols += [i, i + 1, i + 1, i]
    vals += [np.full(n - 1, g), np.full(n - 1, g),
             np.full(n - 1, -g), np.full(n - 1, -g)]
    a = rng.integers(0, n, links)
    b = (a + rng.integers(2, n - 2, links)) % n
    rows += [a, b, a, b]
    cols += [a, b, b, a]
    vals += [np.full(links, g), np.full(links, g),
             np.full(links, -g), np.full(links, -g)]
    br = n
    rows += [np.array([n - 1, br])]
    cols += [np.array([br, n - 1])]
    vals += [np.array([1.0, 1.0])]
    z = np.zeros(n + 1)
    z[br] = 1.0
    return (np.concatenate(rows).astype(np.int32),
            np.concatenate(cols).astype(np.int32),
            np.concatenate(vals), z)


def test_ell_and_banded_matvec_match_coo():
    import numpy as np
    from phy_engine_tpu.ops.sparse import ELL, BandedCOO, coo_matvec
    rows, cols, vals, z = _random_mesh_coo(500, 60)
    nu = len(z)
    x = np.random.default_rng(0).standard_normal(nu)
    y0 = np.asarray(coo_matvec(jnp.asarray(rows), jnp.asarray(cols),
                               jnp.asarray(vals), jnp.asarray(x), nu))
    for pat in (ELL(rows, cols, nu), BandedCOO(rows, cols, nu)):
        vp = pat.values(jnp.asarray(vals))
        y = np.asarray(pat.matvec(vp, jnp.asarray(x)))
        assert np.max(np.abs(y - y0)) < 1e-12 * max(np.max(np.abs(y0)), 1)


def test_bicgstab_ell_vs_scipy():
    import numpy as np
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    from phy_engine_tpu.ops.sparse import ELL, BandedCOO, bicgstab_ell
    rows, cols, vals, z = _random_mesh_coo(800, 100)
    nu = len(z)
    A = sp.csc_matrix((vals, (rows, cols)), shape=(nu, nu))
    xe = spl.splu(A).solve(z)
    for pat in (ELL(rows, cols, nu), BandedCOO(rows, cols, nu)):
        x, ok, it = bicgstab_ell(pat, jnp.asarray(vals), jnp.asarray(z),
                                 tol=1e-10, max_iter=5000)
        assert bool(ok), f"not converged ({type(pat).__name__}, it={int(it)})"
        rel = np.max(np.abs(np.asarray(x) - xe)) / np.max(np.abs(xe))
        assert rel < 1e-7, rel
