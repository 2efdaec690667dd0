"""Headline benchmark: transient Newton circuit-steps/sec, mid-size.

Workload (BASELINE.md metric 'transient Newton-steps/sec on nonlinear
netlists', reference benchmark family
benchmark/0001.models/100000_random_links_*.cpp): a Monte-Carlo batch of
255-node nonlinear random-link meshes (R chain + 255 random R links +
diode & C to ground at every node; 256 MNA unknowns) advanced through
fixed-step transient — every step is a full delta-form Newton solve:
O(nnz) f64 sparse residual + batched blocked Gauss-Jordan f32
factor-solve in VMEM on the MXU (phy_engine_tpu/ops/gj.py).

``vs_baseline``: measured speedup against a per-circuit numpy/LAPACK
dense Newton loop on this host's CPU — the same dense-factorization
algorithm class, one lane at a time (the role Eigen's solver plays in
the reference; it publishes no numbers, BASELINE.md).  A scipy
SparseLU denominator (the reference's actual CPU solver) is also
measured and reported as ``vs_scipy_sparse_lu``.

Prints exactly one JSON line.

NOTE: timing fetches results (float(...)) rather than relying on
block_until_ready — the axon TPU tunnel resolves futures lazily.
"""

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("PE_BENCH_BATCH", "256"))
STEPS = int(os.environ.get("PE_BENCH_STEPS", "100"))
CPU_STEPS = int(os.environ.get("PE_BENCH_CPU_STEPS", "20"))

# Hard overall deadline (seconds from process start).  The driver runs
# this script under its own timeout; round 4's bench chained worst-case
# subprocess timeouts past that cap and returned rc=124 with no record.
# Every stage below budgets against remaining(); the analog headline
# runs FIRST and the digital keys are appended only if time remains.
_T0 = time.monotonic()
DEADLINE_S = float(os.environ.get("PE_BENCH_DEADLINE_S", "1500"))

# Persist XLA compile caches across the fresh-interpreter retries.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache"))


def remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)

N_STAGES = 255
R_CHAIN, R_LINK, C_NODE = 100.0, 1000.0, 1e-9
VP, FREQ = 2.0, 1e6
DT = 5e-8
IS = 1e-14
UT = 1.380650524e-23 * (27.0 + 273.15) / 1.6021765314e-19


def tpu_run():
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from phy_engine_tpu.engine import analog
    from phy_engine_tpu.parallel.batch import (batch_params, batch_state,
                                               batch_x)

    ir = g._build_diode_ladder(N_STAGES, R_CHAIN, C_NODE)
    env = g._env()
    x_b = batch_x(ir, BATCH)
    st_b = batch_state(ir, BATCH)
    t0 = jnp.asarray(0.0, jnp.float64)
    dt = jnp.asarray(DT, jnp.float64)

    solver = os.environ.get("PE_BENCH_SOLVER", "frozen")

    def run(params_b, x_b, st_b):
        x2, st2, ok, _ = analog.transient_batched(
            ir, params_b, x_b, st_b, env, t0, dt, STEPS, solver=solver)
        return jnp.sum(x2), jnp.all(ok), jnp.max(jnp.abs(x2))

    fn = jax.jit(run)
    params_b = batch_params(ir, BATCH, jitter={"R": {"r": 0.05}})
    _ = float(fn(params_b, x_b, st_b)[0])        # compile + warm
    ts = []
    for i in range(3):
        p2 = batch_params(ir, BATCH, jitter={"R": {"r": 0.05}},
                          key=jax.random.PRNGKey(i + 1))
        t_start = time.perf_counter()
        s, ok, mx = fn(p2, x_b, st_b)
        s = float(s)                              # forces completion
        ts.append(time.perf_counter() - t_start)
        assert bool(ok), "bench transient failed to converge"
        assert np.isfinite(s)
    return BATCH * STEPS / min(ts)


def _cpu_setup():
    import __graft_entry__ as g
    links = g._ladder_links(N_STAGES, N_STAGES)
    return links


def cpu_baseline_dense():
    """Per-circuit Newton transient, numpy/LAPACK dense solve."""
    links = _cpu_setup()
    n = N_STAGES + 1
    gs, gl = 1.0 / R_CHAIN, 1.0 / R_LINK
    x = np.zeros(n)
    prev_g = np.zeros(N_STAGES)
    hist_i = np.zeros(N_STAGES)
    ud_last = np.zeros(N_STAGES)
    idx = np.arange(N_STAGES)
    t = 0.0
    t_start = time.perf_counter()
    for _step in range(CPU_STEPS):
        t += DT
        v_prev = x[:N_STAGES].copy()
        g_new = 2.0 * C_NODE / DT
        hist_i = -(g_new + prev_g) * v_prev - hist_i
        prev_g = np.full(N_STAGES, g_new)
        e = VP * np.sin(2 * np.pi * FREQ * t)
        for _it in range(64):
            A = np.zeros((n, n))
            z = np.zeros(n)
            for i in range(N_STAGES - 1):
                A[i, i] += gs
                A[i + 1, i + 1] += gs
                A[i, i + 1] -= gs
                A[i + 1, i] -= gs
            for a, b in links:
                A[a, a] += gl
                A[b, b] += gl
                A[a, b] -= gl
                A[b, a] -= gl
            ud = x[:N_STAGES].copy()
            lim = np.abs(ud - ud_last) > 2 * UT
            ud = np.where(lim & (ud > 0.8),
                          ud_last + 2 * UT * np.sign(ud - ud_last), ud)
            ud_last = ud
            ee = np.exp(np.minimum(ud / UT, 50.0))
            gd = IS * ee / UT
            ieq = IS * (ee - 1.0) - ud * gd
            A[idx, idx] += gd + prev_g
            z[idx] -= ieq + hist_i
            A[0, n - 1] = 1.0
            A[n - 1, 0] = 1.0
            z[n - 1] = e
            x_new = np.linalg.solve(A, z)
            done = np.all(np.abs(x_new - x) <= 1e-6 + 1e-3 * np.maximum(
                np.abs(x_new), np.abs(x)))
            x = x_new
            if done:
                break
    return CPU_STEPS / (time.perf_counter() - t_start)


def cpu_baseline_sparse():
    """Same transient, scipy SparseLU (the reference's solver role)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    links = _cpu_setup()
    n = N_STAGES + 1
    gs, gl = 1.0 / R_CHAIN, 1.0 / R_LINK
    rows, cols, base_vals = [], [], []
    for i in range(N_STAGES - 1):
        rows += [i, i + 1, i, i + 1]
        cols += [i, i + 1, i + 1, i]
        base_vals += [gs, gs, -gs, -gs]
    for a, b in links:
        rows += [a, b, a, b]
        cols += [a, b, b, a]
        base_vals += [gl, gl, -gl, -gl]
    rows += [0, n - 1]
    cols += [n - 1, 0]
    base_vals += [1.0, 1.0]
    rows = np.array(rows)
    cols = np.array(cols)
    base_vals = np.array(base_vals)
    idx = np.arange(N_STAGES)

    x = np.zeros(n)
    prev_g = np.zeros(N_STAGES)
    hist_i = np.zeros(N_STAGES)
    ud_last = np.zeros(N_STAGES)
    t = 0.0
    t_start = time.perf_counter()
    for _step in range(CPU_STEPS):
        t += DT
        v_prev = x[:N_STAGES].copy()
        g_new = 2.0 * C_NODE / DT
        hist_i = -(g_new + prev_g) * v_prev - hist_i
        prev_g = np.full(N_STAGES, g_new)
        e = VP * np.sin(2 * np.pi * FREQ * t)
        for _it in range(64):
            ud = x[:N_STAGES].copy()
            lim = np.abs(ud - ud_last) > 2 * UT
            ud = np.where(lim & (ud > 0.8),
                          ud_last + 2 * UT * np.sign(ud - ud_last), ud)
            ud_last = ud
            ee = np.exp(np.minimum(ud / UT, 50.0))
            gd = IS * ee / UT
            ieq = IS * (ee - 1.0) - ud * gd
            vals = np.concatenate([base_vals, gd + prev_g])
            A = sp.csc_matrix(
                (vals, (np.concatenate([rows, idx]),
                        np.concatenate([cols, idx]))), shape=(n, n))
            z = np.zeros(n)
            z[:N_STAGES] -= ieq + hist_i
            z[n - 1] = e
            x_new = spl.splu(A).solve(z)
            done = np.all(np.abs(x_new - x) <= 1e-6 + 1e-3 * np.maximum(
                np.abs(x_new), np.abs(x)))
            x = x_new
            if done:
                break
    return CPU_STEPS / (time.perf_counter() - t_start)


def digital_metric():
    """Digital gate-evals/s records (BASELINE.md north-star metric b),
    folded into the same JSON line so the driver captures both: the
    host native single-trace rate AND the on-chip batched flash
    aggregate (the TPU-native record, in its own interpreter so a
    tunnel hiccup cannot sink the rest).  Each stage checks the global
    deadline and is skipped (with an explanatory key) when the analog
    headline has eaten the budget."""
    if remaining() < 240:
        return {"digital_skipped": "deadline"}
    try:
        import bench_digital as bd
        c, clk, rst, port_nets, report, expect = bd.build()
        n = report.gate_count + report.ff_count
        cpu = bd.cpu_baseline(n)
        rate = bd.tpu_run(c, clk, rst, port_nets, n, expect)
        rec = {
            "digital_gate_evals_per_sec": round(rate, 1),
            "digital_vs_baseline": round(rate / cpu, 2),
            "digital_workload": "rv32 core, bit-exact program result",
        }
    except Exception as e:  # noqa: BLE001 — never sink the analog record
        return {"digital_error": f"{type(e).__name__}: {e}"}
    budget = remaining() - 60
    if budget < 180:
        rec["digital_batched_skipped"] = "deadline"
        return rec
    try:
        # batched-instance aggregate on the CHIP (flash engine): the
        # TPU-native digital record (VERDICT r3 item 1) — B instances
        # of the core through the fast-gather batched engine
        import subprocess
        import sys
        env2 = dict(os.environ)
        env2["PE_BENCH_DIGITAL_MODE"] = "turbo_batch"
        env2.setdefault("PE_BENCH_DIGITAL_BATCH", "512")
        r = subprocess.run(
            [sys.executable, "bench_digital.py"], capture_output=True,
            text=True, timeout=budget, env=env2,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        row = json.loads(r.stdout.strip().splitlines()[-1])
        rec["digital_batched_gate_evals_per_sec"] = row["value"]
        rec["digital_batched_batch"] = row["batch"]
        rec["digital_batched_vs_native_single_trace"] = \
            row["vs_baseline"]
    except Exception as e:  # noqa: BLE001
        rec["digital_batched_error"] = f"{type(e).__name__}: {e}"
    return rec


def _tpu_run_subprocess(timeout_s: float) -> float:
    """tpu_run in a fresh interpreter (retry path)."""
    import subprocess
    import sys
    code = ("import bench, json; "
            "print(json.dumps({'v': bench.tpu_run()}))")
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout_s, cwd=os.path.dirname(os.path.abspath(__file__)))
    if r.returncode != 0:
        raise RuntimeError(f"tpu_run subprocess rc={r.returncode}: "
                           f"{r.stderr[-500:]}")
    return float(json.loads(r.stdout.strip().splitlines()[-1])["v"])


def main():
    # ANALOG HEADLINE FIRST — it is the record the driver must capture.
    # The axon tunnel occasionally drops with a transient
    # "TPU backend setup/compile error (Unavailable)" (observed r3);
    # every attempt runs in a FRESH interpreter (jax caches a failed
    # backend init for the life of the process) under a hard timeout
    # (a downed tunnel can HANG backend init indefinitely, observed
    # r3) so one hiccup cannot zero out or stall the round's record.
    # Reserve ~180 s after the analog stage for the CPU denominators.
    last = None
    cps_tpu = None
    while cps_tpu is None:
        budget = remaining() - 180
        if budget < 120:
            break
        try:
            cps_tpu = _tpu_run_subprocess(budget)
        except Exception as e:  # noqa: BLE001
            last = e
            time.sleep(min(20, max(0, remaining() - 300)))
    if cps_tpu is None:
        raise (last or RuntimeError("deadline before first TPU attempt"))

    # CPU denominators: best-of-3 when time allows (the scalar baseline
    # is sensitive to host contention), single run under pressure.
    reps = 3 if remaining() > 420 else 1
    cps_dense = max(cpu_baseline_dense() for _ in range(reps))
    cps_sparse = max(cpu_baseline_sparse() for _ in range(reps))
    rec = {
        "metric": "transient_newton_circuit_steps_per_sec",
        "value": round(cps_tpu, 1),
        "unit": "circuit-steps/s",
        "vs_baseline": round(cps_tpu / cps_dense, 2),
        "vs_scipy_sparse_lu": round(cps_tpu / cps_sparse, 2),
        "workload": "255-node nonlinear random-link mesh, 256 unknowns",
    }
    rec.update(digital_metric())
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
