"""MXU utilization record for the analog solver (VERDICT r4 item 6).

Measures, on the real chip, the numbers BASELINE.md's roofline story
needs:

1.  **GEMM denominators** — achieved FLOP/s of a large square matmul at
    bf16, f32 (default precision: one bf16 pass) and f32 HIGHEST (the
    6-pass bf16 emulation every solver GEMM in this repo uses — see
    ops/gj.py / engine/analog.py).  These are the *achievable* rates the
    solver kernels should be compared against, next to the v5e
    datasheet's 197 Tbf16FLOP/s nominal peak.
2.  **`gj_inverse32` utilization** — wall time at the bench shape
    (B=256, n=256: the diode-ladder MNA padded to the 128 panel) and
    at B=64/n=512, with useful-FLOPs = B * 2n^3 (the cost of an explicit
    inverse via LU; the kernel's actual op count is higher, so the
    %-of-peak reported is an upper bound on waste, not an excuse).
3.  **Newton-Schulz refresh pair** — the frozen solver's refresh
    (X(2I - AX): two n x n GEMMs per lane, 4n^3 B useful FLOPs) at the
    bench shape.
4.  **Frozen-iteration roofline** — per accepted iteration the frozen
    path is one GEMV against the carried inverse: 2n^2 FLOPs over
    >= 4n^2 bytes of Minv traffic = arithmetic intensity 0.5 FLOP/byte
    (f32).  At v5e's ~819 GB/s HBM that caps a *single* lane at ~410
    GFLOP/s equivalent — the batch dimension is what feeds the MXU, and
    the measured steps/s is the number that matters.  This section
    prints measured GEMV-sweep time at the bench shape and the implied
    HBM bandwidth so the memory-bound claim is a number, not an
    adjective.

Run on the real TPU (no JAX_PLATFORMS=cpu).  Prints one JSON line.
Reference anchor: the reference's version of "feed the matrix engine"
is batched QR, cuda_sparse_lu.h:599-631.
"""

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

# smoke-test override (the axon TPU plugin ignores the env var alone
# once jax is imported, CLAUDE.md — honor it here at module top)
_plat = os.environ.get("PE_BENCH_MXU_PLATFORM")
if _plat:
    os.environ["JAX_PLATFORMS"] = _plat

import jax

if _plat:
    jax.config.update("jax_platforms", _plat)
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12     # datasheet nominal, single chip
V5E_HBM_GBS = 819.0        # datasheet nominal HBM bandwidth

REPS = int(os.environ.get("PE_BENCH_MXU_REPS", "5"))


def _fetch(out):
    """Force a real device->host sync.  Under the axon tunnel
    ``block_until_ready`` returns as soon as the handle exists, NOT
    when the computation finishes (measured: a 4096 GEMM 'completes'
    in 50 us = 14x nominal peak) — only an actual data fetch waits."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _chain_time(step, x0, iters=None):
    """Per-application wall seconds of ``step`` chained on-device.

    Per-dispatch tunnel overhead is ~5-6 ms (measured: a B=256/n=256
    batched GEMV 'costs' 5.8 ms timed per-call — that is the round
    trip, not the kernel).  So: run the op as a data-dependent
    lax.scan chain (ONE dispatch), at two chain lengths k and 5k, and
    difference — the constant dispatch+fetch overhead cancels
    exactly, leaving pure steady-state device time.  ``iters``
    overrides the base chain length: sub-ms kernels need hundreds of
    chained applications for the delta to clear the ~ms timing jitter
    of the tunnel round trip (scan is rolled, so compile cost does
    not grow with the length)."""
    k1 = iters if iters is not None else REPS
    k2 = 5 * k1

    def chained(k):
        f = jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (step(c), None), x, None, length=k)[0])
        _fetch(f(x0))                      # warmup/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _fetch(f(x0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = chained(k1), chained(k2)
    return max(t2 - t1, 1e-9) / (k2 - k1)


def gemm_rates():
    m = int(os.environ.get("PE_BENCH_MXU_GEMM_N", "4096"))
    key = jax.random.PRNGKey(0)
    a32 = jax.random.normal(key, (m, m), jnp.float32)
    b32 = jax.random.normal(jax.random.PRNGKey(1), (m, m), jnp.float32)
    flops = 2.0 * m * m * m
    scale = jnp.float32(1.0 / np.sqrt(m))   # keep the chain bounded
    rates = {}

    rates["bf16"] = flops / _chain_time(
        lambda a: jnp.dot(a.astype(jnp.bfloat16), b32.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) * scale, a32)
    rates["f32_default"] = flops / _chain_time(
        lambda a: jnp.dot(a, b32) * scale, a32)
    rates["f32_highest"] = flops / _chain_time(
        lambda a: jnp.dot(a, b32,
                          precision=jax.lax.Precision.HIGHEST) * scale, a32)
    return m, rates


def _shapes(default):
    s = os.environ.get("PE_BENCH_MXU_SHAPES")
    if not s:
        return default
    return [tuple(int(x) for x in p.split("x")) for p in s.split(",")]


def gj_inverse_util(f32_highest_rate):
    from phy_engine_tpu.ops.gj import gj_inverse32
    rows = []
    for (B, n) in _shapes([(256, 256), (64, 512), (16, 1024)]):
        key = jax.random.PRNGKey(2)
        A = jax.random.normal(key, (B, n, n), jnp.float32)
        A = A + n * jnp.eye(n, dtype=jnp.float32)[None]   # well-conditioned
        # inv is an involution: the chain alternates A, A^-1, A, ...
        # every element of which is equally well-conditioned
        try:
            t = _chain_time(gj_inverse32, A)
        except Exception as e:   # record, don't die: Mosaic rejects the
            # one-hot kernel's (1, n) cross-lane reduce at n=1024/bt=1
            rows.append({"B": B, "n": n,
                         "error": type(e).__name__ + ": " + str(e)[:120]})
            continue
        useful = B * 2.0 * n ** 3
        rate = useful / t
        rows.append({
            "B": B, "n": n, "ms": round(t * 1e3, 1),
            "gflops": round(rate / 1e9, 1),
            "pct_f32_highest_gemm": round(100 * rate / f32_highest_rate, 2),
            "pct_bf16_nominal": round(100 * rate / V5E_BF16_PEAK, 3),
        })
    return rows


def lu_block_util(f32_highest_rate):
    """The blocked right-looking prototype (ops/lu_block.py) at the
    same shapes — the VERDICT r4 item-6 comparison: does confining
    pivoting to the diagonal block (serial work on (B,nb,2nb) tiles,
    panel updates as GEMMs) beat the global-pivot one-hot GJ?"""
    from phy_engine_tpu.ops.lu_block import (
        lu_block_inverse32, lu_block_inverse32_pallas)
    on_tpu = jax.devices()[0].platform == "tpu"
    fn = lu_block_inverse32_pallas if on_tpu else lu_block_inverse32
    rows = []
    for (B, n) in _shapes([(256, 256), (64, 512), (16, 1024)]):
        key = jax.random.PRNGKey(2)
        A = jax.random.normal(key, (B, n, n), jnp.float32)
        A = A + n * jnp.eye(n, dtype=jnp.float32)[None]
        try:
            t = _chain_time(fn, A)
        except Exception as e:
            rows.append({"B": B, "n": n,
                         "error": type(e).__name__ + ": " + str(e)[:120]})
            continue
        useful = B * 2.0 * n ** 3
        rate = useful / t
        rows.append({
            "B": B, "n": n, "ms": round(t * 1e3, 1),
            "gflops": round(rate / 1e9, 1),
            "pct_f32_highest_gemm": round(100 * rate / f32_highest_rate, 2),
            "pct_bf16_nominal": round(100 * rate / V5E_BF16_PEAK, 3),
        })
    return rows


def ns_refresh_util(f32_highest_rate):
    (B, n), = _shapes([(256, 256)])[:1]
    hp = jax.lax.Precision.HIGHEST
    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (B, n, n), jnp.float32) \
        + n * jnp.eye(n, dtype=jnp.float32)[None]
    X = jnp.linalg.inv(A + 0.1)   # plausible stale inverse

    def ns_pair(X):
        # the frozen solver's refresh GEMM pair (engine/analog.py
        # _ns_refresh body): X <- X(2I - A X), batched over lanes.
        # Chaining IS the NS iteration — X converges to A^-1, bounded.
        AX = jnp.einsum("bij,bjk->bik", A, X, precision=hp,
                        preferred_element_type=jnp.float32)
        T = 2.0 * jnp.eye(n, dtype=jnp.float32)[None] - AX
        return jnp.einsum("bij,bjk->bik", X, T, precision=hp,
                          preferred_element_type=jnp.float32)

    t = _chain_time(ns_pair, X, iters=4 * REPS)
    useful = B * 4.0 * n ** 3
    rate = useful / t
    return {"B": B, "n": n, "ms": round(t * 1e3, 2),
            "gflops": round(rate / 1e9, 1),
            "pct_f32_highest_gemm": round(100 * rate / f32_highest_rate, 2),
            "pct_bf16_nominal": round(100 * rate / V5E_BF16_PEAK, 3)}


def frozen_gemv_roofline():
    """One frozen-Newton iteration's dominant op: batched GEMV against
    the carried inverse.  Reports measured time, achieved FLOP/s and the
    implied HBM read bandwidth (Minv is the traffic; x/y are noise)."""
    (B, n), = _shapes([(256, 256)])[:1]
    hp = jax.lax.Precision.HIGHEST
    Minv = jax.random.normal(jax.random.PRNGKey(4), (B, n, n), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, n), jnp.float32)
    scale = jnp.float32(1.0 / np.sqrt(n))   # keep the chain bounded

    def gemv(v):
        return jnp.einsum("bij,bj->bi", Minv, v, precision=hp,
                          preferred_element_type=jnp.float32) * scale

    t = _chain_time(gemv, x, iters=40 * REPS)
    flops = B * 2.0 * n * n
    bytes_read = B * 4.0 * n * n
    return {"B": B, "n": n, "us": round(t * 1e6, 1),
            "gflops": round(flops / t / 1e9, 1),
            "implied_hbm_gbs": round(bytes_read / t / 1e9, 1),
            "pct_hbm_nominal": round(100 * (bytes_read / t / 1e9)
                                     / V5E_HBM_GBS, 1),
            "arithmetic_intensity_flop_per_byte": 0.5}


def main():
    plat = jax.devices()[0].platform
    m, rates = gemm_rates()
    out = {
        "metric": "mxu_utilization_record",
        "platform": plat,
        "gemm_n": m,
        "gemm_tflops": {k: round(v / 1e12, 2) for k, v in rates.items()},
        "v5e_bf16_nominal_tflops": V5E_BF16_PEAK / 1e12,
        "gj_inverse32": gj_inverse_util(rates["f32_highest"]),
        "lu_block_inverse32": lu_block_util(rates["f32_highest"]),
        "ns_refresh_pair": ns_refresh_util(rates["f32_highest"]),
        "frozen_gemv": frozen_gemv_roofline(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
