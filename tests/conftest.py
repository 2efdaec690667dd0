"""Test configuration: run everything on a virtual 8-device CPU mesh.

The platform override must use jax.config (the axon TPU plugin ignores
the JAX_PLATFORMS env var), and the virtual device count must be in
XLA_FLAGS before jax initializes its backends — conftest is imported by
pytest before any test module, so both happen here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries: a full-suite
    run accumulates hundreds of live XLA CPU executables and the
    compiler segfaulted (twice, same spot ~250 tests in) under that
    load; per-module clearing bounds it with negligible recompile cost
    (modules rarely share jit signatures)."""
    yield
    jax.clear_caches()
