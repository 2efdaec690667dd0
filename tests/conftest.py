"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the platform env vars BEFORE jax is imported anywhere — this
conftest is imported by pytest before any test module.  Explicit
assignment (not setdefault): the surrounding environment may pin a TPU
platform.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
