"""phy_engine_tpu — a TPU-native mixed-signal circuit simulation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Phy-Engine
(reference: NetLogo-Mobile/Phy-Engine, a C++23 header-only SPICE-class
mixed-signal engine; see SURVEY.md).  Architecture (TPU-first, not a port):

* **Host-side compiler, device-side engine.**  The netlist is a host data
  structure; ``engine.lower`` compiles it once into a static *stamp IR*
  (dense per-device-family parameter arrays + precomputed COO scatter
  patterns).  All per-step work (device evaluation, MNA assembly, the
  linear solve, Newton iteration, transient scan, AC sweeps) is pure
  jitted JAX running on TPU.
* **Segmented vmap instead of virtual dispatch.**  The reference walks a
  vtable per device per Newton iteration (model_refs/base.h); here device
  instances are grouped by family and each family is evaluated by one
  vmapped kernel.
* **Synchronous bit-packed digital engine.**  The reference's event-driven
  4-state update-table worklist (circuits/circuit.h:307-337) is re-cast as
  leveled dense sweeps over opcode-segmented gate arrays with uint32
  bit-plane packing (32 independent stimulus lanes per word).
* **Masked batch Newton** under ``lax.while_loop`` mirrors the reference's
  V/I abs+rel convergence rule (circuits/circuit.h:892-985) and the
  SPICE3F5 junction voltage limiting (non-linear/PN_junction.h:58-109).

Precision policy: analog solves default to float64 (enabled at import, as
the reference is double-precision throughout); pass ``dtype=jnp.float32``
to engine entry points for TPU-speed single precision.
"""

from jax import config as _jax_config

_jax_config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .netlist.netlist import Netlist, Node, ModelInstance  # noqa: E402,F401
from .netlist import operations as netops  # noqa: E402,F401
from .engine.circuit import Circuit, AnalyzeType  # noqa: E402,F401
from .engine.environment import Environment  # noqa: E402,F401
from . import models  # noqa: E402,F401
