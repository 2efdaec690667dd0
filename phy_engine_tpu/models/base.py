"""Device model protocol.

The reference uses concept-based static duck typing + a 17-virtual-method
type-erasure vtable per instance (``model_refs/concept.h:33-217``,
``model_refs/base.h:21-62``).  The TPU-native replacement: a device
*family* is a :class:`ModelDef` carrying

* metadata (pins, branches, parameter schema), and
* a handful of **per-instance scalar kernels** written in jnp that the
  lowering pass vmaps over all instances of the family and fuses into the
  MNA assembly:

  - ``pattern(pins, brs)``   -> static COO (rows, cols) for the matrix
    stamp of one instance (host/numpy, computed once at lowering);
  - ``rhs_pattern(pins, brs)`` -> static rows for the RHS stamp;
  - ``stamp(P, v, ib, state, ctx)`` -> (A_vals, z_vals, new_state): the
    traced per-Newton-iteration evaluation (replaces ``iterate_op/dc/tr``);
  - ``ac_stamp(P, state, omega)`` -> complex (A_vals, z_vals) (replaces
    ``iterate_ac``; nonlinear devices read their saved operating point
    from ``state``, mirroring ``save_op``);
  - ``step_update(P, v, ib, state, dt, t)`` -> new_state: transient
    companion-model recurrence between accepted steps (replaces
    ``step_changed_tr``).

Fallback chains (``iterate_op -> iterate_dc`` etc., base.h:64-531) become
mode dispatch *inside* ``stamp`` on the static ``ctx.mode`` string, so XLA
sees a single specialized straight-line kernel per (family, mode).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Sequence, Tuple


class DeviceClass(enum.Enum):
    """Mirrors ``model_device_type`` (model_refs/base.h)."""
    LINEAR = "linear"
    NONLINEAR = "non_linear"
    DIGITAL = "digital"


class UpdatePhase(enum.Enum):
    """Digital scheduling class, mirrors ``digital_update_method_t``
    (node.h): update_table / before_all_clk / after_all_clk."""
    TABLE = 0
    BEFORE = 1
    AFTER = 2


@dataclass
class StampCtx:
    """Static + traced context threaded to device kernels.

    ``mode`` is a *static* Python string ('op'|'dc'|'tr'|'trop'); ``t`` and
    ``dt`` are traced scalars (0.0 outside TR).  ``env`` carries traced
    environment scalars (temperature etc.) when needed.
    """
    mode: str
    t: Any = 0.0
    dt: Any = 0.0
    env: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class ModelDef:
    name: str                       # e.g. "Resistance"
    id_name: str                    # e.g. "R"
    device_class: DeviceClass
    pins: Tuple[str, ...] = ()
    defaults: Dict[str, Any] = field(default_factory=dict)
    nbranches: int = 0

    # ---- analog lowering hooks (None for purely digital devices) ----
    # Order in which float params are packed into the P row.
    param_order: Tuple[str, ...] = ()
    # (state_name, init) pairs; init is a float or fn(params)->float.
    state_vars: Tuple[Tuple[str, Any], ...] = ()
    # pattern(pin_idx: list[int], br_idx: list[int]) -> (rows, cols)
    pattern: Optional[Callable] = None
    # rhs_pattern(pin_idx, br_idx) -> rows
    rhs_pattern: Optional[Callable] = None
    # stamp(P, v, ib, state, ctx) -> (A_vals, z_vals, new_state)
    stamp: Optional[Callable] = None
    # ac_stamp(P, state, omega) -> (A_vals_c, z_vals_c)
    ac_stamp: Optional[Callable] = None
    # step_update(P, v, ib, state, dt, t) -> new_state
    step_update: Optional[Callable] = None
    # check_conv(P, v, state) -> bool: per-device Newton convergence veto
    # (the reference's per-model check_convergence(), base.h:
    # can_check_convergence).  Used e.g. to keep iterating while SPICE
    # junction limiting is still active.
    check_conv: Optional[Callable] = None
    nonlinear: bool = False
    # internal unknowns per instance (the reference's
    # can_generate_internal_node_view role, model_refs/concept.h):
    # the lowering allocates n_internal fresh nodes per instance and
    # appends their indices to the pin vector, so ``stamp`` sees
    # v = [external pins..., internal nodes...] and ``pattern``
    # receives the extended pin index list.
    n_internal: int = 0

    # ---- noise hooks (TPU-native extension: the reference has NO
    #      noise analysis — its own bsim3v32.h:28-29 TODO lists the
    #      "simulator's noise analysis infrastructure" as missing) ----
    # noise(P, v, ib, state, env, f) -> (len(noise_pairs),) one-sided
    # current-noise PSD [A^2/Hz] per source, evaluated at the OP bias
    # (v = pin voltages incl. internal nodes, ib = branch currents).
    noise: Optional[Callable] = None
    # per-source (pin_i, pin_j) index pairs into the instance pin
    # vector: the noise current source is connected between them.
    noise_pairs: Tuple[Tuple[int, int], ...] = ()
    # ---- correlated source groups (e.g. induced gate noise) --------
    # noise_corr(P, v, ib, state, env, f, omega) ->
    #   (len(noise_corr_pairs), 4): per group (S_aa, S_bb, Re S_ab,
    # Im S_ab) one-sided cross-PSDs [A^2/Hz] between current sources on
    # pair_a and pair_b.  Contribution: S_aa|Ga|^2 + S_bb|Gb|^2 +
    # 2 Re(Ga * conj(Gb) * S_ab) with Ga/Gb the adjoint transfers.
    noise_corr: Optional[Callable] = None
    # ((pair_a, pair_b), ...) with each pair = (pin_i, pin_j).
    noise_corr_pairs: Tuple[Tuple[Tuple[int, int],
                                  Tuple[int, int]], ...] = ()

    # ---- digital metadata ----
    digital_op: Optional[str] = None       # opcode key into digital engine
    update_phase: UpdatePhase = UpdatePhase.TABLE
    # pin indices (into .pins) that are digital inputs / outputs; pin
    # ordering itself matches the reference headers exactly.
    din_pins: Tuple[int, ...] = ()
    dout_pins: Tuple[int, ...] = ()

    # attribute schema: list of externally visible attribute names in
    # reference order (for the index-based set/get_attribute API).
    attrs: Tuple[str, ...] = ()
    # alternate attribute spellings -> canonical param name (the
    # reference exposes e.g. both "W" and "w", "diode_Is" and "is";
    # set/get_attribute resolve through this map).
    attr_aliases: Dict[str, str] = field(default_factory=dict)
    # devices with variable pin counts (e.g. Verilog modules)
    dynamic_params: bool = False
    pin_names_fn: Optional[Callable] = None
    nbranches_fn: Optional[Callable] = None

    # ------------------------------------------------------------------
    def num_pins(self, params) -> int:
        if self.pin_names_fn is not None:
            return len(self.pin_names_fn(params))
        return len(self.pins)

    def pin_names_for(self, params) -> Sequence[str]:
        if self.pin_names_fn is not None:
            return self.pin_names_fn(params)
        return self.pins

    def num_branches(self, params) -> int:
        if self.nbranches_fn is not None:
            return self.nbranches_fn(params)
        return self.nbranches

    def attr_names(self, params) -> list:
        return list(self.attrs) if self.attrs else list(self.defaults)

    def init_state_row(self, params) -> Dict[str, float]:
        out = {}
        for sname, init in self.state_vars:
            out[sname] = float(init(params)) if callable(init) else float(init)
        return out

    def pack_params(self, params) -> list:
        return [float(params[k]) for k in self.param_order]

    @property
    def is_analog(self) -> bool:
        return self.stamp is not None

    def __repr__(self):  # pragma: no cover
        return f"ModelDef({self.id_name})"


# Global registry: id_name -> ModelDef  (reference: builtin_registry.h)
MODEL_REGISTRY: Dict[str, ModelDef] = {}


def register(mdef: ModelDef) -> ModelDef:
    MODEL_REGISTRY[mdef.id_name] = mdef
    return mdef
