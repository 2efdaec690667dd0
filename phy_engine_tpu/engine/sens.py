"""DC/AC small-signal sensitivity analysis (SPICE .SENS class).

The reference engine has no sensitivity analysis anywhere in
`circuits/` — like ``noise``/``tf``/``pz`` (engine/noise.py,
engine/circuit.py) this is a TPU-native extension past the parity
line, and it showcases the structural advantage of building the
engine as pure JAX: every device stamp is differentiable, so the
classic adjoint-sensitivity machinery falls out of one ``jax.grad``.

Method (DC/OP): at the converged operating point ``x*`` the Newton
companion matrix ``A(x*, p)`` is the exact Jacobian of the device
currents (that is what makes Newton-Raphson quadratic), so one more
linear step

    h(p) = A(x*, p)^{-1} Z(x*, p),         h(p*) = x*

has, by the implicit-function theorem, exactly the derivative of the
true solution:  dh/dp = A^{-1}(∂Z/∂p − (∂A/∂p)·x*) = dx*/dp.
``jax.grad`` of ``h(p)[out]`` therefore prices the sensitivity of the
output to EVERY parameter of EVERY device in one reverse sweep whose
linear-algebra cost is a single transposed solve — the adjoint-network
method, derived by AD instead of by hand.

Method (AC): the bias shift is chained through in the same sweep —
``xop(p)`` via the one-more-step trick, then a re-assembly at
``xop(p)`` reproduces the saved small-signal linearizations (the
``save_op`` role) as a function of ``p``, and the split-real AC solve
maps those to the output phasor.  d|V(out)|/dp per sweep point thus
includes both the direct path (the parameter's own AC stamp) and the
indirect path (the parameter moving the bias point), matching the
full SPICE .SENS AC semantics.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.base import StampCtx
from ..ops.linsolve import dense_solve
from .lower import AnalogIR
from .analog import assemble, assemble_ac


def sens_op(ir: AnalogIR, params, x_op, states, env, out_idx: int,
            drives=None, dtype=jnp.float64):
    """d x[out_idx] / d params at the converged OP.

    Returns a pytree shaped like ``params``: per family an
    (n_inst, n_param) array of absolute sensitivities."""
    ctx = StampCtx(mode="op", t=jnp.zeros((), dtype),
                   dt=jnp.zeros((), dtype), env=env)

    def h(p):
        A, Z, _ = assemble(ir, p, x_op, states, ctx, drives, dtype)
        return dense_solve(A, Z)[out_idx]

    return jax.grad(h)(params)


def sens_ac(ir: AnalogIR, params, x_op, states, env, out_idx: int,
            omegas, drives=None, dtype=jnp.float64):
    """d |V_out(jω)| / d params over the ω grid.

    Returns ``(mag, grads)``: ``mag`` (nω,) output magnitudes and per
    family an (nω, n_inst, n_param) array of magnitude sensitivities.
    The chain runs through the bias point (one-more-step OP) AND the
    saved small-signal linearizations, so parameters that only act by
    moving the bias (e.g. a bias resistor) are priced correctly."""
    n = ir.n_unknowns
    ctx_op = StampCtx(mode="op", t=jnp.zeros((), dtype),
                      dt=jnp.zeros((), dtype), env=env)

    def mag_at(p, w):
        if ir.nonlinear:
            A, Z, _ = assemble(ir, p, x_op, states, ctx_op, drives,
                               dtype)
            xop = dense_solve(A, Z)
            # re-assembly at the (p-dependent) bias reproduces the
            # save_op linearizations as a function of p
            _, _, st_op = assemble(ir, p, xop, states, ctx_op, drives,
                                   dtype)
        else:
            st_op = states
        Ar, Ai, Zr, Zi = assemble_ac(ir, p, st_op, w, dtype)
        M = jnp.block([[Ar, -Ai], [Ai, Ar]])
        b = jnp.concatenate([Zr, Zi])
        y = dense_solve(M, b)
        re, im = y[out_idx], y[n + out_idx]
        return jnp.sqrt(re * re + im * im + jnp.asarray(1e-300, dtype))

    def at_w(w):
        m, g = jax.value_and_grad(mag_at)(params, w)
        return m, g

    return jax.vmap(at_w)(jnp.asarray(omegas, dtype))


class SensResult:
    """Named sensitivity report.

    ``rows()`` yields ``(device_name, param_name, dout_dp,
    normalized)`` where ``normalized = p · dout/dp`` (the sensitivity
    to a relative parameter change — SPICE's .SENS normalized
    column).  For AC results each row value is an (nω,) array."""

    def __init__(self, ir: AnalogIR, grads, params):
        self.ir = ir
        self.grads = {k: np.asarray(v) for k, v in grads.items()}
        self.params = {k: np.asarray(v) for k, v in params.items()}

    def rows(self):
        for fam in self.ir.families:
            key = fam.mdef.id_name
            g = self.grads.get(key)
            if g is None or not fam.mdef.param_order:
                continue
            p = self.params[key]
            for i, inst in enumerate(fam.instances):
                name = getattr(inst, "name", "") or f"{key}#{i}"
                for j, pname in enumerate(fam.mdef.param_order):
                    gv = g[..., i, j]
                    val = gv if gv.ndim else float(gv)
                    pj = float(p[i, j])
                    nrm = gv * pj if gv.ndim else float(gv) * pj
                    yield name, pname, val, nrm

    def get(self, inst, pname: str):
        """Sensitivity of the output to one instance's parameter."""
        for fam in self.ir.families:
            if inst in fam.instances:
                i = fam.instances.index(inst)
                j = fam.mdef.param_order.index(pname)
                g = self.grads[fam.mdef.id_name][..., i, j]
                return g if g.ndim else float(g)
        raise KeyError("instance is not part of the lowered circuit")
