"""Small-signal noise analysis (SPICE .NOISE class).

The reference engine has **no noise analysis** — its own BSIM3 header
TODO lists "expose them through the simulator's noise analysis
infrastructure" as missing work (bsim3v32.h:28-29) and no analyzer for
it exists anywhere in `circuits/`.  This module is a TPU-native
extension past that parity line.

Method: the adjoint-network (transpose-system) formulation.  At each
frequency the linearized AC system A(ω) (the same split-real assembly
`analog.assemble_ac` uses, built around the saved OP linearizations)
is solved ONCE transposed,

    Aᵀ(ω) · y = e_out,

after which the transfer impedance from a noise current injected
between nodes (p, q) to the output voltage is simply ``y_p − y_q`` —
so EVERY device noise source in the circuit costs one gather, not one
solve (classic SPICE interreciprocal-adjoint trick).  The output
voltage noise PSD is

    S_vout(ω) = Σ_sources |y_p − y_q|² · S_i(ω),

with S_i the device's current-noise PSD at the bias point (thermal /
shot / flicker, provided per model via ``ModelDef.noise`` +
``ModelDef.noise_pairs``).  The ω grid is one batched ``vmap`` like
``analog.ac_sweep`` — the reference's serial AC loop (circuit.h:399-428)
has no analogue to batch, since it never had the analysis at all.

Input-referred noise divides by the squared gain |v_out/e_src|² from a
designated source branch (unit E excitation on its branch row), solved
at the same frequencies in the same batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linsolve import dense_solve
from .lower import AnalogIR
from .analog import assemble_ac

K_B = 1.380649e-23
Q_E = 1.602176634e-19


def noise_sweep(ir: AnalogIR, params, x_op, states, omegas,
                out_idx: int, src_row: Optional[int] = None,
                env: Optional[Dict] = None, dtype=jnp.float64):
    """Batched output-noise sweep.

    Returns ``(onoise, gain2, contribs)``:

    * ``onoise``  — (nω,) output voltage noise PSD [V²/Hz] at node
      ``out_idx``;
    * ``gain2``   — (nω,) squared transfer gain |v_out / e_src|² from
      the branch-row ``src_row`` unit excitation (all-ones when
      ``src_row`` is None);
    * ``contribs`` — {family id_name: (nω,) PSD} per-family breakdown
      (the SPICE per-device noise report, summarized per model family).
    """
    n = ir.n_unknowns
    x_ext = jnp.concatenate([jnp.asarray(x_op, dtype),
                             jnp.zeros(1, dtype)])

    # pre-gather OP bias per noisy family (frequency-independent)
    noisy = [f for f in ir.families if f.mdef.noise is not None
             and f.mdef.noise_pairs]
    corr = [f for f in ir.families if f.mdef.noise_corr is not None
            and f.mdef.noise_corr_pairs]

    def at_w(w):
        Ar, Ai, Zr, Zi = assemble_ac(ir, params, states, w, dtype)
        # adjoint: Aᵀ y = e_out, split-real (Aᵀ = Arᵀ + jAiᵀ)
        Madj = jnp.block([[Ar.T, -Ai.T], [Ai.T, Ar.T]])
        e = jnp.zeros(2 * n, dtype).at[out_idx].set(1.0)
        y = dense_solve(Madj, e)
        yr = jnp.concatenate([y[:n], jnp.zeros(1, dtype)])
        yi = jnp.concatenate([y[n:], jnp.zeros(1, dtype)])

        f = w / (2.0 * jnp.pi)
        onoise = jnp.zeros((), dtype)
        contribs = {}
        for fam in noisy:
            key = fam.mdef.id_name
            P = params[key]
            st = states.get(key, {})
            vp = x_ext[jnp.asarray(fam.pin_nodes)]
            vb = x_ext[jnp.asarray(fam.br_idx)]

            def one(Pr, vr, br, sr, _f=fam.mdef.noise):
                return _f(Pr, vr, br, sr, env, f)

            psd = jax.vmap(one)(P, vp, vb, st)      # (n_inst, n_pairs)
            psd = jnp.maximum(psd.astype(dtype), 0.0)
            msk = getattr(fam, "mask", None)
            if msk is not None:
                psd = psd * jnp.asarray(msk, dtype)[:, None]
            gains = []
            for (i, j) in fam.mdef.noise_pairs:
                p_ = jnp.asarray(fam.pin_nodes)[:, i]
                q_ = jnp.asarray(fam.pin_nodes)[:, j]
                gr = yr[p_] - yr[q_]
                gi = yi[p_] - yi[q_]
                gains.append(gr * gr + gi * gi)
            g2 = jnp.stack(gains, axis=1)           # (n_inst, n_pairs)
            c = jnp.sum(g2 * psd)
            contribs[key] = c
            onoise = onoise + c

        # correlated source groups: S_aa|Ga|² + S_bb|Gb|² +
        # 2·Re(Ga·conj(Gb)·S_ab) per group (induced gate noise etc.)
        for fam in corr:
            key = fam.mdef.id_name
            P = params[key]
            st = states.get(key, {})
            vp = x_ext[jnp.asarray(fam.pin_nodes)]
            vb = x_ext[jnp.asarray(fam.br_idx)]

            def onec(Pr, vr, br, sr, _f=fam.mdef.noise_corr):
                return _f(Pr, vr, br, sr, env, f, w)

            S = jax.vmap(onec)(P, vp, vb, st)   # (n_inst, n_grp, 4)
            S = S.astype(dtype)
            msk = getattr(fam, "mask", None)
            if msk is not None:
                S = S * jnp.asarray(msk, dtype)[:, None, None]
            terms = []
            for gi, (pa, pb) in enumerate(fam.mdef.noise_corr_pairs):
                pins = jnp.asarray(fam.pin_nodes)
                ga_r = yr[pins[:, pa[0]]] - yr[pins[:, pa[1]]]
                ga_i = yi[pins[:, pa[0]]] - yi[pins[:, pa[1]]]
                gb_r = yr[pins[:, pb[0]]] - yr[pins[:, pb[1]]]
                gb_i = yi[pins[:, pb[0]]] - yi[pins[:, pb[1]]]
                saa = jnp.maximum(S[:, gi, 0], 0.0)
                sbb = jnp.maximum(S[:, gi, 1], 0.0)
                sr_, si_ = S[:, gi, 2], S[:, gi, 3]
                # Re(Ga·conj(Gb)·(sr+j·si)) = sr·X − si·Y
                X = ga_r * gb_r + ga_i * gb_i
                Y = ga_i * gb_r - ga_r * gb_i
                terms.append(saa * (ga_r ** 2 + ga_i ** 2) +
                             sbb * (gb_r ** 2 + gb_i ** 2) +
                             2.0 * (sr_ * X - si_ * Y))
            c = jnp.sum(jnp.stack(terms, axis=1))
            # a correlated group can reduce the total below the sum of
            # its parts but never below zero as a whole; clamp the
            # family aggregate, not individual cross terms
            c = jnp.maximum(c, 0.0)
            contribs[key] = contribs.get(key, jnp.zeros((), dtype)) + c
            onoise = onoise + c

        if src_row is not None:
            Msys = jnp.block([[Ar, -Ai], [Ai, Ar]])
            b = jnp.zeros(2 * n, dtype).at[src_row].set(1.0)
            xg = dense_solve(Msys, b)
            gain2 = xg[out_idx] ** 2 + xg[n + out_idx] ** 2
        else:
            gain2 = jnp.ones((), dtype)
        return onoise, gain2, contribs

    return jax.vmap(at_w)(jnp.asarray(omegas, dtype))


def integrate_psd(freqs, psd) -> float:
    """Total noise power over the sweep band: trapezoid of the PSD in
    f [V²].  ``sqrt`` of this is the familiar integrated RMS noise."""
    freqs = np.asarray(freqs, np.float64)
    psd = np.asarray(psd, np.float64)
    return float(np.trapezoid(psd, freqs))


class NoiseResult:
    """Sweep result: PSDs are one-sided, in V²/Hz."""

    def __init__(self, freqs, onoise, gain2, contribs):
        self.freqs = np.asarray(freqs)
        self.onoise_psd = np.asarray(onoise)
        self.gain2 = np.asarray(gain2)
        self.inoise_psd = self.onoise_psd / np.maximum(self.gain2,
                                                       1e-300)
        self.contribs = {k: np.asarray(v) for k, v in contribs.items()}

    def onoise_total(self) -> float:
        return integrate_psd(self.freqs, self.onoise_psd)

    def inoise_total(self) -> float:
        return integrate_psd(self.freqs, self.inoise_psd)
