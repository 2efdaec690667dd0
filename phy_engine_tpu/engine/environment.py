"""Simulation environment: SPICE-like tolerances and temperatures.

Mirrors ``circuits/environment/environment.h:7-26`` (field names and
defaults) plus the *effective* fallbacks applied inside ``solve()``
(circuit.h:900-903) and the MNA default open resistance (mna.h:165).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Environment:
    V_eps_max: float = 0.0       # VNTOL   (effective default 1e-6)
    V_epsr_max: float = 0.0      # V RELTOL (effective default 1e-3)
    I_eps_max: float = 0.0       # ABSTOL  (effective default 1e-12)
    I_epsr_max: float = 0.0      # I RELTOL (effective default = V reltol)
    charge_eps_max: float = 0.0  # CHGTOL
    g_min: float = 0.0           # GMIN diagonal conditioning
    r_open: float = 1e12         # ROPEN (open switch/relay resistance)
    t_TOEF: float = 0.0          # TRTOL
    temperature: float = 27.0    # TEMP
    norm_temperature: float = 27.0  # TNOM

    # effective tolerances with the reference's fallbacks
    @property
    def v_abstol(self) -> float:
        return self.V_eps_max if self.V_eps_max > 0.0 else 1e-6

    @property
    def v_reltol(self) -> float:
        return self.V_epsr_max if self.V_epsr_max > 0.0 else 1e-3

    @property
    def i_abstol(self) -> float:
        return self.I_eps_max if self.I_eps_max > 0.0 else 1e-12

    @property
    def i_reltol(self) -> float:
        return self.I_epsr_max if self.I_epsr_max > 0.0 else self.v_reltol

    def rel_tol(self) -> float:
        """RELTOL = min of the two relative tolerances (environment.h:25)."""
        return min(self.v_reltol, self.i_reltol)
