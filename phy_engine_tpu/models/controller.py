"""Controller devices: switch, relay, comparator
(model/models/controller/*.h).

Switch/relay model their contact as an ideal branch with series contact
resistance ``r_contact`` in the D quadrant (0 when closed, ``r_open``
from the environment when open) — switch.h:85-104, relay.h:75-105.

The relay is *hysteretic*: its engaged/released state flips when the coil
voltage crosses Von/Voff and is carried as device state through Newton
iterations (it is classified nonlinear so DC iterates, relay.h:11).

The comparator is a digital-output device handled by the digital engine
(it samples two analog nodes); see digital_gates.COMPARATOR-like wiring in
``engine.circuit``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import ModelDef, DeviceClass, UpdatePhase, register


def _contact_pattern(pins, brs):
    a, b = pins[-2], pins[-1]     # contact pins are the last two
    k = brs[0]
    return [a, b, k, k, k], [k, k, a, b, k]


# ---------------------------------------------------------------------------
# single-pole switch  (switch.h)
# ---------------------------------------------------------------------------

def _sw_stamp(P, v, ib, state, ctx):
    r_contact = jnp.where(P[0] > 0.5, 0.0, ctx.env["r_open"])
    a = jnp.array([1.0, -1.0, 1.0, -1.0, 0.0]).at[4].set(-r_contact)
    return a, jnp.zeros(0), {"r_contact": r_contact}


def _sw_ac(P, state, omega):
    # contact resistance at the operating state; env not available in AC
    # path, so use the stored engaged resistance from state
    r_contact = state["r_contact"]
    a = jnp.array([1.0, -1.0, 1.0, -1.0, 0.0]).at[4].set(-r_contact)
    return a, jnp.zeros(5), jnp.zeros(0), jnp.zeros(0)


def _sw_pattern(pins, brs):
    a, b = pins
    k = brs[0]
    return [a, b, k, k, k], [k, k, a, b, k]


SWITCH = register(ModelDef(
    name="switch", id_name="switch", device_class=DeviceClass.LINEAR,
    pins=("A", "B"), defaults={"cut_through": 0.0},
    param_order=("cut_through",), nbranches=1,
    state_vars=(("r_contact", 0.0),),
    pattern=_sw_pattern, rhs_pattern=lambda p, b: [],
    stamp=_sw_stamp, ac_stamp=_sw_ac, attrs=("Cut Through",),
))


# ---------------------------------------------------------------------------
# relay  (relay.h): pins C+, C-, A, B; hysteresis Von/Voff on coil voltage.
# ---------------------------------------------------------------------------

def _relay_pattern(pins, brs):
    cp, cn, a, b = pins
    k = brs[0]
    return [a, b, k, k, k], [k, k, a, b, k]


def _relay_stamp(P, v, ib, state, ctx):
    von, voff = P[0], P[1]
    vctrl = v[0] - v[1]
    engaged = state["engaged"]
    engaged_new = jnp.where(engaged > 0.5,
                            jnp.where(vctrl <= voff, 0.0, 1.0),
                            jnp.where(vctrl >= von, 1.0, 0.0))
    r_contact = jnp.where(engaged_new > 0.5, 0.0, ctx.env["r_open"])
    a = jnp.array([1.0, -1.0, 1.0, -1.0, 0.0]).at[4].set(-r_contact)
    return a, jnp.zeros(0), {"engaged": engaged_new, "r_contact": r_contact}


def _relay_ac(P, state, omega):
    a = jnp.array([1.0, -1.0, 1.0, -1.0, 0.0]).at[4].set(-state["r_contact"])
    return a, jnp.zeros(5), jnp.zeros(0), jnp.zeros(0)


RELAY = register(ModelDef(
    name="Relay", id_name="RELAY", device_class=DeviceClass.NONLINEAR,
    pins=("C+", "C-", "A", "B"), defaults={"Von": 5.0, "Voff": 3.0},
    param_order=("Von", "Voff"), nbranches=1,
    state_vars=(("engaged", 0.0), ("r_contact", 0.0)),
    pattern=_relay_pattern, rhs_pattern=lambda p, b: [],
    stamp=_relay_stamp, ac_stamp=_relay_ac, nonlinear=True,
    attrs=("Von", "Voff"),
))


# ---------------------------------------------------------------------------
# comparator  (comparator.h): digital device, A/B analog inputs, output o.
# Handled by the digital engine's special-op table.
# ---------------------------------------------------------------------------

COMPARATOR = register(ModelDef(
    name="Comparator", id_name="CMP", device_class=DeviceClass.DIGITAL,
    pins=("A", "B", "o"), defaults={"Ll": 0.0, "Hl": 5.0},
    digital_op="CMP", update_phase=UpdatePhase.TABLE,
    din_pins=(0, 1), dout_pins=(2,),
    attrs=("Ll", "Hl"),
))
