"""Netlist operations.

Functional parity with ``include/phy_engine/netlist/operation.h:49-338``:
``add_model`` / ``delete_model`` / ``get_model`` / ``create_node`` /
``add_to_node`` / ``remove_from_node`` / ``merge_node`` / ``add_netlist``.
"""

from __future__ import annotations

from typing import Optional, Union

from .netlist import Netlist, Node, ModelInstance, Pin
from ..models.base import ModelDef, DeviceClass


def add_model(nl: Netlist, mdef_or_inst, params=None, name: str = "") -> ModelInstance:
    """Place a device.  Accepts a ModelDef (+params) or a prebuilt instance."""
    if isinstance(mdef_or_inst, ModelInstance):
        inst = mdef_or_inst
    elif isinstance(mdef_or_inst, ModelDef):
        inst = ModelInstance(mdef_or_inst, params, name)
    else:
        raise TypeError(f"cannot add {type(mdef_or_inst)} to netlist")
    inst._pos = len(nl.models)      # O(1) delete_model lookup
    nl.models.append(inst)
    nl.touch()
    return inst


def delete_model(nl: Netlist, inst: ModelInstance) -> bool:
    """Remove a device (tombstone, like operation.h:91-128) and detach pins."""
    pos = getattr(inst, "_pos", -1)
    if not (0 <= pos < len(nl.models)) or nl.models[pos] is not inst:
        try:                           # fallback for foreign instances
            pos = nl.models.index(inst)
        except ValueError:
            return False
    for pin in inst.pins:
        if pin.node is not None:
            remove_from_node(nl, inst, pin.index, pin.node)
    nl.models[pos] = None
    nl.touch()
    return True


def get_model(nl: Netlist, pos: int) -> Optional[ModelInstance]:
    if 0 <= pos < len(nl.models):
        return nl.models[pos]
    return None


def create_node(nl: Netlist, name: str = "") -> Node:
    node = Node(name=name)
    node._pos = len(nl.nodes)       # O(1) swap-removal in drop_node
    nl.nodes.append(node)
    nl.touch()
    return node


def drop_node(nl: Netlist, node: Node) -> bool:
    """Remove a net from the list in O(1) (swap-with-last)."""
    pos = getattr(node, "_pos", -1)
    if not (0 <= pos < len(nl.nodes)) or nl.nodes[pos] is not node:
        return False               # already dropped (stale position)
    last = nl.nodes[-1]
    nl.nodes[pos] = last
    last._pos = pos
    nl.nodes.pop()
    return True


def _pin_of(inst: ModelInstance, pin: Union[int, str, Pin]) -> Pin:
    if isinstance(pin, Pin):
        return pin
    if isinstance(pin, str):
        for p in inst.pins:
            if p.name == pin:
                return p
        raise KeyError(f"no pin named {pin!r} on {inst.mdef.name}")
    return inst.pins[pin]


def add_to_node(nl: Netlist, inst: ModelInstance, pin: Union[int, str, Pin],
                node: Node) -> None:
    """Connect a pin to a net.

    Tracks ``num_of_analog_node`` per the device class exactly as
    ``operation.h:167-217`` does: analog-class devices make the net
    analog; digital devices never do.
    """
    p = _pin_of(inst, pin)
    if p.node is node:
        return
    if p.node is not None:
        remove_from_node(nl, inst, p, p.node)
    p.node = node
    node.pins.append(p)
    if inst.mdef.device_class != DeviceClass.DIGITAL:
        node.num_of_analog_node += 1
    nl.touch()


def remove_from_node(nl: Netlist, inst: ModelInstance, pin: Union[int, str, Pin],
                     node: Optional[Node] = None) -> None:
    p = _pin_of(inst, pin)
    node = node or p.node
    if node is None or p.node is not node:
        return
    node.pins.remove(p)
    p.node = None
    if inst.mdef.device_class != DeviceClass.DIGITAL:
        node.num_of_analog_node -= 1
    nl.touch()


def merge_node(nl: Netlist, keep: Node, absorb: Node) -> Node:
    """Merge net ``absorb`` into ``keep`` (operation.h:251-259).

    Ground wins: merging anything with the ground node yields ground.
    """
    if keep is absorb:
        return keep
    if absorb.is_ground and not keep.is_ground:
        keep, absorb = absorb, keep
    for p in list(absorb.pins):
        p.node = keep
        keep.pins.append(p)
    keep.num_of_analog_node += absorb.num_of_analog_node
    absorb.pins.clear()
    absorb.num_of_analog_node = 0
    drop_node(nl, absorb)
    nl.touch()
    return keep


def add_netlist(dst: Netlist, src: Netlist) -> dict:
    """Graft a copy of ``src`` into ``dst`` (operation.h:261-338).

    Returns a mapping {id(src node/model): new object} so callers can
    stitch ports.  The source ground merges into the destination ground.
    """
    src_copy = src.copy()
    remap = {id(src.ground_node): dst.ground_node}
    # src.copy() preserves ordering, so walk the two in lockstep.
    for orig, copied in zip(src.nodes, src_copy.nodes):
        dst.nodes.append(copied)
        remap[id(orig)] = copied
    for orig, copied in zip(src.models, src_copy.models):
        if copied is None:
            continue
        dst.models.append(copied)
        remap[id(orig)] = copied
    # reconnect copied ground pins to dst ground
    for p in list(src_copy.ground_node.pins):
        p.node = dst.ground_node
        dst.ground_node.pins.append(p)
        dst.ground_node.num_of_analog_node += 1
    dst.touch()
    return remap
