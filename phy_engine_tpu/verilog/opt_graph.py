"""Gate-graph IR for the heavier synthesis optimization tiers (O2+).

The reference runs its O2..O4 passes (AND/OR tree flatten + absorption +
factoring, XOR extraction, primitive selection, truth-table
resubstitution / sweep, Quine-McCluskey two-level minimization —
pe_synth.h:17595-17625 pass gating) on its own in-memory gate structure
rather than on the netlist arenas.  This module does the same for the
TPU build: extract the pure-combinational core of the gate netlist into
an index-based DAG, optimize it, and re-emit gates.

4-state discipline: passes in `safe` mode use only Kleene-algebra
identities that hold for X/Z (associativity, commutativity, absorption,
idempotence, De Morgan, constant identities, structural XOR recognition).
Truth-table passes (resub, QM) assume binary-valued inputs and run only
when ``assume_binary_inputs`` is enabled (the reference exposes the same
relaxation switch, pe_synth.h options).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

# combinational single-output ops handled by the graph
_GRAPH_OPS = {"AND", "OR", "XOR", "XNOR", "NAND", "NOR", "IMP", "NIMP",
              "NOT", "YES"}
# ops whose output is a pure function usable as a *leaf* but whose body
# we do not touch (multi-driver / tri-state / X-introspection semantics)
CONST0, CONST1, CONSTX = -2, -3, -4


@dataclass
class GNode:
    op: str                   # PIN | CONST | gate op
    fanins: Tuple[int, ...] = ()
    # for PIN leaves: the Node object this leaf reads
    net: object = None
    const: int = 0            # for CONST: 4-state code


class GateGraph:
    def __init__(self):
        self.nodes: List[GNode] = []
        # protected output net -> graph index driving it
        self.outputs: Dict[int, Tuple[object, int]] = {}
        self._leaf_by_net: Dict[int, int] = {}
        self._const_idx: Dict[int, int] = {}

    # ---- construction -----------------------------------------------------
    def leaf(self, net) -> int:
        key = id(net)
        if key not in self._leaf_by_net:
            self.nodes.append(GNode("PIN", (), net))
            self._leaf_by_net[key] = len(self.nodes) - 1
        return self._leaf_by_net[key]

    def const(self, code: int) -> int:
        if code not in self._const_idx:
            self.nodes.append(GNode("CONST", (), None, code))
            self._const_idx[code] = len(self.nodes) - 1
        return self._const_idx[code]

    def gate(self, op: str, *fanins: int) -> int:
        self.nodes.append(GNode(op, tuple(fanins)))
        return len(self.nodes) - 1

    def set_output(self, net, idx: int):
        self.outputs[id(net)] = (net, idx)

    # ---- queries ----------------------------------------------------------
    def fanout_counts(self) -> List[int]:
        cnt = [0] * len(self.nodes)
        for n in self.nodes:
            for f in n.fanins:
                cnt[f] += 1
        for _, idx in self.outputs.values():
            cnt[idx] += 1
        return cnt

    def live_set(self) -> Set[int]:
        seen: Set[int] = set()
        stack = [idx for _, idx in self.outputs.values()]
        while stack:
            i = stack.pop()
            if i in seen:
                continue
            seen.add(i)
            stack.extend(self.nodes[i].fanins)
        return seen

    def gate_count(self) -> int:
        live = self.live_set()
        return sum(1 for i in live
                   if self.nodes[i].op not in ("PIN", "CONST"))


# ---------------------------------------------------------------------------
# extraction from / emission to the netlist
# ---------------------------------------------------------------------------

def extract(nl, protected_ids: Set[int]) -> Optional[GateGraph]:
    """Build a GateGraph from the combinational gates of ``nl``.

    A net is a graph *boundary* (leaf or output) if it is protected, has
    a non-graph driver (FF, INPUT, TRI, ...), feeds a non-graph reader,
    or touches the analog side.  Returns None if there is nothing to do.
    """
    from ..models.base import DeviceClass

    gate_of_net: Dict[int, object] = {}    # net id -> driving gate inst
    graph_gates = []
    for inst in nl.live_models():
        if inst.mdef.device_class != DeviceClass.DIGITAL:
            continue
        if inst.mdef.digital_op in _GRAPH_OPS:
            outs = [inst.pins[i].node for i in inst.mdef.dout_pins]
            if len(outs) != 1 or outs[0] is None:
                continue
            ins = [inst.pins[i].node for i in inst.mdef.din_pins]
            if any(n is None for n in ins):
                continue
            # multi-driven output nets are boundaries, skip their driver
            graph_gates.append(inst)
            gate_of_net[id(outs[0])] = inst

    if not graph_gates:
        return None

    # nets with >1 driver or external readers stay as boundaries
    from .optimize import _drivers, _readers, _net_const

    g = GateGraph()
    g._net_cache = {}
    building: Set[int] = set()

    # boundary-output nets: graph-gate-driven nets that the outside
    # world observes (protected, non-graph reader, analog-coupled).
    # Cones stop at these so shared logic is referenced, not duplicated.
    out_nets = {}
    for inst in graph_gates:
        onet = inst.pins[inst.mdef.dout_pins[0]].node
        key = id(onet)
        if len(_drivers(onet)) != 1:
            continue                    # multi-driven: left in place
        ext = (key in protected_ids or onet.num_of_analog_node > 0 or
               any(r.model.mdef.digital_op not in _GRAPH_OPS
                   for r in _readers(onet)))
        if ext:
            out_nets[key] = onet

    def build_net(net, root=False) -> int:
        key = id(net)
        if not root and key in out_nets:
            return g.leaf(net)
        inst = gate_of_net.get(key)
        if inst is None:
            code = _net_const(net)
            if code is not None:
                return g.const(code)
            return g.leaf(net)
        if len(_drivers(net)) != 1 or net.num_of_analog_node > 0:
            return g.leaf(net)
        if key in building:            # combinational loop: cut here
            return g.leaf(net)
        if key in g._net_cache:
            return g._net_cache[key]
        building.add(key)
        ins = [inst.pins[i].node for i in inst.mdef.din_pins]
        fi = [build_net(n) for n in ins]
        building.discard(key)
        idx = g.gate(inst.mdef.digital_op, *fi)
        if not root:
            g._net_cache[key] = idx
        return idx

    for key, onet in out_nets.items():
        g.set_output(onet, build_net(onet, root=True))
    if not g.outputs:
        return None
    return g


def emit(nl, g: GateGraph, stats) -> None:
    """Replace the extracted combinational core of ``nl`` with ``g``.

    Old graph gates whose outputs become dangling are swept by the O1
    DCE pass that runs after emission.
    """
    from ..netlist import operations as ops
    from .. import models as M

    MODEL = {"AND": M.AND, "OR": M.OR, "XOR": M.XOR, "XNOR": M.XNOR,
             "NAND": M.NAND, "NOR": M.NOR, "IMP": M.IMP, "NIMP": M.NIMP,
             "NOT": M.NOT, "YES": M.YES}

    live = g.live_set()
    order = _toposort(g, live)
    net_of: Dict[int, object] = {}
    # pre-bind output nets to their driving gate; when two outputs share
    # a gate (or an output is a leaf/const) the extras get YES buffers
    bound: Dict[int, object] = {}
    for _, (net, idx) in g.outputs.items():
        if idx not in bound and g.nodes[idx].op not in ("PIN", "CONST"):
            bound[idx] = net

    def netf(i) -> object:
        n = g.nodes[i]
        if n.op == "PIN":
            return n.net
        if i in net_of:
            return net_of[i]
        if n.op == "CONST":
            inp = ops.add_model(nl, M.INPUT,
                                {"boolean": float(n.const),
                                 "synth_const": 1.0})
            node = ops.create_node(nl)
            ops.add_to_node(nl, inp, 0, node)
            net_of[i] = node
            return node
        return net_of[i]

    for i in order:
        n = g.nodes[i]
        if n.op in ("PIN", "CONST"):
            continue
        out_net = bound.get(i)
        if out_net is None:
            out_net = ops.create_node(nl)
        # disconnect the old driver of a reused output net
        for pin in list(out_net.pins):
            if pin.index in pin.model.mdef.dout_pins:
                ops.remove_from_node(nl, pin.model, pin.index)
        inst = ops.add_model(nl, MODEL[n.op])
        for k, fi in enumerate(n.fanins):
            ops.add_to_node(nl, inst, k, netf(fi))
        ops.add_to_node(nl, inst, len(n.fanins), out_net)
        net_of[i] = out_net
        stats.rebuilt += 1

    # outputs that alias another output's gate: YES-buffer them
    for _, (net, idx) in g.outputs.items():
        if bound.get(idx) is not net:
            src = netf(idx)
            if src is net:
                continue
            buf = ops.add_model(nl, M.YES)
            ops.add_to_node(nl, buf, 0, src)
            ops.add_to_node(nl, buf, 1, net)
            for pin in list(net.pins):
                if (pin.model is not buf and
                        pin.index in pin.model.mdef.dout_pins):
                    ops.remove_from_node(nl, pin.model, pin.index)


def _toposort(g: GateGraph, live: Set[int]) -> List[int]:
    order: List[int] = []
    state: Dict[int, int] = {}

    for root in live:
        stack = [(root, 0)]
        while stack:
            i, phase = stack.pop()
            if phase == 0:
                if state.get(i):
                    continue
                state[i] = 1
                stack.append((i, 1))
                for f in g.nodes[i].fanins:
                    if not state.get(f):
                        stack.append((f, 0))
            else:
                if state[i] != 2:
                    state[i] = 2
                    order.append(i)
    return order


# ---------------------------------------------------------------------------
# O2+ passes
# ---------------------------------------------------------------------------
# Normalization: every gate is rewritten over {AND, OR, NOT, XOR} so the
# algebraic passes see one uniform system; primitive_select re-introduces
# the composite primitives (NAND/NOR/XNOR/IMP/NIMP) afterwards, mirroring
# the reference's input-inverter push / primitive selection pass.

_X = 2


class _Builder:
    """Hash-consed AND/OR/NOT/XOR graph builder with local Kleene-safe
    simplification applied at construction time."""

    def __init__(self, binary_ok: bool):
        self.nodes: List[GNode] = []
        self.cache: Dict[Tuple, int] = {}
        self.binary_ok = binary_ok
        self._const: Dict[int, int] = {}

    def const(self, code: int) -> int:
        if code not in self._const:
            self.nodes.append(GNode("CONST", (), None, code))
            self._const[code] = len(self.nodes) - 1
        return self._const[code]

    def leaf(self, net) -> int:
        key = ("PIN", id(net))
        if key not in self.cache:
            self.nodes.append(GNode("PIN", (), net))
            self.cache[key] = len(self.nodes) - 1
        return self.cache[key]

    def _raw(self, op: str, *fi: int) -> int:
        if op in ("AND", "OR", "XOR"):
            fi = tuple(sorted(fi))
        key = (op,) + tuple(fi)
        if key not in self.cache:
            self.nodes.append(GNode(op, tuple(fi)))
            self.cache[key] = len(self.nodes) - 1
        return self.cache[key]

    def const_of(self, i: int) -> Optional[int]:
        n = self.nodes[i]
        return n.const if n.op == "CONST" else None

    def NOT(self, a: int) -> int:
        n = self.nodes[a]
        if n.op == "NOT":
            return n.fanins[0]
        c = self.const_of(a)
        if c is not None:
            from ..digital import logic
            return self.const(int(logic.NOT_TABLE[c]))
        return self._raw("NOT", a)

    def _is_not_of(self, a: int, b: int) -> bool:
        """True if a == NOT(b) structurally."""
        n = self.nodes[a]
        return n.op == "NOT" and n.fanins[0] == b

    def AND(self, a: int, b: int) -> int:
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            from ..digital import logic
            return self.const(int(logic.AND_TABLE[ca, cb]))
        for c, x in ((ca, b), (cb, a)):
            if c == 0:
                return self.const(0)
            if c == 1:
                return x
            if c is not None:          # X/Z constant input
                pass
        if a == b:
            return a
        if self.binary_ok and (self._is_not_of(a, b) or
                               self._is_not_of(b, a)):
            return self.const(0)
        # absorption: AND(a, OR(a, x)) = a
        for u, v in ((a, b), (b, a)):
            nv = self.nodes[v]
            if nv.op == "OR" and u in nv.fanins:
                return u
        return self._raw("AND", a, b)

    def OR(self, a: int, b: int) -> int:
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            from ..digital import logic
            return self.const(int(logic.OR_TABLE[ca, cb]))
        for c, x in ((ca, b), (cb, a)):
            if c == 1:
                return self.const(1)
            if c == 0:
                return x
        if a == b:
            return a
        if self.binary_ok and (self._is_not_of(a, b) or
                               self._is_not_of(b, a)):
            return self.const(1)
        for u, v in ((a, b), (b, a)):
            nv = self.nodes[v]
            if nv.op == "AND" and u in nv.fanins:
                return u
        return self._raw("OR", a, b)

    def XOR(self, a: int, b: int) -> int:
        ca, cb = self.const_of(a), self.const_of(b)
        if ca is not None and cb is not None:
            from ..digital import logic
            return self.const(int(logic.XOR_TABLE[ca, cb]))
        for c, x in ((ca, b), (cb, a)):
            if c == 0:
                return x
            if c == 1:
                return self.NOT(x)
        if self.binary_ok:
            if a == b:
                return self.const(0)
            if self._is_not_of(a, b) or self._is_not_of(b, a):
                return self.const(1)
        return self._raw("XOR", a, b)


def _normalize(g: GateGraph, bld: _Builder) -> Dict[int, int]:
    """Rewrite g over {AND,OR,NOT,XOR} into bld; returns old->new map."""
    mp: Dict[int, int] = {}
    for i in _toposort(g, g.live_set()):
        n = g.nodes[i]
        if n.op == "PIN":
            mp[i] = bld.leaf(n.net)
        elif n.op == "CONST":
            mp[i] = bld.const(n.const)
        else:
            f = [mp[x] for x in n.fanins]
            if n.op == "AND":
                mp[i] = bld.AND(*f)
            elif n.op == "OR":
                mp[i] = bld.OR(*f)
            elif n.op == "XOR":
                mp[i] = bld.XOR(*f)
            elif n.op == "XNOR":
                mp[i] = bld.NOT(bld.XOR(*f))
            elif n.op == "NAND":
                mp[i] = bld.NOT(bld.AND(*f))
            elif n.op == "NOR":
                mp[i] = bld.NOT(bld.OR(*f))
            elif n.op == "IMP":
                mp[i] = bld.OR(bld.NOT(f[0]), f[1])
            elif n.op == "NIMP":
                mp[i] = bld.AND(f[0], bld.NOT(f[1]))
            elif n.op in ("NOT",):
                mp[i] = bld.NOT(f[0])
            elif n.op == "YES":
                mp[i] = f[0]
            else:
                raise AssertionError(n.op)
    return mp


def _collect_tree(bld: _Builder, i: int, op: str, fanout, out: List[int],
                  top: bool = False):
    """Flatten same-op trees through *private* (fanout<=1) interior
    nodes; nodes created after the fanout snapshot count as private."""
    n = bld.nodes[i]
    if n.op == op and (top or fanout.get(i, 1) <= 1):
        for f in n.fanins:
            _collect_tree(bld, f, op, fanout, out)
    else:
        out.append(i)


def _factor_pass(bld: _Builder, roots: List[int]) -> Dict[int, int]:
    """Single-literal common-factor extraction over OR-of-AND /
    AND-of-OR trees (distributivity — Kleene-safe), plus XOR
    recognition.  Returns a replacement map applied by re-normalizing."""
    fanout: Dict[int, int] = {}
    for n in bld.nodes:
        for f in n.fanins:
            fanout[f] = fanout.get(f, 0) + 1
    for r in roots:
        fanout[r] = fanout.get(r, 0) + 1

    repl: Dict[int, int] = {}
    done: Set[int] = set()

    def walk(i: int) -> int:
        while i in repl and repl[i] != i:
            i = repl[i]
        if i in done:
            return i
        n = bld.nodes[i]
        if n.op in ("PIN", "CONST"):
            return i
        f = [walk(x) for x in n.fanins]
        if n.op == "NOT":
            out = bld.NOT(f[0])
        elif n.op == "XOR":
            out = bld.XOR(*f)
        elif n.op in ("AND", "OR"):
            dual = "OR" if n.op == "AND" else "AND"
            cur = bld._raw(n.op, *f)
            terms: List[int] = []
            _collect_tree(bld, cur, n.op, fanout, terms, top=True)
            terms = [walk(t) for t in terms]
            # dedup (idempotence)
            seen = []
            for t in terms:
                if t not in seen:
                    seen.append(t)
            terms = seen
            # XOR recognition on 2-term OR-of-ANDs
            if n.op == "OR" and len(terms) == 2:
                x = _match_xor(bld, terms[0], terms[1])
                if x is not None:
                    repl[i] = x
                    done.add(x)
                    return x
            # common single literal among dual-op terms
            if len(terms) >= 2:
                lit = _common_literal(bld, terms, dual, fanout)
                if lit is not None:
                    rest = [_strip_literal(bld, t, lit, dual, fanout)
                            for t in terms]
                    inner = rest[0]
                    for t in rest[1:]:
                        inner = (bld.AND(inner, t) if n.op == "AND"
                                 else bld.OR(inner, t))
                    out = (bld.OR(lit, inner) if dual == "OR"
                           else bld.AND(lit, inner))
                    repl[i] = out
                    done.add(out)
                    return out
            out = terms[0]
            for t in terms[1:]:
                out = bld.AND(out, t) if n.op == "AND" else bld.OR(out, t)
        else:
            out = i
        repl[i] = out
        done.add(out)
        return out

    for r in roots:
        walk(r)
    return repl


def _group_lits(bld: _Builder, t: int, dual: str, fanout) -> List[int]:
    n = bld.nodes[t]
    if n.op != dual:
        return [t]
    out: List[int] = []
    _collect_tree(bld, t, dual, fanout, out, top=True)
    return out


def _common_literal(bld: _Builder, terms: List[int], dual: str,
                    fanout) -> Optional[int]:
    """A literal present in every term (terms are dual-op groups)."""
    common = set(_group_lits(bld, terms[0], dual, fanout))
    for t in terms[1:]:
        common &= set(_group_lits(bld, t, dual, fanout))
        if not common:
            return None
    return min(common) if common else None


def _strip_literal(bld: _Builder, t: int, lit: int, dual: str,
                   fanout) -> int:
    """Remove ``lit`` from the dual-op group ``t`` (t must contain it).

    A fully-stripped group becomes the identity of the *outer* op, i.e.
    the dual op's absorbing element is never produced here."""
    if t == lit:
        # factored term is the literal itself: identity of the dual op
        return bld.const(1 if dual == "AND" else 0)
    parts = _group_lits(bld, t, dual, fanout)
    parts.remove(lit)
    if not parts:
        return bld.const(1 if dual == "AND" else 0)
    out = parts[0]
    for p in parts[1:]:
        out = bld.AND(out, p) if dual == "AND" else bld.OR(out, p)
    return out


def _match_xor(bld: _Builder, t0: int, t1: int) -> Optional[int]:
    """OR(AND(a,~b), AND(~a,b)) -> XOR(a,b);
    OR(AND(a,b), AND(~a,~b)) -> XNOR(a,b).  Kleene-safe."""
    n0, n1 = bld.nodes[t0], bld.nodes[t1]
    if n0.op != "AND" or n1.op != "AND":
        return None
    if len(n0.fanins) != 2 or len(n1.fanins) != 2:
        return None

    def pol(i):
        n = bld.nodes[i]
        if n.op == "NOT":
            return n.fanins[0], True
        return i, False

    a0, i0 = pol(n0.fanins[0])
    b0, j0 = pol(n0.fanins[1])
    a1, i1 = pol(n1.fanins[0])
    b1, j1 = pol(n1.fanins[1])
    if {a0, b0} != {a1, b1} or a0 == b0:
        return None
    # align operand order of the second term
    if a1 != a0:
        a1, b1, i1, j1 = b1, a1, j1, i1
    # polarities: (i0,j0) vs (i1,j1)
    if i0 != i1 and j0 != j1:
        if i0 != j0:
            return bld.XOR(a0, b0)          # a^b
        return bld.NOT(bld.XOR(a0, b0))     # xnor
    return None


def _to_gategraph(bld: _Builder, out_map: Dict[int, Tuple[object, int]],
                  select_primitives: bool = True) -> GateGraph:
    """Convert a builder graph back to a GateGraph, folding NOT/AND/OR/
    XOR combinations into the composite primitives (NAND/NOR/XNOR/
    IMP/NIMP) where it saves a gate (single-fanout inner node)."""
    g = GateGraph()
    roots = [idx for (_, idx) in out_map.values()]

    # live + fanout over the builder graph
    live: Set[int] = set()
    stack = list(roots)
    while stack:
        i = stack.pop()
        if i in live:
            continue
        live.add(i)
        stack.extend(bld.nodes[i].fanins)
    fanout = {i: 0 for i in live}
    for i in live:
        for f in bld.nodes[i].fanins:
            fanout[f] += 1
    for r in roots:
        fanout[r] += 1

    memo: Dict[int, int] = {}

    def conv(i: int) -> int:
        if i in memo:
            return memo[i]
        n = bld.nodes[i]
        out: int
        if n.op == "PIN":
            out = g.leaf(n.net)
        elif n.op == "CONST":
            out = g.const(n.const)
        elif n.op == "NOT":
            inner = bld.nodes[n.fanins[0]]
            if (select_primitives and fanout.get(n.fanins[0], 2) == 1 and
                    inner.op in ("AND", "OR", "XOR")):
                f = [conv(x) for x in inner.fanins]
                out = g.gate({"AND": "NAND", "OR": "NOR",
                              "XOR": "XNOR"}[inner.op], *f)
            else:
                out = g.gate("NOT", conv(n.fanins[0]))
        elif n.op in ("AND", "OR"):
            a, b = n.fanins
            na, nb = bld.nodes[a], bld.nodes[b]
            if select_primitives and n.op == "AND":
                # AND(a, ~b) -> NIMP(a, b) when ~b is private
                if nb.op == "NOT" and fanout.get(b, 2) == 1:
                    out = g.gate("NIMP", conv(a), conv(nb.fanins[0]))
                elif na.op == "NOT" and fanout.get(a, 2) == 1:
                    out = g.gate("NIMP", conv(b), conv(na.fanins[0]))
                else:
                    out = g.gate("AND", conv(a), conv(b))
            elif select_primitives and n.op == "OR":
                # OR(~a, b) -> IMP(a, b) when ~a is private
                if na.op == "NOT" and fanout.get(a, 2) == 1:
                    out = g.gate("IMP", conv(na.fanins[0]), conv(b))
                elif nb.op == "NOT" and fanout.get(b, 2) == 1:
                    out = g.gate("IMP", conv(nb.fanins[0]), conv(a))
                else:
                    out = g.gate("OR", conv(a), conv(b))
            else:
                out = g.gate(n.op, conv(a), conv(b))
        elif n.op == "XOR":
            out = g.gate("XOR", *[conv(x) for x in n.fanins])
        else:
            raise AssertionError(n.op)
        memo[i] = out
        return out

    for _, (net, idx) in out_map.items():
        g.set_output(net, conv(idx))
    return g


def optimize_o2(nl, protected_ids: Set[int], stats,
                binary_ok: bool = False, rounds: int = 4) -> bool:
    """The O2 tier: normalize -> constant/identity/absorption folding ->
    tree factoring + XOR extraction (to fixpoint) -> primitive
    selection -> re-emit.  Returns True if the netlist changed."""
    g0 = extract(nl, protected_ids)
    if g0 is None:
        return False
    before = g0.gate_count()

    bld = _Builder(binary_ok)
    mp = _normalize(g0, bld)
    out_map = {k: (net, mp[idx]) for k, (net, idx) in g0.outputs.items()}

    for _ in range(rounds):
        roots = [idx for (_, idx) in out_map.values()]
        repl = _factor_pass(bld, roots)
        new_map = {}
        changed = False
        for k, (net, idx) in out_map.items():
            j = idx
            while j in repl and repl[j] != j:
                j = repl[j]
            if j != idx:
                changed = True
            new_map[k] = (net, j)
        out_map = new_map
        if not changed:
            break

    g1 = _to_gategraph(bld, out_map)
    after = g1.gate_count()
    if after >= before:
        return False
    emit(nl, g1, stats)
    stats.graph_gates_saved += before - after
    return True
