"""Plain-argument glue for the embeddable C ABI (native/pe_capi.c).

Role parity: the reference ships ``dll_api.h`` + ``dll_main.cpp`` — a
C surface over the engine for embedders (PhysicsLab, wasm hosts).
Here the engine is Python/JAX, so the C shim embeds CPython and calls
THIS module; every function takes/returns only ints, floats, strings
and flat lists so the C marshaling stays trivial.

Covered subset (dll_api.h:143-316): create_circuit / create_circuit_ex
(element codes + wire quads + positional property stream),
analyze-type/TR/AC control, analyze, digital_clk, set_model_digital,
sample layouts + samples (4-state u8), and the verilog_runtime_*
family.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from . import api


def last_api_version() -> int:
    return 1


def props_needed(codes: Sequence[int]) -> int:
    """Exact positional property count for an element stream."""
    n = 0
    for code in codes:
        n += api.PROPERTY_ARITY.get(int(code), 0)
    return n


def _consume_properties(codes: Sequence[int], props: Sequence[float],
                        texts: Optional[Sequence[str]] = None,
                        src_idx: Optional[Sequence[int]] = None,
                        top_idx: Optional[Sequence[int]] = None):
    elements = []
    p = 0
    for k, code in enumerate(codes):
        code = int(code)
        if code == 0:
            elements.append(api.Element(api.ElementCode.GROUND))
            continue
        if code in (int(api.ElementCode.VERILOG_MODULE),
                    int(api.ElementCode.VERILOG_NETLIST)):
            if texts is None or src_idx is None:
                raise api.PhyEngineError(
                    "verilog elements need create_circuit_ex")
            src = texts[src_idx[k]]
            top = texts[top_idx[k]] if top_idx is not None and \
                0 <= top_idx[k] < len(texts) else None
            elements.append(api.Element(code, (), verilog_source=src,
                                        verilog_top=top or None))
            continue
        spec = api._CODE_TABLE.get(code)
        if spec is None:
            raise api.PhyEngineError(f"unsupported element code {code}")
        n = len(spec[1])
        elements.append(api.Element(code, tuple(props[p:p + n])))
        p += n
    return elements


def create_circuit(codes: Sequence[int], wires_flat: Sequence[int],
                   props: Sequence[float]):
    """elements + (ele1,pin1,ele2,pin2)* + positional properties ->
    api.Circuit handle."""
    elements = _consume_properties(codes, props)
    wires = [api.Wire(*wires_flat[i:i + 4])
             for i in range(0, len(wires_flat), 4)]
    return api.Circuit(elements, wires)


def create_circuit_ex(codes, wires_flat, props, texts, src_idx,
                      top_idx):
    elements = _consume_properties(codes, props, texts, src_idx,
                                   top_idx)
    wires = [api.Wire(*wires_flat[i:i + 4])
             for i in range(0, len(wires_flat), 4)]
    return api.Circuit(elements, wires)


def circuit_component_count(c) -> int:
    return c.component_count


def circuit_set_analyze_type(c, at: int) -> int:
    c.set_analyze_type(at)
    return 0


def circuit_set_tr(c, t_step: float, t_stop: float) -> int:
    c.set_tr(t_step, t_stop)
    return 0


def circuit_set_ac_omega(c, omega: float) -> int:
    c.set_ac_omega(omega)
    return 0


def circuit_set_temperature(c, t: float) -> int:
    c.set_temperature(t)
    return 0


def circuit_set_model_double_by_name(c, comp: int, name: str,
                                     value: float) -> int:
    c.set_model_double_by_name(comp, name, value)
    return 0


def circuit_set_model_digital(c, comp: int, state: int) -> int:
    c.set_model_digital(comp, state)
    return 0


def circuit_analyze(c) -> int:
    c.analyze()
    return 0


def circuit_digital_clk(c) -> int:
    c.digital_clk()
    return 0


def circuit_sample_layout(c) -> List[List[int]]:
    """[voltage_ord, current_ord, digital_ord] prefix sums,
    each of length comp_size + 1 (dll_api.h:182-192)."""
    def prefix(counts):
        out = [0]
        for n in counts:
            out.append(out[-1] + int(n))
        return out

    v_cnt, c_cnt, d_cnt = c.sample_layout()
    return [prefix(v_cnt), prefix(c_cnt), prefix(d_cnt)]


def circuit_sample_u8(c) -> List[list]:
    """[voltages, currents, digital_codes] flattened in component
    order; digital codes are 4-state 0..3 (circuit_sample_digital_
    state_u8 semantics — the 0/1-only variant clamps in C)."""
    s = c.sample()
    volts: List[float] = []
    curs: List[float] = []
    digs: List[int] = []
    for comp in s.components:
        volts.extend(float(v) for v in comp.pin_voltages)
        curs.extend(float(x) for x in comp.branch_currents)
        digs.extend(int(d) for d in comp.digital_states)
    return [volts, curs, digs]


# -- verilog runtime ---------------------------------------------------------

def verilog_runtime_create(src: str, top: str):
    return api.VerilogRuntime(src, top=top or None)


def verilog_runtime_tick(rt) -> int:
    return rt.tick()


def verilog_runtime_reset(rt) -> int:
    rt.reset()
    return 0


def verilog_runtime_port_count(rt) -> int:
    return len(rt.ports())


def verilog_runtime_port_name(rt, i: int) -> str:
    return rt.ports()[i].name


def verilog_runtime_port_dir(rt, i: int) -> int:
    # dll_api.h port_dir: 0=unknown 1=input 2=output 3=inout
    d = rt.ports()[i].direction
    return {api.VerilogPortDir.INPUT: 1,
            api.VerilogPortDir.OUTPUT: 2,
            api.VerilogPortDir.INOUT: 3}.get(d, 0)


def verilog_runtime_signal_count(rt) -> int:
    return len(rt.signals())


def verilog_runtime_top_module_name(rt) -> str:
    return rt.top_module_name


def verilog_runtime_get_port_state(rt, i: int) -> int:
    return rt.get_state(rt.ports()[i].name)


def verilog_runtime_set_port_state(rt, i: int, code: int) -> int:
    rt.set_state(rt.ports()[i].name, code)
    return 0


def verilog_runtime_get_port_value(rt, i: int) -> int:
    return rt.get_value(rt.ports()[i].name)


def verilog_runtime_set_port_value(rt, i: int, value: int) -> int:
    rt.set_value(rt.ports()[i].name, value)
    return 0
