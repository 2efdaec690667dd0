"""Shared helper for synthesis-optimization tests: cross-check a
synthesized netlist (with a given SynthOptions) against the behavioral
simulator on the same vectors, returning the synth report."""

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.digital.logic import X
from phy_engine_tpu.models import INPUT
from phy_engine_tpu.verilog import (compile_source, build_design, elaborate,
                                    find_module)
from phy_engine_tpu.verilog.simulate import Runtime, Val, settle
from phy_engine_tpu.verilog.simulate import simulate as bsim
from phy_engine_tpu.verilog.synth import synthesize_to_netlist


def crosscheck_opt(src, top, vectors, out_names, opt,
                   ticks_per_vector=1):
    mods = compile_source(src)
    design = build_design(mods)
    topm = find_module(design, top)
    inst = elaborate(design, topm)

    c = pe.Circuit()
    nl = c.nl
    port_nets = {}
    in_models = {}
    out_nodes = {}
    for pname in topm.ports:
        sig = inst.signals[pname]
        nets = [netops.create_node(nl) for _ in range(sig.width)]
        port_nets[pname] = nets
        if sig.decl.direction == "input":
            models = []
            for n in nets:
                m = netops.add_model(nl, INPUT, {"boolean": float(X)})
                netops.add_to_node(nl, m, 0, n)
                models.append(m)
            in_models[pname] = models
        else:
            out_nodes[pname] = nets
    report = synthesize_to_netlist(nl, design, inst, port_nets, opt)

    rt = Runtime(inst)
    settle(rt, 0)
    tick = 0
    for vec in vectors:
        for name, value in vec.items():
            for i, m in enumerate(in_models[name]):
                m.set_attribute("boolean", float((value >> i) & 1))
            rt.values[name] = Val.from_int(value, rt.values[name].width)
        for _ in range(ticks_per_vector):
            c.digital_clk()
            tick += 1
            bsim(rt, tick)
        for oname in out_names:
            got = 0
            for i, n in enumerate(out_nodes[oname]):
                code = c.node_digital(n)
                assert code in (0, 1), (vec, oname, i, code)
                got |= code << i
            expect = rt.values[oname].to_int()
            assert got == expect, (vec, oname, got, expect)
    return report
