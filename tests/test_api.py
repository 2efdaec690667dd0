"""User-API tests mirroring the reference Python package usage
(python/phy_engine: Circuit from element codes + wire quads,
NetlistBuilder, VerilogRuntime)."""

import numpy as np
import pytest

from phy_engine_tpu.api import (Circuit, Element, Wire, ElementCode,
                                AnalyzeType, DigitalState, NetlistBuilder,
                                VerilogRuntime, PROPERTY_ARITY,
                                get_verilog_synth_config,
                                set_verilog_synth_config)
from phy_engine_tpu.engine.circuit import AnalyzeType


def test_element_code_divider():
    # elements: 0=GROUND, 1=VDC(4V), 2=R1k, 3=R3k
    elements = [
        Element(ElementCode.GROUND),
        Element(ElementCode.VDC, (4.0,)),
        Element(ElementCode.RESISTOR, (1000.0,)),
        Element(ElementCode.RESISTOR, (3000.0,)),
    ]
    wires = [
        Wire(1, 0, 2, 0),      # VDC+ -> R1.A
        Wire(2, 1, 3, 0),      # R1.B -> R2.A
        Wire(3, 1, 0, 0),      # R2.B -> GND
        Wire(1, 1, 0, 0),      # VDC- -> GND
    ]
    c = Circuit(elements, wires)
    assert c.component_count == 3
    c.set_analyze_type(AnalyzeType.DC)
    s = c.analyze_and_sample()
    # component 0 = VDC: pin + at 4V
    vdc = s.components[0]
    assert np.isclose(vdc.pin_voltages[0], 4.0)
    assert np.isclose(vdc.branch_currents[0], -1e-3)
    r2 = s.components[2]
    assert np.isclose(r2.pin_voltages[0], 3.0)


def test_element_code_noise():
    """api.Circuit.noise — element-index surface over the adjoint
    noise sweep (engine extension; no reference analogue)."""
    K_B, T0 = 1.380649e-23, 300.15
    r1, r2 = 4.7e3, 1.2e3
    elements = [
        Element(ElementCode.GROUND),
        Element(ElementCode.VDC, (1.0,)),
        Element(ElementCode.RESISTOR, (r1,)),
        Element(ElementCode.RESISTOR, (r2,)),
    ]
    wires = [
        Wire(1, 0, 2, 0),
        Wire(2, 1, 3, 0),
        Wire(3, 1, 0, 0),
        Wire(1, 1, 0, 0),
    ]
    c = Circuit(elements, wires)
    c.set_ac_omega(2 * np.pi * 1e4)
    res = c.noise(2, out_pin=1, src_element=1)
    rp = r1 * r2 / (r1 + r2)
    assert np.allclose(res.onoise_psd, 4 * K_B * T0 * rp, rtol=1e-9)
    gain = r2 / (r1 + r2)
    assert np.allclose(res.gain2, gain * gain, rtol=1e-9)


def test_digital_codes_and_gate():
    elements = [
        Element(ElementCode.DIGITAL_INPUT, (float(DigitalState.H),)),
        Element(ElementCode.DIGITAL_INPUT, (float(DigitalState.H),)),
        Element(ElementCode.DIGITAL_AND),
        Element(ElementCode.DIGITAL_OUTPUT),
    ]
    wires = [
        Wire(0, 0, 2, 0),
        Wire(1, 0, 2, 1),
        Wire(2, 2, 3, 0),
    ]
    c = Circuit(elements, wires)
    c.digital_clk()
    s = c.sample()
    assert s.components[3].digital_states[0] == DigitalState.H
    c.set_model_digital(1, DigitalState.L)
    c.digital_clk()
    s = c.sample()
    assert s.components[3].digital_states[0] == DigitalState.L


def test_builder_rc():
    b = NetlistBuilder()
    gnd = b.add_element(ElementCode.GROUND, name="gnd")
    v = b.add_element(ElementCode.VDC, (2.0,), name="v1")
    r1 = b.add_element(ElementCode.RESISTOR, (1e3,), name="r1")
    r2 = b.add_element(ElementCode.RESISTOR, (1e3,), name="r2")
    top = b.create_node("top")
    mid = b.create_node("mid")
    b.add_to_node(v, 0, top)
    b.add_to_node(r1, 0, top)
    b.add_to_node(r1, 1, mid)
    b.add_to_node(r2, 0, mid)
    b.connect_pins(r2.pin(1), gnd.pin(0))
    b.connect_pins(v.pin(1), gnd.pin(0))
    c = b.build()
    c.set_analyze_type(AnalyzeType.DC)
    s = c.analyze_and_sample()
    # r2 pin0 (mid node) at 1V
    r2s = s.components[2]
    assert np.isclose(r2s.pin_voltages[0], 1.0)


def test_verilog_runtime():
    src = """
module counter(input clk, input rst_n, output [3:0] q);
  reg [3:0] cnt;
  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) cnt <= 4'd0;
    else cnt <= cnt + 4'd1;
  end
  assign q = cnt;
endmodule
"""
    vr = VerilogRuntime(src, top="counter")
    assert vr.top_module_name == "counter"
    ports = vr.ports()
    assert [p.name for p in ports] == ["clk", "rst_n", "q"]
    assert ports[2].width == 4
    vr.set_value("rst_n", 0)
    vr.set_value("clk", 0)
    vr.tick()
    vr.set_value("rst_n", 1)
    vr.tick()
    for k in range(1, 4):
        vr.set_value("clk", 1)
        vr.tick()
        assert vr.get_value("q") == k
        vr.set_value("clk", 0)
        vr.tick()
    vr.reset()
    assert not vr.is_known("q")


def test_verilog_module_element():
    src = """
module inv(input a, output y);
  assign y = ~a;
endmodule
"""
    elements = [
        Element(ElementCode.DIGITAL_INPUT, (float(DigitalState.L),)),
        Element(ElementCode.VERILOG_MODULE, (), verilog_source=src,
                verilog_top="inv"),
        Element(ElementCode.DIGITAL_OUTPUT),
    ]
    wires = [Wire(0, 0, 1, 0), Wire(1, 1, 2, 0)]
    c = Circuit(elements, wires)
    c.digital_clk()
    s = c.sample()
    assert s.components[2].digital_states[0] == DigitalState.H


def test_verilog_netlist_element():
    src = """
module xnor2(input a, input b, output y);
  assign y = ~(a ^ b);
endmodule
"""
    elements = [
        Element(ElementCode.DIGITAL_INPUT, (float(DigitalState.H),)),
        Element(ElementCode.DIGITAL_INPUT, (float(DigitalState.H),)),
        Element(ElementCode.VERILOG_NETLIST, (), verilog_source=src,
                verilog_top="xnor2"),
        Element(ElementCode.DIGITAL_OUTPUT),
    ]
    wires = [Wire(0, 0, 2, 0), Wire(1, 0, 2, 1), Wire(2, 2, 3, 0)]
    c = Circuit(elements, wires)
    c.digital_clk()
    s = c.sample()
    assert s.components[3].digital_states[0] == DigitalState.H


def test_synth_config_globals():
    prev = get_verilog_synth_config().opt_level
    set_verilog_synth_config(opt_level=3)
    assert get_verilog_synth_config().opt_level == 3
    set_verilog_synth_config(opt_level=prev)


def test_property_arity_table():
    assert PROPERTY_ARITY[int(ElementCode.PN_JUNCTION)] == 9
    assert PROPERTY_ARITY[int(ElementCode.PULSE)] == 7
    assert PROPERTY_ARITY[int(ElementCode.GROUND)] == 0


def test_element_code_sweeps_and_four():
    """dc_sweep/temp_sweep/monte_carlo/four on the element-index
    surface (engine extensions; keeps the two user surfaces in
    parity)."""
    r1, r2, e = 2e3, 3e3, 2.0
    elements = [
        Element(ElementCode.GROUND),
        Element(ElementCode.VDC, (e,)),
        Element(ElementCode.RESISTOR, (r1,)),
        Element(ElementCode.RESISTOR, (r2,)),
    ]
    wires = [
        Wire(1, 0, 2, 0),
        Wire(2, 1, 3, 0),
        Wire(3, 1, 0, 0),
        Wire(1, 1, 0, 0),
    ]
    c = Circuit(elements, wires)
    vals = np.linspace(0.0, 4.0, 9)
    res = c.dc_sweep(1, "V", vals, out_element=2, out_pin=1)
    assert res.ok.all()
    assert np.allclose(res.out, vals * r2 / (r1 + r2), rtol=1e-12)
    ts = c.temp_sweep([0.0, 27.0, 100.0], out_element=2, out_pin=1)
    assert ts.ok.all()
    mc = c.monte_carlo({"R": {"r": 0.1}}, n=8)
    assert mc.ok.all()
