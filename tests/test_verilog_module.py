"""VERILOG_MODULE device tests (reference: 0008.dll verilog module tests
and verilog_module.h semantics)."""

import numpy as np

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.digital.logic import L, H, X
from phy_engine_tpu.models import INPUT, RESISTANCE, make_verilog_module
from phy_engine_tpu.utils import detect_floating_subnets
from phy_engine_tpu.engine.circuit import AnalyzeType


COUNTER_SRC = """
module counter(input clk, input rst_n, output [3:0] q, output carry);
  reg [3:0] cnt;
  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) cnt <= 4'd0;
    else cnt <= cnt + 4'd1;
  end
  assign q = cnt;
  assign carry = (cnt == 4'd15);
endmodule
"""


def wire(nl, *pins):
    n = netops.create_node(nl)
    for inst, pi in pins:
        netops.add_to_node(nl, inst, pi, n)
    return n


def test_verilog_module_counter():
    c = pe.Circuit()
    nl = c.nl
    vm = make_verilog_module(COUNTER_SRC, top="counter")
    netops.add_model(nl, vm)
    clk = netops.add_model(nl, INPUT, {"boolean": float(L)})
    rst = netops.add_model(nl, INPUT, {"boolean": float(L)})
    # pins: clk, rst_n, q(4-bit port -> one pin), carry
    assert [p.name for p in vm.pins] == ["clk", "rst_n", "q", "carry"]
    wire(nl, (clk, 0), (vm, 0))
    wire(nl, (rst, 0), (vm, 1))
    nq = wire(nl, (vm, 2))         # LSB of q drives the pin
    ncarry = wire(nl, (vm, 3))
    c.digital_clk()                # reset active
    rst.set_attribute("boolean", float(H))
    c.digital_clk()
    lsb = []
    for k in range(4):
        clk.set_attribute("boolean", float(H))
        c.digital_clk()
        lsb.append(c.node_digital(nq))
        clk.set_attribute("boolean", float(L))
        c.digital_clk()
    # cnt goes 1,2,3,4 -> LSB pattern 1,0,1,0
    assert lsb == [H, L, H, L]
    assert c.node_digital(ncarry) == L


def test_verilog_module_drives_analog():
    """Verilog output on an analog net becomes a drive request."""
    src = """
module inv(input a, output y);
  assign y = ~a;
endmodule
"""
    c = pe.Circuit()
    nl = c.nl
    vm = make_verilog_module(src, top="inv", Hl=3.3)
    netops.add_model(nl, vm)
    a = netops.add_model(nl, INPUT, {"boolean": float(L)})
    r = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    wire(nl, (a, 0), (vm, 0))
    ny = wire(nl, (vm, 1), (r, 0))     # hybrid output net
    netops.add_to_node(nl, r, 1, nl.ground_node)
    c.set_analyze_type(AnalyzeType.OP)
    assert c.analyze()
    c.digital_clk()                    # ~L = H -> drive 3.3V
    assert c.analyze()
    assert np.isclose(c.node_voltage(ny).real, 3.3, atol=1e-9)
    a.set_attribute("boolean", float(H))
    c.digital_clk()
    assert c.analyze()
    assert np.isclose(c.node_voltage(ny).real, 0.0, atol=1e-9)


def test_floating_subnet_detection():
    from phy_engine_tpu.models import VDC
    c = pe.Circuit()
    nl = c.nl
    v = netops.add_model(nl, VDC, {"V": 1.0})
    r1 = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    r2 = netops.add_model(nl, RESISTANCE, {"r": 1e3})
    n1 = wire(nl, (v, 0), (r1, 0))
    netops.add_to_node(nl, v, 1, nl.ground_node)
    netops.add_to_node(nl, r1, 1, nl.ground_node)
    # floating island: r2 between two fresh nodes
    na = wire(nl, (r2, 0))
    nb = wire(nl, (r2, 1))
    subnets = detect_floating_subnets(nl)
    assert len(subnets) == 1
    assert {id(n) for n in subnets[0]} == {id(na), id(nb)}
