"""SAR ADC mixed-signal integration (test/0028.16b_adc analogue).

An 8-bit successive-approximation ADC: synthesized Verilog SAR logic
clocks against an analog R-2R DAC built from digital-drive branches,
with a comparator closing the loop — exercising the full analog/digital
alternation contract (analyze() <-> digital_clk()) end to end.
"""

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import (RESISTANCE, VDC, INPUT, COMPARATOR)
from phy_engine_tpu.engine.circuit import AnalyzeType
from phy_engine_tpu.verilog import (compile_source, build_design, elaborate,
                                    find_module)
from phy_engine_tpu.verilog.synth import synthesize_to_netlist, SynthOptions

SAR_SRC = """
module sar8(input clk, input rst_n, input cmp,
            output reg [7:0] dac, output reg [7:0] code,
            output reg done);
  reg [3:0] step;
  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) begin
      dac <= 8'h80;
      code <= 8'h00;
      step <= 4'd0;
      done <= 1'b0;
    end else if (!done) begin
      if (cmp) code <= code | (8'h80 >> step);
      if (step == 4'd7) begin
        done <= 1'b1;
        dac <= cmp ? dac : (dac & ~(8'h80 >> step));
      end else begin
        dac <= (cmp ? dac : (dac & ~(8'h80 >> step)))
               | (8'h40 >> step);
        step <= step + 4'd1;
      end
    end
  end
endmodule
"""

R = 10e3
VREF = 5.0


def build_adc():
    mods = compile_source(SAR_SRC)
    design = build_design(mods)
    topm = find_module(design, "sar8")
    inst = elaborate(design, topm)

    c = pe.Circuit()
    nl = c.nl
    pn = {p: [netops.create_node(nl)
              for _ in range(inst.signals[p].width)]
          for p in topm.ports}
    clk = netops.add_model(nl, INPUT, {"boolean": 0.0})
    rst = netops.add_model(nl, INPUT, {"boolean": 0.0})
    netops.add_to_node(nl, clk, 0, pn["clk"][0])
    netops.add_to_node(nl, rst, 0, pn["rst_n"][0])

    # analog side BEFORE synthesis so dac port nets count as hybrid:
    # R-2R ladder, LSB-first: ladder node l_i; bit node = pn['dac'][i]
    vin = netops.add_model(nl, VDC, {"V": 0.0})
    n_vin = netops.create_node(nl)
    netops.add_to_node(nl, vin, 0, n_vin)
    netops.add_to_node(nl, vin, 1, nl.ground_node)

    ladder = [netops.create_node(nl) for _ in range(8)]
    # terminator 2R to ground at the LSB end
    rt_ = netops.add_model(nl, RESISTANCE, {"r": 2 * R})
    netops.add_to_node(nl, rt_, 0, ladder[0])
    netops.add_to_node(nl, rt_, 1, nl.ground_node)
    for i in range(8):
        r2 = netops.add_model(nl, RESISTANCE, {"r": 2 * R})
        netops.add_to_node(nl, r2, 0, pn["dac"][i])
        netops.add_to_node(nl, r2, 1, ladder[i])
        if i < 7:
            r1 = netops.add_model(nl, RESISTANCE, {"r": R})
            netops.add_to_node(nl, r1, 0, ladder[i])
            netops.add_to_node(nl, r1, 1, ladder[i + 1])
    n_dac = ladder[7]

    cmp_ = netops.add_model(nl, COMPARATOR)
    netops.add_to_node(nl, cmp_, 0, n_vin)
    netops.add_to_node(nl, cmp_, 1, n_dac)
    netops.add_to_node(nl, cmp_, 2, pn["cmp"][0])

    synthesize_to_netlist(nl, design, inst, pn, SynthOptions(opt_level=1))
    c.set_analyze_type(AnalyzeType.OP)
    return c, clk, rst, vin, pn, n_dac


def convert(c, clk, rst, vin, pn, n_dac, v_in):
    vin.set_attribute("V", v_in)
    # reset pulse
    rst.set_attribute("boolean", 0.0)
    c.analyze()
    c.digital_clk()
    for lv in (1.0, 0.0):
        clk.set_attribute("boolean", lv)
        c.digital_clk()
    rst.set_attribute("boolean", 1.0)
    c.digital_clk()
    c.analyze()
    c.digital_clk()              # comparator sees dac=0x80 trial

    for cycle in range(9):
        clk.set_attribute("boolean", 1.0)
        c.digital_clk()          # SAR clocks in comparator decision
        c.analyze()              # DAC settles with the new trial code
        clk.set_attribute("boolean", 0.0)
        c.digital_clk()          # comparator re-samples settled DAC
        c.analyze()
        done = c.node_digital(pn["done"][0])
        if done == 1:
            break
    assert done == 1, "conversion never finished"
    code = sum((c.node_digital(n) & 1) << i
               for i, n in enumerate(pn["code"]))
    return code, c.node_voltage(n_dac).real


def test_sar_adc_converges():
    c, clk, rst, vin, pn, n_dac = build_adc()
    lsb = VREF / 256.0
    for v_in in (0.7, 1.23, 2.5, 3.9, 4.97):
        code, vdac = convert(c, clk, rst, vin, pn, n_dac, v_in)
        ideal = v_in / lsb
        # SAR binary search lands within 1 LSB of the ideal code
        assert abs(code - ideal) <= 1.0 + 1e-9, (v_in, code, ideal)


def test_sar_adc_rails():
    c, clk, rst, vin, pn, n_dac = build_adc()
    code0, _ = convert(c, clk, rst, vin, pn, n_dac, -0.5)
    assert code0 == 0
    code1, _ = convert(c, clk, rst, vin, pn, n_dac, 5.5)
    assert code1 == 255
