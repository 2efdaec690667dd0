"""One-hot FSM don't-care inference (pe_synth.h DC-mining tier's FSM
role, generalized to any constant-coded state register).

A register whose every assignment is a compile-time constant can only
hold values from that constant set (plus its reset value); binary
minterms outside the set are don't-cares for cones reading >=2 of its
bits.  Reference: pe_synth.h optimize_infer_dc tier."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from conformance import run_case  # noqa: E402

_SRC = r"""
module fsm(input clk, input rst_n, input go, input stop,
           output reg [3:0] led);
  reg [3:0] st;
  localparam S_IDLE=4'b0001, S_RUN=4'b0010, S_WAIT=4'b0100,
             S_DONE=4'b1000;
  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) st <= S_IDLE;
    else case (st)
      S_IDLE: if (go) st <= S_RUN;
      S_RUN:  if (stop) st <= S_WAIT; else st <= S_DONE;
      S_WAIT: st <= S_DONE;
      S_DONE: st <= S_IDLE;
      default: st <= S_IDLE;
    endcase
  end
  always @* begin
    case (st)
      S_IDLE: led = 4'h1;
      S_RUN:  led = 4'h3;
      S_WAIT: led = 4'h7;
      S_DONE: led = 4'hf;
      default: led = 4'h0;
    endcase
  end
endmodule
"""


def _synth(level, binok, tag=True):
    from phy_engine_tpu.verilog.parser import compile_source
    from phy_engine_tpu.verilog.elaborate import (build_design,
                                                  find_module, elaborate)
    from phy_engine_tpu.verilog import synth as S
    import phy_engine_tpu as pe
    import phy_engine_tpu.netlist.operations as netops
    from phy_engine_tpu.models import INPUT

    saved = S._tag_fsm_bit
    if not tag:
        S._tag_fsm_bit = lambda *a, **k: None
    try:
        design = build_design(compile_source(_SRC))
        topm = find_module(design, "fsm")
        inst = elaborate(design, topm)
        nl = pe.Circuit().nl
        port_nets = {}
        for pname in topm.ports:
            sig = inst.signals[pname]
            nets = [netops.create_node(nl) for _ in range(sig.width)]
            port_nets[pname] = nets
            if sig.decl.direction == "input":
                for n in nets:
                    m = netops.add_model(nl, INPUT, {"boolean": 2.0})
                    netops.add_to_node(nl, m, 0, n)
        S.synthesize_to_netlist(
            nl, design, inst, port_nets,
            S.SynthOptions(opt_level=level, assume_binary_inputs=binok))
    finally:
        S._tag_fsm_bit = saved
    gates = sum(1 for m in nl.live_models()
                if m.mdef.digital_op not in ("INPUT", "OUTPUT"))
    return gates, getattr(nl, "_fsm_states", None)


def test_reachable_states_detected():
    _gates, fs = _synth(1, False)
    assert fs is not None and list(fs.values()) == [[1, 2, 4, 8]]


def test_fsm_dc_shrinks_o3():
    with_dc, _ = _synth(3, True, tag=True)
    without_dc, _ = _synth(3, True, tag=False)
    assert with_dc < without_dc, (with_dc, without_dc)


def test_fsm_dc_bit_exact():
    err = run_case(_SRC, "fsm", cycles=24, seed=5)
    assert err is None, err


def test_counter_register_not_tagged():
    """state <= state + 1 is non-constant: no tag, no DC."""
    src = r"""
module ctr(input clk, input rst_n, output reg [3:0] q);
  always @(posedge clk or negedge rst_n)
    if (!rst_n) q <= 0; else q <= q + 4'd1;
endmodule
"""
    from phy_engine_tpu.verilog.parser import compile_source
    from phy_engine_tpu.verilog.elaborate import (build_design,
                                                  find_module, elaborate)
    from phy_engine_tpu.verilog import synth as S
    import phy_engine_tpu as pe
    import phy_engine_tpu.netlist.operations as netops
    from phy_engine_tpu.models import INPUT

    design = build_design(compile_source(src))
    topm = find_module(design, "ctr")
    inst = elaborate(design, topm)
    nl = pe.Circuit().nl
    port_nets = {}
    for pname in topm.ports:
        sig = inst.signals[pname]
        nets = [netops.create_node(nl) for _ in range(sig.width)]
        port_nets[pname] = nets
        if sig.decl.direction == "input":
            for n in nets:
                m = netops.add_model(nl, INPUT, {"boolean": 2.0})
                netops.add_to_node(nl, m, 0, n)
    S.synthesize_to_netlist(nl, design, inst, port_nets,
                            S.SynthOptions(opt_level=1))
    assert not getattr(nl, "_fsm_states", None)
