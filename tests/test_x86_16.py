"""Reference 16-bit multi-module CPU as data (test/0026.8086 role).

All 19 Verilog modules of the reference's "8086" test (pc8, ROM, IR,
decode, control, regfile, mux, the alu16 block family, flag regs) are
compiled together under an own-written top that reproduces the
driver's wiring (x86_16_multi_module.cc:120-230), then:

* behavioral simulation runs the baked-in ROM program to HLT and must
  leave r0 == 0 and r1 == 7 (the driver's assertions, :404-414);
* the synthesized gate netlist clocks BIT-EXACT against the
  behavioral run on every observable output, every cycle.
"""

import os

import numpy as np
import pytest

_DIR = "/root/reference/test/0026.8086"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_DIR), reason="reference 0026 sources missing")

TOP_SRC = """
module cpu16_top(input clk, input rst_n, output halt,
                 output [15:0] dbg_r0, output [15:0] dbg_r1,
                 output [15:0] dbg_r2, output [15:0] dbg_r3);
  wire [7:0] pc_q, pc_next;
  wire pc_we, reg_we, alu_b_sel, fwz, fwc, fws;
  wire [15:0] rom_d, ir_q, imm16, rdata_a, rdata_b, alu_b, alu_y;
  wire [3:0] opcode;
  wire [1:0] rdst, rsrc, waddr, ra, rb;
  wire [7:0] imm8;
  wire [2:0] alu_op;
  wire zf, cf, sf, flag_z, flag_c, flag_s;

  pc8 u_pc(clk, rst_n, pc_we, pc_next, pc_q);
  rom256x16 u_rom(pc_q, rom_d);
  ir16 u_ir(clk, rst_n, rom_d, ir_q);
  decode16 u_dec(ir_q, opcode, rdst, rsrc, imm8);
  control16 u_ctl(opcode, rdst, rsrc, imm8, pc_q,
                  flag_z, flag_c, flag_s,
                  pc_next, pc_we, reg_we, waddr, ra, rb, alu_b_sel,
                  fwz, fwc, fws, alu_op, halt);
  imm_ext8_to_16 u_imm(imm8, imm16);
  regfile4x16 u_rf(clk, rst_n, reg_we, waddr, alu_y, ra, rb,
                   rdata_a, rdata_b, dbg_r0, dbg_r1, dbg_r2, dbg_r3);
  mux16 u_mux(alu_b_sel, imm16, rdata_b, alu_b);
  alu16 u_alu(alu_op, rdata_a, alu_b, alu_y, zf, cf, sf);
  flag1 u_fz(clk, rst_n, fwz, zf, flag_z);
  flag1 u_fc(clk, rst_n, fwc, cf, flag_c);
  flag1 u_fs(clk, rst_n, fws, sf, flag_s);
endmodule
"""

_FILES = ("pc8.v", "rom256x16.v", "ir16.v", "decode16.v",
          "control16.v", "imm_ext8_to_16.v", "regfile4x16.v",
          "mux16.v", "flag1.v", "alu16_addsub.v", "alu16_and.v",
          "alu16_or.v", "alu16_xor.v", "alu16_mov.v", "alu16_shl.v",
          "alu16_shr.v", "alu16_sub_decode.v", "alu16_select.v",
          "alu16.v")


def _source():
    parts = [open(os.path.join(_DIR, f)).read() for f in _FILES]
    return "\n".join(parts) + TOP_SRC


def test_x86_16_program_runs_to_halt_bit_exact():
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                              SynthOptions)
    from phy_engine_tpu.verilog.simulate import Runtime, settle
    from phy_engine_tpu.verilog.simulate import simulate as bsim
    from phy_engine_tpu.verilog.fourstate import Val

    mods = compile_source(_source())
    design = build_design(mods)
    topm = find_module(design, "cpu16_top")
    inst = elaborate(design, topm)
    rt = Runtime(inst)
    settle(rt, 0)

    c = pe.Circuit()
    nl = c.nl
    pn = {}
    im = {}
    for pname in topm.ports:
        sig = inst.signals[pname]
        nets = [netops.create_node(nl) for _ in range(sig.width)]
        pn[pname] = nets
        if sig.decl.direction == "input":
            m = netops.add_model(nl, INPUT, {"boolean": 0.0})
            netops.add_to_node(nl, m, 0, nets[0])
            im[pname] = m
    rep = synthesize_to_netlist(nl, design, inst, pn,
                                SynthOptions(opt_level=1))
    assert rep.ff_count >= 90          # pc + ir + regfile + flags

    tick = [0]

    def set_in(name, v):
        im[name].set_attribute("boolean", float(v))
        rt.values[name] = Val.from_int(v, 1)

    def step():
        c.digital_clk()
        tick[0] += 1
        bsim(rt, tick[0])

    def read(p):
        beh = rt.values[p]
        g = 0
        gx = 0
        for i, n in enumerate(pn[p]):
            code = c.node_digital(n)
            if code in (0, 1):
                g |= code << i
            else:
                gx |= 1 << i
        return (beh.to_int() if beh.known else None), g, gx

    # reset protocol (x86_16_multi_module.cc:342-352): hold reset low,
    # deassert while clk high, then a negedge so the IR latches the
    # first instruction before the first execute posedge
    set_in("rst_n", 0)
    set_in("clk", 0)
    step()
    set_in("clk", 1)
    step()
    set_in("rst_n", 1)
    step()
    set_in("clk", 0)
    step()

    halted_at = None
    for cyc in range(64):
        set_in("clk", 1)
        step()
        set_in("clk", 0)
        step()
        for p in ("halt", "dbg_r0", "dbg_r1", "dbg_r2", "dbg_r3"):
            b, g, gx = read(p)
            assert gx == 0, (cyc, p, hex(gx))
            assert b == g, (cyc, p, b, g)
        if read("halt")[0] == 1:
            halted_at = cyc
            break
    assert halted_at is not None, "CPU did not reach HLT"
    # driver's final assertions (:404-414): r0 == 0, r1 == 7
    assert read("dbg_r0")[0] == 0x0000
    assert read("dbg_r1")[0] == 0x0007
