"""Multi-module 16-bit CPU (test/0026.8086 tier analogue).

Own-design accumulator machine split across modules (ALU, 8x16
register file, 16-word RAM, control) — hierarchical synthesis with
memories, cross-checked Python ISS vs behavioral vs gates.
"""

import numpy as np

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import INPUT
from phy_engine_tpu.verilog import (compile_source, build_design, elaborate,
                                    find_module)
from phy_engine_tpu.verilog.simulate import Runtime, Val, settle
from phy_engine_tpu.verilog.simulate import simulate as bsim
from phy_engine_tpu.verilog.synth import synthesize_to_netlist, SynthOptions

MCU_TEMPLATE = """
module alu16(input [15:0] a, input [15:0] b, input [2:0] op,
             output reg [15:0] y);
  always @* begin
    case (op)
      3'd0: y = a + b;
      3'd1: y = a - b;
      3'd2: y = a & b;
      3'd3: y = a | b;
      3'd4: y = a ^ b;
      3'd5: y = a << b[3:0];
      3'd6: y = a >> b[3:0];
      default: y = b;
    endcase
  end
endmodule

module regfile8(input clk, input we, input [2:0] wa, input [15:0] wd,
                input [2:0] ra1, input [2:0] ra2,
                output [15:0] rd1, output [15:0] rd2);
  reg [15:0] regs [7:0];
  always @(posedge clk) if (we) regs[wa] <= wd;
  assign rd1 = regs[ra1];
  assign rd2 = regs[ra2];
endmodule

module ram16(input clk, input we, input [3:0] addr, input [15:0] wd,
             output [15:0] rd);
  reg [15:0] store [15:0];
  always @(posedge clk) if (we) store[addr] <= wd;
  assign rd = store[addr];
endmodule

module pe_mcu16(input clk, input rst_n, output done,
                output [15:0] result);
  reg [7:0] pc;
  reg halted;

  reg [15:0] instr;
  always @* begin
    case (pc[5:0])
__ROM__
      default: instr = 16'hF000;
    endcase
  end

  wire [3:0] opc = instr[15:12];
  wire [2:0] rd = instr[11:9];
  wire [2:0] rs = instr[8:6];
  wire [5:0] imm6 = instr[5:0];
  wire [15:0] imm_ext = {10'd0, imm6};
  wire [15:0] simm = {{10{imm6[5]}}, imm6};

  wire [15:0] rv1, rv2;
  // rd is also the first source (accumulator style)
  regfile8 rf(.clk(clk), .we(rf_we), .wa(rd), .wd(rf_wd),
              .ra1(rd), .ra2(rs), .rd1(rv1), .rd2(rv2));

  wire is_alu = (opc >= 4'd1) & (opc <= 4'd7);
  wire [15:0] alu_y;
  alu16 alu(.a(rv1), .b(rv2), .op(opc[2:0] - 3'd1), .y(alu_y));

  wire is_ldi = (opc == 4'd0);
  wire is_ld  = (opc == 4'd8);
  wire is_st  = (opc == 4'd9);
  wire is_beqz = (opc == 4'd10);
  wire is_jmp = (opc == 4'd11);
  wire is_halt = (opc == 4'd15);

  wire [15:0] addr16 = rv2 + imm_ext;
  wire [15:0] mem_rd;
  ram16 ram(.clk(clk), .we(is_st & ~halted), .addr(addr16[3:0]),
            .wd(rv1), .rd(mem_rd));

  wire rf_we = (is_ldi | is_alu | is_ld) & ~halted;
  wire [15:0] rf_wd = is_ldi ? imm_ext : is_ld ? mem_rd : alu_y;

  wire take = (is_beqz & (rv2 == 16'd0)) | is_jmp;
  wire [7:0] next_pc = take ? (pc + simm[7:0]) : (pc + 8'd1);

  assign done = halted;
  assign result = rv1;   // reads regs[rd of current instr]; HALT sets rd

  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) begin
      pc <= 8'd0;
      halted <= 1'b0;
    end else if (!halted) begin
      if (is_halt) halted <= 1'b1;
      else pc <= next_pc;
    end
  end
endmodule
"""


def asm(program):
    """[(mnemonic, rd, rs, imm)] -> words; imm may be a label name."""
    ops = {"ldi": 0, "add": 1, "sub": 2, "and": 3, "or": 4, "xor": 5,
           "shl": 6, "shr": 7, "ld": 8, "st": 9, "beqz": 10, "jmp": 11,
           "halt": 15}
    labels = {}
    pc = 0
    for item in program:
        if isinstance(item, str):
            labels[item] = pc
        else:
            pc += 1
    words = []
    pc = 0
    for item in program:
        if isinstance(item, str):
            continue
        mn, rd, rs, imm = item
        if isinstance(imm, str):
            imm = labels[imm] - pc      # pc-relative branch offset
        words.append((ops[mn] << 12) | ((rd & 7) << 9) | ((rs & 7) << 6)
                     | (imm & 0x3F))
        pc += 1
    return words


class ISS:
    """Independent instruction-set simulator."""

    def __init__(self, rom):
        self.rom = rom
        self.pc = 0
        self.regs = [0] * 8
        self.mem = [0] * 16
        self.halted = False
        self.result_reg = 0

    def step(self):
        if self.halted:
            return
        w = self.rom[self.pc] if self.pc < len(self.rom) else 0xF000
        opc, rd, rs = w >> 12, (w >> 9) & 7, (w >> 6) & 7
        imm = w & 0x3F
        simm = imm - 64 if imm & 0x20 else imm
        a, b = self.regs[rd], self.regs[rs]
        nxt = self.pc + 1
        if opc == 0:
            self.regs[rd] = imm
        elif 1 <= opc <= 7:
            f = [lambda: (a + b), lambda: (a - b), lambda: a & b,
                 lambda: a | b, lambda: a ^ b,
                 lambda: a << (b & 15), lambda: a >> (b & 15)][opc - 1]
            self.regs[rd] = f() & 0xFFFF
        elif opc == 8:
            self.regs[rd] = self.mem[(b + imm) & 15]
        elif opc == 9:
            self.mem[(b + imm) & 15] = a
        elif opc == 10:
            if b == 0:
                nxt = self.pc + simm
        elif opc == 11:
            nxt = self.pc + simm
        elif opc == 15:
            self.halted = True
            self.result_reg = rd
            return
        self.pc = nxt & 0xFF

    def result(self):
        return self.regs[self.result_reg]


def program():
    """sum 1..10 -> store/load through RAM -> xor-fold -> halt."""
    return [
        ("ldi", 0, 0, 0),        # r0 = 0 (hardware regs power up X)
        ("ldi", 1, 0, 0),        # r1 = 0   (sum)
        ("ldi", 2, 0, 10),       # r2 = 10  (counter)
        ("ldi", 3, 0, 1),        # r3 = 1
        "loop",
        ("beqz", 0, 2, "end"),   # while r2 != 0
        ("add", 1, 2, 0),        # r1 += r2
        ("sub", 2, 3, 0),        # r2 -= 1
        ("jmp", 0, 0, "loop"),
        "end",
        ("st", 1, 0, 3),         # mem[3] = r1 (=55)
        ("ld", 4, 0, 3),         # r4 = mem[3]
        ("shl", 4, 3, 0),        # r4 <<= 1  (110)
        ("ldi", 5, 0, 7),
        ("xor", 4, 5, 0),        # r4 ^= 7   (105)
        ("st", 4, 0, 9),         # mem[9] = r4
        ("ld", 6, 0, 9),         # r6 = 105
        ("add", 6, 1, 0),        # r6 += 55 -> 160
        ("halt", 6, 0, 0),       # result = r6
    ]


def test_mcu16_iss():
    rom = asm(program())
    iss = ISS(rom)
    for _ in range(200):
        iss.step()
        if iss.halted:
            break
    assert iss.halted and iss.result() == 160


def _rom_case(words):
    halt = 0xF000
    lines = []
    for i in range(64):
        w = words[i] if i < len(words) else halt
        lines.append(f"      6'd{i}: instr = 16'h{w:04X};")
    return "\n".join(lines)


def _src():
    return MCU_TEMPLATE.replace("__ROM__", _rom_case(asm(program())))


def test_mcu16_behavioral_and_gates():
    src = _src()
    mods = compile_source(src)
    design = build_design(mods)
    topm = find_module(design, "pe_mcu16")

    rt = Runtime(elaborate(design, topm))
    rt.values["clk"] = Val.from_int(0, 1)
    rt.values["rst_n"] = Val.from_int(0, 1)
    settle(rt, 0)

    inst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    pn = {p: [netops.create_node(nl)
              for _ in range(inst.signals[p].width)]
          for p in topm.ports}
    clk = netops.add_model(nl, INPUT, {"boolean": 0.0})
    rstm = netops.add_model(nl, INPUT, {"boolean": 0.0})
    netops.add_to_node(nl, clk, 0, pn["clk"][0])
    netops.add_to_node(nl, rstm, 0, pn["rst_n"][0])
    report = synthesize_to_netlist(nl, design, inst, pn,
                                   SynthOptions(opt_level=1))
    assert report.ff_count >= 8 * 16 + 16 * 16 + 9

    tick = [0]

    def half(level, rst):
        rt.values["clk"] = Val.from_int(level, 1)
        rt.values["rst_n"] = Val.from_int(rst, 1)
        tick[0] += 1
        bsim(rt, tick[0])
        clk.set_attribute("boolean", float(level))
        rstm.set_attribute("boolean", float(rst))
        c.digital_clk()

    c.digital_clk()
    half(1, 0)
    half(0, 0)
    half(0, 1)

    iss = ISS(asm(program()))
    done = False
    for cyc in range(120):
        half(1, 1)
        half(0, 1)
        iss.step()
        b_done = rt.values["done"].to_int()
        g_done = c.node_digital(pn["done"][0])
        assert g_done == b_done, (cyc, g_done, b_done)
        assert b_done == int(iss.halted), cyc
        g_res = sum((c.node_digital(n) & 1) << i
                    for i, n in enumerate(pn["result"]))
        b_res = rt.values["result"].to_int()
        assert g_res == b_res, (cyc, hex(g_res), hex(b_res))
        if b_done:
            done = True
            break
    assert done
    assert b_res == 160
    assert iss.result() == 160
