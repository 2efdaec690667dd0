"""Minimal RV32I assembler for integration tests.

Encodes the standard RISC-V base ISA formats (R/I/S/B/U/J) from the
published spec — used to build test ROMs for the pe_rv32 core without
hand-writing hex.  Labels are resolved in a second pass.
"""

R_FUNCT = {
    "add": (0b000, 0b0000000), "sub": (0b000, 0b0100000),
    "sll": (0b001, 0b0000000), "slt": (0b010, 0b0000000),
    "sltu": (0b011, 0b0000000), "xor": (0b100, 0b0000000),
    "srl": (0b101, 0b0000000), "sra": (0b101, 0b0100000),
    "or": (0b110, 0b0000000), "and": (0b111, 0b0000000),
}
I_FUNCT = {"addi": 0b000, "slti": 0b010, "sltiu": 0b011, "xori": 0b100,
           "ori": 0b110, "andi": 0b111}
SHIFT_FUNCT = {"slli": (0b001, 0), "srli": (0b101, 0),
               "srai": (0b101, 0b0100000)}
B_FUNCT = {"beq": 0b000, "bne": 0b001, "blt": 0b100, "bge": 0b101,
           "bltu": 0b110, "bgeu": 0b111}


def _u(val, bits):
    return val & ((1 << bits) - 1)


class Asm:
    def __init__(self):
        self.items = []          # (mnemonic, operands) or ("label", name)
        self.labels = {}

    def label(self, name):
        self.items.append(("label", name))
        return self

    def ins(self, mn, *ops):
        self.items.append((mn, ops))
        return self

    def __getattr__(self, mn):
        if mn.startswith("_"):
            raise AttributeError(mn)
        mn2 = mn.rstrip("_")     # and_ / or_ for python keywords

        def f(*ops):
            return self.ins(mn2, *ops)
        return f

    def assemble(self):
        pc = 0
        for kind, ops in self.items:
            if kind == "label":
                self.labels[ops] = pc
            else:
                pc += 4
        words = []
        pc = 0
        for kind, ops in self.items:
            if kind == "label":
                continue
            words.append(self._encode(kind, ops, pc))
            pc += 4
        return words

    def _off(self, target, pc):
        if isinstance(target, str):
            return self.labels[target] - pc
        return target

    def _encode(self, mn, ops, pc):
        if mn in R_FUNCT:
            rd, rs1, rs2 = ops
            f3, f7 = R_FUNCT[mn]
            return (f7 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12) \
                | (rd << 7) | 0b0110011
        if mn in I_FUNCT:
            rd, rs1, imm = ops
            return (_u(imm, 12) << 20) | (rs1 << 15) \
                | (I_FUNCT[mn] << 12) | (rd << 7) | 0b0010011
        if mn in SHIFT_FUNCT:
            rd, rs1, sh = ops
            f3, f7 = SHIFT_FUNCT[mn]
            return (f7 << 25) | (sh << 20) | (rs1 << 15) | (f3 << 12) \
                | (rd << 7) | 0b0010011
        if mn in B_FUNCT:
            rs1, rs2, target = ops
            imm = self._off(target, pc)
            return ((_u(imm >> 12, 1) << 31) | (_u(imm >> 5, 6) << 25)
                    | (rs2 << 20) | (rs1 << 15) | (B_FUNCT[mn] << 12)
                    | (_u(imm >> 1, 4) << 8) | (_u(imm >> 11, 1) << 7)
                    | 0b1100011)
        if mn == "lui":
            rd, imm20 = ops
            return (_u(imm20, 20) << 12) | (rd << 7) | 0b0110111
        if mn == "auipc":
            rd, imm20 = ops
            return (_u(imm20, 20) << 12) | (rd << 7) | 0b0010111
        if mn == "jal":
            rd, target = ops
            imm = self._off(target, pc)
            return ((_u(imm >> 20, 1) << 31) | (_u(imm >> 1, 10) << 21)
                    | (_u(imm >> 11, 1) << 20) | (_u(imm >> 12, 8) << 12)
                    | (rd << 7) | 0b1101111)
        if mn == "jalr":
            rd, rs1, imm = ops
            return (_u(imm, 12) << 20) | (rs1 << 15) | (rd << 7) \
                | 0b1100111
        if mn == "lw":
            rd, rs1, imm = ops
            return (_u(imm, 12) << 20) | (rs1 << 15) | (0b010 << 12) \
                | (rd << 7) | 0b0000011
        if mn == "sw":
            rs2, rs1, imm = ops
            return ((_u(imm >> 5, 7) << 25) | (rs2 << 20) | (rs1 << 15)
                    | (0b010 << 12) | (_u(imm, 5) << 7) | 0b0100011)
        raise ValueError(f"unknown mnemonic {mn}")


def rom_case(words, pad_to=64):
    """Emit the body of a Verilog case statement mapping word-index ->
    instruction, padded with jal x0,0 (halt self-loops)."""
    halt = 0x0000006F  # jal x0, 0
    lines = []
    for i in range(pad_to):
        w = words[i] if i < len(words) else halt
        lines.append(f"      6'd{i}: instr = 32'h{w:08X};")
    return "\n".join(lines)
