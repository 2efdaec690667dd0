"""Front-end robustness (fuzz/verilog_digital_fuzzer.cpp analogue).

Seeded random mutations of valid sources plus token soup: the
preprocessor/lexer/parser/elaborator/simulator must either succeed or
raise a CompileError/SimError — never crash with an arbitrary
exception or hang.
"""

import random

import pytest

from phy_engine_tpu.verilog import (compile_source, build_design, elaborate,
                                    find_module, settle, Runtime)
from phy_engine_tpu.verilog.parser import CompileError
from phy_engine_tpu.verilog.simulate import SimError, simulate

SEED_SOURCES = [
    """
module m(input [3:0] a, input [3:0] b, output [3:0] y);
  assign y = (a & b) | (a ^ b);
endmodule
""",
    """
module c(input clk, input rst_n, output reg [3:0] q);
  always @(posedge clk or negedge rst_n)
    if (!rst_n) q <= 0; else q <= q + 1;
endmodule
""",
    """
`define W 4
module d(input [`W-1:0] x, output [`W-1:0] y);
  generate
    genvar i;
    for (i = 0; i < `W; i = i + 1) begin : g
      assign y[i] = ~x[i];
    end
  endgenerate
endmodule
""",
]

TOKENS = ["module", "endmodule", "input", "output", "wire", "reg",
          "assign", "always", "@", "(", ")", "[", "]", "{", "}", ";",
          ",", "=", "<=", "+", "-", "&", "|", "^", "~", "?", ":",
          "posedge", "negedge", "begin", "end", "if", "else", "case",
          "endcase", "default", "4'b1010", "8'hFF", "1'bz", "1'bx",
          "x", "y", "clk", "foo", "`define", "`ifdef", "`endif",
          "$clog2", "3", "0", "==", "<<", ">>", "initial", "#1",
          "function", "endfunction", "genvar", "generate",
          "endgenerate"]

ALLOWED = (CompileError, SimError, RecursionError)


def _try_pipeline(src):
    try:
        mods = compile_source(src)
        if not mods:
            return
        design = build_design(mods)
        top = mods[-1]
        inst = elaborate(design, top)
        rt = Runtime(inst)
        settle(rt, 0)
        simulate(rt, 1)
    except ALLOWED:
        pass


def test_fuzz_mutations():
    rng = random.Random(1234)
    for trial in range(150):
        src = rng.choice(SEED_SOURCES)
        chars = list(src)
        for _ in range(rng.randrange(1, 8)):
            k = rng.randrange(3)
            pos = rng.randrange(len(chars))
            if k == 0 and chars:
                del chars[pos]
            elif k == 1:
                chars.insert(pos, rng.choice(
                    "(){}[];,=<>&|^~?:@#$%x01 \n"))
            else:
                chars[pos] = rng.choice(
                    "(){}[];,=<>&|^~?:@#$%x01 \n")
        _try_pipeline("".join(chars))


def test_fuzz_token_soup():
    rng = random.Random(99)
    for trial in range(150):
        n = rng.randrange(3, 60)
        src = " ".join(rng.choice(TOKENS) for _ in range(n))
        _try_pipeline(src)


def test_fuzz_corpus_replay():
    """Replay the checked-in fuzz corpus (tools/fuzz_verilog.py):
    regressions/ holds minimized past crashers (must now be handled),
    interesting/ holds novel-signature mutants."""
    import os
    base = os.path.join(os.path.dirname(__file__), "fuzz_corpus")
    n = 0
    for sub in ("regressions", "interesting"):
        d = os.path.join(base, sub)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            src = open(os.path.join(d, fn)).read()
            _try_pipeline(src)
            n += 1
    assert n > 0, "fuzz corpus missing"


def test_fuzz_pathological_inputs():
    cases = [
        "",
        "\x00\x01\x02",
        "module",
        "module m; endmodule" * 50,
        "`define A `A\nmodule m(output y); assign y = `A; endmodule",
        "module m(input a, output y); assign y = " +
        "(" * 200 + "a" + ")" * 200 + "; endmodule",
        "/* unterminated",
        '"unterminated string',
        "`include \"nonexistent.v\"\nmodule m; endmodule",
        "module m(input [99999:0] a, output y); assign y = ^a; endmodule",
    ]
    for src in cases:
        _try_pipeline(src)
