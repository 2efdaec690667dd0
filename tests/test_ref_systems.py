"""Reference full-system workloads as data (test/0030.snake6x6,
test/0032.go, test/0029.snake_combine roles).

Each system runs the conformance pipeline: compile -> elaborate ->
behavioral simulate -> synthesize(O1) -> clock the gate netlist
against the behavioral engine bit-exactly on every output under
random stimulus.  Together with test_riscv_ref (full RV32) and
test_x86_16 (16-bit multi-module CPU) this covers the reference's
flagship sequential systems.
"""

import os
import re

import pytest

from conformance import run_case

_CASES = [
    ("/root/reference/test/0017.tetris/tetris.v", "tetris_top", 24),
    ("/root/reference/test/0031.tetris6x6/tetris6x6.v", "tetris6x6", 24),
    ("/root/reference/test/0030.snake6x6/snake6x6.v", "snake6x6", 24),
    ("/root/reference/test/0032.go/go9x9_lite.v", None, 16),
    ("/root/reference/test/0032.go/go9x9.v", None, 16),
    ("/root/reference/test/0032.go/go.v", None, 12),
]

# the 0029 split-snake modules each crosscheck standalone
_SNAKE_DIR = "/root/reference/test/0029.snake_combine"
for _f in ("snake_dir.v", "snake_food_pick.v", "snake_head_next.v",
           "snake_hit_eat.v", "snake_render.v", "snake_state.v"):
    _CASES.append((os.path.join(_SNAKE_DIR, _f), None, 12))

# reference arithmetic units (test/0020-0025, 0027): every remaining
# corpus .v the flagship list above doesn't reach
for _p, _cyc in [
    ("0020.fp16_calc/fp16_addsub.v", 16),
    ("0020.fp16_calc/fp16_mul.v", 16),
    ("0020.fp16_calc/fp16_div.v", 16),
    ("0020.fp16_calc/fp16_calc.v", 16),
    ("0021.fp16_fpu/fp16_fpu.v", 16),
    ("0022.adder/adder8.v", 16),
    ("0023.fp8/fp8_add.v", 16),
    ("0023.fp8/fp8_sub.v", 16),
    ("0023.fp8/fp8_mul.v", 16),
    ("0023.fp8/fp8_div.v", 16),
    ("0024.mul2x2/mul2x2.v", 16),
    ("0025.mul8x8/mul8x8.v", 16),
    ("0025.mul8x8/mul8x8_serial.v", 24),
    ("0027.devider/divider8.v", 24),
]:
    # top = last module in the file (true for every unit here)
    _CASES.append((os.path.join("/root/reference/test", _p),
                   None, _cyc))


@pytest.mark.parametrize(
    "path,top,cycles", _CASES,
    ids=[os.path.basename(p) for p, _, _ in _CASES])
def test_reference_system_bit_exact(path, top, cycles):
    if not os.path.exists(path):
        pytest.skip("reference source unavailable")
    src = open(path).read()
    if top is None:
        top = re.findall(r"\bmodule\s+(\w+)", src)[-1]
    # `include resolves like the reference's file resolver: relative
    # to the including file's directory (fp16_fpu.v pulls
    # ../0020.fp16_calc/*.v)
    d = os.path.dirname(path)

    class _Resolver:
        @staticmethod
        def get(name):
            p = os.path.normpath(os.path.join(d, name))
            return open(p).read() if os.path.exists(p) else None

    err = run_case(src, top, cycles=cycles, seed=3,
                   includes=_Resolver())
    assert err is None, f"{os.path.basename(path)}[{top}]: {err}"
