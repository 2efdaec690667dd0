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


@pytest.mark.parametrize(
    "path,top,cycles", _CASES,
    ids=[os.path.basename(p) for p, _, _ in _CASES])
def test_reference_system_bit_exact(path, top, cycles):
    if not os.path.exists(path):
        pytest.skip("reference source unavailable")
    src = open(path).read()
    if top is None:
        top = re.findall(r"\bmodule\s+(\w+)", src)[-1]
    err = run_case(src, top, cycles=cycles, seed=3)
    assert err is None, f"{os.path.basename(path)}[{top}]: {err}"
