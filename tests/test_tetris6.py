"""Tetris-class sequential workload (test/0017.tetris / 0031.tetris6x6
role, own design): a 6x6 falling-block game FSM — LFSR spawn column,
lateral moves with collision, landing merge, full-row clear with
gravity, score, game-over — synthesized to gates and clocked against a
cycle-exact Python oracle.
"""

import numpy as np
import pytest

import phy_engine_tpu as pe
from phy_engine_tpu import netops
from phy_engine_tpu.models import INPUT
from phy_engine_tpu.verilog import (compile_source, build_design,
                                    elaborate, find_module)
from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                          SynthOptions)

TETRIS_SRC = """
module tetris6(input clk, input rst_n, input mv_l, input mv_r,
               output [35:0] grid_o, output reg [3:0] score,
               output reg game_over);
  reg [5:0] r0, r1, r2, r3, r4, r5;   // r0 = top row
  reg [3:0] lfsr;
  reg [2:0] col, row;
  reg falling;

  assign grid_o = {r5, r4, r3, r2, r1, r0};

  function automatic [5:0] row_at(input [2:0] r);
    case (r)
      3'd0: row_at = r0;  3'd1: row_at = r1;  3'd2: row_at = r2;
      3'd3: row_at = r3;  3'd4: row_at = r4;  default: row_at = r5;
    endcase
  endfunction

  wire [3:0] lfsr_n = {lfsr[2:0], lfsr[3] ^ lfsr[2]};
  wire [2:0] spawn_col = (lfsr >= 4'd12) ? (lfsr - 4'd12)
                       : (lfsr >= 4'd6) ? (lfsr - 4'd6) : lfsr[2:0];

  // lateral move (left has priority), with wall + collision checks
  wire can_l = (col != 3'd0) & ~row_at(row)[col - 3'd1];
  wire can_r = (col != 3'd5) & ~row_at(row)[col + 3'd1];
  wire [2:0] ncol = (mv_l & can_l) ? col - 3'd1
                  : (~mv_l & mv_r & can_r) ? col + 3'd1 : col;
  wire landed = (row == 3'd5) | row_at(row + 3'd1)[ncol];

  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) begin
      r0 <= 6'd0; r1 <= 6'd0; r2 <= 6'd0;
      r3 <= 6'd0; r4 <= 6'd0; r5 <= 6'd0;
      score <= 4'd0; game_over <= 1'b0; falling <= 1'b0;
      lfsr <= 4'b1011; col <= 3'd0; row <= 3'd0;
    end else if (!game_over) begin
      if (!falling) begin
        lfsr <= lfsr_n;
        if (r0[spawn_col]) game_over <= 1'b1;
        else begin
          falling <= 1'b1; col <= spawn_col; row <= 3'd0;
        end
      end else if (!landed) begin
        col <= ncol; row <= row + 3'd1;
      end else begin
        // land: merge at (row, ncol), then clear that row if full
        logic [5:0] m0, m1, m2, m3, m4, m5;
        logic [5:0] merged;
        m0 = r0; m1 = r1; m2 = r2; m3 = r3; m4 = r4; m5 = r5;
        merged = row_at(row) | (6'd1 << ncol);
        case (row)
          3'd0: m0 = merged;  3'd1: m1 = merged;
          3'd2: m2 = merged;  3'd3: m3 = merged;
          3'd4: m4 = merged;  default: m5 = merged;
        endcase
        if (merged == 6'b111111) begin
          score <= score + 4'd1;
          // gravity: rows above the cleared one shift down
          case (row)
            3'd0: m0 = 6'd0;
            3'd1: begin m1 = m0; m0 = 6'd0; end
            3'd2: begin m2 = m1; m1 = m0; m0 = 6'd0; end
            3'd3: begin m3 = m2; m2 = m1; m1 = m0; m0 = 6'd0; end
            3'd4: begin m4 = m3; m3 = m2; m2 = m1; m1 = m0;
                        m0 = 6'd0; end
            default: begin m5 = m4; m4 = m3; m3 = m2; m2 = m1;
                           m1 = m0; m0 = 6'd0; end
          endcase
        end
        r0 <= m0; r1 <= m1; r2 <= m2;
        r3 <= m3; r4 <= m4; r5 <= m5;
        falling <= 1'b0;
      end
    end
  end
endmodule
"""


class TetrisOracle:
    """Cycle-exact mirror of the RTL above."""

    def __init__(self):
        self.rows = [0] * 6
        self.score = 0
        self.game_over = False
        self.falling = False
        self.lfsr = 0b1011
        self.col = 0
        self.row = 0

    def grid(self) -> int:
        g = 0
        for i, r in enumerate(self.rows):
            g |= r << (6 * i)
        return g

    def clock(self, mv_l: int, mv_r: int):
        if self.game_over:
            return
        if not self.falling:
            spawn = self.lfsr - 12 if self.lfsr >= 12 else (
                self.lfsr - 6 if self.lfsr >= 6 else self.lfsr)
            self.lfsr = ((self.lfsr << 1) & 0xF) | (
                ((self.lfsr >> 3) ^ (self.lfsr >> 2)) & 1)
            if (self.rows[0] >> spawn) & 1:
                self.game_over = True
            else:
                self.falling = True
                self.col = spawn
                self.row = 0
            return
        can_l = self.col != 0 and not (
            (self.rows[self.row] >> (self.col - 1)) & 1)
        can_r = self.col != 5 and not (
            (self.rows[self.row] >> (self.col + 1)) & 1)
        ncol = (self.col - 1 if (mv_l and can_l) else
                self.col + 1 if (not mv_l and mv_r and can_r) else
                self.col)
        landed = self.row == 5 or (
            (self.rows[self.row + 1] >> ncol) & 1)
        if not landed:
            self.col = ncol
            self.row += 1
            return
        m = list(self.rows)
        m[self.row] |= 1 << ncol
        if m[self.row] == 0b111111:
            self.score = (self.score + 1) & 0xF
            for j in range(self.row, 0, -1):
                m[j] = m[j - 1]
            m[0] = 0
        self.rows = m
        self.falling = False


def _build():
    mods = compile_source(TETRIS_SRC)
    design = build_design(mods)
    topm = find_module(design, "tetris6")
    inst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    pn = {p: [netops.create_node(nl)
              for _ in range(inst.signals[p].width)]
          for p in topm.ports}
    ins = {}
    for name in ("clk", "rst_n", "mv_l", "mv_r"):
        m = netops.add_model(nl, INPUT, {"boolean": 0.0})
        netops.add_to_node(nl, m, 0, pn[name][0])
        ins[name] = m
    rep = synthesize_to_netlist(nl, design, inst, pn,
                                SynthOptions(opt_level=1))
    return c, ins, pn, rep


def test_tetris6_game_vs_oracle():
    c, ins, pn, rep = _build()
    assert rep.ff_count >= 49            # 36 grid + regs

    rng = np.random.default_rng(17)
    T = 400
    moves = [(int(rng.integers(0, 2)), int(rng.integers(0, 2)))
             for _ in range(T)]

    sched = [{}, {ins["rst_n"]: 0}, {ins["rst_n"]: 0, ins["clk"]: 1},
             {ins["rst_n"]: 1, ins["clk"]: 0}]
    for (l, r) in moves:
        base = {ins["rst_n"]: 1, ins["mv_l"]: l, ins["mv_r"]: r}
        hi = dict(base)
        hi[ins["clk"]] = 1
        lo = dict(base)
        lo[ins["clk"]] = 0
        sched.append(hi)
        sched.append(lo)
    tr = c.digital_run(sched)

    orc = TetrisOracle()
    grid_vals = tr.bus_values(pn["grid_o"])
    score_vals = tr.bus_values(pn["score"])
    over_vals = tr.bus_values(pn["game_over"])
    for k, (l, r) in enumerate(moves):
        orc.clock(l, r)
        t = 4 + 2 * k + 1                 # after the falling edge
        assert int(grid_vals[t]) == orc.grid(), (k, l, r)
        assert int(score_vals[t]) == orc.score, k
        assert int(over_vals[t]) == int(orc.game_over), k
    # the random game must have actually played: blocks landed and at
    # least one full row cleared or the stack topped out
    assert orc.score > 0 or orc.game_over
    assert any(v != 0 for v in grid_vals[8:])
