"""Snake game FSM (test/0019.snake / 0030.snake6x6 analogue).

Own-design 4x4 snake: ring-buffer body RAM, LFSR food, growth on eat,
self-collision death. Synthesized gates are clocked cycle-by-cycle and
must match the behavioral simulator bit-exactly on head position,
length, food, and death — plus a Python game model as the third oracle.
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

SNAKE_SRC = """
module snake4(input clk, input rst_n, input [1:0] dir,
              output [3:0] head, output [4:0] length,
              output [3:0] food, output dead);
  // position encoding: {y[1:0], x[1:0]} on a 4x4 torus
  reg [3:0] body [15:0];      // ring buffer of positions
  reg [3:0] head_q;
  reg [3:0] tail_i;           // ring index of tail
  reg [4:0] len_q;            // 1..16
  reg [3:0] food_q;
  reg [3:0] lfsr;
  reg dead_q;

  wire [1:0] hx = head_q[1:0];
  wire [1:0] hy = head_q[3:2];
  wire [1:0] nx = (dir == 2'd0) ? hx + 2'd1 :
                  (dir == 2'd1) ? hx - 2'd1 : hx;
  wire [1:0] ny = (dir == 2'd2) ? hy + 2'd1 :
                  (dir == 2'd3) ? hy - 2'd1 : hy;
  wire [3:0] nhead = {ny, nx};

  wire eat = (nhead == food_q);

  // self-collision: nhead equals any live body cell. Ring layout:
  // body slots tail_i .. tail_i+len_q-1 (mod 16) are live; the tail
  // slot vacates this tick unless we eat.
  wire [15:0] hit;
  genvar i;
  generate
    for (i = 0; i < 16; i = i + 1) begin : coll
      wire [3:0] rel = i[3:0] - tail_i;
      wire live = ({1'b0, rel} < len_q) & ~((rel == 4'd0) & ~eat);
      assign hit[i] = live & (body[i] == nhead);
    end
  endgenerate
  wire collide = |hit;

  wire [3:0] head_i = tail_i + len_q[3:0];   // next head slot (mod 16)
  wire [3:0] lfsr_next = {lfsr[2:0], lfsr[3] ^ lfsr[2]};

  assign head = head_q;
  assign length = len_q;
  assign food = food_q;
  assign dead = dead_q;

  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) begin
      head_q <= 4'd5;          // (1,1)
      tail_i <= 4'd0;
      len_q <= 5'd1;
      body[0] <= 4'd5;
      food_q <= 4'd10;
      lfsr <= 4'b1001;
      dead_q <= 1'b0;
    end else if (!dead_q) begin
      if (collide) begin
        dead_q <= 1'b1;
      end else begin
        head_q <= nhead;
        body[head_i] <= nhead;
        lfsr <= lfsr_next;
        if (eat) begin
          len_q <= (len_q == 5'd16) ? len_q : len_q + 5'd1;
          food_q <= lfsr_next;
        end else begin
          tail_i <= tail_i + 4'd1;
        end
      end
    end
  end
endmodule
"""


class PySnake:
    """Independent Python game model (third oracle)."""

    def __init__(self):
        self.head = 5
        self.body = [5]                   # tail .. head order
        self.food = 10
        self.lfsr = 0b1001
        self.dead = False

    def step(self, d):
        if self.dead:
            return
        hx, hy = self.head & 3, (self.head >> 2) & 3
        if d == 0:
            hx = (hx + 1) & 3
        elif d == 1:
            hx = (hx - 1) & 3
        elif d == 2:
            hy = (hy + 1) & 3
        else:
            hy = (hy - 1) & 3
        nhead = (hy << 2) | hx
        eat = nhead == self.food
        live = self.body if eat else self.body[1:]
        if nhead in live:
            self.dead = True
            return
        lfsr_next = ((self.lfsr << 1) & 0xF) | \
            (((self.lfsr >> 3) ^ (self.lfsr >> 2)) & 1)
        self.head = nhead
        self.body.append(nhead)
        if eat:
            if len(self.body) > 16:
                self.body.pop()           # clamp (len cap)
            self.food = lfsr_next
        else:
            self.body.pop(0)
        self.lfsr = lfsr_next


def _directions(n, seed=13):
    """A wandering path that eats a few foods and finally bites itself:
    deterministic mix of spirals and straight runs."""
    rng = np.random.default_rng(seed)
    dirs = []
    cur = 0
    for k in range(n):
        if rng.random() < 0.3:
            cur = int(rng.integers(4))
        dirs.append(cur)
    return dirs


def test_snake_behavioral_vs_model():
    mods = compile_source(SNAKE_SRC)
    design = build_design(mods)
    topm = find_module(design, "snake4")
    inst = elaborate(design, topm)
    rt = Runtime(inst)
    rt.values["clk"] = Val.from_int(0, 1)
    rt.values["rst_n"] = Val.from_int(0, 1)
    rt.values["dir"] = Val.from_int(0, 2)
    settle(rt, 0)
    rt.values["clk"] = Val.from_int(1, 1)
    bsim(rt, 1)
    rt.values["clk"] = Val.from_int(0, 1)
    bsim(rt, 2)
    rt.values["rst_n"] = Val.from_int(1, 1)
    bsim(rt, 3)

    model = PySnake()
    tick = 3
    grew = False
    for d in _directions(80):
        # present dir during the low phase so the posedge samples it
        rt.values["dir"] = Val.from_int(d, 2)
        rt.values["clk"] = Val.from_int(0, 1)
        tick += 1
        bsim(rt, tick)
        rt.values["clk"] = Val.from_int(1, 1)
        tick += 1
        bsim(rt, tick)
        model.step(d)
        assert rt.values["dead"].to_int() == int(model.dead)
        if model.dead:
            break
        assert rt.values["head"].to_int() == model.head
        assert rt.values["length"].to_int() == len(model.body)
        assert rt.values["food"].to_int() == model.food
        grew = grew or len(model.body) > 1
    assert grew, "test path never ate food — pick a better seed"


def test_snake_synth_bit_exact():
    """Gate level vs behavioral, cycle by cycle, until death."""
    mods = compile_source(SNAKE_SRC)
    design = build_design(mods)
    topm = find_module(design, "snake4")

    binst = elaborate(design, topm)
    rt = Runtime(binst)
    rt.values["clk"] = Val.from_int(0, 1)
    rt.values["rst_n"] = Val.from_int(0, 1)
    rt.values["dir"] = Val.from_int(0, 2)
    settle(rt, 0)

    sinst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    pn = {p: [netops.create_node(nl)
              for _ in range(sinst.signals[p].width)]
          for p in topm.ports}
    clk = netops.add_model(nl, INPUT, {"boolean": 0.0})
    rstm = netops.add_model(nl, INPUT, {"boolean": 0.0})
    dirm = [netops.add_model(nl, INPUT, {"boolean": 0.0})
            for _ in range(2)]
    netops.add_to_node(nl, clk, 0, pn["clk"][0])
    netops.add_to_node(nl, rstm, 0, pn["rst_n"][0])
    for i, m in enumerate(dirm):
        netops.add_to_node(nl, m, 0, pn["dir"][i])
    report = synthesize_to_netlist(nl, design, sinst, pn,
                                   SynthOptions(opt_level=1))
    assert report.ff_count >= 64 + 4 + 4 + 5 + 4 + 4 + 1

    def gate_read(name):
        return sum((c.node_digital(n) & 1) << i
                   for i, n in enumerate(pn[name]))

    tick = 0

    def half(level, rst, d):
        nonlocal tick
        rt.values["clk"] = Val.from_int(level, 1)
        rt.values["rst_n"] = Val.from_int(rst, 1)
        rt.values["dir"] = Val.from_int(d, 2)
        tick += 1
        bsim(rt, tick)
        clk.set_attribute("boolean", float(level))
        rstm.set_attribute("boolean", float(rst))
        for i, m in enumerate(dirm):
            m.set_attribute("boolean", float((d >> i) & 1))
        c.digital_clk()

    c.digital_clk()
    half(1, 0, 0)
    half(0, 0, 0)
    half(0, 1, 0)

    died = False
    for d in _directions(80):
        half(0, 1, d)        # settle with the new direction
        half(1, 1, d)        # then clock
        for name in ("head", "length", "food", "dead"):
            g = gate_read(name)
            b = rt.values[name].to_int()
            assert g == b, (name, g, b)
        if rt.values["dead"].to_int():
            died = True
            break
    # the wandering path should eventually self-collide once the snake
    # has grown; if not, force a tight loop
    if not died:
        for d in [0, 2, 1, 3] * 4:
            half(0, 1, d)
            half(1, 1, d)
            if rt.values["dead"].to_int():
                died = True
                break
        assert gate_read("dead") == rt.values["dead"].to_int()
