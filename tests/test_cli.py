"""CLI tests (verilog2penl / verilog2plsav)."""

import json
import os

from phy_engine_tpu.cli.verilog2penl import main as v2penl
from phy_engine_tpu.cli.verilog2plsav import main as v2plsav

SRC = """
module blink(input clk, input rst_n, output led);
  reg [1:0] cnt;
  always @(posedge clk or negedge rst_n) begin
    if (!rst_n) cnt <= 2'd0;
    else cnt <= cnt + 2'd1;
  end
  assign led = cnt[1];
endmodule
"""


def test_verilog2penl_synth(tmp_path):
    vfile = tmp_path / "blink.v"
    vfile.write_text(SRC)
    out = tmp_path / "blink.penl"
    rc = v2penl([str(out), str(vfile), "--top", "blink", "--report"])
    assert rc == 0
    from phy_engine_tpu.io import load
    c = load(str(out))
    kinds = [m.mdef.id_name for m in c.nl.live_models()]
    assert "DFF_ARSTN" in kinds
    assert kinds.count("INPUT") >= 2


def test_verilog2penl_module(tmp_path):
    vfile = tmp_path / "blink.v"
    vfile.write_text(SRC)
    out = tmp_path / "blink_vm.penl"
    rc = v2penl([str(out), str(vfile), "--top", "blink", "--module"])
    assert rc == 0
    from phy_engine_tpu.io import load
    c = load(str(out))
    kinds = [m.mdef.id_name for m in c.nl.live_models()]
    assert "VERILOG" in kinds


def test_verilog2plsav(tmp_path):
    vfile = tmp_path / "blink.v"
    vfile.write_text(SRC)
    out = tmp_path / "blink.sav"
    rc = v2plsav([str(out), str(vfile), "--top", "blink"])
    assert rc == 0
    with open(out, encoding="utf-8") as f:
        root = json.load(f)
    status = json.loads(root["Experiment"]["StatusSave"])
    ids = [e["ModelID"] for e in status["Elements"]]
    assert "D Flipflop" in ids
    assert "Logic Input" in ids
