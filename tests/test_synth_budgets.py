"""Per-pass synthesis budgets, DC-inference gates, growth guards, and
the support_* policy flags (pe_synth_options:110-186 parity: qm_max_*/
resub_*/sweep_*/rewrite_max_candidates/decomp_*/infer_dc_from_*/
max_total_*/support_always_*), plus the CLI flag surface.
"""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from tests_helpers_synth import crosscheck_opt  # noqa: E402

from phy_engine_tpu.verilog.optimize import PassBudgets  # noqa: E402
from phy_engine_tpu.verilog.parser import CompileError  # noqa: E402
from phy_engine_tpu.verilog.synth import SynthOptions  # noqa: E402

SRC = r"""
module blk(input [7:0] a, input [7:0] b, output [7:0] s,
           output any_hi);
  assign s = a + b;
  assign any_hi = |(a & b);
endmodule
"""

VECS = [dict(a=a, b=b) for a, b in
        ((0, 0), (1, 1), (0x55, 0xAA), (0xFF, 0x01), (0x3C, 0xC3),
         (17, 42), (255, 255))]


def _passes(budgets):
    rep = crosscheck_opt(SRC, "blk", VECS, ["s", "any_hi"],
                         SynthOptions(opt_level=3,
                                      assume_binary_inputs=True,
                                      budgets=budgets))
    return rep, [p[0] for p in rep.opt_stats.passes]


def test_budget_zero_disables_stages():
    """The reference convention: a 0 budget disables that pass family
    — and the lowered netlist stays bit-exact without it."""
    rep, names = _passes(PassBudgets(sweep_max_pairs=0,
                                     resub_max_targets=0,
                                     qm_max_vars=0,
                                     decomp_max_vars=0))
    assert "tt_sweep" not in names
    assert "resub" not in names
    assert "qm_2lvl" not in names and "qm_deep" not in names
    assert "bdd_decomp" not in names
    assert "factor" in names            # structural tiers still run


def test_default_budgets_run_all_stages():
    _rep, names = _passes(None)
    for stage in ("tt_sweep", "rewrite", "resub", "qm_2lvl",
                  "qm_deep", "bdd_decomp"):
        assert stage in names, (stage, names)


def test_tight_budgets_still_bit_exact():
    """Tiny (but nonzero) budgets bound the work, never the
    correctness."""
    rep, _ = _passes(PassBudgets(qm_max_vars=4, qm_exact_vars=4,
                                 qm_max_gates=8, qm_max_targets=2,
                                 sop_max_vars=4, resub_max_targets=2,
                                 resub_max_divisors=2,
                                 sweep_max_pairs=2,
                                 rewrite_max_candidates=1,
                                 techmap_max_cut=3,
                                 decomp_min_vars=4, decomp_max_vars=5))
    assert rep.gate_count > 0


def test_growth_guards_accept_roomy_caps():
    rep, _ = _passes(PassBudgets(max_total_models=10 ** 9,
                                 max_total_logic_gates=10 ** 9))
    assert rep.gate_count > 0


def test_fsm_dc_budget_flag():
    """infer_dc_from_fsm=False must reproduce the untagged QoR on the
    FSM corpus design (the flag really gates the DC tier)."""
    from test_fsm_dc import _synth, _SRC  # noqa: F401
    from phy_engine_tpu.verilog.parser import compile_source
    from phy_engine_tpu.verilog.elaborate import (build_design,
                                                  find_module, elaborate)
    from phy_engine_tpu.verilog import synth as S
    import phy_engine_tpu as pe
    import phy_engine_tpu.netlist.operations as netops
    from phy_engine_tpu.models import INPUT

    def run(flag):
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
            S.SynthOptions(opt_level=3, assume_binary_inputs=True,
                           budgets=PassBudgets(infer_dc_from_fsm=flag)))
        return sum(1 for m in nl.live_models()
                   if m.mdef.digital_op not in ("INPUT", "OUTPUT"))

    with_dc = run(True)
    without_dc = run(False)
    assert with_dc < without_dc, (with_dc, without_dc)


def test_support_flags_reject_disabled_constructs():
    from phy_engine_tpu.verilog.parser import compile_source
    from phy_engine_tpu.verilog.elaborate import (build_design,
                                                  find_module, elaborate)
    from phy_engine_tpu.verilog.synth import synthesize_to_netlist
    import phy_engine_tpu as pe
    import phy_engine_tpu.netlist.operations as netops

    src = """
module ff(input clk, input d, output reg q);
  always @(posedge clk) q <= d;
endmodule
"""
    design = build_design(compile_source(src))
    topm = find_module(design, "ff")
    inst = elaborate(design, topm)
    nl = pe.Circuit().nl
    port_nets = {p: [netops.create_node(nl)] for p in topm.ports}
    with pytest.raises(CompileError, match="support_always_ff"):
        synthesize_to_netlist(nl, design, inst, port_nets,
                              SynthOptions(support_always_ff=False))

    src2 = """
module mux(input s, input a, input b, output reg y);
  always @* y = s ? a : b;
endmodule
"""
    design2 = build_design(compile_source(src2))
    topm2 = find_module(design2, "mux")
    inst2 = elaborate(design2, topm2)
    nl2 = pe.Circuit().nl
    port_nets2 = {p: [netops.create_node(nl2)] for p in topm2.ports}
    with pytest.raises(CompileError, match="support_always_comb"):
        synthesize_to_netlist(nl2, design2, inst2, port_nets2,
                              SynthOptions(support_always_comb=False))


def test_cli_budget_and_export_flags(tmp_path):
    """verilog2penl accepts the budget flag family and the --mode/
    --layout/--no-io export options (verilog2penl.cpp flag parity)."""
    vfile = tmp_path / "blk.v"
    vfile.write_text(SRC)
    out_dir = tmp_path / "out_penl"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "phy_engine_tpu.cli.verilog2penl",
         str(out_dir), str(vfile), "--top", "blk", "--synth", "-O3",
         "--assume-binary-inputs", "--sweep-max-pairs", "0",
         "--qm-max-vars", "6", "--no-dc-odc", "--layout", "dir",
         "--mode", "full", "--report"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    assert "tt_sweep" not in r.stderr      # budget 0 disabled the pass
    assert (out_dir / "structure.json").exists()
    assert (out_dir / "runtime.json").exists()

    # --no-io: no INPUT/OUTPUT devices in the saved netlist
    out2 = tmp_path / "noio.penl"
    r2 = subprocess.run(
        [sys.executable, "-m", "phy_engine_tpu.cli.verilog2penl",
         str(out2), str(vfile), "--top", "blk", "--no-io"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r2.returncode == 0, r2.stderr
    from phy_engine_tpu.io.penl import load
    c2 = load(str(out2))
    assert not any(m.mdef.digital_op in ("INPUT", "OUTPUT")
                   for m in c2.nl.live_models())
