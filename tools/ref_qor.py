"""Head-to-head synthesis QoR: this framework vs the reference binary.

Builds the reference's own ``verilog2penl`` CLI (header-only C++,
``/root/reference/src``) out-of-tree, runs BOTH synthesizers on the
shared corpus (tests/conformance.py extraction) at matched levels, and
prints a comparison table using the REFERENCE's gate metric —
``count_logic_gates`` (pe_synth.h:420-437): only the ten pure logic ops
AND/OR/XOR/XNOR/NOT/NAND/NOR/IMP/NIMP/YES; FFs/latches/macros/IO are
excluded on both sides.

Usage:
    python tools/ref_qor.py --build          # cmake+make the reference CLI
    python tools/ref_qor.py [name-filter]    # run the comparison
    python tools/ref_qor.py --rv32           # RV32 only (slow: reference
                                             #   -Omax on 674k gates)

Reference gate counts are parsed from ``--report`` stderr (the last
``pass NAME: a -> b`` line is the final post-pipeline count; cases whose
report is empty fall back to counting gate models in a ``--mode
structure --layout dir`` export's LevelDB values — not needed at -O1+).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

REF_SRC = os.environ.get("PE_REFERENCE_ROOT", "/root/reference")
BUILD = os.environ.get("PE_REF_BUILD", "/tmp/refbuild")
CLI = os.path.join(BUILD, "verilog2penl")

LOGIC_OPS = ("AND", "OR", "XOR", "XNOR", "NOT", "NAND", "NOR", "IMP",
             "NIMP", "YES")
_PASS = re.compile(r"pass\s+\S+:\s*\d+\s*->\s*(\d+)")

# (level-flag for the reference CLI, our opt_level, assume_binary)
LEVELS = (("-O1", 1, False), ("-O2", 2, False), ("-O3", 3, True),
          ("-Omax", 4, True))


SHADOW = os.path.join(BUILD, "shadow")


def _shadow_include() -> str:
    """Symlink-farm copy of the reference include tree with ONE header
    patched: g++ 12 lacks P2448 (constexpr functions whose body is not
    constexpr-evaluable are ill-formed), so `update_digital_clk_define`
    in verilog_module.h fails on `shared_ptr == nullptr`; the patched
    copy drops that single `constexpr`.  A symlink farm (not -isystem
    tricks) is required because phy_engine.h pulls its subheaders with
    QUOTED relative includes, which resolve against the including
    file's own (symlinked) directory."""
    inc = os.path.join(SHADOW, "include")
    if not os.path.isdir(inc):
        os.makedirs(SHADOW, exist_ok=True)
        subprocess.run(
            ["cp", "-rs", os.path.join(REF_SRC, "include"), inc],
            check=True)
    rel = "phy_engine/model/models/digital/verilog_module.h"
    patched = os.path.join(inc, rel)
    if os.path.islink(patched):
        src = open(os.path.join(REF_SRC, "include", rel)).read()
        out = src.replace(
            "inline constexpr ::phy_engine::digital::"
            "need_operate_analog_node_t update_digital_clk_define",
            "inline ::phy_engine::digital::"
            "need_operate_analog_node_t update_digital_clk_define", 1)
        if out == src:
            raise RuntimeError(
                f"constexpr patch no-op: reference header drifted ({rel})")
        tmp = patched + ".tmp"
        with open(tmp, "w") as f:
            f.write(out)
        os.unlink(patched)       # drop the symlink, then atomic-replace
        os.replace(tmp, patched)
    # shadow src dir too: the reference CMake hard-codes
    # include_directories(${CMAKE_SOURCE_DIR}/../include), which would
    # win the -I order over any CMAKE_CXX_FLAGS injection — configuring
    # from the shadow src makes ../include resolve to the patched tree
    sdir = os.path.join(SHADOW, "src")
    if not os.path.isdir(sdir):
        subprocess.run(
            ["cp", "-rs", os.path.join(REF_SRC, "src"), sdir],
            check=True)
    return inc


def build_reference() -> None:
    os.makedirs(BUILD, exist_ok=True)
    _shadow_include()
    subprocess.run(
        ["cmake", "-S", os.path.join(SHADOW, "src"), "-B", BUILD,
         "-DCMAKE_BUILD_TYPE=Release",
         "-DPHY_ENGINE_ENABLE_OPENMP=OFF"],
        check=True)
    subprocess.run(
        ["cmake", "--build", BUILD, "--target", "verilog2penl", "-j", "1"],
        check=True)
    print("built:", CLI)


def ref_gates(src: str, top: str, level_flag: str, binok: bool,
              includes=None, timeout=900):
    """Final count_logic_gates from the reference CLI's --report."""
    with tempfile.TemporaryDirectory() as td:
        vpath = os.path.join(td, "case.v")
        open(vpath, "w").write(src)
        for name, body in (includes or {}).items():
            ipath = os.path.join(td, name)
            os.makedirs(os.path.dirname(ipath), exist_ok=True) \
                if os.path.dirname(name) else None
            open(ipath, "w").write(body)
        cmd = [CLI, os.path.join(td, "out.penl"), vpath, "--top", top,
               "--synth", level_flag, "--report", "--overwrite"]
        if binok:
            cmd.append("--assume-binary-inputs")
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout, cwd=td)
        except subprocess.TimeoutExpired:
            return None, "timeout"
        # The report prints BEFORE the .penl save, so a save failure
        # (rc=20, e.g. unsupported layout on this host) still yields
        # usable gate counts.  -Omax reports omax_best_gates instead of
        # (sometimes in addition to) pass lines; prefer whichever is
        # latest in pipeline order: omax_best_gates > passes.
        m = re.search(r"omax_best_gates:((?:\s+\d+)+)", p.stderr)
        if m:
            return int(m.group(1).split()[-1]), ""
        hits = _PASS.findall(p.stderr)
        if hits:
            return int(hits[-1]), ""
        if p.returncode != 0:
            return None, f"rc={p.returncode}"
        return None, "no-report"


def our_gates(src: str, top: str, level: int, binok: bool,
              includes=None):
    """Same design through our synthesizer, counted with the
    reference's metric (pure logic ops only)."""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                              SynthOptions)
    popt = None
    if includes:
        from phy_engine_tpu.verilog.preprocess import PreprocessOptions
        popt = PreprocessOptions(include_resolver=includes.get)
    design = build_design(compile_source(src, popt))
    topm = find_module(design, top)
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
    synthesize_to_netlist(
        nl, design, inst, port_nets,
        SynthOptions(opt_level=level, assume_binary_inputs=binok))
    return sum(1 for m in nl.live_models()
               if m.mdef.digital_op in LOGIC_OPS)


def rv32_case():
    import conformance  # noqa: F401  (path side effects)
    base = os.path.join(REF_SRC, "test/0016.risc-v")
    src = open(os.path.join(base, "risc-v.v")).read()
    inc = {}
    for fn in os.listdir(base):
        if fn.endswith((".vh", ".vi", ".hex")):
            inc[fn] = open(os.path.join(base, fn)).read()
    return [("0016.risc-v/risc-v", src, "riscv_top", inc)]


def main():
    if "--build" in sys.argv:
        build_reference()
        return
    if not os.path.exists(CLI):
        print(f"reference CLI not built; run: python tools/ref_qor.py "
              f"--build   (expected at {CLI})", file=sys.stderr)
        sys.exit(2)

    filt = None
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        filt = args[0]

    from conformance import collect_corpus, EXPECT_ERROR
    cases = rv32_case() if "--rv32" in sys.argv else collect_corpus()

    hdr = ["case"]
    for flag, _, _ in LEVELS:
        hdr += [f"ref{flag}", f"ours{flag}"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    tot_ref = [0] * len(LEVELS)
    tot_our = [0] * len(LEVELS)
    n_both = [0] * len(LEVELS)
    for name, src, top, includes in cases:
        if filt and filt not in name:
            continue
        if any(e in name for e in EXPECT_ERROR):
            continue
        row = [name]
        for k, (flag, lvl, binok) in enumerate(LEVELS):
            rg, why = ref_gates(src, top, flag, binok, includes)
            try:
                og = our_gates(src, top, lvl, binok, includes)
            except Exception as e:  # noqa: BLE001
                og, oe = None, type(e).__name__
            else:
                oe = ""
            row.append(str(rg) if rg is not None else why)
            row.append(str(og) if og is not None else oe)
            if rg is not None and og is not None:
                tot_ref[k] += rg
                tot_our[k] += og
                n_both[k] += 1
        print("| " + " | ".join(row) + " |", flush=True)
    trow = ["TOTAL (both ran)"]
    for k in range(len(LEVELS)):
        trow += [f"{tot_ref[k]} (n={n_both[k]})", str(tot_our[k])]
    print("| " + " | ".join(trow) + " |")


if __name__ == "__main__":
    main()
