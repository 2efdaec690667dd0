"""Synthesis QoR table: corpus gate counts per optimization level.

Runs every reference-corpus case (tests/conformance.py extraction)
through synthesis at -O1 / -O2 / -O3 / -Omax (O3+ with
assume_binary_inputs, the reference's own relaxation for its TT
passes) and prints per-case gate counts plus totals — the
pe_synth_report QoR evidence VERDICT round 2 asked for.

Usage:  python tools/qor_table.py [name-filter] [--rv32]
Writes a markdown table to stdout; slow cases are still only seconds.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def synth_gates(src, top, level, binok, includes=None):
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
    rep = synthesize_to_netlist(
        nl, design, inst, port_nets,
        SynthOptions(opt_level=level, assume_binary_inputs=binok))
    gates = sum(1 for m in nl.live_models()
                if m.mdef.digital_op not in ("INPUT", "OUTPUT"))
    return gates


LEVELS = ((1, False), (2, False), (3, True), (4, True))


def main():
    filt = None
    rv32 = "--rv32" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        filt = args[0]

    from conformance import collect_corpus
    rows = []
    totals = [0, 0, 0, 0]
    t_tot = [0.0, 0.0, 0.0, 0.0]
    for name, src, top, includes in collect_corpus():
        if filt and filt not in name:
            continue
        counts = []
        for k, (lvl, binok) in enumerate(LEVELS):
            t0 = time.time()
            try:
                g = synth_gates(src, top, lvl, binok, includes)
            except Exception as e:  # noqa: BLE001
                g = f"ERR:{type(e).__name__}"
            dt = time.time() - t0
            counts.append(g)
            if isinstance(g, int):
                totals[k] += g
                t_tot[k] += dt
        rows.append((name, counts))
        print(f"| {name} | " + " | ".join(str(c) for c in counts) +
              " |", flush=True)

    print("\n| case | O1 | O2 | O3 | Omax |")
    print(f"| TOTAL ({len(rows)} cases) | " +
          " | ".join(str(t) for t in totals) + " |")
    print(f"| wall (s) | " +
          " | ".join(f"{t:.0f}" for t in t_tot) + " |")

    if rv32:
        from test_riscv import _cpu_source
        src, _ = _cpu_source()
        for lvl, binok in LEVELS:
            t0 = time.time()
            g = synth_gates(src, "pe_rv32", lvl, binok)
            print(f"| rv32 -O{lvl} | {g} | {time.time()-t0:.0f}s |",
                  flush=True)


if __name__ == "__main__":
    main()
