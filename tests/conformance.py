"""Reference-corpus conformance harness.

Treats the reference's Verilog test corpus (test/0007.verilog,
test/0015.verilog_compile — C++ drivers embedding Verilog in u8R"()"
raw strings) as DATA: each extracted source runs through
compile -> elaborate -> behavioral simulate -> synthesize(O1) ->
gate-level clock, with a behavioral-vs-gate cross-check on random
stimulus (two independent implementations must agree bit-for-bit on
defined outputs).

Used by tests/test_conformance.py and runnable standalone:
``python tests/conformance.py [--verbose]``.
"""

from __future__ import annotations

import os
import re
import sys

CORPUS_DIRS = ("test/0007.verilog", "test/0015.verilog_compile")
REFERENCE = os.environ.get("PE_REFERENCE_ROOT", "/root/reference")

_RAW = re.compile(r'u8R"\((.*?)\)"', re.S)
_TOP = re.compile(r'top_name\[\]\s*=\s*u8"([A-Za-z_0-9]+)"')
_TOPV = re.compile(r'topmodule\w*\s*=\s*u8"([A-Za-z_0-9]+)"')
_MOD = re.compile(r'\bmodule\s+([A-Za-z_][A-Za-z_0-9$]*)')


def extract_units(path: str):
    """(src, top, includes) triples from one corpus driver file.
    Raw strings without a module declaration are include-file bodies;
    they pair positionally with *.vh-style filename literals in the
    driver (the reference registers them through its resolver)."""
    text = open(path, "r", errors="replace").read()
    tops = _TOP.findall(text) + _TOPV.findall(text)
    units = []
    extras = []
    for raw in _RAW.findall(text):
        mods = _MOD.findall(raw)
        if not mods:
            extras.append(raw)
            continue
        top = next((t for t in tops if t in mods), mods[-1])
        units.append((raw, top))
    inc_names = re.findall(r'"([\w./]+\.(?:vh|svh|vi))"', text)
    includes = dict(zip(inc_names, extras))
    return [(src, top, includes) for src, top in units]


def collect_corpus():
    """[(case_name, src, top)] over both corpus directories."""
    out = []
    for d in CORPUS_DIRS:
        full = os.path.join(REFERENCE, d)
        if not os.path.isdir(full):
            continue
        for fn in sorted(os.listdir(full)):
            if not fn.endswith(".cpp"):
                continue
            units = extract_units(os.path.join(full, fn))
            for k, (src, top, inc) in enumerate(units):
                name = fn[:-4] if len(units) == 1 else f"{fn[:-4]}#{k}"
                out.append((f"{os.path.basename(d)}/{name}", src, top,
                            inc))
    return out


# cases whose reference driver checks that compilation FAILS with a
# correctly-mapped source position (parse.cpp error-map tests)
EXPECT_ERROR = ("sim_preprocessor_linecol_map",)


def run_case(src: str, top: str, cycles: int = 8, seed: int = 0,
             expect_error: bool = False, includes=None):
    """compile -> elaborate -> simulate -> synth -> cross-check.

    The cross-check compares behavioral vs gate-level outputs after
    every full clock cycle (the reference drivers' checking style).
    Sources with behavioral-only semantics (initial blocks /
    declaration initializers / $urandom) still run the whole pipeline
    but skip the value comparison, as the reference runs them through
    its event-driven simulator only.

    Returns None on success, or a short failure string."""
    import numpy as np
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                              SynthOptions)
    from phy_engine_tpu.verilog.simulate import Runtime, settle
    from phy_engine_tpu.verilog.simulate import simulate as bsim
    from phy_engine_tpu.verilog.fourstate import Val

    popt = None
    if includes:
        from phy_engine_tpu.verilog.preprocess import PreprocessOptions
        popt = PreprocessOptions(include_resolver=includes.get)
    try:
        mods = compile_source(src, popt)
        design = build_design(mods)
        topm = find_module(design, top)
        if topm is None:
            return "top-not-found"
        inst = elaborate(design, topm)
    except Exception as e:  # noqa: BLE001
        if expect_error and "line" in str(e):
            return None          # failing with a mapped position IS
        return f"frontend: {type(e).__name__}: {e}"   # the expectation
    if expect_error:
        return "expected a front-end error"

    behavioral_only = ("$urandom" in src or "$random" in src or
                       any(m.initials for m in mods))

    try:
        rt = Runtime(inst)
        settle(rt, 0)
    except Exception as e:  # noqa: BLE001
        return f"simulate: {type(e).__name__}: {e}"

    try:
        c = pe.Circuit()
        nl = c.nl
        port_nets = {}
        in_models = {}
        out_ports = []
        for pname in topm.ports:
            sig = inst.signals[pname]
            nets = [netops.create_node(nl) for _ in range(sig.width)]
            port_nets[pname] = nets
            if sig.decl.direction == "input":
                ms = []
                for n in nets:
                    m = netops.add_model(nl, INPUT, {"boolean": 2.0})
                    netops.add_to_node(nl, m, 0, n)
                    ms.append(m)
                in_models[pname] = ms
            elif sig.decl.direction == "output":
                out_ports.append(pname)
        synthesize_to_netlist(nl, design, inst, port_nets,
                              SynthOptions(opt_level=1))
    except Exception as e:  # noqa: BLE001
        return f"synth: {type(e).__name__}: {e}"

    # stimulus plan: clock-ish ports toggled; reset handled by polarity
    rng = np.random.default_rng(seed)
    seq = "posedge" in src or "negedge" in src
    clks = [p for p in in_models
            if p.lower() in ("clk", "clock", "clk_i")]
    rsts = [p for p in in_models if p.lower().startswith(("rst",
                                                          "reset"))]
    data = [p for p in in_models if p not in clks and p not in rsts]

    def set_in(pname, value):
        for i, m in enumerate(in_models[pname]):
            m.set_attribute("boolean", float((value >> i) & 1))
        rt.values[pname] = Val.from_int(value,
                                        rt.values[pname].width)

    def compare(tag):
        if behavioral_only:
            return None
        for oname in out_ports:
            beh = rt.values[oname]
            for i, n in enumerate(port_nets[oname]):
                bcode = beh.bit(i)
                if bcode not in (0, 1):
                    continue            # undefined behaviorally: free
                g = c.node_digital(n)
                if g != bcode:
                    return (f"mismatch@{tag} {oname}[{i}]: "
                            f"beh={bcode} gate={g}")
        return None

    try:
        tick = [0]

        def step():
            c.digital_clk()
            tick[0] += 1
            bsim(rt, tick[0])

        # reset pulse (active level guessed by name suffix)
        for r in rsts:
            active = 0 if r.endswith("_n") else 1
            set_in(r, active * ((1 << len(in_models[r])) - 1))
        for cl in clks:
            set_in(cl, 0)
        step()
        if seq and clks:
            for cl in clks:
                set_in(cl, 1)
            step()
            for cl in clks:
                set_in(cl, 0)
            step()
        for r in rsts:
            inactive = 1 if r.endswith("_n") else 0
            set_in(r, inactive * ((1 << len(in_models[r])) - 1))

        for cyc in range(cycles):
            for pname in data:
                w = len(in_models[pname])
                set_in(pname, int(rng.integers(0, 1 << min(w, 62))))
            if seq and clks:
                step()                      # data settles, clk low
                for cl in clks:
                    set_in(cl, 1)
                step()
                for cl in clks:
                    set_in(cl, 0)
                step()
            else:
                step()
            err = compare(f"c{cyc}")
            if err:
                return err
    except Exception as e:  # noqa: BLE001
        return f"run: {type(e).__name__}: {e}"
    return None


def main():
    verbose = "--verbose" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    cases = collect_corpus()
    if only:
        cases = [c for c in cases if any(o in c[0] for o in only)]
    passed = failed = 0
    fails = []
    import time
    for name, src, top, inc in cases:
        t0 = time.time()
        err = run_case(src, top, includes=inc,
                       expect_error=any(e in name
                                        for e in EXPECT_ERROR))
        dt = time.time() - t0
        if err is None:
            passed += 1
            if verbose:
                print(f"PASS {name} ({dt:.1f}s)", flush=True)
        else:
            failed += 1
            fails.append((name, err))
            print(f"FAIL {name}: {err} ({dt:.1f}s)", flush=True)
    print(f"\n{passed}/{passed + failed} passed "
          f"({100.0 * passed / max(1, passed + failed):.1f}%)")
    return fails


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
