"""Digital headline benchmark: gate-evaluations/sec on the RV32 core.

BASELINE.md north-star metric (b): synthesize the in-repo RV32I-subset
CPU to gates, then clock the bit-packed digital engine and report
gate-evals/s = live gates x fixpoint sweeps ... measured conservatively
as gates x ticks / wall (each tick re-evaluates every gate at least
once).  The scalar baseline is a pure-Python interpreted sweep of the
same netlist, standing in for the reference's single-threaded
event-driven engine on this host.

Prints one JSON line (same shape as bench.py; run manually — the driver
runs bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "tests"))

CYCLES = int(os.environ.get("PE_BENCH_DIGITAL_CYCLES", "200"))


def build():
    from test_riscv import _cpu_source
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                              SynthOptions)
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT

    src, expect = _cpu_source()
    mods = compile_source(src)
    design = build_design(mods)
    topm = find_module(design, "pe_rv32")
    inst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    port_nets = {p: [netops.create_node(nl)
                     for _ in range(inst.signals[p].width)]
                 for p in topm.ports}
    clk = netops.add_model(nl, INPUT, {"boolean": 0.0})
    rst = netops.add_model(nl, INPUT, {"boolean": 0.0})
    netops.add_to_node(nl, clk, 0, port_nets["clk"][0])
    netops.add_to_node(nl, rst, 0, port_nets["rst_n"][0])
    report = synthesize_to_netlist(nl, design, inst, port_nets,
                                   SynthOptions(opt_level=1))
    return c, clk, rst, port_nets, report, expect


def tpu_run(c, clk, rst, port_nets, n_gates, expect):
    # device-side scan: settle + reset pulse, then CYCLES full clocks
    sched = [{}, {clk: 1}, {clk: 0}, {rst: 1}]
    body = []
    for _ in range(CYCLES):
        body += [{clk: 1, rst: 1}, {clk: 0, rst: 1}]
    c.digital_run(sched)                      # warm start + reset
    c.digital_run(body)                       # compile the T-shape once
    t0 = time.perf_counter()
    tr = c.digital_run(body)
    elapsed = time.perf_counter() - t0
    ticks = len(body)

    res = int(tr.bus_values(port_nets["result"])[-1])
    assert res == expect, (hex(res), hex(expect))
    return n_gates * ticks / elapsed


def cpu_baseline(n_gates):
    """Interpreted scalar gate sweep: same op mix, Python dict netlist —
    the role of a single-threaded event-driven interpreter."""
    import random
    rng = random.Random(7)
    # synthetic leveled netlist of n_gates 2-input gates
    values = [rng.randrange(2) for _ in range(n_gates + 2)]
    gates = []
    for i in range(n_gates):
        a = rng.randrange(i + 2)
        b = rng.randrange(i + 2)
        gates.append((rng.randrange(4), a, b, i + 2))
    sweeps = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 1.0:
        for op, a, b, o in gates:
            x, y = values[a], values[b]
            if op == 0:
                values[o] = x & y
            elif op == 1:
                values[o] = x | y
            elif op == 2:
                values[o] = x ^ y
            else:
                values[o] = 1 - (x & y)
        sweeps += 1
    elapsed = time.perf_counter() - t0
    return n_gates * sweeps / elapsed


def build_fp16():
    from test_fp16 import FP16_ADD_SRC, _ref_add
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                              SynthOptions)
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT

    mods = compile_source(FP16_ADD_SRC)
    design = build_design(mods)
    topm = find_module(design, "fp16_add")
    inst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    pn = {p: [netops.create_node(nl)
              for _ in range(inst.signals[p].width)]
          for p in topm.ports}
    ins = {}
    for name in ("a", "b"):
        ins[name] = []
        for n in pn[name]:
            m = netops.add_model(nl, INPUT, {"boolean": 0.0})
            netops.add_to_node(nl, m, 0, n)
            ins[name].append(m)
    report = synthesize_to_netlist(nl, design, inst, pn,
                                   SynthOptions(opt_level=1))
    return c, ins, pn, report, _ref_add


def fp16_lanes_run():
    """Lane-parallel combinational throughput: 32 random fp16 adds per
    tick (the reference's CUDA test-vector batching role)."""
    import numpy as np
    c, ins, pn, report, _ref_add = build_fp16()
    n_gates = report.gate_count
    T = int(os.environ.get("PE_BENCH_DIGITAL_TICKS", "64"))
    rng = np.random.default_rng(3)
    vec_a = rng.integers(0, 1 << 16, (T, 32))
    vec_b = rng.integers(0, 1 << 16, (T, 32))
    sched = []
    for t in range(T):
        entry = {}
        for name, vals in (("a", vec_a), ("b", vec_b)):
            for i, m in enumerate(ins[name]):
                word = 0
                for lane in range(32):
                    word |= (int(vals[t, lane]) >> i & 1) << lane
                entry[m] = (word, 0)
        sched.append(entry)
    c.digital_run(sched)                 # compile + warm
    t0 = time.perf_counter()
    tr = c.digital_run(sched)
    elapsed = time.perf_counter() - t0
    # spot-check a lane against numpy
    got = tr.bus_values_lanes(pn["y"])
    assert int(got[-1, 7]) == _ref_add(int(vec_a[-1, 7]),
                                       int(vec_b[-1, 7]))
    return n_gates * T * 32 / elapsed, n_gates


def build_fp16_cyclic():
    """The reference's latch-heavy fp16_addsub unit (~3.5k cyclic
    gates from incomplete always@* assignment) — the ir.cyclic class
    that round 4's flash engine could not take.  Falls back to the
    in-repo feed-forward adder when the reference tree is absent."""
    import phy_engine_tpu as pe
    from phy_engine_tpu import netops
    from phy_engine_tpu.models import INPUT
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import (synthesize_to_netlist,
                                              SynthOptions)

    path = "/root/reference/test/0020.fp16_calc/fp16_addsub.v"
    if os.path.exists(path):
        src, top = open(path).read(), "fp16_addsub_unit"
    else:
        from test_fp16 import FP16_ADD_SRC
        src, top = FP16_ADD_SRC, "fp16_add"
    mods = compile_source(src)
    design = build_design(mods)
    topm = find_module(design, top)
    inst = elaborate(design, topm)
    c = pe.Circuit()
    nl = c.nl
    pn = {p: [netops.create_node(nl)
              for _ in range(inst.signals[p].width)]
          for p in topm.ports}
    ins = {}
    in_ports = [("a", 16), ("b", 16)]
    if top == "fp16_addsub_unit":
        in_ports.append(("sub", 1))
    for name, w in in_ports:
        ins[name] = []
        for i in range(w):
            m = netops.add_model(nl, INPUT, {"boolean": 0.0})
            netops.add_to_node(nl, m, 0, pn[name][i])
            ins[name].append(m)
    report = synthesize_to_netlist(nl, design, inst, pn,
                                   SynthOptions(opt_level=1))
    return c, ins, pn, report


def fp16_flash_run():
    """Batched-instances x 32-lane fp16 adds through the flash engine's
    cyclic (latch-feedback) path: B instances, each tick carries 32
    independent operand pairs per instance.  Gate-evals counted
    conservatively as live gates x ticks x lanes x instances (each
    fixpoint pass re-evaluates the cyclic block at least once).
    Verifies a sample of lanes against the levels engine."""
    import numpy as np
    os.environ["PE_TPU_DIGITAL"] = "flash"
    c, ins, pn, report = build_fp16_cyclic()
    n_gates = report.gate_count
    T = int(os.environ.get("PE_BENCH_DIGITAL_TICKS", "16"))
    B = int(os.environ.get("PE_BENCH_DIGITAL_BATCH", "128"))
    rng = np.random.default_rng(7)
    va = rng.integers(0, 1 << 16, (B, T, 32))
    vb = rng.integers(0, 1 << 16, (B, T, 32))

    def sched_for(b):
        s = []
        for t in range(T):
            e = {}
            for name, vals in (("a", va), ("b", vb)):
                for i, m in enumerate(ins[name]):
                    word = 0
                    for lane in range(32):
                        word |= (int(vals[b, t, lane]) >> i & 1) << lane
                    e[m] = (word, 0)
            if "sub" in ins:
                e[ins["sub"][0]] = (0, 0)
            s.append(e)
        return s

    def run_words(circ, inputs, nets, bsel):
        """Full (hv, hu) lane words for the selected instances."""
        eng = circ._digital or (circ.prepare() and circ._digital)
        eng = circ._digital
        comp = [circ._compile_schedule(sched_for(b, inputs))
                for b in bsel]
        fs = comp[0][1]
        FV = np.stack([cc[2] for cc in comp])
        FU = np.stack([cc[3] for cc in comp])
        watch = [eng.ir.node_sig.get(id(n), 0) for n in nets]
        return eng.run_ticks_batched(fs, FV, FU, watch=watch)

    def sched_for(b, inputs):
        s = []
        for t in range(T):
            e = {}
            for name, vals in (("a", va), ("b", vb)):
                for i, m in enumerate(inputs[name]):
                    word = 0
                    for lane in range(32):
                        word |= (int(vals[b, t, lane]) >> i & 1) << lane
                    e[m] = (word, 0)
            if "sub" in inputs:
                e[inputs["sub"][0]] = (0, 0)
            s.append(e)
        return s

    run_words(c, ins, pn["y"], range(B))                # compile+warm
    t0 = time.perf_counter()
    hv, hu = run_words(c, ins, pn["y"], range(B))
    elapsed = time.perf_counter() - t0
    # host native single-trace denominator on the same design (the
    # engine the latch class previously fell back to; it runs
    # instances serially, so its aggregate is its per-instance rate)
    from phy_engine_tpu.digital import native_run
    native_rate = 0.0
    if native_run.available():
        os.environ["PE_TPU_DIGITAL"] = "native"
        cn, insn, pnn, _rep = build_fp16_cyclic()
        run_words(cn, insn, pnn["y"], [0, 1])           # warm
        t0 = time.perf_counter()
        nv, nu = run_words(cn, insn, pnn["y"], [0, 1])
        native_rate = n_gates * T * 32 * 2 / (time.perf_counter() - t0)
        assert np.array_equal(np.asarray(nv), np.asarray(hv)[:2]), \
            "flash != native (v plane)"
        assert np.array_equal(np.asarray(nu), np.asarray(hu)[:2]), \
            "flash != native (u plane)"
    else:
        # bit-exactness spot check vs the levels engine instead
        os.environ["PE_TPU_DIGITAL"] = "levels"
        c2, ins2, pn2, _rep = build_fp16_cyclic()
        pick = [0, B - 1]
        rv, ru = run_words(c2, ins2, pn2["y"], pick)
        assert np.array_equal(np.asarray(rv), np.asarray(hv)[pick]), \
            "flash != levels (v plane)"
        assert np.array_equal(np.asarray(ru), np.asarray(hu)[pick]), \
            "flash != levels (u plane)"
    return n_gates * T * 32 * B / elapsed, n_gates, B, native_rate


def turbo_batch_run():
    """Batched-instances record: B independent RV32 instances through
    the fast-gather flash engine (digital/flash.py) vs the host C++
    sweep engine clocking the same design single-trace (its strongest
    mode).  Round-4 redesign: the round-3 one-hot-matmul turbo core was
    flat at ~8M aggregate gate-evals/s; flash's take-based state rides
    the XLA vectorized-gather path (engaged by padding the state to
    >=256 columns), so the wall-time is flat in batch and the aggregate
    scales linearly — the multi-instance fan-out role of
    pe_synth_cuda_u64_cones.cu:671-1860."""
    import numpy as np
    c, clk, rst, port_nets, report, expect = build()
    n = report.gate_count + report.ff_count
    B = int(os.environ.get("PE_BENCH_DIGITAL_BATCH", "128"))
    body = []
    for _ in range(CYCLES):
        body += [{clk: 1, rst: 1}, {clk: 0, rst: 1}]
    warm = [{}, {clk: 1}, {clk: 0}, {rst: 1}]

    # native single-trace reference on the same design + schedule
    os.environ["PE_TPU_DIGITAL"] = "native"
    c.digital_run(warm)
    c.digital_run(body)
    t0 = time.perf_counter()
    tr = c.digital_run(body)
    native_rate = n * len(body) / (time.perf_counter() - t0)
    res = int(tr.bus_values(port_nets["result"])[-1])
    assert res == expect, (hex(res), hex(expect))

    # batched flash: B identical instances (RV32 has no data inputs),
    # aggregate = gates * ticks * B / wall
    os.environ["PE_TPU_DIGITAL"] = "flash"
    c2, clk2, rst2, port_nets2, _rep, _ = build()
    c2.digital_run(warm := [{}, {clk2: 1}, {clk2: 0}, {rst2: 1}])
    body2 = []
    for _ in range(CYCLES):
        body2 += [{clk2: 1, rst2: 1}, {clk2: 0, rst2: 1}]
    scheds = [body2] * B
    watch = port_nets2["result"]
    codes = c2.digital_run_batch(scheds, watch_nodes=watch)  # compile
    t0 = time.perf_counter()
    codes = c2.digital_run_batch(scheds, watch_nodes=watch)
    elapsed = time.perf_counter() - t0
    turbo_rate = n * len(body2) * B / elapsed
    for b in (0, B - 1):
        got = sum(int(codes[b, -1, i] == 1) << i
                  for i in range(len(watch)))
        assert got == expect, (b, hex(got), hex(expect))
    return turbo_rate, native_rate, n, B


def main():
    mode = os.environ.get("PE_BENCH_DIGITAL_MODE", "rv32")
    if mode == "turbo_batch":
        turbo, native, n, B = turbo_batch_run()
        print(json.dumps({
            "metric": "turbo_batch_gate_evals_per_sec",
            "value": round(turbo, 1),
            "unit": "gate-evals/s",
            "vs_baseline": round(turbo / native, 2),
            "batch": B,
            "native_single_trace": round(native, 1),
        }))
        return
    if mode == "fp16_flash":
        tpu, n, B, native = fp16_flash_run()
        print(json.dumps({
            "metric": "fp16_cyclic_flash_gate_evals_per_sec",
            "value": round(tpu, 1),
            "unit": "gate-evals/s",
            "vs_baseline": round(tpu / native, 2) if native else 0.0,
            "gates": n,
            "batch": B,
            "native_single_trace": round(native, 1),
        }))
        return
    if mode == "fp16_lanes":
        tpu, n = fp16_lanes_run()
        cpu = max(cpu_baseline(n) for _ in range(2))
        print(json.dumps({
            "metric": "fp16_lane_gate_evals_per_sec",
            "value": round(tpu, 1),
            "unit": "gate-evals/s",
            "vs_baseline": round(tpu / cpu, 2),
        }))
        return
    c, clk, rst, port_nets, report, expect = build()
    n = report.gate_count + report.ff_count
    cpu = max(cpu_baseline(n) for _ in range(2))
    tpu = tpu_run(c, clk, rst, port_nets, n, expect)
    print(json.dumps({
        "metric": "rv32_gate_evals_per_sec",
        "value": round(tpu, 1),
        "unit": "gate-evals/s",
        "vs_baseline": round(tpu / cpu, 2),
    }))


if __name__ == "__main__":
    main()
