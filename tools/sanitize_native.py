"""ASan/UBSan run of the native C++ backends (VERDICT r3 item 9).

The reference fuzzes its digital engine under libFuzzer+ASan+UBSan
(/root/reference/fuzz/verilog_digital_fuzzer.cpp,
/root/reference/test/CMakeLists.txt:68-83).  Our native surface is two
hand-written C++ libraries — the AVX-512 gather/scatter sweep engine
(native/pe_digital.cpp) and the u64 truth-table kernel
(native/pe_tt.cpp) — which is exactly where memory bugs hide.

This tool re-execs itself with the GCC sanitizer runtimes preloaded,
builds `libpe_digital_asan.so` / `libpe_tt_asan.so`
(PE_TPU_NATIVE_SANITIZE=1, -fsanitize=address,undefined
-fno-sanitize-recover=all), and drives both through representative
workloads: synthesized feed-forward and cyclic (latch-feedback)
designs at every optimization level, multi-tick batched stimulus with
the narrow-cone path, and randomized truth-table graphs checked
against numpy.  Any sanitizer report aborts the process (non-zero
exit); a clean exit prints PASS lines.

Run: ``python tools/sanitize_native.py``  (~2 min)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def reexec():
    out = subprocess.run(
        ["g++", "-print-file-name=libasan.so"],
        capture_output=True, text=True, check=True)
    asan = out.stdout.strip()
    out = subprocess.run(
        ["g++", "-print-file-name=libubsan.so"],
        capture_output=True, text=True, check=True)
    ubsan = out.stdout.strip()
    env = dict(os.environ)
    env["LD_PRELOAD"] = f"{asan}:{ubsan}"
    # leak checking trips on CPython's arena allocator; the target is
    # heap-corruption/UB in OUR .so, not interpreter leaks
    env["ASAN_OPTIONS"] = ("detect_leaks=0:abort_on_error=1:"
                           "strict_string_checks=1")
    env["UBSAN_OPTIONS"] = "halt_on_error=1:print_stacktrace=1"
    env["PE_TPU_NATIVE_SANITIZE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PE_SAN_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable, __file__], env)


def drive_digital():
    import numpy as np
    from phy_engine_tpu.verilog import (compile_source, build_design,
                                        elaborate, find_module)
    from phy_engine_tpu.verilog.synth import synthesize_to_netlist, \
        SynthOptions
    from phy_engine_tpu.netlist import Netlist, operations as ops
    from phy_engine_tpu.digital.ir import lower_digital
    from phy_engine_tpu.digital import native_run, turbo

    designs = [
        # feed-forward mixed comb + FFs
        ("ff", """
module ff(input clk, input rst_n, input [7:0] a, input [7:0] b,
          output reg [8:0] acc, output [7:0] y);
  assign y = (a & b) ^ (a + b);
  always @(posedge clk or negedge rst_n)
    if (!rst_n) acc <= 0; else acc <= acc + a + b;
endmodule
"""),
        # gate-level latch feedback (cyclic IR -> fixpoint path)
        ("latch", """
module latch(input en, input d, output q, output qn);
  wire s = ~(d & en);
  wire r = ~(~d & en);
  assign q = ~(s & qn);
  assign qn = ~(r & q);
endmodule
"""),
        # wide shifter: deep levels, big tables
        ("shift", """
module shift(input clk, input [4:0] n, input [31:0] x,
             output reg [31:0] y);
  always @(posedge clk) y <= (x << n) | (x >> (32 - n));
endmodule
"""),
    ]
    rng = np.random.default_rng(7)
    for name, src in designs:
        for lvl in (0, 1, 2):
            nl = Netlist()
            mods = compile_source(src)
            design = build_design(mods)
            topm = find_module(design, name)
            inst = elaborate(design, topm)
            port_nets = {}
            for pname in topm.ports:
                sig = inst.signals[pname]
                port_nets[pname] = [ops.create_node(nl)
                                    for _ in range(sig.width)]
            synthesize_to_netlist(nl, design, inst, port_nets,
                                  SynthOptions(opt_level=lvl))
            ir = lower_digital(nl)
            if ir is None:
                raise RuntimeError(f"{name}: no digital IR")
            if not turbo.eligible(ir, allow_cyclic=True):
                raise RuntimeError(f"{name}: not native-eligible")
            plan = native_run.NativePlan(ir)
            # forced inputs = every INPUT signal, random multi-tick
            fsig = np.array([s for _i, sigs in ir.inputs
                             for s in sigs], np.int32)
            T = 64
            FV = rng.integers(0, 2**32, (T, len(fsig)),
                              dtype=np.uint64).astype(np.uint32)
            FU = (rng.integers(0, 2**32, (T, len(fsig)),
                               dtype=np.uint64).astype(np.uint32)
                  & (FV >> np.uint32(1)))     # sprinkle X/Z
            sv = np.zeros(ir.n_signals, np.uint32)
            su = np.full(ir.n_signals, 0xFFFFFFFF, np.uint32)
            st = plan.pack_state(sv, su, {})
            HV, HU = plan.run(st, fsig, FV, FU)
            assert HV.shape == (T, ir.n_signals)
            # narrow-cone second run (varying subset only)
            FV2 = np.repeat(FV[:1], T, axis=0)
            FV2[:, :1] = rng.integers(0, 2**32, (T, 1),
                                      dtype=np.uint64).astype(np.uint32)
            plan.run(st, fsig, FV2, np.zeros_like(FV2))
            print(f"PASS digital {name} -O{lvl}", flush=True)


def drive_tt():
    import numpy as np
    from phy_engine_tpu.native import (get_lib, OP_LEAF, OP_NOT, OP_AND,
                                       OP_OR, OP_XOR, OP_CONST0,
                                       OP_CONST1, eval_graph)

    if get_lib() is None:
        raise RuntimeError("tt lib unavailable")
    rng = np.random.default_rng(11)
    for trial in range(50):
        n_leaf = int(rng.integers(1, 7))
        n_gate = int(rng.integers(1, 64))
        W = int(rng.integers(1, 9))
        n = n_leaf + n_gate
        ops_arr = np.zeros(n, np.int32)
        a_arr = np.zeros(n, np.int32)
        b_arr = np.zeros(n, np.int32)
        for g in range(n_leaf, n):
            ops_arr[g] = int(rng.choice([OP_NOT, OP_AND, OP_OR, OP_XOR,
                                         OP_CONST0, OP_CONST1]))
            a_arr[g] = int(rng.integers(0, g))
            b_arr[g] = int(rng.integers(0, g))
        words = np.zeros((n, W), np.uint64)
        words[:n_leaf] = rng.integers(0, 2**64, (n_leaf, W),
                                      dtype=np.uint64)
        leaves = words[:n_leaf].copy()
        out = eval_graph(ops_arr, a_arr, b_arr, words)
        # numpy oracle
        vals = [leaves[i] for i in range(n_leaf)]
        for g in range(n_leaf, n):
            a = vals[a_arr[g]]
            b = vals[b_arr[g]]
            op = ops_arr[g]
            if op == OP_NOT:
                v = ~a
            elif op == OP_AND:
                v = a & b
            elif op == OP_OR:
                v = a | b
            elif op == OP_XOR:
                v = a ^ b
            elif op == OP_CONST0:
                v = np.zeros(W, np.uint64)
            else:
                v = np.full(W, ~np.uint64(0))
            vals.append(v)
        assert (out[-1] == vals[-1]).all(), trial
    print("PASS tt 50 random graphs vs numpy", flush=True)


def main():
    if not os.environ.get("PE_SAN_CHILD"):
        reexec()
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from phy_engine_tpu import native
    assert native._SAN, "sanitized build not selected"
    drive_digital()
    drive_tt()
    print("SANITIZER RUN CLEAN (ASan+UBSan, pe_digital.cpp + pe_tt.cpp)")


if __name__ == "__main__":
    main()
