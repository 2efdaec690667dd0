"""Dictionary/corpus mutation fuzzer for the Verilog front-end.

Role parity: the reference fuzzes preprocess->compile->simulate with
libFuzzer + a Verilog token dictionary
(/root/reference/fuzz/verilog_digital_fuzzer.cpp).  Atheris is not in
this image, so this is a corpus-driven mutation loop with a cheap
novelty signal standing in for edge coverage: a mutant is "interesting"
(kept in the live corpus) when its pipeline outcome signature — the
exception type plus the deepest in-repo ``file:line`` it was raised
from — has not been seen before.  That drives the corpus toward new
error paths the same way coverage feedback does, at Python speed.

Seeds: the reference conformance corpus (104 real designs) plus the
hand-written seed set in tests/test_fuzz.py.  Mutations: byte-level
edits, Verilog-dictionary token splices, line shuffles/duplication,
truncation, source crossover, and numeric-literal perturbation.

A crash = any exception that is NOT CompileError/SimError (or a
too-deep RecursionError) or a per-case timeout.  Crashing inputs are
minimized by line-dropping and written to tests/fuzz_corpus/crashes/;
novel-signature inputs to tests/fuzz_corpus/interesting/ (checked in,
and replayed by tests/test_fuzz.py::test_fuzz_corpus_replay).

Run: ``python tools/fuzz_verilog.py [--minutes N] [--seed S]``
"""

from __future__ import annotations

import argparse
import hashlib
import os
import random
import signal
import sys
import time
import traceback

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from phy_engine_tpu.verilog import (compile_source, build_design,  # noqa: E402
                                    elaborate, settle, Runtime)
from phy_engine_tpu.verilog.errors import CompileError  # noqa: E402
from phy_engine_tpu.verilog.simulate import SimError, simulate  # noqa: E402

CORPUS_DIR = os.path.join(REPO, "tests", "fuzz_corpus")
ALLOWED = (CompileError, SimError, RecursionError)
PER_CASE_TIMEOUT = 10          # seconds (wall, SIGALRM)

DICT = ["module", "endmodule", "input", "output", "inout", "wire",
        "reg", "assign", "always", "initial", "@", "posedge",
        "negedge", "begin", "end", "if", "else", "case", "casez",
        "casex", "endcase", "default", "for", "while", "repeat",
        "generate", "endgenerate", "genvar", "function",
        "endfunction", "task", "endtask", "parameter", "localparam",
        "integer", "signed", "supply0", "supply1", "tri",
        "`define", "`undef", "`ifdef", "`ifndef", "`else", "`endif",
        "`include", "$clog2", "$bits", "$signed", "$unsigned",
        "$random", "$urandom", "$display", "$finish",
        "4'b10xz", "8'hFF", "32'hDEAD_BEEF", "1'bz", "1'bx", "'0",
        "<=", ">=", "==", "!=", "===", "!==", "<<", ">>", "<<<",
        ">>>", "&&", "||", "**", "+:", "-:", "::", "#1", "#(1,2)",
        "(*)", ";", ",", ".", "?", ":", "{", "}", "[", "]"]


class Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise Timeout()


def pipeline(src: str):
    """Run the full front-end; return an outcome signature string."""
    try:
        signal.alarm(PER_CASE_TIMEOUT)
        try:
            mods = compile_source(src)
            if not mods:
                return "ok:empty"
            design = build_design(mods)
            inst = elaborate(design, mods[-1])
            rt = Runtime(inst)
            settle(rt, 0)
            for t in range(1, 4):
                simulate(rt, t)
            return "ok:sim"
        finally:
            signal.alarm(0)
    except ALLOWED as e:
        tb = e.__traceback__
        site = "?"
        while tb is not None:
            fn = tb.tb_frame.f_code.co_filename
            if fn.startswith(REPO):
                site = f"{os.path.relpath(fn, REPO)}:{tb.tb_lineno}"
            tb = tb.tb_next
        return f"{type(e).__name__}@{site}"
    except Timeout:
        return "CRASH:timeout"
    except BaseException as e:  # noqa: BLE001 — the fuzzer's whole point
        tb = traceback.format_exc(limit=6)
        return f"CRASH:{type(e).__name__}:{tb.splitlines()[-1][:120]}"


def mutate(rng: random.Random, src: str, pool) -> str:
    k = rng.randrange(7)
    if k == 0:                                  # byte edits
        chars = list(src)
        for _ in range(rng.randrange(1, 10)):
            if not chars:
                break
            pos = rng.randrange(len(chars))
            c = rng.choice("(){}[];,=<>&|^~?:@#$%'\"\\x01 \n0123456789")
            op = rng.randrange(3)
            if op == 0:
                del chars[pos]
            elif op == 1:
                chars.insert(pos, c)
            else:
                chars[pos] = c
        return "".join(chars)
    if k == 1:                                  # dictionary splice
        toks = src.split(" ")
        for _ in range(rng.randrange(1, 6)):
            toks.insert(rng.randrange(len(toks) + 1), rng.choice(DICT))
        return " ".join(toks)
    if k == 2:                                  # line shuffle/dup/drop
        lines = src.splitlines()
        if len(lines) > 2:
            op = rng.randrange(3)
            i = rng.randrange(len(lines))
            j = rng.randrange(len(lines))
            if op == 0:
                lines[i], lines[j] = lines[j], lines[i]
            elif op == 1:
                lines.insert(i, lines[j])
            else:
                del lines[i]
        return "\n".join(lines)
    if k == 3:                                  # truncate
        if len(src) > 4:
            return src[:rng.randrange(1, len(src))]
        return src
    if k == 4:                                  # crossover
        other = rng.choice(pool)
        cut_a = rng.randrange(len(src) + 1)
        cut_b = rng.randrange(len(other) + 1)
        return src[:cut_a] + other[cut_b:]
    if k == 5:                                  # numeric perturbation
        out = []
        for tok in src.split(" "):
            if tok.isdigit() and rng.random() < 0.4:
                tok = str(rng.choice([0, 1, -1, 2**31 - 1, 2**32,
                                      99999, rng.randrange(0, 256)]))
            out.append(tok)
        return " ".join(out)
    # token soup from the dictionary
    return " ".join(rng.choice(DICT)
                    for _ in range(rng.randrange(3, 80)))


def minimize(src: str, sig: str) -> str:
    """Greedy line-dropping while the crash signature persists."""
    lines = src.splitlines()
    changed = True
    while changed and len(lines) > 1:
        changed = False
        i = 0
        while i < len(lines):
            cand = lines[:i] + lines[i + 1:]
            if pipeline("\n".join(cand)) == sig:
                lines = cand
                changed = True
            else:
                i += 1
    return "\n".join(lines)


def seeds():
    import test_fuzz
    pool = list(test_fuzz.SEED_SOURCES)
    try:
        from conformance import collect_corpus
        for _name, src, _top, _inc in collect_corpus():
            pool.append(src)
    except Exception as e:  # noqa: BLE001
        print(f"corpus unavailable ({e}); hand seeds only",
              file=sys.stderr)
    inter = os.path.join(CORPUS_DIR, "interesting")
    if os.path.isdir(inter):
        for f in sorted(os.listdir(inter)):
            pool.append(open(os.path.join(inter, f)).read())
    return pool


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-interesting", action="store_true",
                    help="check novel-signature mutants into the corpus")
    args = ap.parse_args()
    signal.signal(signal.SIGALRM, _alarm)
    rng = random.Random(args.seed)
    pool = seeds()
    print(f"{len(pool)} seeds", flush=True)

    # baseline signatures from the seeds themselves
    seen = set()
    for s in pool:
        seen.add(pipeline(s))
    print(f"{len(seen)} baseline signatures", flush=True)

    os.makedirs(os.path.join(CORPUS_DIR, "crashes"), exist_ok=True)
    os.makedirs(os.path.join(CORPUS_DIR, "interesting"), exist_ok=True)
    deadline = time.time() + args.minutes * 60
    n = n_new = n_crash = 0
    while time.time() < deadline:
        src = mutate(rng, rng.choice(pool), pool)
        sig = pipeline(src)
        n += 1
        if sig.startswith("CRASH"):
            n_crash += 1
            small = minimize(src, sig)
            h = hashlib.sha1(sig.encode()).hexdigest()[:12]
            path = os.path.join(CORPUS_DIR, "crashes", f"{h}.v")
            if not os.path.exists(path):
                with open(path, "w") as f:
                    f.write(f"// {sig}\n{small}\n")
                print(f"CRASH {sig} -> {path}", flush=True)
        elif sig not in seen:
            seen.add(sig)
            n_new += 1
            pool.append(src)
            if args.save_interesting:
                h = hashlib.sha1(src.encode()).hexdigest()[:12]
                with open(os.path.join(CORPUS_DIR, "interesting",
                                       f"{h}.v"), "w") as f:
                    f.write(src)
    print(f"{n} execs, {n_new} novel signatures, {n_crash} crashes, "
          f"{len(seen)} total signatures", flush=True)
    return 1 if n_crash else 0


if __name__ == "__main__":
    sys.exit(main())
