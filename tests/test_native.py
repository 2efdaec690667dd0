"""Native TT backend tests: C++ library vs numpy fallback parity."""

import numpy as np

from phy_engine_tpu import native as N
from phy_engine_tpu.native import eval_graph, rows_equal


def _sample_graph():
    # leaves 0,1; AND(0,1)=2; OR(2,1)=3; NOT(3)=4; XOR(4,0)=5
    op = [N.OP_LEAF, N.OP_LEAF, N.OP_AND, N.OP_OR, N.OP_NOT, N.OP_XOR]
    f0 = [0, 0, 0, 2, 3, 4]
    f1 = [0, 0, 1, 1, 0, 0]
    rng = np.random.default_rng(42)
    w = np.zeros((6, 8), np.uint64)
    w[0] = rng.integers(0, 1 << 63, 8, dtype=np.uint64)
    w[1] = rng.integers(0, 1 << 63, 8, dtype=np.uint64)
    return op, f0, f1, w


def test_native_matches_fallback(monkeypatch):
    op, f0, f1, w = _sample_graph()
    got_native = eval_graph(op, f0, f1, w.copy())
    # force fallback
    monkeypatch.setattr(N, "_lib", None)
    monkeypatch.setattr(N, "_tried", True)
    got_np = eval_graph(op, f0, f1, w.copy())
    assert (got_native == got_np).all()
    # semantic spot check
    a, b = w[0], w[1]
    assert (got_np[2] == (a & b)).all()
    assert (got_np[5] == (~((a & b) | b) ^ a)).all()


def test_rows_equal_tail_mask():
    a = np.array([0xDEADBEEF, 0x12345], np.uint64)
    b = a.copy()
    b[1] ^= np.uint64(1 << 40)      # differ only above npat=100
    assert rows_equal(a, b, 100, False)
    assert not rows_equal(a, b, 128, False)
    assert rows_equal(a, ~a, 128, True)
