"""Native host kernels vs pure-NumPy oracles — exact diff over random
extension and global-alignment tasks."""

import numpy as np
import pytest

from bwa_flow_tpu.ops import ksw
from bwa_flow_tpu.utils.opts import MemOpt

pytestmark = pytest.mark.skipif(
    ksw._NAT is None, reason="native extension not built "
    "(python setup.py build_ext --inplace)")


def _task(rng, qmax, tmax, mut):
    ql = int(rng.integers(1, qmax + 1))
    tl = int(rng.integers(1, tmax + 1))
    q = rng.integers(0, 4, size=ql).astype(np.uint8)
    t = np.resize(q, tl).copy()
    m = rng.random(tl) < mut
    t[m] = rng.integers(0, 4, size=m.sum())
    return ql, q, tl, t


def test_native_extend2_exact(rng):
    opt = MemOpt()
    mat = opt.mat[:5, :5]
    for i in range(150):
        ql, q, tl, t = _task(rng, 120, 150, 0.1 if i % 2 else 0.3)
        h0 = int(rng.integers(1, 80))
        zd = [0, 25, 100][i % 3]
        w = [100, 10][i % 2]
        got = ksw._NAT.ksw_extend2(ql, q, tl, t, mat.astype(np.int8), 5,
                                   opt.o_del, opt.e_del, opt.o_ins,
                                   opt.e_ins, w, 5, zd, h0)
        want = ksw.ksw_extend2_py(ql, q, tl, t, mat.astype(np.int64),
                                  opt.o_del, opt.e_del, opt.o_ins,
                                  opt.e_ins, w, 5, zd, h0)
        assert tuple(got) == tuple(int(x) for x in want), (i, got, want)


def test_native_global2_exact(rng):
    opt = MemOpt()
    mat = opt.mat[:5, :5]
    for i in range(100):
        ql, q, tl, t = _task(rng, 100, 120, 0.1)
        w = max(abs(ql - tl) + 3, [50, 10][i % 2])
        gs, gc = ksw._NAT.ksw_global2(ql, q, tl, t, mat.astype(np.int8), 5,
                                      opt.o_del, opt.e_del, opt.o_ins,
                                      opt.e_ins, w, True)
        ws, wc = ksw.ksw_global2_py(ql, q, tl, t, mat.astype(np.int64),
                                    opt.o_del, opt.e_del, opt.o_ins,
                                    opt.e_ins, w, True)
        assert int(gs) == int(ws), (i, gs, ws)
        assert list(gc) == [(int(o), int(l)) for o, l in wc], i


def test_native_speedup(rng):
    """The native path must be decisively faster than the oracle."""
    import time
    opt = MemOpt()
    mat8 = opt.mat[:5, :5].astype(np.int8)
    mat64 = mat8.astype(np.int64)
    ql, q, tl, t = 100, rng.integers(0, 4, 100).astype(np.uint8), \
        120, rng.integers(0, 4, 120).astype(np.uint8)
    t0 = time.time()
    for _ in range(50):
        ksw._NAT.ksw_global2(ql, q, tl, t, mat8, 5, 6, 1, 6, 1, 50, True)
    tn = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        ksw.ksw_global2_py(ql, q, tl, t, mat64, 6, 1, 6, 1, 50, True)
    tp = (time.time() - t0) * 10
    assert tn < tp, (tn, tp)


def test_native_ksw_align2_matches_golden(rng):
    """C++ ksw_align2 (mate-rescue local alignment) vs the golden NumPy
    emulation, across byte/word modes and xtra combinations."""
    import numpy as np
    import pytest
    from bwa_flow_tpu.ops import ksw
    try:
        from bwa_flow_tpu import _native
    except ImportError:
        pytest.skip("_native not built")
    if not hasattr(_native, "ksw_align2"):
        pytest.skip("binding absent")
    from bwa_flow_tpu.utils.opts import MemOpt
    mat = MemOpt().mat
    for trial in range(200):
        ql = int(rng.integers(5, 120))
        tl = int(rng.integers(5, 300))
        q = rng.integers(0, 4, ql).astype(np.uint8)
        if rng.random() < 0.6:
            t = np.concatenate([rng.integers(0, 4, max(0, (tl - ql) // 2))
                                .astype(np.uint8), q,
                                rng.integers(0, 4, tl).astype(np.uint8)]
                               )[:tl].copy()
            muts = rng.integers(0, tl, max(1, tl // 15))
            t[muts] = rng.integers(0, 4, len(muts))
        else:
            t = rng.integers(0, 4, tl).astype(np.uint8)
        xtra = (ksw.KSW_XSUBO | ksw.KSW_XSTART
                | (ksw.KSW_XBYTE if rng.random() < 0.5 else 0)
                | int(rng.integers(10, 40)))
        want = ksw.ksw_align2(ql, q, tl, t, mat, 6, 1, 6, 1, xtra)
        got = _native.ksw_align2(ql, q, tl, t,
                                 np.ascontiguousarray(mat[:5, :5], np.int8),
                                 5, 6, 1, 6, 1, xtra)
        assert got == (want.score, want.te, want.qe, want.score2,
                       want.te2, want.tb, want.qb), trial
