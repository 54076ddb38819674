"""Differential fuzz: our ksw_extend2 implementations vs the real one.

Compares the golden NumPy kernel, the native C++ kernel, and the batched
device kernel against the genuine bwa ksw_extend2 (bwa/ksw.c:380-479)
loaded via ctypes — including band-collapse corners the ADVICE flagged
(eh[end]/gscore bookkeeping on the empty-band row).
"""

import numpy as np
import pytest

import oracle as orc
from bwa_flow_tpu.ops import ksw
from bwa_flow_tpu.ops.extend_jax import extend_batch_np
from bwa_flow_tpu.utils.opts import MemOpt

LIB = orc.build_ksw_lib()
pytestmark = pytest.mark.skipif(LIB is None, reason="real ksw unavailable")


def _cases(rng, n):
    opt = MemOpt()
    mat = opt.mat
    cases = []
    for k in range(n):
        qlen = int(rng.integers(1, 120))
        tlen = int(rng.integers(1, 240))
        q = rng.integers(0, 4, qlen).astype(np.uint8)
        if rng.random() < 0.6:
            # make target resemble query so extensions go somewhere
            t = np.concatenate([q, rng.integers(0, 4, max(0, tlen - qlen))
                                .astype(np.uint8)])[:tlen].copy()
            muts = rng.integers(0, tlen, max(1, tlen // 12))
            t[muts] = rng.integers(0, 4, len(muts))
        else:
            t = rng.integers(0, 5, tlen).astype(np.uint8)
        w = int(rng.choice([1, 2, 5, 10, 100]))
        h0 = int(rng.integers(1, 120))
        zdrop = int(rng.choice([0, 10, 100]))
        end_bonus = int(rng.choice([0, 5]))
        cases.append((q, t, mat, 6, 1, 6, 1, w, end_bonus, zdrop, h0))
    return cases


def test_golden_and_native_vs_real():
    rng = np.random.default_rng(0x5EED)
    for case in _cases(rng, 400):
        q, t, mat = case[0], case[1], case[2]
        want = orc.real_ksw_extend2(LIB, *case)
        got = ksw.ksw_extend2(len(q), q, len(t), t, mat, *case[3:])
        assert got == want, (q.tolist(), t.tolist(), case[3:], got, want)


def test_device_vs_real():
    rng = np.random.default_rng(0xD17)
    cases = _cases(rng, 128)
    qmax = 128
    tmax = 256
    B = len(cases)
    Q = np.zeros((B, qmax), np.uint8)
    T = np.zeros((B, tmax), np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    h0 = np.zeros(B, np.int32)
    wv = np.zeros(B, np.int32)
    zd = np.zeros(B, np.int32)
    eb = np.zeros(B, np.int32)
    mat = cases[0][2]
    # the batched kernel takes scalar w/zdrop/end_bonus; group by them
    groups = {}
    for i, c in enumerate(cases):
        groups.setdefault((c[7], c[8], c[9]), []).append(i)
    for (w, end_bonus, zdrop), idxs in groups.items():
        n = len(idxs)
        Q = np.zeros((n, qmax), np.uint8)
        T = np.zeros((n, tmax), np.uint8)
        qlen = np.zeros(n, np.int32)
        tlen = np.zeros(n, np.int32)
        h0 = np.zeros(n, np.int32)
        for row, i in enumerate(idxs):
            q, t = cases[i][0], cases[i][1]
            Q[row, :len(q)] = q
            T[row, :len(t)] = t
            qlen[row], tlen[row], h0[row] = len(q), len(t), cases[i][10]
        res = extend_batch_np(Q, qlen, T, tlen, h0, mat,
                              6, 1, 6, 1, w, end_bonus, zdrop)
        got = np.stack([np.asarray(r) for r in res], axis=1)
        for row, i in enumerate(idxs):
            want = orc.real_ksw_extend2(LIB, *cases[i])
            assert tuple(int(x) for x in got[row]) == want, (i, cases[i][:2])
