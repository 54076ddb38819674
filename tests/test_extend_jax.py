"""Device batched SW extension vs golden ksw_extend2 — exact-diff over
random seed-extension tasks (golden-diff pattern of the reference,
/root/reference/test/src/TestCommon.h)."""

import numpy as np

from bwa_flow_tpu.ops import ksw
from bwa_flow_tpu.ops.extend_jax import extend_batch_np
from bwa_flow_tpu.utils.opts import MemOpt


def _rand_tasks(rng, n, qmax, tmax, mut=0.08):
    """Extension-shaped tasks: target = mutated copy of query region, so
    alignments behave like real seed extensions (not random noise)."""
    query = np.zeros((n, qmax), dtype=np.int32)
    target = np.zeros((n, tmax), dtype=np.int32)
    qlen = np.zeros(n, dtype=np.int32)
    tlen = np.zeros(n, dtype=np.int32)
    h0 = np.zeros(n, dtype=np.int32)
    for b in range(n):
        ql = int(rng.integers(1, qmax + 1))
        tl = int(rng.integers(1, tmax + 1))
        q = rng.integers(0, 4, size=ql)
        t = np.resize(q, tl).copy()
        m = rng.random(tl) < mut
        t[m] = rng.integers(0, 4, size=m.sum())
        # occasional indel
        if tl > 4 and rng.random() < 0.5:
            cut = int(rng.integers(1, tl - 1))
            t = np.concatenate([t[:cut], t[cut + 1:], [int(rng.integers(0, 4))]])
        query[b, :ql] = q
        target[b, :tl] = t[:tl]
        qlen[b] = ql
        tlen[b] = tl
        h0[b] = int(rng.integers(1, 60))
    return query, qlen, target, tlen, h0


def _diff(rng, n, qmax, tmax, opt, w=None, zdrop=None, end_bonus=5, mut=0.08):
    query, qlen, target, tlen, h0 = _rand_tasks(rng, n, qmax, tmax, mut)
    mat = opt.mat[:5, :5].astype(np.int32)
    w_ = opt.w if w is None else w
    zd = opt.zdrop if zdrop is None else zdrop
    got = extend_batch_np(query, qlen, target, tlen, h0, mat,
                          opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                          w_, end_bonus, zd)
    names = ("score", "qle", "tle", "gtle", "gscore", "max_off")
    for b in range(n):
        want = ksw.ksw_extend2(
            int(qlen[b]), query[b], int(tlen[b]), target[b],
            mat.astype(np.int64), opt.o_del, opt.e_del, opt.o_ins,
            opt.e_ins, w_, end_bonus, zd, int(h0[b]))
        for k, (g, x) in enumerate(zip([o[b] for o in got], want)):
            assert int(g) == int(x), (
                f"lane {b} field {names[k]}: got {int(g)} want {int(x)} "
                f"(qlen={qlen[b]} tlen={tlen[b]} h0={h0[b]})")


def test_extend_batch_default_params(rng):
    _diff(rng, 64, 96, 128, MemOpt())


def test_extend_batch_narrow_band(rng):
    _diff(rng, 48, 80, 96, MemOpt(), w=8)


def test_extend_batch_no_zdrop(rng):
    _diff(rng, 32, 64, 80, MemOpt(), zdrop=0)


def test_extend_batch_tight_zdrop_noisy(rng):
    _diff(rng, 48, 96, 128, MemOpt(), zdrop=25, mut=0.3)


def test_extend_batch_asym_gaps(rng):
    opt = MemOpt(o_del=5, e_del=2, o_ins=9, e_ins=1, a=2, b=5)
    opt.refresh_mat()
    _diff(rng, 48, 72, 96, opt)


def test_extend_batch_degenerate_lanes(rng):
    opt = MemOpt()
    mat = opt.mat[:5, :5].astype(np.int32)
    query = np.zeros((3, 16), dtype=np.int32)
    target = np.zeros((3, 16), dtype=np.int32)
    qlen = np.array([0, 8, 8], dtype=np.int32)
    tlen = np.array([8, 0, 8], dtype=np.int32)
    h0 = np.array([7, 7, 7], dtype=np.int32)
    query[2, :8] = target[2, :8] = [0, 1, 2, 3, 0, 1, 2, 3]
    got = extend_batch_np(query, qlen, target, tlen, h0, mat,
                          opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                          opt.w, 5, opt.zdrop)
    # degenerate lanes: (h0, 0, 0, 0, -1, 0)
    for b in (0, 1):
        assert [int(o[b]) for o in got] == [7, 0, 0, 0, -1, 0]
    # exact-match lane: extends to both ends
    assert int(got[0][2]) == 7 + 8  # h0 + 8 matches
    assert int(got[4][2]) == 7 + 8  # gscore reaches the end
