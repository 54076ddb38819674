"""SW kernel golden tests: vectorized ksw vs scalar transliterations and
independent oracles."""

import numpy as np
import pytest

from bwa_flow_tpu.ops import ksw
from bwa_flow_tpu.utils.opts import MemOpt, fill_scmat
import ksw_scalar


@pytest.fixture(scope="module")
def opt():
    return MemOpt()


def rand_pair(rng, qlen, tlen, related=True, snps=5):
    t = rng.integers(0, 4, size=tlen).astype(np.uint8)
    if related and tlen >= qlen:
        off = int(rng.integers(0, tlen - qlen + 1))
        q = t[off:off + qlen].copy()
        for _ in range(snps):
            p = int(rng.integers(0, qlen))
            q[p] = (q[p] + 1 + rng.integers(0, 3)) % 4
        # occasional indel
        if rng.random() < 0.5 and qlen > 10:
            p = int(rng.integers(1, qlen - 5))
            q = np.concatenate([q[:p], q[p + int(rng.integers(1, 4)):]])
    else:
        q = rng.integers(0, 4, size=qlen).astype(np.uint8)
    return q.astype(np.uint8), t


def test_extend2_matches_scalar(opt):
    rng = np.random.default_rng(123)
    for trial in range(60):
        qlen = int(rng.integers(1, 120))
        tlen = int(rng.integers(1, 200))
        q, t = rand_pair(rng, qlen, tlen, related=trial % 2 == 0)
        h0 = int(rng.integers(1, 40))
        w = int(rng.choice([5, 20, 100]))
        zdrop = int(rng.choice([0, 20, 100]))
        args = (len(q), q, len(t), t, opt.mat, opt.o_del, opt.e_del,
                opt.o_ins, opt.e_ins, w, opt.pen_clip5, zdrop, h0)
        got = ksw.ksw_extend2(*args)
        want = ksw_scalar.extend2_scalar(*args)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_extend2_tlen_clamp_exact(opt):
    """Clamping the target to qlen + w + 1 must be output-identical: the
    banded DP never reaches target rows beyond qlen + w (the band
    collapses and the row loop breaks). The wave driver relies on this
    to run repeat-spanning chains (kb-scale rmax windows) on device
    (ops/chain2aln_jax.py, native/_wave.cpp:task_fits)."""
    rng = np.random.default_rng(77)
    for trial in range(80):
        qlen = int(rng.integers(1, 120))
        w = int(rng.choice([5, 20, 100]))
        tlen = qlen + w + 1 + int(rng.integers(1, 4000))
        q, t = rand_pair(rng, qlen, tlen, related=trial % 2 == 0)
        h0 = int(rng.integers(1, 40))
        zdrop = int(rng.choice([0, 20, 100]))
        full = ksw.ksw_extend2(len(q), q, tlen, t, opt.mat, opt.o_del,
                               opt.e_del, opt.o_ins, opt.e_ins, w,
                               opt.pen_clip5, zdrop, h0)
        tc = len(q) + w + 1
        clamped = ksw.ksw_extend2(len(q), q, tc, t[:tc], opt.mat,
                                  opt.o_del, opt.e_del, opt.o_ins,
                                  opt.e_ins, w, opt.pen_clip5, zdrop, h0)
        assert full == clamped, f"trial {trial}: {full} != {clamped}"


def test_extend2_perfect_match(opt):
    rng = np.random.default_rng(5)
    q = rng.integers(0, 4, size=50).astype(np.uint8)
    score, qle, tle, gtle, gscore, max_off = ksw.ksw_extend2(
        50, q, 80, np.concatenate([q, rng.integers(0, 4, 30).astype(np.uint8)]),
        opt.mat, 6, 1, 6, 1, 100, 5, 100, 19)
    assert score == 19 + 50 * opt.a
    assert qle == 50 and tle == 50
    assert gscore == score  # reaches the end of the query


def test_global2_matches_scalar_and_cigar_score(opt):
    rng = np.random.default_rng(77)
    for trial in range(40):
        qlen = int(rng.integers(1, 80))
        q, t = rand_pair(rng, qlen, qlen + int(rng.integers(0, 8)),
                         related=True, snps=3)
        w = max(int(rng.choice([3, 10, 50])), abs(len(t) - len(q)) + 3)
        score, cigar = ksw.ksw_global2(len(q), q, len(t), t, opt.mat,
                                       opt.o_del, opt.e_del, opt.o_ins,
                                       opt.e_ins, w)
        want = ksw_scalar.global2_scalar(len(q), q, len(t), t, opt.mat,
                                         opt.o_del, opt.e_del, opt.o_ins,
                                         opt.e_ins, w)
        assert score == want, f"trial {trial}"
        # cigar consistency: consumes full sequences and reproduces score
        x = y = 0
        s = 0
        prev_op = None
        for op, ln in cigar:
            if op == 0:
                for k in range(ln):
                    s += int(opt.mat[t[y + k], q[x + k]])
                x += ln
                y += ln
            elif op == 1:
                s -= opt.o_ins + opt.e_ins * ln
                x += ln
            else:
                s -= opt.o_del + opt.e_del * ln
                y += ln
            assert op != prev_op
            prev_op = op
        assert x == len(q) and y == len(t)
        assert s == score, f"trial {trial}: cigar score {s} != {score}"


def test_global2_matches_exhaustive(opt):
    rng = np.random.default_rng(9)
    for trial in range(30):
        qlen = int(rng.integers(1, 7))
        tlen = int(rng.integers(1, 7))
        q = rng.integers(0, 4, size=qlen).astype(np.uint8)
        t = rng.integers(0, 4, size=tlen).astype(np.uint8)
        w = 10  # wide enough to be unbanded at this size
        score, _ = ksw.ksw_global2(qlen, q, tlen, t, opt.mat, opt.o_del,
                                   opt.e_del, opt.o_ins, opt.e_ins, w)
        want = ksw_scalar.exhaustive_global(q, t, opt.mat, opt.o_del,
                                            opt.e_del, opt.o_ins, opt.e_ins)
        assert score == want, f"trial {trial}"


def brute_local_sw(q, t, mat, o_del, e_del, o_ins, e_ins):
    """Independent local SW (H-derived E/F, as in ksw_u8/i16). Returns
    (score, te, qe) with bwa's tie rules: first row, min column."""
    qlen, tlen = len(q), len(t)
    H = np.zeros((tlen + 1, qlen + 1), dtype=np.int64)
    E = np.zeros((tlen + 1, qlen + 1), dtype=np.int64)  # E[i][j]: gap in query dir
    F = np.zeros((tlen + 1, qlen + 1), dtype=np.int64)
    for i in range(1, tlen + 1):
        for j in range(1, qlen + 1):
            E[i][j] = max(E[i - 1][j] - e_del, H[i - 1][j] - o_del - e_del, 0)
            F[i][j] = max(F[i][j - 1] - e_ins, H[i][j - 1] - o_ins - e_ins, 0)
            M = max(H[i - 1][j - 1] + int(mat[t[i - 1], q[j - 1]]), 0)
            H[i][j] = max(M, E[i][j], F[i][j])
    score = int(H.max())
    if score == 0:
        return 0, -1, -1
    rows = np.nonzero((H == score).any(axis=1))[0]
    te = int(rows[0]) - 1
    cols = np.nonzero(H[te + 1] == int(H[te + 1].max()))[0]
    return score, te, int(cols[0]) - 1


def test_ksw_align2_score_and_positions(opt):
    rng = np.random.default_rng(31)
    for trial in range(25):
        qlen = int(rng.integers(5, 60))
        tlen = int(rng.integers(5, 120))
        q, t = rand_pair(rng, min(qlen, tlen), tlen, related=trial % 2 == 0)
        xtra = ksw.KSW_XSUBO | ksw.KSW_XSTART | (19 * opt.a) | \
            (ksw.KSW_XBYTE if len(q) * opt.a < 250 else 0)
        r = ksw.ksw_align2(len(q), q.copy(), len(t), t.copy(), opt.mat,
                           opt.o_del, opt.e_del, opt.o_ins, opt.e_ins, xtra)
        score, te, qe = brute_local_sw(q, t, opt.mat, opt.o_del, opt.e_del,
                                       opt.o_ins, opt.e_ins)
        assert r.score == score, f"trial {trial}"
        if score > 0:
            assert (r.te, r.qe) == (te, qe), f"trial {trial}"
            if r.tb >= 0:
                # start positions consistent: re-scoring the local window
                # reproduces the score
                sub_s, _, _ = brute_local_sw(q[r.qb:r.qe + 1],
                                             t[r.tb:r.te + 1], opt.mat,
                                             opt.o_del, opt.e_del,
                                             opt.o_ins, opt.e_ins)
                assert sub_s == score
