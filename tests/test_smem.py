"""SMEM seeding vs brute-force oracles.

Pass-1 SMEMs must equal the set of maximal exact matches of the read in the
forward+RC reference (N never matches), each found exactly once; interval
ranks/sizes must agree with the full suffix array."""

import bisect

import numpy as np
import pytest

from bwa_flow_tpu.index.build import build_index, encode_reference
from bwa_flow_tpu.index.suffix import suffix_array
from bwa_flow_tpu.ops import smem as smemops
from bwa_flow_tpu.utils.opts import MemOpt
from conftest import make_genome


class SuffixOracle:
    """Brute-force pattern counting/rank over both strands + sentinel."""

    def __init__(self, both: np.ndarray):
        self.both = both
        self.sa = suffix_array(both)  # length n+1, row 0 = sentinel
        s = both.tolist()
        self.suffixes = [tuple(s[i:]) for i in self.sa[1:]]  # rows 1..n

    def range(self, pat: np.ndarray):
        """(k, s): first row and number of rows whose suffix starts with pat."""
        p = tuple(int(v) for v in pat)
        if any(v > 3 for v in p):
            return 0, 0
        lo = bisect.bisect_left(self.suffixes, p)
        hi = bisect.bisect_left(self.suffixes, p + (4,))
        return lo + 1, hi - lo  # +1: row 0 is the sentinel row

    def count(self, pat) -> int:
        return self.range(np.asarray(pat))[1]


def mutate_read(rng, fwd, length=100, snps=3, with_n=False):
    start = int(rng.integers(0, len(fwd) - length))
    read = fwd[start:start + length].copy()
    for _ in range(snps):
        p = int(rng.integers(0, length))
        read[p] = (read[p] + 1 + rng.integers(0, 3)) % 4
    if with_n:
        read[int(rng.integers(0, length))] = 4
    return read


def brute_mems(oracle: SuffixOracle, q: np.ndarray, min_len: int):
    """All maximal exact matches (b, e, count) with len >= min_len."""
    length = len(q)
    out = set()
    for b in range(length):
        if q[b] > 3 or oracle.count(q[b:b + 1]) == 0:
            continue
        e = b + 1
        while e < length and q[e] < 4 and oracle.count(q[b:e + 1]) > 0:
            e += 1
        left_ext = b > 0 and q[b - 1] < 4 and oracle.count(q[b - 1:e]) > 0
        if not left_ext and e - b >= min_len:
            out.add((b, e, oracle.count(q[b:e])))
    return out


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    contigs = make_genome(rng, 4000, n_contigs=1)
    fm = build_index(contigs)
    _, fwd = encode_reference(contigs)
    both = np.concatenate([fwd, (3 - fwd)[::-1]])
    return fm, fwd, SuffixOracle(both), rng


def test_smem_pass1_equals_maximal_matches(setup):
    fm, fwd, oracle, rng = setup
    opt = MemOpt()
    for trial in range(10):
        read = mutate_read(rng, fwd, snps=4, with_n=(trial % 3 == 0))
        # pass 1 only: run smem1a scan manually
        got = set()
        x = 0
        while x < len(read):
            if read[x] < 4:
                x, mems = smemops.smem1a(fm, read, x, 1, 0)
                for m in mems:
                    if m.end - m.start >= opt.min_seed_len:
                        got.add((m.start, m.end, m.s))
            else:
                x += 1
        want = brute_mems(oracle, read, opt.min_seed_len)
        assert got == want, f"trial {trial}"


def test_smem_interval_ranks(setup):
    fm, fwd, oracle, rng = setup
    for _ in range(5):
        read = mutate_read(rng, fwd, snps=2)
        _, mems = smemops.smem1a(fm, read, 10, 1, 0)
        for m in mems:
            k, s = oracle.range(read[m.start:m.end])
            assert (m.x0, m.s) == (k, s)


def test_collect_intv_properties(setup):
    fm, fwd, oracle, rng = setup
    opt = MemOpt()
    for _ in range(5):
        read = mutate_read(rng, fwd, snps=3)
        intvs = smemops.collect_intv(opt, fm, read)
        infos = [iv.info for iv in intvs]
        assert infos == sorted(infos)
        for iv in intvs:
            assert 0 <= iv.start < iv.end <= len(read)
            k, s = oracle.range(read[iv.start:iv.end])
            assert iv.x0 == k and iv.s == s
        # pass-1 SMEMs are a subset
        want = brute_mems(oracle, read, opt.min_seed_len)
        got = {(iv.start, iv.end, iv.s) for iv in intvs}
        assert want <= got


def test_seed_strategy1_interval(setup):
    fm, fwd, oracle, rng = setup
    read = mutate_read(rng, fwd, length=80, snps=0)
    nxt, m = smemops.seed_strategy1(fm, read, 0, 19, 20)
    if m is not None:
        k, s = oracle.range(read[m.start:m.end])
        assert (m.x0, m.s) == (k, s)
        assert s < 20 and m.end - m.start >= 19 + 1
