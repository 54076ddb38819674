"""Native chain stage vs the golden Python implementation.

Randomized differential test over genomes with planted repeats (chain
ties exercise the introsort port) plus N runs and multi-contig layouts.
"""

import numpy as np
import pytest

from bwa_flow_tpu.index.build import build_index
from bwa_flow_tpu.ops import chain as chainops
from bwa_flow_tpu.ops import chain_native
from bwa_flow_tpu.ops import fm as fmops
from bwa_flow_tpu.ops import smem as smemops
from bwa_flow_tpu.utils.opts import MemOpt

pytestmark = pytest.mark.skipif(not chain_native.available(),
                                reason="_chain extension not built")


def _chains_sig(chains):
    return [(c.rid, round(c.frac_rep, 9),
             [(s.rbeg, s.qbeg, s.len, s.score) for s in c.seeds])
            for c in chains]


def test_chain_batch_matches_python():
    rng = np.random.default_rng(0xC0DE)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g1 = bases[rng.integers(0, 4, 9000)].copy()
    seg = g1[1000:1400].copy()
    for dst in (3000, 5000, 7000):  # planted repeats -> weight ties
        g1[dst:dst + 400] = seg
    g1[4000:4007] = ord("N")
    g2 = bases[rng.integers(0, 4, 3000)]
    fm = build_index([("c1", "", g1.tobytes()), ("c2", "", g2.tobytes())])
    opt = MemOpt()
    code = np.full(256, 4, np.uint8)
    for i, c in enumerate(b"ACGT"):
        code[c] = i
    seqs = []
    for k in range(120):
        src = g1 if rng.random() < 0.8 else g2
        ln = int(rng.integers(60, 151))
        pos = int(rng.integers(0, len(src) - ln))
        r = code[src[pos:pos + ln]].copy()
        m = rng.random(ln) < 0.02
        r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
        seqs.append(r)
    all_intvs = [smemops.collect_intv(opt, fm, s) for s in seqs]
    rows, off, owners = chain_native.sa_probe_layout(opt, all_intvs)
    vals = np.array([fmops.bwt_sa(fm, int(k)) for k in rows], np.int64)
    got = chain_native.chain_batch(opt, fm, seqs, all_intvs, vals, off)
    luts = [dict() for _ in seqs]
    for (ridx, x0, k), v in zip(owners, vals):
        luts[ridx][(x0, k)] = int(v)
    for r, (seq, intvs) in enumerate(zip(seqs, all_intvs)):
        want = chainops.mem_chain(
            opt, fm, len(seq), intvs,
            sa_lookup=lambda x0, k, _l=luts[r]: _l[(x0, k)])
        want = chainops.mem_chain_flt(opt, want)
        chainops.mem_flt_chained_seeds(opt, fm, len(seq), seq, want)
        assert got[r] is not None, r
        assert _chains_sig(got[r]) == _chains_sig(want), r


def test_long_read_falls_back():
    """Reads where the seed-SW filter applies must come back as None."""
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g = bases[rng.integers(0, 4, 20000)]
    fm = build_index([("c", "", g.tobytes())])
    opt = MemOpt()
    code = np.full(256, 4, np.uint8)
    for i, c in enumerate(b"ACGT"):
        code[c] = i
    long_read = code[g[100:1200]].copy()   # 1100bp: 5.5*ln(l) < 0.05*l
    intvs = [smemops.collect_intv(opt, fm, long_read)]
    rows, off, _ = chain_native.sa_probe_layout(opt, intvs)
    vals = np.array([fmops.bwt_sa(fm, int(k)) for k in rows], np.int64)
    got = chain_native.chain_batch(opt, fm, [long_read], intvs, vals, off)
    assert got[0] is None
