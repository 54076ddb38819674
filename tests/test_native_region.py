"""Native SE tail vs the golden Python implementation (byte-exact SAM)."""

import numpy as np
import pytest

from bwa_flow_tpu.index.build import build_index
from bwa_flow_tpu.io.sam import Read, mem_reg2sam
from bwa_flow_tpu.models import golden
from bwa_flow_tpu.ops import chain as chainops
from bwa_flow_tpu.ops import region as regionops
from bwa_flow_tpu.ops import region_native
from bwa_flow_tpu.ops import smem as smemops
from bwa_flow_tpu.utils.opts import MEM_F_ALL, MEM_F_PRIMARY5, MemOpt

pytestmark = pytest.mark.skipif(not region_native.available(),
                                reason="_region extension not built")


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(0xAE61)
    bases = np.frombuffer(b"ACGT", np.uint8)
    g1 = bases[rng.integers(0, 4, 12000)].copy()
    seg = g1[2000:2500].copy()
    for dst in (5000, 8000, 10500):
        g1[dst:dst + 500] = seg          # repeats: XA/SA/secondary paths
    g1[6000:6006] = ord("N")
    alt = g1[3000:4500].copy()
    for i in range(0, len(alt), 83):
        alt[i] = bases[(np.searchsorted(bases, alt[i]) + 1) % 4]
    fm = build_index([("c1", "", g1.tobytes()), ("c2", "", bases[
        rng.integers(0, 4, 4000)].tobytes()),
        ("c1_alt", "", alt.tobytes())])
    fm.bns.anns[2].is_alt = 1
    code = np.full(256, 4, np.uint8)
    for i, c in enumerate(b"ACGT"):
        code[c] = i
    reads = []
    for k in range(150):
        src = g1
        ln = int(rng.integers(70, 152))
        pos = int(rng.integers(0, len(src) - ln))
        r = code[src[pos:pos + ln]].copy()
        m = rng.random(ln) < 0.03
        r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
        # occasional chimeric read (SA/supplementary path)
        if k % 17 == 0:
            pos2 = int(rng.integers(0, len(src) - ln))
            half = ln // 2
            r[half:] = code[src[pos2:pos2 + ln - half]]
        q = "".join(chr(33 + int(x)) for x in rng.integers(20, 40, ln))
        reads.append(Read(name=f"r{k:04d}", seq=r, qual=q, id=k))
    return fm, reads


def _pre_dedup_regs(opt, fm, seq):
    intvs = smemops.collect_intv(opt, fm, seq)
    chains = chainops.mem_chain(opt, fm, len(seq), intvs)
    chains = chainops.mem_chain_flt(opt, chains)
    chainops.mem_flt_chained_seeds(opt, fm, len(seq), seq, chains)
    regs = []
    for c in chains:
        regionops.mem_chain2aln(opt, fm, len(seq), seq, c, regs)
    return regs


def _python_tail(opt, fm, reads, reg_lists, rg_id=""):
    import copy
    sams = []
    for s, regs in zip(reads, reg_lists):
        regs = regionops.mem_sort_dedup_patch(
            opt, fm, s.seq, copy.deepcopy(regs),
            golden.make_patch_scorer(opt, fm, s.seq))
        for p in regs:
            if p.rid >= 0 and fm.bns.anns[p.rid].is_alt:
                p.is_alt = 1
        regionops.mem_mark_primary_se(opt, regs, s.id)
        if opt.flag & MEM_F_PRIMARY5:
            regionops.mem_reorder_primary5(opt.T, regs)
        rr = Read(name=s.name, seq=s.seq, qual=s.qual, comment=s.comment,
                  id=s.id)
        mem_reg2sam(opt, fm, rr, regs, 0, None, rg_id)
        sams.append(rr.sam)
    return sams


@pytest.mark.parametrize("flags", [0, MEM_F_ALL, MEM_F_PRIMARY5])
def test_se_tail_matches_python(fixture, flags):
    fm, reads = fixture
    opt = MemOpt()
    opt.flag |= flags
    reg_lists = [_pre_dedup_regs(opt, fm, r.seq) for r in reads]
    want = _python_tail(opt, fm, reads, reg_lists, rg_id="rg1")
    got = region_native.se_tail_batch(opt, fm, reads, reg_lists,
                                      rg_id="rg1")
    for r, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"read {r}:\n got: {g!r}\nwant: {w!r}"


def test_dedup_batch_matches_python(fixture):
    import copy
    fm, reads = fixture
    opt = MemOpt()
    reg_lists = [_pre_dedup_regs(opt, fm, r.seq) for r in reads[:60]]
    got = region_native.dedup_batch(opt, fm, [r.seq for r in reads[:60]],
                                    reg_lists)
    for r, regs in enumerate(reg_lists):
        want = regionops.mem_sort_dedup_patch(
            opt, fm, reads[r].seq, copy.deepcopy(regs),
            golden.make_patch_scorer(opt, fm, reads[r].seq))
        for p in want:
            if p.rid >= 0 and fm.bns.anns[p.rid].is_alt:
                p.is_alt = 1
        sig_w = [(p.rb, p.re, p.qb, p.qe, p.rid, p.score, p.truesc, p.w,
                  p.seedcov, p.is_alt) for p in want]
        sig_g = [(p.rb, p.re, p.qb, p.qe, p.rid, p.score, p.truesc, p.w,
                  p.seedcov, p.is_alt) for p in got[r]]
        assert sig_g == sig_w, r
