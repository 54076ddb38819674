"""Paired-end golden model tests with simulated read pairs."""

import numpy as np
import pytest

from bwa_flow_tpu.index.build import build_index, encode_reference
from bwa_flow_tpu.io.sam import Read
from bwa_flow_tpu.models.golden import align_pe, mem_align1_core, mem_pestat_batch
from bwa_flow_tpu.utils.opts import MEM_F_PE, MemOpt
from conftest import make_genome
from test_golden_se import sam_fields


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(777)
    contigs = make_genome(rng, 30000, n_contigs=1)
    fm = build_index(contigs)
    _, fwd = encode_reference(contigs)
    return fm, fwd, rng


def make_pairs(fm, fwd, rng, n_pairs, isize_mean=300, isize_sd=20,
               rlen=100, snps=2):
    """FR-oriented pairs: read1 forward at p, read2 = RC at p+isize-rlen."""
    reads = []
    truth = []
    for i in range(n_pairs):
        isize = int(rng.normal(isize_mean, isize_sd))
        isize = max(isize, rlen + 10)
        p = int(rng.integers(0, len(fwd) - isize - 1))
        r1 = fwd[p:p + rlen].copy()
        r2 = (3 - fwd[p + isize - rlen:p + isize])[::-1].copy()
        for r in (r1, r2):
            for _ in range(snps):
                q = int(rng.integers(0, rlen))
                r[q] = (r[q] + 1 + rng.integers(0, 3)) % 4
        reads.append(Read(name=f"p{i}", seq=r1))
        reads.append(Read(name=f"p{i}", seq=r2))
        truth.append((p, p + isize - rlen, isize))
    return reads, truth


def test_pestat_inference(world):
    fm, fwd, rng = world
    opt = MemOpt()
    opt.flag |= MEM_F_PE
    reads, truth = make_pairs(fm, fwd, rng, 60)
    regs = [mem_align1_core(opt, fm, s.seq) for s in reads]
    pes = mem_pestat_batch(opt, fm, regs)
    # FR orientation (dir=1) must be inferred; others failed
    assert pes[1].failed == 0
    assert pes[0].failed and pes[2].failed and pes[3].failed
    assert 250 < pes[1].avg < 350
    assert pes[1].low < 300 < pes[1].high


def test_pe_end_to_end(world):
    fm, fwd, rng = world
    opt = MemOpt()
    opt.flag |= MEM_F_PE
    reads, truth = make_pairs(fm, fwd, rng, 60)
    align_pe(opt, fm, reads)
    n_proper = 0
    n_exact = 0
    for i, (p1, p2, isize) in enumerate(truth):
        rec1 = sam_fields(reads[2 * i].sam.splitlines()[0])
        rec2 = sam_fields(reads[2 * i + 1].sam.splitlines()[0])
        # read1: flags paired|first (0x1|0x40); read2: paired|second
        assert rec1["flag"] & 0x1 and rec1["flag"] & 0x40
        assert rec2["flag"] & 0x1 and rec2["flag"] & 0x80
        assert rec2["flag"] & 0x10 and not rec1["flag"] & 0x10
        assert rec1["rnext"] == "=" and rec2["rnext"] == "="
        assert rec1["pnext"] == rec2["pos"] and rec2["pnext"] == rec1["pos"]
        if rec1["flag"] & 0x2:
            n_proper += 1
        assert "MC" in rec1["tags"] and "MC" in rec2["tags"]
        if rec1["cigar"] == "100M" and rec2["cigar"] == "100M":
            # unclipped pairs must land exactly on the simulated loci
            assert rec1["pos"] == p1 + 1, i
            assert rec2["pos"] == p2 + 1, i
            assert rec1["tlen"] == isize and rec2["tlen"] == -isize
            n_exact += 1
    assert n_proper >= 50  # almost all pairs properly paired
    assert n_exact >= 40   # most pairs align full-length


def test_mate_rescue(world):
    fm, fwd, rng = world
    opt = MemOpt()
    opt.flag |= MEM_F_PE
    reads, truth = make_pairs(fm, fwd, rng, 59)
    # append one pair whose read2 is too mutated to seed (but rescuable by SW)
    p = 12000
    isize = 300
    rlen = 100
    r1 = fwd[p:p + rlen].copy()
    r2 = (3 - fwd[p + isize - rlen:p + isize])[::-1].copy()
    # mutate read2 every 12 bp so no 19bp exact seed survives
    for q in range(5, rlen, 12):
        r2[q] = (r2[q] + 1) % 4
    reads.append(Read(name="rescue", seq=r1))
    reads.append(Read(name="rescue", seq=r2))
    align_pe(opt, fm, reads)
    rec2 = sam_fields(reads[-1].sam.splitlines()[0])
    assert not rec2["flag"] & 0x4, "mate rescue failed"
    assert rec2["pos"] == p + isize - rlen + 1


def test_unpaired_ends_still_emitted(world):
    fm, fwd, rng = world
    opt = MemOpt()
    opt.flag |= MEM_F_PE
    reads, truth = make_pairs(fm, fwd, rng, 58)
    # a pair where read2 is pure random (unmappable, not rescuable)
    p = 20000
    r1 = fwd[p:p + 100].copy()
    r2 = rng.integers(0, 4, size=100).astype(np.uint8)
    reads.append(Read(name="orphan", seq=r1))
    reads.append(Read(name="orphan", seq=r2))
    align_pe(opt, fm, reads)
    rec1 = sam_fields(reads[-2].sam.splitlines()[0])
    rec2 = sam_fields(reads[-1].sam.splitlines()[0])
    assert not rec1["flag"] & 0x4
    if rec2["flag"] & 0x4:  # unmapped mate placed at read1's position
        assert rec1["flag"] & 0x8
        assert rec2["rname"] == rec1["rname"] and rec2["pos"] == rec1["pos"]
