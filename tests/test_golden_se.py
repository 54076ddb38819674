"""End-to-end single-end golden model tests against simulated ground truth."""

import numpy as np
import pytest

from bwa_flow_tpu.index.build import build_index, encode_reference
from bwa_flow_tpu.io.sam import Read
from bwa_flow_tpu.models.golden import align_se
from bwa_flow_tpu.utils.opts import MemOpt
from conftest import make_genome


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(2024)
    contigs = make_genome(rng, 20000, n_contigs=2)
    fm = build_index(contigs)
    _, fwd = encode_reference(contigs)
    return fm, fwd, contigs, rng


def revcomp(seq):
    return (3 - seq)[::-1].copy()


def sam_fields(line):
    f = line.rstrip("\n").split("\t")
    tags = {t.split(":", 1)[0]: t.split(":", 2)[2] for t in f[11:]}
    return dict(qname=f[0], flag=int(f[1]), rname=f[2], pos=int(f[3]),
                mapq=int(f[4]), cigar=f[5], rnext=f[6], pnext=int(f[7]),
                tlen=int(f[8]), seq=f[9], qual=f[10], tags=tags)


def align_one(fm, seq, name="r1"):
    opt = MemOpt()
    r = Read(name=name, seq=seq.astype(np.uint8))
    align_se(opt, fm, [r])
    return [sam_fields(l) for l in r.sam.splitlines(True)]


def contig_pos(fm, fwd_pos):
    """(contig_name, offset_in_contig) for a forward coordinate."""
    rid = fm.bns.pos2rid(fwd_pos)
    return fm.bns.anns[rid].name, fwd_pos - fm.bns.anns[rid].offset


def test_exact_forward_read(world):
    fm, fwd, contigs, rng = world
    for _ in range(10):
        pos = int(rng.integers(0, len(fwd) - 100))
        recs = align_one(fm, fwd[pos:pos + 100])
        assert len(recs) == 1
        r = recs[0]
        name, off = contig_pos(fm, pos)
        assert r["flag"] == 0
        assert r["rname"] == name and r["pos"] == off + 1
        assert r["cigar"] == "100M"
        assert r["tags"]["NM"] == "0" and r["tags"]["MD"] == "100"
        assert r["tags"]["AS"] == "100"
        assert int(r["mapq"]) >= 30


def test_exact_reverse_read(world):
    fm, fwd, contigs, rng = world
    pos = int(rng.integers(0, len(fwd) - 100))
    read = revcomp(fwd[pos:pos + 100])
    recs = align_one(fm, read)
    r = recs[0]
    name, off = contig_pos(fm, pos)
    assert r["flag"] == 16
    assert r["rname"] == name and r["pos"] == off + 1
    assert r["cigar"] == "100M"
    # SEQ is written on the forward reference strand
    want = "".join("ACGT"[c] for c in fwd[pos:pos + 100])
    assert r["seq"] == want


def test_snp_read(world):
    fm, fwd, contigs, rng = world
    pos = int(rng.integers(200, len(fwd) - 300))
    read = fwd[pos:pos + 100].copy()
    read[50] = (read[50] + 1) % 4
    recs = align_one(fm, read)
    r = recs[0]
    name, off = contig_pos(fm, pos)
    assert r["pos"] == off + 1 and r["cigar"] == "100M"
    assert r["tags"]["NM"] == "1"
    ref_base = "ACGT"[fwd[pos + 50]]
    assert r["tags"]["MD"] == f"50{ref_base}49"
    assert r["tags"]["AS"] == str(100 - 5)  # 99 matches*1 - 4 mismatch


def test_deletion_read(world):
    fm, fwd, contigs, rng = world
    pos = 5000
    # read = 50bp + skip 4 ref bases + 50bp
    read = np.concatenate([fwd[pos:pos + 50], fwd[pos + 54:pos + 104]])
    recs = align_one(fm, read)
    r = recs[0]
    name, off = contig_pos(fm, pos)
    assert r["pos"] == off + 1
    assert r["cigar"] == "50M4D50M"
    assert r["tags"]["NM"] == "4"


def test_insertion_read(world):
    fm, fwd, contigs, rng = world
    pos = 7000
    ins = rng.integers(0, 4, size=3).astype(np.uint8)
    read = np.concatenate([fwd[pos:pos + 50], ins, fwd[pos + 50:pos + 97]])
    recs = align_one(fm, read)
    r = recs[0]
    assert "I" in r["cigar"]
    assert r["pos"] == contig_pos(fm, pos)[1] + 1


def test_unmapped_read(world):
    fm, fwd, contigs, rng = world
    # a read extremely unlikely to hit a 20kb genome with score >= 30
    read = rng.integers(0, 4, size=60).astype(np.uint8)
    recs = align_one(fm, read)
    if len(recs) == 1 and recs[0]["flag"] & 4:
        r = recs[0]
        assert r["rname"] == "*" and r["pos"] == 0 and r["cigar"] == "*"


def test_n_bases_handled(world):
    fm, fwd, contigs, rng = world
    pos = 9000
    read = fwd[pos:pos + 100].copy()
    read[30] = 4  # N
    recs = align_one(fm, read)
    r = recs[0]
    assert r["pos"] == contig_pos(fm, pos)[1] + 1
    assert r["cigar"] == "100M"
    assert r["seq"][30] == "N"
    assert r["tags"]["NM"] == "1"  # N counts as mismatch


def test_determinism(world):
    fm, fwd, contigs, rng = world
    reads = []
    for i in range(5):
        pos = int(rng.integers(0, len(fwd) - 100))
        read = fwd[pos:pos + 100].copy()
        for _ in range(3):
            p = int(rng.integers(0, 100))
            read[p] = (read[p] + 1 + rng.integers(0, 3)) % 4
        reads.append(read)
    out1 = [align_one(fm, r, name=f"r{i}") for i, r in enumerate(reads)]
    out2 = [align_one(fm, r, name=f"r{i}") for i, r in enumerate(reads)]
    assert out1 == out2


def test_chimeric_read_gets_supplementary(world):
    fm, fwd, contigs, rng = world
    # two halves from far-apart loci -> primary + supplementary (flag 2048)
    a, b = 3000, 14000
    read = np.concatenate([fwd[a:a + 60], fwd[b:b + 60]])
    recs = align_one(fm, read)
    flags = [r["flag"] for r in recs]
    assert len(recs) == 2
    assert sum(1 for f in flags if f & 0x800) == 1
    prim = [r for r in recs if not r["flag"] & 0x800][0]
    supp = [r for r in recs if r["flag"] & 0x800][0]
    assert "SA" in prim["tags"] and "SA" in supp["tags"]
    # supplementary uses hard clips
    assert "H" in supp["cigar"] and "S" in prim["cigar"]
