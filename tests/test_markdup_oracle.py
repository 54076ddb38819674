"""MarkDup anchored to the REAL samblaster (round-4 verdict task 8).

A simulated PCR-duplicate PE fixture (duplicated fragments, orphans
with unmapped mates, shuffled order) is aligned by the real bwa binary;
the resulting SAM goes through (a) the vendored samblaster library
driven exactly as the reference's MarkDupStage drives it
(tests/samblaster_driver.cpp) and (b) this repo's markdup stage. The
FLAG-1024 sets must be identical line for line — the same external
anchoring the bwa oracle gives alignment."""

import numpy as np
import pytest

import oracle as orc

pytestmark = pytest.mark.skipif(
    orc.build_oracle() is None or orc.build_samblaster() is None,
    reason="oracle tooling unavailable")


def _aligned_sam(tmp_path, seed=7, n_pairs=300, dup_frac=0.35):
    import subprocess
    rng = np.random.default_rng(seed)
    contigs = orc.make_ref(rng, [("chr1", 60000), ("chr2", 40000)],
                           repeat_frac=0.1)
    fa = tmp_path / "ref.fa"
    orc.write_fasta(fa, contigs)
    orc.oracle_index(fa)
    pairs = orc.sample_pe(rng, contigs, n_pairs)
    recs = []   # (r1, r2) fastq tuples
    for k, (r1, r2) in enumerate(pairs):
        recs.append(((f"p{k:05d}",) + r1[1:], (f"p{k:05d}",) + r2[1:]))
        if rng.random() < dup_frac:   # PCR duplicate: same fragment
            recs.append(((f"p{k:05d}d",) + r1[1:],
                         (f"p{k:05d}d",) + r2[1:]))
    # a few orphans: mate is random sequence (unmapped)
    for k in range(8):
        name, seq, q = recs[k][0]
        junk = bytes(b"ACGT"[i] for i in rng.integers(0, 4, len(seq)))
        recs.append(((f"o{k}",) + (seq, q), (f"o{k}", junk, q)))
    rng.shuffle(recs)
    orc.write_fastq(tmp_path / "r1.fq", [a for a, _ in recs])
    orc.write_fastq(tmp_path / "r2.fq", [b for _, b in recs])
    return contigs, orc.oracle_mem(fa, [tmp_path / "r1.fq",
                                        tmp_path / "r2.fq"])


def _dup_flags(lines):
    return [(l.split("\t", 2)[0], int(l.split("\t", 2)[1]) & 1024)
            for l in lines if not l.startswith("@")]


def test_markdup_matches_real_samblaster(tmp_path):
    import subprocess
    contigs, sam = _aligned_sam(tmp_path)
    sam_text = "\n".join(sam) + "\n"
    blaster = orc.build_samblaster()
    out = subprocess.run([str(blaster)], input=sam_text,
                         capture_output=True, text=True, check=True)
    oracle_lines = out.stdout.splitlines()

    from bwa_flow_tpu.dedup.markdup import make_markdup_stage
    from bwa_flow_tpu.index.build import build_index
    from bwa_flow_tpu.io.sam import Read

    fm = build_index([(n, "", s) for n, s in contigs])
    reads = []
    for i, l in enumerate(l for l in sam if not l.startswith("@")):
        r = Read(name=l.split("\t", 1)[0], seq=np.zeros(1, np.uint8),
                 qual="I", id=i)
        r.sam = l + "\n"
        reads.append(r)
    stage = make_markdup_stage(fm, ignore_unmated=True)
    stage.process(reads)
    ours = [(r.name, int(r.sam.split("\t", 2)[1]) & 1024) for r in reads]

    theirs = _dup_flags(oracle_lines)
    assert len(ours) == len(theirs)
    n_dup = sum(1 for _, d in theirs if d)
    assert n_dup > 50, f"fixture produced too few duplicates ({n_dup})"
    mism = [(a, b) for a, b in zip(ours, theirs) if a != b]
    assert not mism, f"{len(mism)} FLAG-1024 mismatches, first: {mism[:5]}"


def test_markdup_python_native_agree(tmp_path):
    """Both markdup implementations (Python + native) agree on the
    oracle fixture, not just on hand-built lines."""
    from bwa_flow_tpu.dedup import markdup as md
    if md._native is None:
        pytest.skip("native markdup not built")
    contigs, sam = _aligned_sam(tmp_path, seed=13, n_pairs=200)
    from bwa_flow_tpu.index.build import build_index
    from bwa_flow_tpu.io.sam import Read

    fm = build_index([(n, "", s) for n, s in contigs])

    def run(stage_cls):
        reads = []
        for i, l in enumerate(l for l in sam if not l.startswith("@")):
            r = Read(name=l.split("\t", 1)[0], seq=np.zeros(1, np.uint8),
                     qual="I", id=i)
            r.sam = l + "\n"
            reads.append(r)
        stage = stage_cls(fm, True)
        stage.process(reads)
        return [int(r.sam.split("\t", 2)[1]) & 1024 for r in reads]

    assert run(md.MarkDupStage) == run(md.NativeMarkDupStage)
