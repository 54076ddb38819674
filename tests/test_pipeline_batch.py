"""Device batch pipeline vs golden straight-line aligner: SAM-for-SAM
equality (the reference's PipelineTests.Seq2BamsCompute pattern,
/root/reference/test/src/PipelineTests.cpp:18-83, with bam-for-bam equality
replaced by SAM text equality)."""

import copy

import numpy as np
import pytest

from bwa_flow_tpu.io.sam import Read
from bwa_flow_tpu.models import golden
from bwa_flow_tpu.pipeline.batch import BatchAligner
from bwa_flow_tpu.utils.opts import MEM_F_PE, MemOpt

CODE = np.full(256, 4, dtype=np.uint8)
for _i, _ch in enumerate(b"ACGT"):
    CODE[_ch] = _i
_COMP = {0: 3, 1: 2, 2: 1, 3: 0, 4: 4}


def _make_se_reads(rng, contigs, n, L=101):
    seqs = [np.frombuffer(s, dtype=np.uint8) for _, _, s in contigs]
    reads = []
    for i in range(n):
        seq = seqs[int(rng.integers(0, len(seqs)))]
        pos = int(rng.integers(0, max(1, len(seq) - L)))
        r = CODE[seq[pos:pos + L]].astype(np.int32).copy()
        kind = rng.random()
        if kind < 0.4:
            m = rng.random(len(r)) < 0.04
            r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
        elif kind < 0.55:  # reverse strand
            r = np.array([_COMP[int(b)] for b in r[::-1]], dtype=np.int32)
        elif kind < 0.65:  # N run
            st = int(rng.integers(0, max(1, len(r) - 8)))
            r[st:st + 5] = 4
        elif kind < 0.75:  # deletion
            cut = int(rng.integers(1, len(r) - 2))
            r = np.concatenate([r[:cut], r[cut + 3:]])
        elif kind < 0.85:  # insertion
            cut = int(rng.integers(1, len(r) - 2))
            ins = rng.integers(0, 4, size=2)
            r = np.concatenate([r[:cut], ins, r[cut:]])[:L]
        reads.append(Read(name=f"r{i}", seq=r.astype(np.uint8),
                          qual="I" * len(r), id=i))
    return reads


def _make_pe_reads(rng, contigs, n_pairs, L=101, isize=300):
    seqs = [np.frombuffer(s, dtype=np.uint8) for _, _, s in contigs]
    reads = []
    for i in range(n_pairs):
        seq = seqs[int(rng.integers(0, len(seqs)))]
        span = isize + int(rng.integers(-40, 40))
        pos = int(rng.integers(0, max(1, len(seq) - span - L)))
        fwd = CODE[seq[pos:pos + L]].astype(np.int32)
        mate_pos = pos + span - L
        mate_f = CODE[seq[mate_pos:mate_pos + L]].astype(np.int32)
        rev = np.array([_COMP[int(b)] for b in mate_f[::-1]], dtype=np.int32)
        for j, r in enumerate((fwd, rev)):
            r = r.copy()
            m = rng.random(len(r)) < 0.02
            r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
            reads.append(Read(name=f"p{i}", seq=r.astype(np.uint8),
                              qual="I" * len(r), id=2 * i + j))
    return reads


def test_batch_se_matches_golden(small_index, rng):
    fm, contigs = small_index
    opt = MemOpt()
    reads = _make_se_reads(rng, contigs, 24)
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want, n_processed=0)
    # drain_max=0 pins wave mode (production default is host-extension)
    # so this test keeps covering the device wave path
    ba = BatchAligner(opt, fm, wave_cap=64, drain_max=0)
    ba.align_se(reads, n_processed=0)
    for got_r, want_r in zip(reads, want):
        assert got_r.sam == want_r.sam, \
            f"{got_r.name}:\n got: {got_r.sam!r}\nwant: {want_r.sam!r}"
    assert ba.stats["ext_tasks_device"] > 0


def test_batch_pe_matches_golden(small_index, rng):
    fm, contigs = small_index
    opt = MemOpt(flag=MEM_F_PE)
    reads = _make_pe_reads(rng, contigs, 12)
    want = copy.deepcopy(reads)
    golden.align_pe(opt, fm, want, n_processed=0)
    opt2 = MemOpt(flag=MEM_F_PE)
    ba = BatchAligner(opt2, fm, wave_cap=64)
    ba.align_pe(reads, n_processed=0)
    for got_r, want_r in zip(reads, want):
        assert got_r.sam == want_r.sam, \
            f"{got_r.name}:\n got: {got_r.sam!r}\nwant: {want_r.sam!r}"


def test_batch_small_wave_buffer(small_index, rng):
    """wave_cap smaller than the read count forces multi-chunk waves."""
    fm, contigs = small_index
    opt = MemOpt()
    reads = _make_se_reads(rng, contigs, 12)
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want)
    ba = BatchAligner(opt, fm, wave_cap=4)
    ba.align_se(reads)
    for got_r, want_r in zip(reads, want):
        assert got_r.sam == want_r.sam


def test_batch_oversized_fallback(small_index, rng):
    """Tiny device shapes push every task to the host path; output must be
    unchanged (packReadData-style CPU fallback)."""
    fm, contigs = small_index
    opt = MemOpt()
    reads = _make_se_reads(rng, contigs, 8)
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want)
    ba = BatchAligner(opt, fm, wave_cap=8, qmax=16, tmax=32)
    ba.align_se(reads)
    assert ba.stats["ext_tasks_host"] > 0
    for got_r, want_r in zip(reads, want):
        assert got_r.sam == want_r.sam
