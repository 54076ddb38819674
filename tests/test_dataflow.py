"""Dataflow pipeline (kflow analog) vs golden: identical SAM through the
overlapped device/pool path, SE and PE, with and without worker processes."""

import copy

import numpy as np
import pytest

from bwa_flow_tpu.models import golden
from bwa_flow_tpu.pipeline.dataflow import AlignPipeline
from bwa_flow_tpu.utils.opts import MEM_F_PE, MemOpt
from tests.test_pipeline_batch import _make_pe_reads, _make_se_reads


def _run(opt, fm, reads, paired, n_workers, batch_size=10):
    batches = [reads[i:i + batch_size]
               for i in range(0, len(reads), batch_size)]
    pipe = AlignPipeline(opt, fm, paired=paired, n_workers=n_workers,
                         aligner_kw=dict(wave_cap=64))
    done = []
    try:
        n = pipe.run(iter(batches), done.extend)
    finally:
        pipe.close()
    assert n == len(reads)
    return done


@pytest.mark.parametrize("n_workers", [0, 2])
def test_dataflow_se(small_index, rng, n_workers):
    fm, contigs = small_index
    opt = MemOpt()
    reads = _make_se_reads(rng, contigs, 20)
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want)
    got = _run(opt, fm, reads, False, n_workers)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.sam == w.sam, f"{g.name}\n got {g.sam!r}\nwant {w.sam!r}"


@pytest.mark.parametrize("n_workers", [0, 2])
def test_dataflow_pe(small_index, rng, n_workers):
    """Insert-size stats are per pipeline batch (the reference's per-batch
    pestat, bwamem.c:1220-1249) — golden must see the same batching."""
    fm, contigs = small_index
    opt = MemOpt(flag=MEM_F_PE)
    reads = _make_pe_reads(rng, contigs, 10)
    want = copy.deepcopy(reads)
    bsz = 8
    for off in range(0, len(want), bsz):
        golden.align_pe(opt, fm, want[off:off + bsz], n_processed=off)
    got = _run(opt, fm, reads, True, n_workers, batch_size=bsz)
    for g, w in zip(got, want):
        assert g.sam == w.sam, f"{g.name}\n got {g.sam!r}\nwant {w.sam!r}"
