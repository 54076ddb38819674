"""Failure detection / graceful degradation (the FPGA validate + redo +
setUseAccx(false) pattern, /root/reference/src/fpga/FPGAPipeline.cpp)."""

import copy

import numpy as np

from bwa_flow_tpu.models import golden
from bwa_flow_tpu.pipeline.batch import BatchAligner
from bwa_flow_tpu.utils.opts import MemOpt
from bwa_flow_tpu.utils.trace import Tracer
from tests.test_pipeline_batch import _make_se_reads


def test_validation_clean_run(small_index, rng):
    fm, contigs = small_index
    opt = MemOpt()
    reads = _make_se_reads(rng, contigs, 8)
    ba = BatchAligner(opt, fm, wave_cap=32, validate_every=1)
    ba.align_se(reads)
    assert ba.device_ok
    assert ba.stats["validations"] == 1


def test_device_exception_degrades_to_host(small_index, rng, monkeypatch):
    fm, contigs = small_index
    opt = MemOpt()
    reads = _make_se_reads(rng, contigs, 6)
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want)
    ba = BatchAligner(opt, fm, wave_cap=32)
    monkeypatch.setattr(ba, "collect_seeds",
                        lambda seqs: (_ for _ in ()).throw(
                            RuntimeError("tunnel lost")))
    ba.align_se(reads)
    assert not ba.device_ok
    assert ba.stats["device_errors"] == 1
    for g, w in zip(reads, want):
        assert g.sam == w.sam
    # subsequent batches run host directly
    reads2 = _make_se_reads(rng, contigs, 4)
    want2 = copy.deepcopy(reads2)
    golden.align_se(opt, fm, want2, n_processed=0)
    ba.align_se(reads2, n_processed=0)
    for g, w in zip(reads2, want2):
        assert g.sam == w.sam


def test_validation_mismatch_degrades(small_index, rng, monkeypatch):
    """Corrupted device extension results must be caught by the validator
    and the batch redone on host, bit-identically."""
    fm, contigs = small_index
    opt = MemOpt()
    reads = _make_se_reads(rng, contigs, 6)
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want)
    ba = BatchAligner(opt, fm, wave_cap=32, validate_every=1,
                      validate_sample=6)
    real = ba.extend_waves

    def corrupted(seqs, chains):
        regs = real(seqs, chains)
        for rr in regs:
            for a in rr:
                a.score += 7  # wrong-result injection
        return regs

    monkeypatch.setattr(ba, "extend_waves", corrupted)
    ba.align_se(reads)
    assert not ba.device_ok
    for g, w in zip(reads, want):
        assert g.sam == w.sam


def test_tracer_spans():
    tr = Tracer("t")
    with tr.span("stage_a"):
        pass
    with tr.span("stage_a"):
        pass
    with tr.span("stage_b"):
        pass
    assert tr.counts["stage_a"] == 2
    assert "stage_a" in tr.report()
    assert "stage_b" in tr.as_json()
