"""samblaster-equivalent duplicate marking: signature, strand/clip
normalization, orphans, SE dummies (reference semantics:
/root/reference/src/samblaster.cpp:425-568)."""

import numpy as np
import pytest

from bwa_flow_tpu.dedup.markdup import MarkDupStage, MarkDupState, \
    _Line, mark_dups_block
from bwa_flow_tpu.io.sam import Read


class _Ann:
    def __init__(self, name, length):
        self.name = name
        self.len = length


class _FM:
    class bns:
        anns = [_Ann("chr1", 100000), _Ann("chr2", 50000)]


def _read(name, sam):
    return Read(name=name, seq=np.zeros(1, np.uint8), sam=sam)


def _sam(name, flag, rname, pos, cigar, mrname="=", mpos=0, tlen=0):
    return (f"{name}\t{flag}\t{rname}\t{pos}\t60\t{cigar}\t{mrname}"
            f"\t{mpos}\t{tlen}\tA\tI\n")


def test_pe_duplicate_pair_marked():
    st = MarkDupStage(_FM())
    reads = []
    for tag in ("a", "b"):  # identical coordinates -> second pair is dup
        reads.append(_read(tag, _sam(tag, 99, "chr1", 1000, "101M",
                                     mpos=1300, tlen=401)))
        reads.append(_read(tag, _sam(tag, 147, "chr1", 1300, "101M",
                                     mpos=1000, tlen=-401)))
    st.process(reads)
    flags = [int(r.sam.split("\t")[1]) for r in reads]
    assert flags[0] == 99 and flags[1] == 147
    assert flags[2] == 99 | 1024 and flags[3] == 147 | 1024
    assert st.state.dup_count == 1


def test_clip_normalization_detects_dup():
    """5'-clipped copy has the same unclipped signature (calcOffsets)."""
    st = MarkDupStage(_FM())
    reads = [
        _read("a", _sam("a", 99, "chr1", 1000, "101M", mpos=1300)),
        _read("a", _sam("a", 147, "chr1", 1300, "101M", mpos=1000)),
        # same molecule, 5 bases soft-clipped at 5' -> POS shifted +5
        _read("b", _sam("b", 99, "chr1", 1005, "5S96M", mpos=1300)),
        _read("b", _sam("b", 147, "chr1", 1300, "101M", mpos=1005)),
    ]
    st.process(reads)
    assert int(reads[2].sam.split("\t")[1]) & 1024
    assert int(reads[3].sam.split("\t")[1]) & 1024


def test_different_position_not_dup():
    st = MarkDupStage(_FM())
    reads = [
        _read("a", _sam("a", 99, "chr1", 1000, "101M", mpos=1300)),
        _read("a", _sam("a", 147, "chr1", 1300, "101M", mpos=1000)),
        _read("b", _sam("b", 99, "chr1", 2000, "101M", mpos=2300)),
        _read("b", _sam("b", 147, "chr1", 2300, "101M", mpos=2000)),
    ]
    st.process(reads)
    assert not any(int(r.sam.split("\t")[1]) & 1024 for r in reads)


def test_pair_order_normalized():
    """Swapped first/second mates yield the same signature (needSwap)."""
    st = MarkDupStage(_FM())
    reads = [
        _read("a", _sam("a", 99, "chr1", 1000, "101M", mpos=1300)),
        _read("a", _sam("a", 147, "chr1", 1300, "101M", mpos=1000)),
        # mate roles flipped: read1 at 1300 reverse, read2 at 1000 forward
        _read("b", _sam("b", 83, "chr1", 1300, "101M", mpos=1000)),
        _read("b", _sam("b", 163, "chr1", 1000, "101M", mpos=1300)),
    ]
    st.process(reads)
    assert int(reads[2].sam.split("\t")[1]) & 1024


def test_se_duplicates():
    st = MarkDupStage(_FM())
    reads = [
        _read("a", _sam("a", 0, "chr1", 500, "101M")),
        _read("b", _sam("b", 0, "chr1", 500, "101M")),
        _read("c", _sam("c", 16, "chr1", 500, "101M")),  # other strand
    ]
    st.process(reads)
    flags = [int(r.sam.split("\t")[1]) for r in reads]
    assert flags == [0, 1024, 16]


def test_orphan_and_unmapped():
    st = MarkDupStage(_FM())
    reads = [
        # orphan pair: mate unmapped; two identical orphans -> dup
        _read("a", _sam("a", 73, "chr1", 700, "101M")),   # paired,mate unmap
        _read("a", _sam("a", 133, "chr1", 700, "*")),     # unmapped mate
        _read("b", _sam("b", 73, "chr1", 700, "101M")),
        _read("b", _sam("b", 133, "chr1", 700, "*")),
        # fully unmapped single: never dup
        _read("c", _sam("c", 4, "*", 0, "*")),
        _read("d", _sam("d", 4, "*", 0, "*")),
    ]
    st.process(reads)
    flags = [int(r.sam.split("\t")[1]) for r in reads]
    assert flags[0] == 73 and flags[2] == 73 | 1024 and flags[3] == 133 | 1024
    assert flags[4] == 4 and flags[5] == 4


def test_secondary_lines_ignored_but_marked():
    st = MarkDupStage(_FM())
    two_lines = (_sam("a", 0, "chr1", 500, "101M")
                 + _sam("a", 256, "chr2", 900, "101M"))
    reads = [
        _read("a", two_lines),
        _read("b", _sam("b", 0, "chr1", 500, "101M")),
    ]
    st.process(reads)
    assert int(reads[1].sam.split("\t")[1]) & 1024
    # now a dup of read a: both its lines get the flag
    reads2 = [_read("c", two_lines)]
    st.process(reads2)
    lines = reads2[0].sam.splitlines()
    assert int(lines[0].split("\t")[1]) == 1024
    assert int(lines[1].split("\t")[1]) == 256 | 1024


def test_signature_merge_across_instances():
    """Cross-host merge: signatures travel, dup detected remotely."""
    a = MarkDupState(_FM.bns.anns)
    b = MarkDupState(_FM.bns.anns)
    l1 = [_Line(flag=99, rname="chr1", rapos=1000, cigar=b"101M"),
          _Line(flag=147, rname="chr1", rapos=1300, cigar=b"101M")]
    assert not mark_dups_block(a, l1)
    b.merge(a.signature_items())
    l2 = [_Line(flag=99, rname="chr1", rapos=1000, cigar=b"101M"),
          _Line(flag=147, rname="chr1", rapos=1300, cigar=b"101M")]
    assert mark_dups_block(b, l2)


def test_native_markdup_matches_python(small_index, rng):
    """The native engine must mark exactly the blocks the Python stage
    marks (same signatures, FLAG rewrites, and counters)."""
    import copy
    import pytest
    from bwa_flow_tpu.dedup import markdup as md
    if md._native is None:
        pytest.skip("_markdup extension not built")
    from bwa_flow_tpu.models import golden
    from bwa_flow_tpu.utils.opts import MemOpt
    from tests.test_pipeline_batch import _make_pe_reads
    fm, contigs = small_index
    opt = MemOpt()
    from bwa_flow_tpu.utils.opts import MEM_F_PE
    opt.flag |= MEM_F_PE
    reads = _make_pe_reads(rng, contigs, 30)
    # duplicate a third of the pairs (same coordinates -> same signature)
    for k in range(0, 20, 2):
        for j in (0, 1):
            dup = copy.deepcopy(reads[2 * k + j])
            dup.name = f"dup{k}"
            dup.id = len(reads) + 2 * k + j
            reads.append(dup)
    golden.align_pe(opt, fm, reads)
    py_reads = copy.deepcopy(reads)
    nat_reads = copy.deepcopy(reads)
    py = md.MarkDupStage(fm, ignore_unmated=True)
    py.process(py_reads)
    nat = md.NativeMarkDupStage(fm, ignore_unmated=True)
    nat.process(nat_reads)
    assert nat.state.dup_count == py.state.dup_count
    assert nat.state.unmated_count == py.state.unmated_count
    for a, b in zip(nat_reads, py_reads):
        assert a.sam == b.sam, a.name
    assert sorted(nat.state.signature_items()) == \
        sorted(py.state.signature_items())
