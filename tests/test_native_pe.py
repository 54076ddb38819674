"""Native PE tail vs the golden Python pipeline (byte-exact SAM)."""

import copy

import numpy as np
import pytest

from bwa_flow_tpu.models import golden
from bwa_flow_tpu.ops import chain as chainops
from bwa_flow_tpu.ops import region as regionops
from bwa_flow_tpu.ops import region_native
from bwa_flow_tpu.ops import smem as smemops
from bwa_flow_tpu.utils.opts import MEM_F_PE, MemOpt
from tests.test_pipeline_batch import _make_pe_reads

pytestmark = pytest.mark.skipif(
    not (region_native.available()
         and hasattr(getattr(region_native, "_ext", None),
                     "pe_tail_batch")),
    reason="_region pe_tail not built")


def _pre_dedup(opt, fm, seq):
    intvs = smemops.collect_intv(opt, fm, seq)
    chains = chainops.mem_chain(opt, fm, len(seq), intvs)
    chains = chainops.mem_chain_flt(opt, chains)
    chainops.mem_flt_chained_seeds(opt, fm, len(seq), seq, chains)
    regs = []
    for c in chains:
        regionops.mem_chain2aln(opt, fm, len(seq), seq, c, regs)
    return regs


def test_pe_tail_matches_golden(small_index, rng):
    fm, contigs = small_index
    opt = MemOpt()
    opt.flag |= MEM_F_PE
    reads = _make_pe_reads(rng, contigs, 40)
    # widen the isize spread so pestat sees a distribution
    reads += _make_pe_reads(rng, contigs, 20, isize=400)
    for i, r in enumerate(reads):
        r.id = i
    want = copy.deepcopy(reads)
    golden.align_pe(opt, fm, want, n_processed=0, rg_id="rg7")
    reg_lists = [_pre_dedup(opt, fm, r.seq) for r in reads]
    sams, pes = region_native.pe_tail_batch(opt, fm, reads, reg_lists,
                                            rg_id="rg7")
    for i, (g, w) in enumerate(zip(sams, want)):
        assert g == w.sam, f"read {i} ({reads[i].name}):\n got {g!r}\n" \
                           f"want {w.sam!r}"


def test_pe_tail_with_pes0(small_index, rng):
    from bwa_flow_tpu.cli import parse_insert_override
    fm, contigs = small_index
    opt = MemOpt()
    opt.flag |= MEM_F_PE
    pes0 = parse_insert_override("300,40")
    reads = _make_pe_reads(rng, contigs, 16)
    for i, r in enumerate(reads):
        r.id = i
    want = copy.deepcopy(reads)
    golden.align_pe(opt, fm, want, n_processed=0, pes0=pes0)
    reg_lists = [_pre_dedup(opt, fm, r.seq) for r in reads]
    sams, _ = region_native.pe_tail_batch(opt, fm, reads, reg_lists,
                                          pes0=pes0)
    for i, (g, w) in enumerate(zip(sams, want)):
        assert g == w.sam, i
