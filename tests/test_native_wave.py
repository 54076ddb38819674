"""Native wave driver vs the Python generator driver (identical regions).

Both paths run the same device kernel; what differs is who steps the
per-read state machines (C++ _wave vs Python generators). Regions must
match field-for-field, including reads whose tasks run inline on the
scalar kernel (tiny qmax/tmax force the oversize path)."""

import numpy as np
import pytest

from bwa_flow_tpu.ops import region_native, wave_native
from bwa_flow_tpu.pipeline.batch import BatchAligner
from bwa_flow_tpu.utils.opts import MemOpt
from tests.test_pipeline_batch import _make_se_reads

pytestmark = pytest.mark.skipif(not wave_native.available(),
                                reason="_wave extension not built")


def _sig(regs):
    return [(p.rb, p.re, p.qb, p.qe, p.rid, p.score, p.truesc, p.w,
             p.seedcov, p.seedlen0, round(p.frac_rep, 9)) for p in regs]


@pytest.mark.parametrize("shapes", [dict(wave_cap=32),
                                    dict(wave_cap=8, qmax=16, tmax=32)])
def test_wave_driver_matches_python(small_index, rng, shapes):
    fm, contigs = small_index
    opt = MemOpt()
    reads = _make_se_reads(rng, contigs, 24)
    seqs = [r.seq for r in reads]
    ba = BatchAligner(opt, fm, **shapes)
    h = ba.seeds_dispatch(seqs)
    intvs = ba.seeds_collect(h)
    sa_flat = ba.resolve_sa_flat(intvs, h)
    rows, frac, off = ba.extend_waves_packed(seqs, intvs, sa_flat)
    got = region_native.unpack_regs(rows, frac, off)
    chains = ba.chain_reads(seqs, intvs, sa_flat)
    want = ba.extend_waves(seqs, chains)
    for r in range(len(seqs)):
        assert _sig(got[r]) == _sig(want[r]), r
