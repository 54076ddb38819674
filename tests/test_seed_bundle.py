"""Ragged seed bundle edge paths: pool overflow falls back to the dense
refetch, the lists() view restores the elided x1, and the wave driver's
host drain produces exact output."""

import numpy as np

from bwa_flow_tpu.ops import fm_jax, smem_jax
from bwa_flow_tpu.ops import smem as smem_golden
from bwa_flow_tpu.utils.opts import MemOpt


def _reads(rng, contigs, n, L=101):
    code = np.full(256, 4, dtype=np.uint8)
    for i, ch in enumerate(b"ACGT"):
        code[ch] = i
    seqs = [np.frombuffer(s, dtype=np.uint8) for _, _, s in contigs]
    out = []
    for _ in range(n):
        seq = seqs[int(rng.integers(0, len(seqs)))]
        pos = int(rng.integers(0, max(1, len(seq) - L)))
        r = code[seq[pos:pos + L]].astype(np.int32).copy()
        m = rng.random(len(r)) < 0.04
        r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
        out.append(r.astype(np.uint8))
    return out


def test_ragged_pool_overflow_dense_refetch(small_index, rng, monkeypatch):
    """Force CAPM/CAPO pools far below the batch's real totals: the host
    must refetch the dense mems and still return exact intervals + fused
    SA coverage via the probe path (occ segments dropped)."""
    fm, contigs = small_index
    dfm = fm_jax.DeviceFM.from_host(fm)
    opt = MemOpt()
    reads = _reads(rng, contigs, 24)
    monkeypatch.setattr(smem_jax, "CAPM_PER", 1)
    monkeypatch.setattr(smem_jax, "CAPO_PER", 1)
    # the pool sizes bake into the traced program: drop cached traces so
    # the tiny pools take effect now and the defaults do again afterwards
    smem_jax.collect_intv_device.clear_cache()
    try:
        got = smem_jax.collect_intv_batch(opt, fm, dfm, reads, L=128)
    finally:
        smem_jax.collect_intv_device.clear_cache()
    for b, r in enumerate(reads):
        want = smem_golden.collect_intv(opt, fm, r)
        assert sorted((m.x0, m.x1, m.s, m.info) for m in got[b]) == \
            sorted((m.x0, m.x1, m.s, m.info) for m in want), f"read {b}"


def test_batch_view_elides_x1_lists_view_restores(small_index, rng):
    """Production array path ships no x1 (zeros); the lists() view must
    still carry the exact x1 (device refetch)."""
    fm, contigs = small_index
    dfm = fm_jax.DeviceFM.from_host(fm)
    opt = MemOpt()
    reads = _reads(rng, contigs, 8)
    h = smem_jax.seed_dispatch(opt, fm, dfm, reads, L=128)
    batch = smem_jax.seed_collect_batch(h)
    # batch view: x1 elided unless a redo spliced golden values in
    h2 = smem_jax.seed_dispatch(opt, fm, dfm, reads, L=128)
    lists = smem_jax.seed_collect(h2)
    for b, r in enumerate(reads):
        want = smem_golden.collect_intv(opt, fm, r)
        assert [(m.x0, m.x1, m.s, m.info) for m in lists[b]] == \
            [(m.x0, m.x1, m.s, m.info) for m in want]
        lo, hi = batch.iv_off[b], batch.iv_off[b + 1]
        assert list(batch.x0[lo:hi]) == [m.x0 for m in want]


def test_wave_full_host_drain_exact(small_index, rng):
    """drain_max above the batch size: every extension task runs on the
    host scalar kernel through _wave.drain; output must stay exact."""
    import copy

    from bwa_flow_tpu.io.sam import Read
    from bwa_flow_tpu.models import golden
    from bwa_flow_tpu.ops import wave_native
    from bwa_flow_tpu.pipeline.batch import BatchAligner

    if not wave_native.available():
        import pytest
        pytest.skip("native wave driver not built")
    fm, contigs = small_index
    opt = MemOpt()
    seqs = _reads(rng, contigs, 16)
    reads = [Read(name=f"d{i}", seq=s, qual="I" * len(s), id=i)
             for i, s in enumerate(seqs)]
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want, n_processed=0)
    ba = BatchAligner(opt, fm, wave_cap=64, drain_max=10_000)
    ba.align_se(reads, n_processed=0)
    for got_r, want_r in zip(reads, want):
        assert got_r.sam == want_r.sam, got_r.name
    assert ba.stats["ext_tasks_device"] == 0
    assert ba.stats["ext_tasks_host"] > 0


def test_pipeline_no_dense_sa_probe_path(small_index, rng, monkeypatch):
    """Gbp-scale configuration on a small genome: no dense SA, so the
    pipeline resolves SA through the narrowed LF-walk probe path
    (occ_total = -1 sentinel on every read). Output must stay exact."""
    import copy

    from bwa_flow_tpu.io.sam import Read
    from bwa_flow_tpu.models import golden
    from bwa_flow_tpu.pipeline.batch import BatchAligner

    monkeypatch.setenv("BWA_TPU_DENSE_SA_MAX", "0")
    fm, contigs = small_index
    opt = MemOpt()
    seqs = _reads(rng, contigs, 16)
    reads = [Read(name=f"p{i}", seq=s, qual="I" * len(s), id=i)
             for i, s in enumerate(seqs)]
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want, n_processed=0)
    ba = BatchAligner(opt, fm, wave_cap=64)
    assert ba.dfm.sa_dense is None
    ba.align_se(reads, n_processed=0)
    for got_r, want_r in zip(reads, want):
        assert got_r.sam == want_r.sam, got_r.name


def test_wave_harvest_workers_exact(small_index, rng):
    """Harvester threads steal pending reads onto the scalar kernel WHILE
    device waves are in flight (the reference's concurrent CPU+accel
    execution of one queue, kflow/include/kflow/MapStage.h:78-116).
    Output must be bit-identical to golden, and both the device and the
    host path must actually run."""
    import copy

    from bwa_flow_tpu.io.sam import Read
    from bwa_flow_tpu.models import golden
    from bwa_flow_tpu.ops import wave_native
    from bwa_flow_tpu.pipeline.batch import BatchAligner

    if not (wave_native.available() and wave_native.can_steal()):
        import pytest
        pytest.skip("native wave driver without steal()")
    fm, contigs = small_index
    opt = MemOpt()
    seqs = _reads(rng, contigs, 48)
    reads = [Read(name=f"h{i}", seq=s, qual="I" * len(s), id=i)
             for i, s in enumerate(seqs)]
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want, n_processed=0)
    # tiny wave_cap -> many small waves -> plenty of in-flight windows
    # for the harvesters to steal during; drain_max=0 forces wave mode
    # (the production default is host-extension, BWA_TPU_EXT=host)
    ba = BatchAligner(opt, fm, wave_cap=16, harvest_workers=2,
                      drain_max=0)
    ba.align_se(reads, n_processed=0)
    for got_r, want_r in zip(reads, want):
        assert got_r.sam == want_r.sam, got_r.name
    assert ba.stats["ext_tasks_host"] > 0, "harvesters never ran"
    assert ba.stats["ext_tasks_device"] > 0, "device never ran"


def test_global_fused_sa_heavy_occ_reads(rng):
    """Reads whose occurrence totals far exceed the old per-read fused
    budget (64) must now resolve SA fully on device through the global
    ragged pool — no probe round trip — and match the golden output
    byte-for-byte. A tandem-repeat genome makes every read's seeds land
    on dozens-to-hundreds of copies."""
    import copy

    from bwa_flow_tpu.index.build import build_index
    from bwa_flow_tpu.io.sam import Read
    from bwa_flow_tpu.models import golden
    from bwa_flow_tpu.pipeline.batch import BatchAligner
    from bwa_flow_tpu.utils.opts import MemOpt

    unit = rng.integers(0, 4, 97)
    genome = np.tile(unit, 120)           # ~11.6 kb of a 97 bp repeat
    # a unique flank so some seeds anchor
    flank = rng.integers(0, 4, 800)
    g = np.concatenate([flank, genome, flank[::-1]])
    seq = bytes(bytearray(b"ACGT"[int(c)] for c in g))
    fm = build_index([("chr1", "", seq)])
    opt = MemOpt()
    code = np.full(256, 4, np.uint8)
    for i, ch in enumerate(b"ACGT"):
        code[ch] = i
    seqs = []
    for i in range(12):
        pos = int(rng.integers(0, len(g) - 101))
        r = code[np.frombuffer(seq[pos:pos + 101], np.uint8)].copy()
        m = rng.random(101) < 0.02
        r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
        seqs.append(r.astype(np.uint8))
    reads = [Read(name=f"h{i}", seq=s, qual="I" * len(s), id=i)
             for i, s in enumerate(seqs)]
    want = copy.deepcopy(reads)
    golden.align_se(opt, fm, want, n_processed=0)
    ba = BatchAligner(opt, fm, wave_cap=64)
    assert ba.dfm.sa_dense is not None
    # seed + collect directly to observe the fused coverage
    h = ba.seeds_dispatch([r.seq for r in reads])
    ba.seeds_collect(h)
    heavy = [v for v in h["sa_vals"] if v is not None and len(v) > 64]
    assert heavy, "expected reads with >64 fused SA occurrences"
    ba2 = BatchAligner(opt, fm, wave_cap=64)
    ba2.align_se(reads, n_processed=0)
    for got_r, want_r in zip(reads, want):
        assert got_r.sam == want_r.sam, got_r.name


def test_fused_sa_walk_sparse_intv(small_index, rng, monkeypatch):
    """Gbp-class configuration: NO dense SA and a SPARSE sampled SA
    (intv 32, the stock bwa interval), so the seed program resolves SA
    through the fused phased LF walk (round-5). Values must match
    host bwt_sa exactly, and segment offsets must stay layout-
    consistent even when a read is OVF_SA-flagged (the round-5 offset
    desync shipped wrong SA values for every read after a flagged
    one before the CLI drive caught it)."""
    import numpy as np

    from bwa_flow_tpu.index.build import build_index
    from bwa_flow_tpu.ops import fm as fmops
    from bwa_flow_tpu.ops import fm_jax, smem_jax
    from bwa_flow_tpu.ops.chain_native import sa_probe_layout
    from bwa_flow_tpu.utils.opts import MemOpt

    fm, contigs = small_index
    fm32 = build_index(list(contigs), sa_intv=32)
    dfm = fm_jax.DeviceFM.from_host(fm32, dense_sa_max=0)
    assert dfm.sa_dense is None and fm32.sa_intv == 32
    opt = MemOpt()
    seqs = _reads(rng, contigs, 24)
    h = smem_jax.seed_dispatch(opt, fm32, dfm, seqs, L=128)
    batch = smem_jax.seed_collect_batch(h)
    sav = h["sa_vals"]
    assert sum(1 for v in sav if v is not None) >= 20
    rows, offs, _ = sa_probe_layout(opt, batch, build_owners=False)
    checked = 0
    for b in range(len(seqs)):
        if sav[b] is None:
            continue
        lo, hi = int(offs[b]), int(offs[b + 1])
        assert hi - lo == len(sav[b])
        for j in range(lo, hi):
            assert int(sav[b][j - lo]) == fmops.bwt_sa(fm32, int(rows[j]))
            checked += 1
    assert checked > 50


def test_adaptive_pool_escalation(rng):
    """Novel-genome guard (round-5): a read mix that overflows the
    default pass-2 task pool (many distinct unique fragments per read
    -> ~6 re-seed tasks/read vs the 2/read budget) must trigger a
    one-way p2x escalation after the first batch, drop the redo count
    on the next batch, and stay golden-exact throughout."""
    import numpy as np

    from bwa_flow_tpu.index.build import build_index
    from bwa_flow_tpu.ops import fm_jax, smem_jax
    from bwa_flow_tpu.ops import smem as smem_golden
    from bwa_flow_tpu.utils.opts import MemOpt

    g = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, 40000)].tobytes()
    fm = build_index([("chr1", "", g)])
    dfm = fm_jax.DeviceFM.from_host(fm)
    opt = MemOpt()
    code = np.full(256, 4, np.uint8)
    for i, c in enumerate(b"ACGT"):
        code[c] = i
    gi = code[np.frombuffer(g, np.uint8)]

    def frankenread():
        # 5 unique 30-mers from scattered positions: five >=28bp occ-1
        # SMEMs -> five pass-2 tasks (budget is 2/read)
        parts = [gi[p:p + 30] for p in
                 rng.integers(0, len(gi) - 30, 5)]
        return np.concatenate(parts).astype(np.uint8)

    batch = [frankenread() for _ in range(64)]
    smem_jax._ADAPT.clear()
    try:
        h1 = smem_jax.seed_dispatch(opt, fm, dfm, batch, L=160)
        assert h1["p2x"] == 1
        got1 = smem_jax.seed_collect(h1)
        assert smem_jax._ADAPT.get(id(fm), 1) > 1, \
            "overflow cliff did not escalate the profile"
        h2 = smem_jax.seed_dispatch(opt, fm, dfm, batch, L=160)
        assert h2["p2x"] > 1
        got2 = smem_jax.seed_collect(h2)
    finally:
        smem_jax._ADAPT.clear()
    for b, r in enumerate(batch):
        want = smem_golden.collect_intv(opt, fm, r)
        for got in (got1, got2):
            assert sorted(_mems_key_sb(got[b])) == \
                sorted(_mems_key_sb(want)), f"read {b}"


def _mems_key_sb(ivs):
    return [(iv.start, iv.end, iv.x0, iv.x1, iv.s) for iv in ivs]
