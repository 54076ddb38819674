"""Device SMEM machine vs golden collect_intv — exact set/list equality of
(k, l, s, info) after the info sort, over reads with SNPs, indels and Ns."""

import numpy as np

from bwa_flow_tpu.ops import smem as smem_golden
from bwa_flow_tpu.ops import fm_jax, smem_jax
from bwa_flow_tpu.utils.opts import MemOpt


def _sample_reads(rng, contigs, n, L=101):
    reads = []
    code = np.full(256, 4, dtype=np.uint8)
    for i, ch in enumerate(b"ACGT"):
        code[ch] = i
    seqs = [np.frombuffer(s, dtype=np.uint8) for _, _, s in contigs]
    for _ in range(n):
        seq = seqs[int(rng.integers(0, len(seqs)))]
        pos = int(rng.integers(0, max(1, len(seq) - L)))
        r = code[seq[pos:pos + L]].astype(np.int32).copy()
        kind = rng.random()
        if kind < 0.35:  # SNPs
            m = rng.random(len(r)) < 0.05
            r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
        elif kind < 0.5:  # N run
            st = int(rng.integers(0, max(1, len(r) - 6)))
            r[st:st + 4] = 4
        elif kind < 0.65:  # deletion in read
            cut = int(rng.integers(1, len(r) - 2))
            r = np.concatenate([r[:cut], r[cut + 2:]])
        elif kind < 0.75:  # random (unmappable) read
            r = rng.integers(0, 4, size=len(r)).astype(np.int32)
        reads.append(r.astype(np.uint8))
    return reads


def _mems_key(lst):
    return [(m.x0, m.x1, m.s, m.info) for m in lst]


def test_collect_intv_device_matches_golden(small_index, rng):
    fm, contigs = small_index
    dfm = fm_jax.DeviceFM.from_host(fm)
    opt = MemOpt()
    reads = _sample_reads(rng, contigs, 48)
    got = smem_jax.collect_intv_batch(opt, fm, dfm, reads, L=128)
    for b, r in enumerate(reads):
        want = smem_golden.collect_intv(opt, fm, r)
        # golden sort is by info only; ties may order differently — compare
        # as multisets of full tuples
        assert sorted(_mems_key(got[b])) == sorted(_mems_key(want)), \
            f"read {b}: {len(got[b])} vs {len(want)} mems"


def test_collect_intv_device_no_pass3(small_index, rng):
    fm, contigs = small_index
    dfm = fm_jax.DeviceFM.from_host(fm)
    opt = MemOpt(max_mem_intv=0)
    reads = _sample_reads(rng, contigs, 16)
    got = smem_jax.collect_intv_batch(opt, fm, dfm, reads, L=128)
    for b, r in enumerate(reads):
        want = smem_golden.collect_intv(opt, fm, r)
        assert sorted(_mems_key(got[b])) == sorted(_mems_key(want))


def test_collect_intv_overflow_fallback(small_index, rng, monkeypatch):
    """Tiny budgets force the device machine to overflow; with the device
    redo disabled the wrapper must fall back to the host golden and still
    return exact results (the last-resort path)."""
    fm, contigs = small_index
    dfm = fm_jax.DeviceFM.from_host(fm)
    opt = MemOpt()
    reads = _sample_reads(rng, contigs, 8)
    monkeypatch.setattr(smem_jax, "DEVICE_REDO", False)
    got = smem_jax.collect_intv_batch(opt, fm, dfm, reads, L=128,
                                      MAXB=2, MAXM=4, iters_factor=1)
    for b, r in enumerate(reads):
        want = smem_golden.collect_intv(opt, fm, r)
        assert sorted(_mems_key(got[b])) == sorted(_mems_key(want))


def test_collect_intv_device_redo(small_index, rng, monkeypatch):
    """Overflowed reads must be redone by the big-budget DEVICE machine;
    the host golden is only the last resort. With MAXM=4 every read
    overflows (OVF_MEMS), and the big machine (MAXM>=256) resolves all of
    them — so golden must never be called, and results stay exact."""
    fm, contigs = small_index
    dfm = fm_jax.DeviceFM.from_host(fm)
    opt = MemOpt()
    reads = _sample_reads(rng, contigs, 8)
    calls = []
    real = smem_golden.collect_intv
    monkeypatch.setattr(smem_golden, "collect_intv",
                        lambda *a: calls.append(a) or real(*a))
    got = smem_jax.collect_intv_batch(opt, fm, dfm, reads, L=128,
                                      MAXB=2, MAXM=4, iters_factor=1)
    assert not calls, "device redo should have resolved every overflow"
    for b, r in enumerate(reads):
        want = smem_golden.collect_intv(opt, fm, r)
        assert sorted(_mems_key(got[b])) == sorted(_mems_key(want))


def test_collect_intv_all_n_read(small_index):
    fm, _ = small_index
    dfm = fm_jax.DeviceFM.from_host(fm)
    opt = MemOpt()
    reads = [np.full(50, 4, dtype=np.uint8)]
    got = smem_jax.collect_intv_batch(opt, fm, dfm, reads, L=128)
    assert got[0] == []


def test_collect_intv_wide_path_matches_golden(small_index, rng):
    """The int64 (wide) machine — the human-scale >=2^31 path — forced on
    a small genome via the FORCE_WIDE hook (ADVICE r2: every test genome
    is sub-2^31, so without this the wide machine and the INFO_SHIFT=32
    dense-collect branch would only ever run at human scale)."""
    fm, contigs = small_index
    dfm = fm_jax.DeviceFM.from_host(fm)
    opt = MemOpt()
    reads = _sample_reads(rng, contigs, 24)
    smem_jax.FORCE_WIDE = True
    try:
        h = smem_jax.seed_dispatch(opt, fm, dfm, reads, L=128)
        assert "packed" not in h, "wide path must not take the narrow " \
            "packed-bundle branch"
        got = smem_jax.seed_collect(h)
    finally:
        smem_jax.FORCE_WIDE = False
    for b, r in enumerate(reads):
        want = smem_golden.collect_intv(opt, fm, r)
        assert sorted(_mems_key(got[b])) == sorted(_mems_key(want)), \
            f"read {b}: {len(got[b])} vs {len(want)} mems"
