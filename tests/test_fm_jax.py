"""Device FM ops vs golden NumPy oracle (mirrors the reference's golden-diff
test pattern, /root/reference/test/src/TestCommon.h)."""

import numpy as np
import jax.numpy as jnp

from bwa_flow_tpu.ops import fm as fmops
from bwa_flow_tpu.ops import fm_jax


def _dfm(small_index):
    fm, _ = small_index
    return fm, fm_jax.DeviceFM.from_host(fm)


def test_occ_batch(small_index, rng):
    fm, dfm = _dfm(small_index)
    ks = np.concatenate([
        rng.integers(0, fm.seq_len, size=200),
        np.array([-1, 0, 1, fm.seq_len - 1, fm.seq_len,
                  fm.primary - 1, fm.primary, fm.primary + 1]),
    ]).astype(np.int64)
    cs = rng.integers(0, 4, size=len(ks)).astype(np.int32)
    got = np.asarray(fm_jax.occ_batch(dfm, jnp.asarray(ks), jnp.asarray(cs)))
    want = np.array([fmops.occ(fm, int(k), int(c)) for k, c in zip(ks, cs)])
    np.testing.assert_array_equal(got, want)


def test_occ4_batch(small_index, rng):
    fm, dfm = _dfm(small_index)
    ks = np.concatenate([
        rng.integers(-1, fm.seq_len + 1, size=200),
        np.array([-1, fm.seq_len, fm.primary]),
    ]).astype(np.int64)
    got = np.asarray(fm_jax.occ4_batch(dfm, jnp.asarray(ks)))
    want = np.stack([fmops.occ4(fm, int(k)) for k in ks])
    np.testing.assert_array_equal(got, want)


def test_extend_batch(small_index, rng):
    fm, dfm = _dfm(small_index)
    # random plausible intervals: start from single-base intervals and walk
    iks = []
    for c in range(4):
        ik = fmops.set_intv(fm, c)
        iks.append(ik.copy())
        for _ in range(6):
            ok = fmops.bwt_extend(fm, ik, is_back=False)
            nz = [i for i in range(4) if ok[i, 2] > 0]
            if not nz:
                break
            ik = ok[int(rng.choice(nz))].copy()
            iks.append(ik.copy())
    iks = np.stack(iks)
    for is_back in (False, True):
        got = np.asarray(fm_jax.bwt_extend_batch(dfm, jnp.asarray(iks), is_back))
        want = np.stack([fmops.bwt_extend(fm, ik, is_back) for ik in iks])
        np.testing.assert_array_equal(got, want)


def test_set_intv_batch(small_index):
    fm, dfm = _dfm(small_index)
    cs = np.arange(4, dtype=np.int32)
    got = np.asarray(fm_jax.set_intv_batch(dfm, jnp.asarray(cs)))
    want = np.stack([fmops.set_intv(fm, c) for c in range(4)])
    np.testing.assert_array_equal(got, want)


def test_bwt_b0_and_sa_batch(small_index, rng):
    fm, dfm = _dfm(small_index)
    ks = rng.integers(0, fm.seq_len, size=300).astype(np.int64)
    got_b0 = np.asarray(fm_jax.bwt_b0_batch(dfm, jnp.asarray(ks)))
    want_b0 = np.array([fmops.bwt_b0(fm, int(k)) for k in ks])
    np.testing.assert_array_equal(got_b0, want_b0)

    # SA lookup: row coords in [0, seq_len]
    ks2 = rng.integers(0, fm.seq_len + 1, size=300).astype(np.int64)
    sa, ovf = fm_jax.sa_batch(dfm, jnp.asarray(ks2), max_iters=4096)
    sa, ovf = np.asarray(sa), np.asarray(ovf)
    assert not ovf.any()
    want_sa = np.array([fmops.bwt_sa(fm, int(k)) for k in ks2])
    np.testing.assert_array_equal(sa, want_sa)


def test_sa_batch_overflow_flags(small_index):
    fm, dfm = _dfm(small_index)
    ks = np.arange(1, 65, dtype=np.int64) * 17 % fm.seq_len
    sa, ovf = fm_jax.sa_batch(dfm, jnp.asarray(ks), max_iters=1)
    ovf = np.asarray(ovf)
    # with a 1-step budget, any lane needing >1 LF steps must be flagged
    need = np.array([0 if (int(k) % fm.sa_intv) == 0 else 1 for k in ks])
    walked = np.asarray(sa)
    exact = np.array([fmops.bwt_sa(fm, int(k)) for k in ks])
    assert ((walked == exact) | ovf).all()
    assert (ovf <= need.astype(bool)).all() or ovf.any()


def test_dense_sa_covers_last_row(small_index):
    """FM interval rows span [0, seq_len] INCLUSIVE; the densified SA
    must answer the final row (regression: a read whose only seed
    interval started at x0 == seq_len resolved to garbage)."""
    import jax.numpy as jnp
    from bwa_flow_tpu.ops import fm as fmops
    from bwa_flow_tpu.ops.fm_jax import DeviceFM, sa_batch
    fm, _ = small_index
    dfm = DeviceFM.from_host(fm)
    assert dfm.sa_dense is not None
    ks = jnp.asarray([0, fm.seq_len // 2, fm.seq_len - 1, fm.seq_len],
                     jnp.int64)
    vals, ovf = sa_batch(dfm, ks)
    import numpy as np
    want = [fmops.bwt_sa(fm, int(k)) for k in np.asarray(ks)]
    assert not np.asarray(ovf).any()
    assert np.asarray(vals).tolist() == want


def test_sa_batch_walk_branch_narrow_and_wide(small_index, rng):
    """The LF-walk branch (no dense SA — Gbp-scale genomes) in both probe
    dtypes: int32 (narrowed view, sub-2^31 genomes) and int64. Small test
    genomes normally carry a dense SA, which hid a dtype bug here."""
    fm, contigs = small_index
    dfm = fm_jax.DeviceFM.from_host(fm, dense_sa_max=0)
    assert dfm.sa_dense is None
    ks = rng.integers(0, fm.seq_len + 1, size=200)
    want = np.array([fmops.bwt_sa(fm, int(k)) for k in ks])
    for dt in (np.int64, np.int32):
        d = fm_jax._narrow_view(dfm) if dt == np.int32 else dfm
        sa, ovf = fm_jax.sa_batch(d, jnp.asarray(ks.astype(dt)),
                                  max_iters=4096)
        assert not np.asarray(ovf).any()
        np.testing.assert_array_equal(np.asarray(sa), want)
