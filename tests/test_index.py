"""Index layer tests: suffix array, BWT, FM primitives, bwa file formats.

Oracles are brute-force string algorithms, mirroring the reference's
golden-diff test strategy (reference: test/src/TestCommon.h)."""

import numpy as np
import pytest

from bwa_flow_tpu.index.build import build_index, encode_reference
from bwa_flow_tpu.index.fmindex import unpack_pac
from bwa_flow_tpu.index import io as idx_io
from bwa_flow_tpu.index.suffix import bwt_from_sa, suffix_array
from bwa_flow_tpu.ops import fm as fmops
from conftest import make_genome


def naive_suffix_array(seq):
    n = len(seq)
    s = list(seq) + [-1]
    return np.array(sorted(range(n + 1), key=lambda i: s[i:]), dtype=np.int64)


def test_suffix_array_matches_naive(rng):
    for n in [1, 2, 7, 64, 300]:
        seq = rng.integers(0, 4, size=n).astype(np.uint8)
        sa = suffix_array(seq)
        np.testing.assert_array_equal(sa, naive_suffix_array(seq))


def test_bwt_matches_naive_rotations(rng):
    seq = rng.integers(0, 4, size=200).astype(np.uint8)
    sa = suffix_array(seq)
    bwt, primary = bwt_from_sa(seq, sa)
    # naive: sort rotations of seq+$ ($ smallest); BWT = last column, $ removed
    n = len(seq)
    s = list(seq) + [-1]
    rot = sorted(range(n + 1), key=lambda i: s[i:] + s[:i])
    last_col = [s[(i - 1) % (n + 1)] for i in rot]
    naive_primary = last_col.index(-1)
    naive_bwt = [c for c in last_col if c >= 0]
    assert primary == naive_primary
    np.testing.assert_array_equal(bwt, np.array(naive_bwt, dtype=np.uint8))


def _both_strands(contigs):
    from bwa_flow_tpu.index.build import encode_reference
    bns, fwd = encode_reference(contigs)
    return np.concatenate([fwd, (3 - fwd)[::-1]]), bns, fwd


def naive_count(hay, pat):
    n, m = len(hay), len(pat)
    if m == 0 or m > n:
        return 0
    windows = np.lib.stride_tricks.sliding_window_view(hay, m)
    return int((windows == pat).all(axis=1).sum())


def test_occ_against_direct_count(small_index):
    fm, contigs = small_index
    bwt = fm.bwt_symbols()
    rng = np.random.default_rng(7)
    for _ in range(200):
        k = int(rng.integers(-1, fm.seq_len + 1))
        c = int(rng.integers(0, 4))
        got = fmops.occ(fm, k, c)
        if k == -1:
            want = 0
        else:
            kk = k - (k >= fm.primary) if k != fm.seq_len else fm.seq_len - 1
            want = int((bwt[:kk + 1] == c).sum())
        assert got == want, (k, c)


def test_backward_and_forward_extension_count(small_index, rng):
    fm, contigs = small_index
    both, bns, fwd = _both_strands(contigs)
    for trial in range(40):
        plen = int(rng.integers(1, 25))
        start = int(rng.integers(0, len(fwd) - plen))
        pat = fwd[start:start + plen]
        # backward extension: start from last char, prepend
        ik = fmops.set_intv(fm, int(pat[-1]))
        for c in pat[-2::-1]:
            ok = fmops.bwt_extend(fm, ik, is_back=True)
            ik = ok[int(c)]
        assert int(ik[2]) == naive_count(both, pat), f"bwd trial {trial}"
        # forward extension: start from first char, append (complement index)
        ik = fmops.set_intv(fm, int(pat[0]))
        for c in pat[1:]:
            ok = fmops.bwt_extend(fm, ik, is_back=False)
            ik = ok[3 - int(c)]
        assert int(ik[2]) == naive_count(both, pat), f"fwd trial {trial}"


def test_bwt_sa_walk_matches_full_sa(rng):
    contigs = make_genome(np.random.default_rng(3), 2000)
    bns_fwd = _both_strands(contigs)
    both = bns_fwd[0]
    sa_full = suffix_array(both)
    fm = build_index(contigs)
    assert fmops.bwt_sa(fm, 0) == -1  # $-row sentinel (bwa/bwt.c:83)
    for k in range(1, fm.seq_len + 1, 17):
        assert fmops.bwt_sa(fm, k) == int(sa_full[k]), k


def test_index_file_roundtrip(tmp_path, small_index):
    fm, contigs = small_index
    prefix = str(tmp_path / "ref")
    idx_io.save_index(prefix, fm)
    fm2 = idx_io.load_index(prefix)
    assert fm2.primary == fm.primary
    assert fm2.seq_len == fm.seq_len
    np.testing.assert_array_equal(fm2.L2, fm.L2)
    np.testing.assert_array_equal(fm2.fm_blocks, fm.fm_blocks)
    np.testing.assert_array_equal(fm2.sa, fm.sa)
    np.testing.assert_array_equal(fm2.bns.pac, fm.bns.pac)
    assert [a.name for a in fm2.bns.anns] == [a.name for a in fm.bns.anns]
    assert [(h.offset, h.len) for h in fm2.bns.ambs] == \
           [(h.offset, h.len) for h in fm.bns.ambs]


def test_bwt_file_layout_matches_bwa_macro(tmp_path, small_index):
    """Pin the on-disk .bwt layout to bwa's bwt_bwt macro
    (bwa/bwt.h:72: word = body[(k>>7<<4) + 8 + ((k&0x7f)>>4)])."""
    fm, _ = small_index
    prefix = str(tmp_path / "ref")
    idx_io.save_index(prefix, fm)
    raw = np.fromfile(prefix + ".bwt", dtype=np.uint8)
    body = raw[40:].view(np.uint32)
    bwt = fm.bwt_symbols()
    rng = np.random.default_rng(11)
    for k in rng.integers(0, fm.seq_len, size=100):
        k = int(k)
        word = int(body[(k >> 7 << 4) + 8 + ((k & 0x7F) >> 4)])
        sym = (word >> ((~k & 0xF) << 1)) & 3
        assert sym == int(bwt[k])
    # and the occ checkpoints match bwt_occ_intv (body[(k>>7)<<4 .. +8] as 4 u64)
    for k in rng.integers(0, fm.seq_len, size=50):
        k = int(k)
        ck = body[(k >> 7 << 4):(k >> 7 << 4) + 8].tobytes()
        cnts = np.frombuffer(ck, dtype=np.uint64)
        want = [(bwt[: (k >> 7) << 7] == c).sum() for c in range(4)]
        np.testing.assert_array_equal(cnts.astype(np.int64), want)


def test_pac_roundtrip_and_nfill(tmp_path, rng):
    contigs = make_genome(np.random.default_rng(5), 1000, n_contigs=2, with_n=True)
    bns, fwd = encode_reference(contigs)
    assert len(bns.ambs) >= 1
    assert all(a.n_ambs >= 0 for a in bns.anns)
    got = unpack_pac(bns.pac, 0, bns.l_pac)
    np.testing.assert_array_equal(got, fwd)
    # holes record original N positions
    h = bns.ambs[0]
    assert h.amb == "N"


def test_sa_resample_on_load(tmp_path, rng, monkeypatch):
    """Large-genome SA densification (round-3): load_index re-samples the
    stock sa_intv=32 table via native LF-orbit enumeration; every SA
    value the denser table serves must equal the stock walk's."""
    import pytest
    from bwa_flow_tpu import index as _  # noqa: F401
    from bwa_flow_tpu.index import io as idx_io
    from bwa_flow_tpu.index.build import build_index
    from bwa_flow_tpu.ops import fm as fmops
    try:
        from bwa_flow_tpu import _native
    except ImportError:
        pytest.skip("native extension not built")
    if not hasattr(_native, "sa_resample"):
        pytest.skip("stale native build")
    genome = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 120000)]
    fm = build_index([("chr1", "", genome.tobytes())])
    pfx = str(tmp_path / "ref")
    idx_io.save_index(pfx, fm)
    monkeypatch.setattr(idx_io, "RESAMPLE_MIN", 1)  # force on small genome
    fm2 = idx_io.load_index(pfx)
    assert fm2.sa_intv < fm.sa_intv
    assert fm2.sa[0] == -1
    # denser table must agree with the stock walk everywhere
    for j in rng.integers(1, len(fm2.sa), 512):
        k = int(j) * fm2.sa_intv
        assert int(fm2.sa[int(j)]) == fmops.bwt_sa(fm, k)
    # cache file round-trips
    fm3 = idx_io.load_index(pfx)
    assert fm3.sa_intv == fm2.sa_intv
    assert (fm3.sa == fm2.sa).all()


def test_native_sais_matches_prefix_doubling(rng):
    """Native SA-IS (production index construction, the reference's
    is.c/bwt_gen.c role — /root/reference/bwa/bwtindex.c:210-324) must
    agree with the NumPy prefix-doubling oracle on adversarial inputs."""
    import pytest

    from bwa_flow_tpu import _native
    from bwa_flow_tpu.index.suffix import suffix_array

    if not hasattr(_native, "sais"):
        pytest.skip("_native.sais not built")
    cases = [rng.integers(0, 4, n).astype(np.uint8)
             for n in (1, 2, 7, 64, 1000, 65537)]
    cases += [np.zeros(100, np.uint8),                    # all-equal run
              np.tile(np.array([3, 0], np.uint8), 500),   # period 2
              np.tile(np.array([1, 1, 0], np.uint8), 333),
              np.arange(4, dtype=np.uint8).repeat(25)]
    for seq in cases:
        want = suffix_array(seq)
        got = np.frombuffer(_native.sais(np.ascontiguousarray(seq), 4),
                            np.int64)
        assert (got == want).all(), seq[:12]


def test_build_index_artifacts_match_stock_bwa(tmp_path, rng):
    """End-to-end builder parity: our `index` command's artifacts must be
    byte-identical to stock `bwa index` output (pac encode + ambiguity
    fill + BWT + occ interleave + SA sampling), including N runs."""
    import subprocess

    import pytest

    from bwa_flow_tpu.index import io as idx_io
    from bwa_flow_tpu.index.build import index_fasta
    from tests.oracle import build_oracle

    bwa = build_oracle()
    if bwa is None:
        pytest.skip("oracle bwa unavailable")
    n = 200_000
    g = rng.integers(0, 4, n)
    sym = np.frombuffer(b"ACGT", np.uint8)[g].copy()
    sym[5000:5180] = ord("N")            # an N island
    s = sym.tobytes().decode()
    fa = tmp_path / "ref.fa"
    with open(fa, "w") as f:
        f.write(">c1 hello\n")
        for i in range(0, n, 61):
            f.write(s[i:i + 61] + "\n")
    fa2 = tmp_path / "oracle.fa"
    fa2.write_bytes(fa.read_bytes())
    subprocess.run([str(bwa), "index", str(fa2)], check=True,
                   capture_output=True)
    fm = index_fasta(str(fa))
    idx_io.save_index(str(fa), fm)
    for ext in ("bwt", "sa", "pac", "ann", "amb"):
        ours = (tmp_path / f"ref.fa.{ext}").read_bytes()
        stock = (tmp_path / f"oracle.fa.{ext}").read_bytes()
        assert ours == stock, f".{ext} differs"
