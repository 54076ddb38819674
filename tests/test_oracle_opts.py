"""Option-level oracle parity: byte-identical SAM vs real bwa across the
`bwa mem` flag surface (golden host path; device equivalence is covered
by test_oracle.py::test_se_device and the CLI device/host equality test).
"""

import numpy as np
import pytest

import oracle as orc
from bwa_flow_tpu.cli import main_mem

pytestmark = pytest.mark.skipif(orc.build_oracle() is None,
                                reason="oracle bwa not buildable")


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    """One shared fixture: 2 contigs + an ALT contig + SE/PE read sets."""
    d = tmp_path_factory.mktemp("oracle_opt_fx")
    rng = np.random.default_rng(21)
    contigs = orc.make_ref(rng, [("chr1", 30000), ("chr2", 12000)],
                           repeat_frac=0.15)
    # ALT contig: a mutated copy of a chr1 segment
    alt = bytearray(contigs[0][1][5000:8000])
    for i in range(0, len(alt), 97):
        alt[i] = ord("ACGT"[(alt[i] + 1) % 4])
    contigs.append(("chr1_alt", bytes(alt)))
    ref = d / "ref.fa"
    orc.write_fasta(ref, contigs)
    orc.oracle_index(ref)
    # .alt file marks chr1_alt (bwa-postalt convention)
    (d / "ref.fa.alt").write_text("chr1_alt\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")
    se = orc.sample_se(rng, contigs, 250, read_len=101)
    # some unalignable + short + N-heavy reads
    se += [("junk0", b"ACGTACGTACGTACGTACGT", b"I" * 20),
           ("junk1", rng.integers(65, 68, 101).astype(np.uint8).tobytes(),
            b"I" * 101),
           ("nrun", b"ACGTN" * 20 + b"A", b"I" * 101)]
    fq = d / "se.fq"
    orc.write_fastq(fq, se)
    pairs = orc.sample_pe(rng, contigs[:2], 150, read_len=101)
    fq1, fq2 = d / "pe1.fq", d / "pe2.fq"
    orc.write_fastq(fq1, [p[0] for p in pairs])
    orc.write_fastq(fq2, [p[1] for p in pairs])
    # interleaved file for smart pairing
    inter = d / "inter.fq"
    both = []
    for a, b in pairs:
        both += [a, b]
    orc.write_fastq(inter, both)
    return d, ref, fq, fq1, fq2, inter


def check(fx, bwa_opts, our_opts, fastqs_idx, name):
    d, ref, fq, fq1, fq2, inter = fx
    files = {"se": [fq], "pe": [fq1, fq2], "inter": [inter]}[fastqs_idx]
    want = orc.oracle_mem(ref, files, ["-v", "1"] + bwa_opts)
    out = d / f"{name}.sam"
    argv = (["--disable-markdup", "--no-device", "-o", str(out)]
            + our_opts + [str(ref)] + [str(f) for f in files])
    assert main_mem(argv) == 0
    got = out.read_text().splitlines()
    diff = orc.sam_diff(got, want)
    assert not diff, diff


def test_alt_contigs(fx):
    check(fx, [], [], "se", "alt")


def test_ignore_alt_j(fx):
    check(fx, ["-j"], ["-j"], "se", "altj")


def test_output_all_a(fx):
    check(fx, ["-a"], ["-a"], "se", "alla")


def test_score_opts(fx):
    o = ["-T", "20", "-k", "25", "-L", "10,5", "-O", "5,7", "-E", "2,1",
         "-A", "2", "-B", "6"]
    check(fx, o, o, "se", "score")


def test_softclip_supp_Y_and_M(fx):
    check(fx, ["-Y"], ["-Y"], "se", "yflag")
    check(fx, ["-M"], ["-M"], "se", "mflag")


def test_rescue_off_S_P(fx):
    check(fx, ["-S", "-P"], ["-S", "-P"], "pe", "sp")


def test_pe_insert_override(fx):
    o = ["-I", "300,40"]
    check(fx, o, o, "pe", "iover")


def test_smart_pairing(fx):
    check(fx, ["-p"], ["-p"], "inter", "smartpe")


def test_unpaired_penalty(fx):
    check(fx, ["-U", "5"], ["-U", "5"], "pe", "unp")


def test_preset_intractg(fx):
    check(fx, ["-x", "intractg"], ["-x", "intractg"], "se", "intractg")


def test_comment_copy_C(fx, tmp_path):
    """FASTQ comments appear in SAM only with -C (aux.copy_comment)."""
    d, ref, *_ = fx
    rng = np.random.default_rng(31)
    contigs = orc.make_ref(rng, [("c1", 8000)], 0.0)
    ref2 = tmp_path / "c.fa"
    orc.write_fasta(ref2, contigs)
    orc.oracle_index(ref2)
    reads = orc.sample_se(rng, contigs, 40, read_len=101)
    fq = tmp_path / "c.fq"
    with open(fq, "w") as f:
        for name, seq, qual in reads:
            f.write(f"@{name} BC:Z:ACGT\n{seq.decode()}\n+\n"
                    f"{qual.decode()}\n")
    for opts in ([], ["-C"]):
        want = orc.oracle_mem(ref2, [fq], ["-v", "1"] + opts)
        out = tmp_path / f"c{'C' if opts else ''}.sam"
        assert main_mem(["--disable-markdup", "--no-device",
                         "-o", str(out)] + opts
                        + [str(ref2), str(fq)]) == 0
        diff = orc.sam_diff(out.read_text().splitlines(), want)
        assert not diff, (opts, diff)


def test_chunk_boundaries_K(fx, tmp_path):
    """-K chunk sizing must match bwa's (pestat runs per chunk; read-id
    hashes must line up across chunk boundaries)."""
    d, ref, fq, fq1, fq2, inter = fx
    o = ["-K", "100000"]
    want = orc.oracle_mem(ref, [fq1, fq2], ["-v", "1"] + o)
    out = tmp_path / "k.sam"
    assert main_mem(["--disable-markdup", "--no-device", "-o", str(out)]
                    + o + [str(ref), str(fq1), str(fq2)]) == 0
    diff = orc.sam_diff(out.read_text().splitlines(), want)
    assert not diff, diff
