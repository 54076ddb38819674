"""BAM/BGZF encoding and bucket-sort merge (BamFileBuffer + BucketSort +
sort-merge pipeline analogs)."""

import gzip
import struct

import numpy as np
import pytest

from bwa_flow_tpu.io.bam import (BGZF_EOF, BamWriter, bgzf_compress,
                                 bgzf_decompress, decode_bam_records,
                                 sam_line_to_bam)
from bwa_flow_tpu.pipeline.sort import (BucketSort, merge_sorted_bam,
                                        sort_key_from_raw)


class _Ann:
    def __init__(self, name, length):
        self.name = name
        self.len = length


ANNS = [_Ann("chr1", 5000), _Ann("chr2", 3000)]


def test_bgzf_roundtrip_and_gzip_compat():
    data = bytes(range(256)) * 1000
    comp = bgzf_compress(data) + BGZF_EOF
    assert bgzf_decompress(comp) == data
    # BGZF must remain a valid multi-member gzip stream
    assert gzip.decompress(comp) == data


def test_sam_line_roundtrip():
    line = ("r1\t99\tchr1\t100\t60\t5S96M\t=\t400\t401\t" + "A" * 101
            + "\t" + "I" * 101 + "\tNM:i:2\tMD:Z:96\tAS:i:91\tRG:Z:rg1")
    raw = sam_line_to_bam(line, {"chr1": 0, "chr2": 1})
    hdr = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 0)
    text, refs, recs = decode_bam_records(hdr + raw)
    r = recs[0]
    assert r["qname"] == "r1" and r["flag"] == 99 and r["tid"] == 0
    assert r["pos"] == 99 and r["mtid"] == 0 and r["mpos"] == 399
    assert r["tlen"] == 401 and r["l_seq"] == 101


def test_bucket_sort_merge(tmp_path):
    rng = np.random.default_rng(3)
    lines = []
    for i in range(200):
        tid = int(rng.integers(0, 2))
        pos = int(rng.integers(1, ANNS[tid].len - 100))
        flag = int(rng.choice([0, 16]))
        lines.append(f"q{i}\t{flag}\tchr{tid+1}\t{pos}\t60\t50M\t*\t0\t0\t"
                     + "A" * 50 + "\t" + "I" * 50)
    # a couple of unmapped reads must land in the tail bucket
    lines.append("u1\t4\t*\t0\t0\t*\t*\t0\t0\tAAAA\tIIII")
    bs = BucketSort(ANNS, str(tmp_path / "tmp"), num_buckets=8)
    for l in lines:
        bs.write_sam_text(l + "\n")
    paths = bs.close()
    assert len(paths) == 9
    assert (tmp_path / "tmp" / "bucket-000003.bed").exists()
    out = tmp_path / "out.bam"
    merge_sorted_bam(paths, str(out), ANNS, "@HD\tVN:1.6\tSO:coordinate\n")
    data = gzip.decompress(out.read_bytes())
    text, refs, recs = decode_bam_records(data)
    assert refs == [("chr1", 5000), ("chr2", 3000)]
    assert len(recs) == 201
    keys = [sort_key_from_raw(r["raw"]) for r in recs]
    assert keys == sorted(keys)
    assert recs[-1]["tid"] == -1  # unmapped last
    assert "SO:coordinate" in text


def test_bucket_bed_intervals(tmp_path):
    bs = BucketSort(ANNS, str(tmp_path / "t2"), num_buckets=4)
    bs.close()
    # total 8000 bases over 4 buckets -> 2000 each; bucket 2 spans the
    # chr1/chr2 boundary (4000-6000 = chr1:4000-5000 + chr2:0-1000)
    bed = (tmp_path / "t2" / "bucket-000002.bed").read_text()
    assert bed == "chr1\t4000\t5000\nchr2\t0\t1000\n"


def test_cli_sorted_bam(tmp_path):
    """CLI --sort writes a samtools-grade sorted BAM with markdup flags."""
    import subprocess
    import sys
    rng = np.random.default_rng(0xB0)
    g = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 6000)].tobytes()
    (tmp_path / "ref.fa").write_text(
        ">c1\n" + "\n".join(g.decode()[i:i + 70]
                            for i in range(0, 6000, 70)) + "\n")
    with open(tmp_path / "se.fq", "w") as f:
        for i in range(6):
            p = 500 * i
            f.write(f"@s{i}\n{g[p:p+101].decode()}\n+\n{'I'*101}\n")
        # duplicate of s0
        f.write(f"@dup0\n{g[0:101].decode()}\n+\n{'I'*101}\n")
    env = {"PYTHONPATH": "/root/repo:/root/.axon_site",
           "PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAX_PLATFORMS": "cpu"}
    for cmd in (["index", "ref.fa"],
                ["mem", "--no-device", "--sort", "-o", "out.bam",
                 "--temp-dir", "td", "ref.fa", "se.fq"]):
        r = subprocess.run([sys.executable, "-m", "bwa_flow_tpu"] + cmd,
                           capture_output=True, text=True,
                           cwd=str(tmp_path), env=env, timeout=400)
        assert r.returncode == 0, r.stderr[-1500:]
    data = gzip.decompress((tmp_path / "out.bam").read_bytes())
    text, refs, recs = decode_bam_records(data)
    assert len(recs) == 7
    keys = [sort_key_from_raw(r["raw"]) for r in recs]
    assert keys == sorted(keys)
    dups = [r for r in recs if r["flag"] & 0x400]
    assert len(dups) == 1 and dups[0]["qname"] == "dup0"
