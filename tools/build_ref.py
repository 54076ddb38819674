#!/usr/bin/env python
"""Build a repeat-realistic benchmark reference + stock `bwa index` artifacts.

The reference project benchmarks exclusively on human genomes
(/root/reference/test/test-config.sh:6 — human_g1k_v37.fasta), never on
uniform-random DNA. Uniform-random genomes under-price max_occ /
re-seeding / chain-filter work because every ~19 bp seed is unique.
This tool synthesizes genomes with human-like repeat structure:

  - SINE-like dispersed family (~300 bp consensus, ~10% per-copy
    divergence, high copy number) — the Alu analog (~28% of human).
  - LINE-like dispersed family (~6 kbp consensus, 5'-truncated copies,
    ~12% divergence) — the L1 analog (~12%).
  - Tandem arrays (micro/minisatellites, unit 2-64 bp).
  - A few N islands (ambiguity paths).

Artifacts are produced by the REAL vendored `bwa index` (built by
tests/oracle.py into .cache/oracle/bwa), so the on-disk format is
byte-authentic (auto-selects BWT-SW for >50 Mbp genomes,
/root/reference/bwa/bwtindex.c:276).

Usage:
  python tools/build_ref.py --length 1000000000 --out .cache/gbp --seed 7
  python tools/build_ref.py --length 3100000000 --out .cache/human \
      --seed 9 --contigs 4
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
BASES = np.frombuffer(b"ACGTN", np.uint8)


def _consensus(rng, n):
    return rng.integers(0, 4, n, dtype=np.uint8)


def _paste_dispersed(rng, g, consensus, frac, div, truncate=False,
                     chunk=200_000):
    """Scatter diverged copies of `consensus` over `g` (in place)."""
    elen = len(consensus)
    total_bp = int(len(g) * frac)
    if truncate:
        # 5'-truncated copies: length ~ U(0.05, 1.0) * elen
        lens = (elen * (0.05 + 0.95 * rng.random(
            max(1, int(total_bp / (elen * 0.52)))))).astype(np.int64)
        lens = lens[np.cumsum(lens) <= total_bp]
    else:
        lens = np.full(max(1, total_bp // elen), elen, np.int64)
    pos = rng.integers(0, len(g) - elen - 1, len(lens))
    done = 0
    while done < len(lens):
        hi = done
        bp = 0
        while hi < len(lens) and bp < chunk * 64:
            bp += int(lens[hi])
            hi += 1
        for i in range(done, hi):
            L = int(lens[i])
            cp = consensus[elen - L:].copy()
            nmut = rng.binomial(L, div)
            if nmut:
                at = rng.integers(0, L, nmut)
                cp[at] = (cp[at] + rng.integers(1, 4, nmut)) & 3
            g[pos[i]:pos[i] + L] = cp
        done = hi


def _paste_tandems(rng, g, frac):
    total_bp = int(len(g) * frac)
    placed = 0
    while placed < total_bp:
        unit_len = int(rng.integers(2, 65))
        n_copies = int(rng.integers(8, 200))
        arr = np.tile(_consensus(rng, unit_len), n_copies)
        # light divergence so arrays are not perfectly exact
        nmut = rng.binomial(len(arr), 0.02)
        if nmut:
            at = rng.integers(0, len(arr), nmut)
            arr[at] = (arr[at] + rng.integers(1, 4, nmut)) & 3
        p = int(rng.integers(0, len(g) - len(arr) - 1))
        g[p:p + len(arr)] = arr
        placed += len(arr)


def make_genome(length: int, seed: int, sine_frac=0.28, line_frac=0.12,
                tandem_frac=0.04, n_islands=8) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t0 = time.time()
    g = rng.integers(0, 4, length, dtype=np.uint8)
    print(f"backbone {time.time()-t0:.0f}s", file=sys.stderr)
    if line_frac:
        _paste_dispersed(rng, g, _consensus(rng, 6000), line_frac, 0.12,
                         truncate=True)
        print(f"LINEs {time.time()-t0:.0f}s", file=sys.stderr)
    if sine_frac:
        # two SINE subfamilies sharing a 300bp ancestor (realistic: old
        # diverged + young near-identical copies)
        anc = _consensus(rng, 300)
        young = anc.copy()
        at = rng.integers(0, 300, 15)
        young[at] = (young[at] + rng.integers(1, 4, 15)) & 3
        _paste_dispersed(rng, g, anc, sine_frac * 0.6, 0.12)
        _paste_dispersed(rng, g, young, sine_frac * 0.4, 0.04)
        print(f"SINEs {time.time()-t0:.0f}s", file=sys.stderr)
    if tandem_frac:
        _paste_tandems(rng, g, tandem_frac)
        print(f"tandems {time.time()-t0:.0f}s", file=sys.stderr)
    for _ in range(n_islands):
        p = int(rng.integers(0, length - 20000))
        g[p:p + int(rng.integers(100, 20000))] = 4
    return g


def write_fasta(path, g: np.ndarray, n_contigs: int, width=80):
    t0 = time.time()
    bounds = np.linspace(0, len(g), n_contigs + 1).astype(np.int64)
    with open(path, "wb") as f:
        for c in range(n_contigs):
            seq = g[bounds[c]:bounds[c + 1]]
            f.write(b">chr%d\n" % (c + 1))
            n = len(seq)
            full = n // width * width
            body = BASES[seq[:full]].reshape(-1, width)
            out = np.empty((body.shape[0], width + 1), np.uint8)
            out[:, :width] = body
            out[:, width] = ord("\n")
            f.write(out.tobytes())
            if n > full:
                f.write(BASES[seq[full:]].tobytes() + b"\n")
    print(f"fasta write {time.time()-t0:.0f}s", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--contigs", type=int, default=1)
    ap.add_argument("--no-index", action="store_true")
    ap.add_argument("--sine-frac", type=float, default=0.28)
    ap.add_argument("--line-frac", type=float, default=0.12)
    ap.add_argument("--tandem-frac", type=float, default=0.04)
    args = ap.parse_args()

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    fa = out / "ref.fa"
    if not fa.exists():
        g = make_genome(args.length, args.seed, args.sine_frac,
                        args.line_frac, args.tandem_frac)
        write_fasta(fa, g, args.contigs)
        del g
    (out / "GENOME.txt").write_text(
        f"length={args.length} seed={args.seed} contigs={args.contigs} "
        f"sine={args.sine_frac} line={args.line_frac} "
        f"tandem={args.tandem_frac}\n")
    if args.no_index:
        return
    bwa = REPO / ".cache" / "oracle" / "bwa"
    assert bwa.exists(), "build the oracle first (tests/oracle.py)"
    t0 = time.time()
    with open(out / "index.log", "w") as log:
        subprocess.run([str(bwa), "index", str(fa)], check=True,
                       stdout=log, stderr=log)
    print(f"bwa index: {time.time()-t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
