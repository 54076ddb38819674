#!/usr/bin/env python
"""Canonical seed-program timer (round 5): the fused collect_intv_device
(single dispatch, production shapes, pack_H=32) timed over N distinct
read batches — distinct inputs defeat the tunnel's identical-call
memoization, and the spread across reps shows the shared chip's window
swings. Judge improvements by min AND median of one run."""
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".cache/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bwa_flow_tpu.ops import smem_jax as sj
from bwa_flow_tpu.ops.fm_jax import DeviceFM
from bwa_flow_tpu.utils.opts import MemOpt
from bwa_flow_tpu.index.fmindex import FMIndex, ReferenceMeta, Annotation

sys.path.insert(0, str(ROOT / "tools"))
from build_ref import make_genome

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
L, READ_LEN, GENOME_LEN = 160, 151, 2_000_000
CODE = np.full(256, 4, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    CODE[_c] = _i


def main():
    print(f"# devices: {jax.devices()}  B={B} reps={REPS}", file=sys.stderr)
    rng = np.random.default_rng(2)
    opt = MemOpt()
    g = make_genome(GENOME_LEN, 0xBE7C, n_islands=2)
    g[g == 4] = 0
    genome = np.frombuffer(b"ACGT", np.uint8)[g]
    d = np.load(ROOT / f".cache/bench_index_rep_{GENOME_LEN}.npz")
    bns = ReferenceMeta(l_pac=int(d["l_pac"]),
                        anns=[Annotation("chr1", "", 0, int(d["l_pac"]), 0)],
                        ambs=[], pac=d["pac"])
    fm = FMIndex(seq_len=int(d["seq_len"]), primary=int(d["primary"]),
                 L2=d["L2"], fm_blocks=d["fm_blocks"],
                 sa_intv=int(d["sa_intv"]), sa=d["sa"], bns=bns)
    dfm = DeviceFM.from_host(fm)
    ndfm = sj._narrow_dfm(dfm)
    params = sj._opt_params(opt)

    batches = []
    for _ in range(REPS + 1):
        reads = []
        for _ in range(B):
            pos = int(rng.integers(0, len(genome) - READ_LEN))
            r = CODE[genome[pos:pos + READ_LEN]].astype(np.int32)
            m = rng.random(READ_LEN) < 0.01
            r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
            reads.append(r.astype(np.uint8))
        q, qlen = sj.pad_reads(reads, L)
        batches.append((jnp.asarray(q), jnp.asarray(qlen)))
    jax.block_until_ready(batches)

    def once(q_dev, qlen_dev):
        out = sj.collect_intv_device(ndfm, L, 64, 128, L * 16, q_dev,
                                     qlen_dev, *params, pack_H=32)
        return out[5]   # the packed bundle (production fetch target)

    jax.block_until_ready(once(*batches[0]))   # warm/compile
    ts = []
    for qd, qld in batches[1:]:
        t0 = time.time()
        jax.block_until_ready(once(qd, qld))
        ts.append(time.time() - t0)
    ts_ms = sorted(t * 1e3 for t in ts)
    med = ts_ms[len(ts_ms) // 2]
    print("reps:", " ".join(f"{t:.0f}" for t in ts_ms))
    print(f"seed program: min {ts_ms[0]:.1f} ms  median {med:.1f} ms  "
          f"({B / (med / 1e3):.0f} reads/s median)")


if __name__ == "__main__":
    main()
