#!/usr/bin/env python
"""Ablation timing of the fused seed program, all variants in ONE
process run (the shared chip's windows make cross-run comparisons
meaningless). Variants: full / no-pack / no-fused-SA / no-pass2-tasks,
plus a B sweep of full."""
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

L, READ_LEN, GENOME_LEN = 160, 151, 2_000_000
I32 = jnp.int32
CODE = np.full(256, 4, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    CODE[_c] = _i


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr)
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
    ndfm_nosa = ndfm._replace(sa_dense=None)
    params = sj._opt_params(opt)
    p_notask = list(params)
    p_notask[1] = jnp.asarray(10**9, I32)     # split_len: no pass-2 tasks

    def mk_batches(B, n):
        out = []
        for _ in range(n):
            reads = []
            for _ in range(B):
                pos = int(rng.integers(0, len(genome) - READ_LEN))
                r = CODE[genome[pos:pos + READ_LEN]].astype(np.int32)
                m = rng.random(READ_LEN) < 0.01
                r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
                reads.append(r.astype(np.uint8))
            q, qlen = sj.pad_reads(reads, L)
            out.append((jnp.asarray(q), jnp.asarray(qlen)))
        return jax.block_until_ready(out)

    REPS = 4
    batches = {B: mk_batches(B, REPS + 1) for B in (4096, 2048, 1024)}

    def run(tag, B, dd, pp, pack):
        def once(qd, qld):
            out = sj.collect_intv_device(dd, L, 64, 128, L * 16, qd, qld,
                                         *pp, pack_H=pack)
            # SYNC BY FETCH: block_until_ready through the tunnel can
            # return without completion after the first executable; a
            # small host fetch genuinely round-trips
            probe = out[5][:4] if pack else out[1][:4]
            return int(np.asarray(probe)[0])
        bs = batches[B]
        once(*bs[0])
        ts = []
        for qd, qld in bs[1:]:
            t0 = time.time()
            once(qd, qld)
            ts.append(time.time() - t0)
        ts = sorted(ts)
        print(f"{tag:>24} B={B}: min {ts[0]*1e3:7.1f} ms  "
              f"med {ts[len(ts)//2]*1e3:7.1f} ms", flush=True)

    run("full", 4096, ndfm, params, 32)
    run("no-pack", 4096, ndfm, params, 0)
    run("no-fused-SA", 4096, ndfm_nosa, params, 0)
    run("no-pass2-tasks", 4096, ndfm, tuple(p_notask), 32)
    run("full", 2048, ndfm, params, 32)
    run("full", 1024, ndfm, params, 32)
    run("full(2)", 4096, ndfm, params, 32)


if __name__ == "__main__":
    main()
