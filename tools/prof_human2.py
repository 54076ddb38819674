#!/usr/bin/env python
"""Human-path overflow forensics: which budget bits overflow, how many
reads hit the device redo, and what the batch timeline looks like with
redo on vs off (DEVICE_REDO hook). All fetch-synced, one run."""
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

from bwa_flow_tpu.index.io import load_index
from bwa_flow_tpu.ops import smem_jax as sj
from bwa_flow_tpu.ops.fm_jax import DeviceFM
from bwa_flow_tpu.utils.opts import MemOpt

B = 4096
L, READ_LEN = 160, 151

BITS = [("P1_FWD", 1), ("P1_POOL", 2), ("TASKPOOL", 4), ("P2_FWD", 8),
        ("P2_POOL", 16), ("P2_EMIT", 32), ("P3", 64), ("MEMS", 128),
        ("SA", 256)]


def main():
    t0 = time.time()
    fm = load_index(str(ROOT / ".cache/human/ref.fa"))
    dfm = DeviceFM.from_host(fm)
    jax.block_until_ready(dfm.fm_blocks)
    print(f"# load+upload {time.time()-t0:.1f}s", flush=True)
    opt = MemOpt()
    pac = fm.bns.pac
    rng = np.random.default_rng(11)
    a0 = fm.bns.anns[0]
    lo = a0.offset
    hi = min(a0.offset + a0.len, fm.bns.l_pac, lo + 200_000_000)

    def mk_batch():
        reads = []
        for _ in range(B):
            pos = lo + int(rng.integers(0, hi - lo - READ_LEN))
            idx = np.arange(pos, pos + READ_LEN)
            r = ((pac[idx >> 2] >> ((~idx & 3) << 1)) & 3).astype(np.uint8)
            m = rng.random(READ_LEN) < 0.01
            r[m] = (r[m] + rng.integers(1, 4, m.sum()).astype(np.uint8)) % 4
            reads.append(r)
        return reads

    batches = [mk_batch() for _ in range(3)]

    # overflow histogram straight from the machine's ovf bitmask
    sj.DEVICE_REDO = False        # count, don't cascade
    params = sj._opt_params(opt)
    for bi, reads in enumerate(batches[:2]):
        q, qlen = sj.pad_reads(reads, L)
        sa_s = int(fm.sa_intv)
        t0 = time.time()
        out = sj.collect_intv_device(
            dfm, L, 64, 128, L * 16, jnp.asarray(q), jnp.asarray(qlen),
            *params, pack_H=0, p2x=4, sa_intv_s=sa_s)
        ovf = np.asarray(out[2])
        n_mem = np.asarray(out[1])
        dt = time.time() - t0
        n_ovf = (ovf != 0).sum()
        print(f"# batch {bi}: {dt*1e3:.0f} ms  ovf reads {n_ovf}/{B} "
              f"mems mean {n_mem.mean():.1f} max {n_mem.max()}", flush=True)
        for name, bit in BITS:
            c = ((ovf & bit) != 0).sum()
            if c:
                print(f"#   {name:>9}: {c}", flush=True)

    # timeline with the production redo cascade + fused-SA coverage
    sj.DEVICE_REDO = True
    ts = []
    for reads in batches:
        t0 = time.time()
        h = sj.seed_dispatch(opt, fm, dfm, reads, L=L)
        sj.seed_collect_batch(h)
        ts.append(time.time() - t0)
        sav = h.get("sa_vals")
        cov = sum(1 for v in sav if v is not None)
        print(f"#   {ts[-1]*1e3:.0f} ms  fused-SA coverage {cov}/{B}",
              flush=True)
    print(f"# dispatch+collect with redo: "
          + " ".join(f"{t*1e3:.0f}" for t in ts), flush=True)


if __name__ == "__main__":
    main()
