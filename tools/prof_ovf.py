#!/usr/bin/env python
"""Which seeding overflow sources fire on the repeat-realistic genome?"""
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

sys.path.insert(0, str(ROOT / "tools"))
from build_ref import make_genome

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L, READ_LEN, GENOME_LEN = 160, 151, 2_000_000
CODE = np.full(256, 4, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    CODE[_c] = _i

rng = np.random.default_rng(1)
opt = MemOpt()
g = make_genome(GENOME_LEN, 0xBE7C, n_islands=2)
g[g == 4] = 0
genome = np.frombuffer(b"ACGT", np.uint8)[g]
from bwa_flow_tpu.index.build import build_index
fm = build_index([("chr1", "", genome.tobytes())])
dfm = DeviceFM.from_host(fm)

reads = []
for _ in range(B):
    pos = int(rng.integers(0, len(genome) - READ_LEN))
    r = CODE[genome[pos:pos + READ_LEN]].astype(np.int32)
    m = rng.random(READ_LEN) < 0.01
    r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
    reads.append(r.astype(np.uint8))

q, qlen = sj.pad_reads(reads, L)
params = (jnp.asarray(opt.min_seed_len, jnp.int32),
          jnp.asarray(opt.split_len, jnp.int32),
          jnp.asarray(opt.split_width, jnp.int32),
          jnp.asarray(opt.max_mem_intv, jnp.int64),
          jnp.asarray(opt.max_occ, jnp.int64))
ndfm = sj._narrow_dfm(dfm)
out = sj.collect_intv_device(ndfm, L, 64, 128, L * 16, jnp.asarray(q),
                             jnp.asarray(qlen), *params, pack_H=32)
mems, n_mem, ovf, occ_sa, occ_total, packed = out
ovf = np.asarray(ovf)[:B]
n_mem = np.asarray(n_mem)[:B]
occ_total = np.asarray(occ_total)[:B]
names = {1: "P1_FWD", 2: "P1_POOL", 4: "TASKPOOL", 8: "P2_FWD",
         16: "P2_POOL", 32: "P2_EMIT", 64: "P3", 128: "MEMS"}
print(f"B={B} reads overflowed: {(ovf != 0).sum()} "
      f"({(ovf != 0).mean()*100:.1f}%)")
for bit, nm in names.items():
    n = ((ovf & bit) != 0).sum()
    if n:
        print(f"  {nm}: {n} ({n/B*100:.1f}%)")
print(f"n_mem mean={n_mem.mean():.1f} p99={np.percentile(n_mem, 99):.0f} "
      f"max={n_mem.max()}")
pk = np.asarray(packed)
print(f"packed totals: mems={pk[0]} (cap {sj.CAPM_PER*len(q)}) "
      f"occ={pk[1]} (cap {sj.CAPO_PER*len(q)})")
print(f"occ_total: resolved={(occ_total >= 0).sum()} "
      f"over-MAXO={((occ_total > sj.MAXO)).sum()} "
      f"mean={occ_total[occ_total >= 0].mean():.1f}")
# time the host redo for the overflowed share
t0 = time.time()
from bwa_flow_tpu.ops import smem as smem_golden
nredo = 0
for b in np.nonzero(ovf)[0][:50]:
    smem_golden.collect_intv(opt, fm, reads[b])
    nredo += 1
if nredo:
    per = (time.time() - t0) / nredo
    print(f"host golden redo: {per*1e3:.1f} ms/read -> "
          f"{(ovf != 0).sum() * per:.1f} s/batch")
