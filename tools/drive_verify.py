#!/usr/bin/env python
"""Verify drive: production pipeline on the repeat-realistic genome on
the REAL TPU, overflow reads resolved by the big-budget device redo, SAM
field-checked against the host golden model."""
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".cache/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from build_ref import make_genome
from bwa_flow_tpu.index.build import build_index
from bwa_flow_tpu.io.sam import Read
from bwa_flow_tpu.models import golden
from bwa_flow_tpu.ops import smem_jax
from bwa_flow_tpu.pipeline.dataflow import AlignPipeline
from bwa_flow_tpu.utils.opts import MemOpt

print("# devices:", jax.devices(), file=sys.stderr)
CODE = np.full(256, 4, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    CODE[_c] = _i

g = make_genome(2_000_000, 0xBE7C, n_islands=2)
g[g == 4] = 0
genome = np.frombuffer(b"ACGT", np.uint8)[g]
fm = build_index([("chr1", "", genome.tobytes())])
opt = MemOpt()
rng = np.random.default_rng(5)
reads = []
for i in range(4096):
    pos = int(rng.integers(0, len(genome) - 151))
    r = CODE[genome[pos:pos + 151]].astype(np.int32)
    m = rng.random(151) < 0.01
    r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
    reads.append(Read(name=f"r{i}", seq=r.astype(np.uint8),
                      qual="I" * 151, id=i))

# count golden fallbacks: with the device redo, overflows should resolve
calls = []
from bwa_flow_tpu.ops import smem as smem_golden
real = smem_golden.collect_intv
smem_golden.collect_intv = lambda *a: calls.append(1) or real(*a)

pipe = AlignPipeline(opt, fm, paired=False, n_workers=4,
                     aligner_kw=dict(smem_L=160, wave_cap=4096,
                                     qmax=160, tmax=512))
done = []
t0 = time.time()
pipe.run(iter([reads]), done.extend)
dt = time.time() - t0
pipe.close()
assert len(done) == 4096, len(done)
print(f"# pipeline: 4096 reads in {dt:.1f}s, "
      f"golden collect_intv calls: {len(calls)}", file=sys.stderr)
print(f"# stats: {pipe.ba.stats}", file=sys.stderr)

# SAM equality vs host golden on a subsample
idx = list(range(0, 4096, 64))
import copy
gw = copy.deepcopy([reads[i] for i in idx])
golden.align_se(opt, fm, gw)   # fills .sam in place
got = {r.name: r.sam for r in done}
bad = 0
for w in gw:
    if got.get(w.name) != w.sam:
        print(f"MISMATCH {w.name}:\n got={got.get(w.name)!r}"
              f"\nwant={w.sam!r}")
        bad += 1
print(f"# SAM golden diff on {len(idx)} reads: {bad} mismatches",
      file=sys.stderr)
assert bad == 0
print("DRIVE OK")
