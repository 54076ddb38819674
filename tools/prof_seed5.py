#!/usr/bin/env python
"""Phase split of the fused seed program with REAL state dynamics,
fetch-synced (block_until_ready can return early through the tunnel),
distinct inputs per rep, all phases in one run:

  P1  = _p1p3_machine (fwd scans, while loop)
  P1B = _smem_pass_post on p1's real state (compact+sort+worklist+emit)
  P2  = task setup + fwd scan + pass_post + merge (real tasks)
  TL  = concat+sort + fused SA + pack
"""
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
from bwa_flow_tpu.ops.fm_jax import DeviceFM, set_intv_batch
from bwa_flow_tpu.utils.opts import MemOpt
from bwa_flow_tpu.index.fmindex import FMIndex, ReferenceMeta, Annotation

sys.path.insert(0, str(ROOT / "tools"))
from build_ref import make_genome

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L, READ_LEN, GENOME_LEN = 160, 151, 2_000_000
I32 = jnp.int32
CODE = np.full(256, 4, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    CODE[_c] = _i


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    return x


def main():
    print(f"# devices: {jax.devices()}  B={B}", file=sys.stderr)
    rng = np.random.default_rng(3)
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
    dt_ = ndfm.L2.dtype
    params = sj._opt_params(opt)
    (min_seed_len, split_len, split_width, max_mem_intv, max_occ) = params
    max_mem_intv = max_mem_intv.astype(dt_)
    max_occ = max_occ.astype(dt_)

    NB = 128
    NB2, NP3, M2 = 64, 24, 64
    MAXB, MAXM, ITERS = 64, 128, L * 16
    PBUD1, TBUD, PBUD2 = 48 * B, 2 * B, 32 * B
    CS = min(4096, max(2048, B // 2))
    rid = jnp.arange(B, dtype=I32)
    c3 = sj._MachineConsts(L, MAXB, NP3, ITERS)

    def fresh(NL, NBc):
        return dict(
            mode=jnp.zeros(NL, I32), x=jnp.zeros(NL, I32),
            i=jnp.zeros(NL, I32), ik=jnp.zeros((NL, 3), dt_),
            ik_info=jnp.zeros(NL, I32), g=jnp.zeros(NL, I32),
            nb=jnp.zeros(NL, I32),
            brk_kls=jnp.zeros((NL, 3, NBc), dt_),
            brk_meta=jnp.zeros((NL, 3, NBc), I32),
            ovf=jnp.zeros(NL, bool), it=jnp.zeros((), I32))

    REPS = 4
    sets = []
    for _ in range(REPS + 1):
        reads = []
        for _ in range(B):
            pos = int(rng.integers(0, len(genome) - READ_LEN))
            r = CODE[genome[pos:pos + READ_LEN]].astype(np.int32)
            m = rng.random(READ_LEN) < 0.01
            r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
            reads.append(r.astype(np.uint8))
        q, qlen = sj.pad_reads(reads, L)
        sets.append((jnp.asarray(q), jnp.asarray(qlen)))
    jax.block_until_ready(sets)

    @jax.jit
    def ph_p1(q_dev, qlen_dev):
        qq = q_dev.astype(I32)
        q_flat = qq.reshape(-1)
        st3 = dict(mode=jnp.zeros(B, I32), x=jnp.zeros(B, I32),
                   i=jnp.zeros(B, I32), ik=jnp.zeros((B, 3), dt_),
                   mems=jnp.zeros((B, 4, NP3), dt_),
                   n_mem=jnp.zeros(B, I32),
                   ovf=jnp.zeros(B, bool), it=jnp.zeros((), I32))
        s1, p3out = sj._p1p3_machine(
            ndfm, L, NB, ITERS, q_flat, rid, qlen_dev, fresh(B, NB), qq,
            qlen_dev, c3, min_seed_len, max_mem_intv, st3)
        return s1, p3out

    @jax.jit
    def ph_p1b(q_dev, s1):
        q_flat = q_dev.astype(I32).reshape(-1)
        return sj._smem_pass_post(ndfm, L, NB, q_flat, rid,
                                  jnp.ones(B, dt_), min_seed_len, s1,
                                  PBUD1, CS)

    @jax.jit
    def ph_p2(q_dev, qlen_dev, mems1, n1):
        qq = q_dev.astype(I32)
        q_flat = qq.reshape(-1)
        slot1 = jnp.arange(NB, dtype=I32)[None, :]
        ish = 16
        start = (mems1[:, 3, :] >> ish).astype(I32)
        end = (mems1[:, 3, :] & ((1 << ish) - 1)).astype(I32)
        want = (slot1 < n1[:, None]) \
            & ((end - start) >= split_len) \
            & (mems1[:, 2, :] <= split_width.astype(dt_))
        mid = ((start + end) >> 1).astype(I32)
        tsrc, _tdst, tv, tdrop = sj._compact(want.reshape(-1), TBUD)
        rid2 = tsrc // NB
        tx = jnp.where(tv, mid.reshape(-1)[tsrc], 0)
        tmi = jnp.where(tv, (mems1[:, 2, :] + 1).reshape(-1)[tsrc],
                        dt_.type(1))
        qx = sj._q_at(q_flat, rid2 * L + jnp.clip(tx, 0, L - 1))
        st2 = fresh(TBUD, NB2)
        st2.update(mode=jnp.where(tv, 1, 3), x=tx, i=tx + 1,
                   ik=set_intv_batch(ndfm, jnp.clip(qx, 0, 3)),
                   ik_info=tx + 1)
        mems2l, n2l, o2f, o2p = sj._smem_pass(
            ndfm, L, NB2, ITERS, q_flat, rid2, qlen_dev[rid2], tmi,
            min_seed_len, st2, task_mode=True, PBUD=PBUD2, CS=CS)
        return mems2l, n2l, tv, rid2

    def timephase(tag, fn, argsets):
        outs = [sync(fn(*a)) for a in argsets[:1]]   # warm
        ts = []
        rets = []
        for a in argsets[1:]:
            t0 = time.time()
            rets.append(sync(fn(*a)))
            ts.append(time.time() - t0)
        ts = sorted(ts)
        print(f"{tag:>6}: min {ts[0]*1e3:7.1f} ms  "
              f"med {ts[len(ts)//2]*1e3:7.1f} ms", flush=True)
        return outs + rets

    p1outs = timephase("P1", ph_p1, sets)
    p1b_args = [(sets[i][0], p1outs[i][0]) for i in range(len(p1outs))]
    p1bouts = timephase("P1B", ph_p1b, p1b_args)
    p2_args = [(sets[i][0], sets[i][1], p1bouts[i][0], p1bouts[i][1])
               for i in range(len(p1bouts))]
    timephase("P2", ph_p2, p2_args)

    # worklist iteration count on the real pool (diagnostic)
    s1 = p1outs[1][0]
    nbh = np.asarray(s1["nb"])
    print(f"# p1 breaks: mean {nbh.mean():.1f} total {nbh.sum()}",
          flush=True)


if __name__ == "__main__":
    main()
