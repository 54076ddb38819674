#!/usr/bin/env python
"""Human wide-machine phase split (dfm passed as an ARG — closures
capture 4.3 GB of constants). P1 / P1B / P2fwd / P2post, fetch-synced,
distinct batches, one run."""
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
from bwa_flow_tpu.ops.fm_jax import DeviceFM, set_intv_batch
from bwa_flow_tpu.utils.opts import MemOpt

B = 4096
L, READ_LEN = 160, 151
I32 = jnp.int32


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    return x


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
    dt_ = dfm.L2.dtype
    params = sj._opt_params(opt)
    (msl, spl, spw, mmi, mo) = params
    mmi = mmi.astype(dt_)
    mo = mo.astype(dt_)
    p2x = 4
    NB, NB2, NP3 = 160, 128, 64 if False else 24
    MAXB, MAXM, ITERS = 64, 128, L * 16
    PBUD1, TBUD, PBUD2 = 48 * B, 2 * p2x * B, 32 * p2x * B
    M2 = 96
    CS = 2048
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

    sets = []
    for _ in range(4):
        reads = []
        for _ in range(B):
            pos = lo + int(rng.integers(0, hi - lo - READ_LEN))
            idx = np.arange(pos, pos + READ_LEN)
            r = ((pac[idx >> 2] >> ((~idx & 3) << 1)) & 3).astype(np.uint8)
            m = rng.random(READ_LEN) < 0.01
            r[m] = (r[m] + rng.integers(1, 4, m.sum()).astype(np.uint8)) % 4
            reads.append(r)
        q, qlen = sj.pad_reads(reads, L)
        sets.append((jnp.asarray(q), jnp.asarray(qlen)))
    jax.block_until_ready(sets)

    @jax.jit
    def ph_p1(dfm, q_dev, qlen_dev):
        qq = q_dev.astype(I32)
        q_flat = qq.reshape(-1)
        st3 = dict(mode=jnp.zeros(B, I32), x=jnp.zeros(B, I32),
                   i=jnp.zeros(B, I32), ik=jnp.zeros((B, 3), dt_),
                   mems=jnp.zeros((B, 4, NP3), dt_),
                   n_mem=jnp.zeros(B, I32),
                   ovf=jnp.zeros(B, bool), it=jnp.zeros((), I32))
        s1, p3out = sj._p1p3_machine(
            dfm, L, NB, ITERS, q_flat, rid, qlen_dev, fresh(B, NB), qq,
            qlen_dev, c3, msl, mmi, st3)
        return s1, p3out

    @jax.jit
    def ph_p1b(dfm, q_dev, s1):
        q_flat = q_dev.astype(I32).reshape(-1)
        return sj._smem_pass_post(dfm, L, NB, q_flat, rid,
                                  jnp.ones(B, dt_), msl, s1, PBUD1, CS)

    @jax.jit
    def ph_p2fwd(dfm, q_dev, qlen_dev, mems1, n1):
        qq = q_dev.astype(I32)
        q_flat = qq.reshape(-1)
        slot1 = jnp.arange(NB, dtype=I32)[None, :]
        start = (mems1[:, 3, :] >> 32).astype(I32)
        end = (mems1[:, 3, :] & 0xFFFFFFFF).astype(I32)
        want = (slot1 < n1[:, None]) \
            & ((end - start) >= spl) \
            & (mems1[:, 2, :] <= spw.astype(dt_))
        mid = ((start + end) >> 1).astype(I32)
        tsrc, _tdst, tv, tdrop = sj._compact(want.reshape(-1), TBUD)
        rid2 = tsrc // NB
        tx = jnp.where(tv, mid.reshape(-1)[tsrc], 0)
        tmi = jnp.where(tv, (mems1[:, 2, :] + 1).reshape(-1)[tsrc],
                        dt_.type(1))
        qx = sj._q_at(q_flat, rid2 * L + jnp.clip(tx, 0, L - 1))
        st2 = fresh(TBUD, NB2)
        st2.update(mode=jnp.where(tv, 1, 3), x=tx, i=tx + 1,
                   ik=set_intv_batch(dfm, jnp.clip(qx, 0, 3)),
                   ik_info=tx + 1)
        s2 = sj._fwd_scan_machine(dfm, L, NB2, ITERS, q_flat, rid2,
                                  qlen_dev[rid2], tmi, st2,
                                  task_mode=True)
        return s2, rid2, tmi, tv

    @jax.jit
    def ph_p2post(dfm, q_dev, s2, rid2, tmi):
        q_flat = q_dev.astype(I32).reshape(-1)
        return sj._smem_pass_post(dfm, L, NB2, q_flat, rid2, tmi, msl,
                                  s2, PBUD2, CS)

    def timephase(tag, fn, argsets):
        outs = [sync(fn(*a)) for a in argsets[:1]]
        ts = []
        for a in argsets[1:]:
            t0 = time.time()
            outs.append(sync(fn(*a)))
            ts.append(time.time() - t0)
        ts = sorted(ts)
        print(f"{tag:>8}: min {ts[0]*1e3:8.1f} ms  "
              f"med {ts[len(ts)//2]*1e3:8.1f} ms", flush=True)
        return outs

    p1outs = timephase("P1", ph_p1, [(dfm,) + s for s in sets])
    s1 = p1outs[1][0]
    print(f"# p1 it={int(np.asarray(s1['it']))} "
          f"breaks mean={np.asarray(s1['nb']).mean():.1f}", flush=True)
    p1b = timephase("P1B", ph_p1b,
                    [(dfm, sets[i][0], p1outs[i][0])
                     for i in range(len(p1outs))])
    p2f = timephase("P2fwd", ph_p2fwd,
                    [(dfm, sets[i][0], sets[i][1], p1b[i][0], p1b[i][1])
                     for i in range(len(p1b))])
    s2 = p2f[1][0]
    ntask = int(np.asarray(p2f[1][3]).sum())
    print(f"# p2 it={int(np.asarray(s2['it']))} tasks={ntask} "
          f"breaks/task mean="
          f"{np.asarray(s2['nb'])[np.asarray(p2f[1][3])].mean():.1f}",
          flush=True)
    timephase("P2post", ph_p2post,
              [(dfm, sets[i][0], p2f[i][0], p2f[i][1], p2f[i][2])
               for i in range(len(p2f))])


if __name__ == "__main__":
    main()
