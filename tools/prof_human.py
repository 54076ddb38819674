#!/usr/bin/env python
"""Human-scale (3.1 Gbp, int64 machine) seed-program profile + fused-SA
validation. Loads .cache/human, times the fused seed program (with the
round-5 on-device phased SA walk), spot-checks fused SA values against
host bwt_sa, and phase-splits P1/P1B/P2 on the wide machine."""
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
from bwa_flow_tpu.ops import fm as fmops
from bwa_flow_tpu.ops import smem_jax as sj
from bwa_flow_tpu.ops.fm_jax import DeviceFM
from bwa_flow_tpu.utils.opts import MemOpt

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L, READ_LEN = 160, 151


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    return x


def main():
    t0 = time.time()
    fm = load_index(str(ROOT / ".cache/human/ref.fa"))
    print(f"# index load {time.time()-t0:.1f}s seq_len={fm.seq_len} "
          f"sa_intv={fm.sa_intv}", flush=True)
    t0 = time.time()
    dfm = DeviceFM.from_host(fm)
    jax.block_until_ready(dfm.fm_blocks)
    print(f"# device upload {time.time()-t0:.1f}s "
          f"(sa_dense={dfm.sa_dense is not None})", flush=True)
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

    batches = [mk_batch() for _ in range(4)]

    # --- correctness spot check: fused SA vs host bwt_sa -------------
    h = sj.seed_dispatch(opt, fm, dfm, batches[0], L=L)
    t0 = time.time()
    got = sj.seed_collect_batch(h)
    print(f"# warm dispatch+collect {time.time()-t0:.1f}s", flush=True)
    sav = h.get("sa_vals")
    n_res = sum(1 for v in sav if v is not None)
    print(f"# fused SA coverage: {n_res}/{B} reads", flush=True)
    from bwa_flow_tpu.ops.chain_native import sa_probe_layout
    rows, offs, _ = sa_probe_layout(opt, got, build_owners=False)
    checked = bad = 0
    for b in range(0, B, 257):
        v = sav[b]
        if v is None:
            continue
        lo_, hi_ = int(offs[b]), int(offs[b + 1])
        for j in range(lo_, min(hi_, lo_ + 3)):
            want = fmops.bwt_sa(fm, int(rows[j]))
            gotv = int(v[j - lo_])
            checked += 1
            bad += (want != gotv)
    print(f"# fused SA spot check: {checked} probes, {bad} wrong",
          flush=True)
    assert bad == 0

    # --- seed program timing ------------------------------------------
    ts = []
    for reads in batches[1:]:
        t0 = time.time()
        h = sj.seed_dispatch(opt, fm, dfm, reads, L=L)
        sj.seed_collect_batch(h)
        ts.append(time.time() - t0)
    ts = sorted(ts)
    print(f"# human seed dispatch+collect: min {ts[0]*1e3:.0f} ms "
          f"med {ts[len(ts)//2]*1e3:.0f} ms "
          f"({B/ts[len(ts)//2]:.0f} reads/s)", flush=True)

    # --- phase split (wide machine) ------------------------------------
    I32 = jnp.int32
    dt_ = dfm.L2.dtype
    params = sj._opt_params(opt)
    (msl, spl, spw, mmi, mo) = params
    mmi = mmi.astype(dt_)
    p2x = 4
    NB = 160
    NB2, NP3 = 96, 24
    MAXB, MAXM, ITERS = 64, 128, L * 16
    PBUD1, TBUD, PBUD2 = 48 * B, 2 * p2x * B, 32 * p2x * B
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

    sets = []
    for reads in batches:
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
            dfm, L, NB, ITERS, q_flat, rid, qlen_dev, fresh(B, NB), qq,
            qlen_dev, c3, msl, mmi, st3)
        return s1, p3out

    @jax.jit
    def ph_p1b(q_dev, s1):
        q_flat = q_dev.astype(I32).reshape(-1)
        return sj._smem_pass_post(dfm, L, NB, q_flat, rid,
                                  jnp.ones(B, dt_), msl, s1, PBUD1, CS)

    def timephase(tag, fn, argsets):
        outs = [sync(fn(*a)) for a in argsets[:1]]
        ts = []
        for a in argsets[1:]:
            t0 = time.time()
            outs.append(sync(fn(*a)))
            ts.append(time.time() - t0)
        ts = sorted(ts)
        print(f"{tag:>6}: min {ts[0]*1e3:7.1f} ms  "
              f"med {ts[len(ts)//2]*1e3:7.1f} ms", flush=True)
        return outs

    p1outs = timephase("P1", ph_p1, sets)
    s1 = p1outs[1][0]
    print(f"# p1 it={int(np.asarray(s1['it']))} breaks "
          f"mean={np.asarray(s1['nb']).mean():.1f}", flush=True)
    p1b_args = [(sets[i][0], p1outs[i][0]) for i in range(len(p1outs))]
    timephase("P1B", ph_p1b, p1b_args)


if __name__ == "__main__":
    main()
