#!/usr/bin/env python
"""Sub-phase profile of collect_intv_device's post-pass-1 work: pass-2
task scan, pass-2 backward pool, merge scatter, final sort, fused SA,
ragged pack — each under its own jit, timed on the chip. Round-4
companion to prof_seed.py (which covers pass 1/3)."""
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

sys.path.insert(0, str(ROOT / "tools"))
from build_ref import make_genome

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = 160
READ_LEN = 151
GENOME_LEN = 2_000_000
I32 = jnp.int32

CODE = np.full(256, 4, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    CODE[_c] = _i


def t_it(fn, *a):
    out = jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(*a))
        ts.append(time.time() - t0)
    return out, min(ts)


def main():
    print(f"# devices: {jax.devices()}  B={B}", file=sys.stderr)
    rng = np.random.default_rng(1)
    opt = MemOpt()
    g = make_genome(GENOME_LEN, 0xBE7C, n_islands=2)
    g[g == 4] = 0
    genome = np.frombuffer(b"ACGT", np.uint8)[g]
    from bwa_flow_tpu.index.fmindex import (FMIndex, ReferenceMeta,
                                            Annotation)
    d = np.load(ROOT / f".cache/bench_index_rep_{GENOME_LEN}.npz")
    bns = ReferenceMeta(l_pac=int(d["l_pac"]),
                        anns=[Annotation("chr1", "", 0, int(d["l_pac"]), 0)],
                        ambs=[], pac=d["pac"])
    fm = FMIndex(seq_len=int(d["seq_len"]), primary=int(d["primary"]),
                 L2=d["L2"], fm_blocks=d["fm_blocks"],
                 sa_intv=int(d["sa_intv"]), sa=d["sa"], bns=bns)
    dfm = DeviceFM.from_host(fm)
    ndfm = sj._narrow_dfm(dfm)
    dt = ndfm.L2.dtype

    reads = []
    for _ in range(B):
        pos = int(rng.integers(0, len(genome) - READ_LEN))
        r = CODE[genome[pos:pos + READ_LEN]].astype(np.int32)
        m = rng.random(READ_LEN) < 0.01
        r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
        reads.append(r.astype(np.uint8))
    q, qlen = sj.pad_reads(reads, L)
    q_dev, qlen_dev = jnp.asarray(q), jnp.asarray(qlen)

    MAXB, MAXM, ITERS = 64, 128, L * 16
    NB = max(MAXB, 128)
    NB2, NP3 = 64, 24
    M2 = 64
    PBUD1, TBUD, PBUD2 = 48 * B, 2 * B, 16 * B
    CS = min(B // 2, 4096)
    params = (jnp.asarray(opt.min_seed_len, I32),
              jnp.asarray(opt.split_len, I32),
              jnp.asarray(opt.split_width, I32),
              jnp.asarray(opt.max_mem_intv, jnp.int64).astype(dt),
              jnp.asarray(opt.max_occ, jnp.int64).astype(dt))
    min_seed_len, split_len, split_width, max_mem_intv, max_occ = params
    qq = q_dev.astype(I32)
    q_flat = qq.reshape(-1)
    rid = jnp.arange(B, dtype=I32)

    def fresh(NL, NBc):
        return dict(
            mode=jnp.zeros(NL, I32), x=jnp.zeros(NL, I32),
            i=jnp.zeros(NL, I32), ik=jnp.zeros((NL, 3), dt),
            ik_info=jnp.zeros(NL, I32), g=jnp.zeros(NL, I32),
            nb=jnp.zeros(NL, I32),
            brk_kls=jnp.zeros((NL, 3, NBc), dt),
            brk_end=jnp.zeros((NL, NBc), I32),
            brk_x=jnp.zeros((NL, NBc), I32),
            brk_g=jnp.zeros((NL, NBc), I32),
            ovf=jnp.zeros(NL, bool), it=jnp.zeros((), I32))

    c3 = sj._MachineConsts(L, MAXB, NP3, ITERS)

    @jax.jit
    def phase_p1():
        st3 = dict(mode=jnp.zeros(B, I32), x=jnp.zeros(B, I32),
                   i=jnp.zeros(B, I32), ik=jnp.zeros((B, 3), dt),
                   mems=jnp.zeros((B, 4, NP3), dt), n_mem=jnp.zeros(B, I32),
                   ovf=jnp.zeros(B, bool), it=jnp.zeros((), I32))
        s1, p3out = sj._p1p3_machine(
            ndfm, L, NB, ITERS, q_flat, rid, qlen_dev, fresh(B, NB), qq,
            qlen_dev, c3, min_seed_len, max_mem_intv, st3)
        mems1, n1, ovf_f1, ovf_p1 = sj._smem_pass_post(
            ndfm, L, NB, q_flat, rid, jnp.ones(B, dt), min_seed_len, s1,
            PBUD1, CS)
        return mems1, n1, p3out

    (mems1, n1, p3out), t_p1 = t_it(phase_p1)
    print(f"pass1 (+fused p3): {t_p1*1e3:.1f} ms")

    # ---- pass 2 task setup ------------------------------------------------
    slot1 = jnp.arange(NB, dtype=I32)[None, :]
    ish = 16
    start = (mems1[:, 3, :] >> ish).astype(I32)
    end = (mems1[:, 3, :] & ((1 << ish) - 1)).astype(I32)

    @jax.jit
    def task_setup(mems1, n1):
        want = (slot1 < n1[:, None]) \
            & ((end - start) >= split_len) \
            & (mems1[:, 2, :] <= split_width.astype(dt))
        mid = ((start + end) >> 1).astype(I32)
        tsrc, _tdst, tv, tdrop = sj._compact(want.reshape(-1), TBUD)
        rid2 = tsrc // NB
        tx = jnp.where(tv, mid.reshape(-1)[tsrc], 0)
        tmi = jnp.where(tv, (mems1[:, 2, :] + 1).reshape(-1)[tsrc],
                        dt.type(1))
        qx = q_flat[rid2 * L + jnp.clip(tx, 0, L - 1)]
        st2 = fresh(TBUD, NB2)
        st2.update(mode=jnp.where(tv, 1, 3), x=tx, i=tx + 1,
                   ik=set_intv_batch(ndfm, jnp.clip(qx, 0, 3)),
                   ik_info=tx + 1)
        return st2, rid2, tmi, tv

    (st2, rid2, tmi, tv), t_setup = t_it(task_setup, mems1, n1)
    n_tasks = int(np.asarray(tv).sum())
    print(f"pass2 task setup: {t_setup*1e3:.1f} ms  tasks={n_tasks} "
          f"(pool {TBUD})")

    @jax.jit
    def p2_fwd(st2, rid2, tmi):
        return sj._fwd_scan_machine(ndfm, L, NB2, ITERS, q_flat, rid2,
                                    qlen_dev[rid2], tmi, st2,
                                    task_mode=True)

    s2, t_fwd = t_it(p2_fwd, st2, rid2, tmi)
    nbh = np.asarray(s2["nb"])[np.asarray(tv)]
    print(f"pass2 fwd task scan: {t_fwd*1e3:.1f} ms  it={int(s2['it'])}  "
          f"breaks/task mean={nbh.mean():.1f} max={nbh.max()}")

    @jax.jit
    def p2_post(s2, rid2, tmi):
        return sj._smem_pass_post(ndfm, L, NB2, q_flat, rid2, tmi,
                                  min_seed_len, s2, PBUD2, CS)

    (mems2l, n2l, o2f, o2p), t_post = t_it(p2_post, s2, rid2, tmi)
    print(f"pass2 bwd pool+emit: {t_post*1e3:.1f} ms  "
          f"PBUD2={PBUD2} CS={CS}")

    # pass-2 backward walk volume
    slot = jnp.arange(NB2, dtype=I32)[None, :]
    valid = (slot < s2["nb"][:, None])
    doa = valid & (s2["brk_x"] == 0)
    n_real = int(np.asarray(valid & ~doa).sum())
    print(f"  pass2 bwd pool: real lanes={n_real} "
          f"({n_real/max(n_tasks,1):.1f}/task, pool fill "
          f"{n_real/PBUD2*100:.0f}%)")

    # ---- merge scatter ----------------------------------------------------
    @jax.jit
    def merge(mems2l, n2l, tv, rid2):
        slot2 = jnp.arange(NB2, dtype=I32)[None, :]
        v2 = ((slot2 < n2l[:, None]) & tv[:, None]).reshape(-1)
        rid2e = jnp.repeat(rid2, NB2)
        v32 = v2.astype(I32)
        grank = jnp.cumsum(v32) - v32
        cnt2 = jnp.zeros(B, I32).at[rid2e].add(v32, mode="drop")
        base2 = jnp.cumsum(cnt2) - cnt2
        p2 = grank - base2[rid2e]
        keep2 = v2 & (p2 < M2)
        dst2 = jnp.where(keep2, rid2e * M2 + p2, B * M2)
        ent2 = mems2l.transpose(0, 2, 1).reshape(TBUD * NB2, 4)
        mems2 = jnp.zeros((B * M2, 4), dt).at[dst2].set(
            ent2, mode="drop").reshape(B, M2, 4).transpose(0, 2, 1)
        n2 = jnp.minimum(cnt2, M2)
        return mems2, n2

    (mems2, n2), t_merge = t_it(merge, mems2l, n2l, tv, rid2)
    print(f"pass2 merge scatter: {t_merge*1e3:.1f} ms")

    mems3, n3, _ = p3out

    @jax.jit
    def sort_cat(mems1, n1, mems2, n2, mems3, n3):
        mems = jnp.concatenate([mems1, mems2, mems3], axis=2)
        valid_all = jnp.concatenate(
            [slot1 < n1[:, None],
             jnp.arange(M2, dtype=I32)[None, :] < n2[:, None],
             jnp.arange(NP3, dtype=I32)[None, :] < n3[:, None]], axis=1)
        n_mem = jnp.minimum(n1 + n2 + n3, MAXM)
        key = jnp.where(valid_all, mems[:, 3, :], jnp.iinfo(dt).max)
        order = jnp.argsort(key, axis=1)
        mems = jnp.take_along_axis(mems, order[:, None, :],
                                   axis=2)[:, :, :MAXM]
        return mems, n_mem

    (memsf, n_mem), t_sort = t_it(sort_cat, mems1, n1, mems2, n2, mems3, n3)
    print(f"concat+argsort+take: {t_sort*1e3:.1f} ms "
          f"(width {NB + M2 + NP3})")

    @jax.jit
    def fused_sa(mems, n_mem):
        MAXO = sj.MAXO
        slot_i = jnp.arange(MAXM, dtype=I32)[None, :]
        valid = slot_i < n_mem[:, None]
        s_col = jnp.where(valid, mems[:, 2, :], 0)
        x0_col = mems[:, 0, :]
        over = s_col > max_occ
        cnt = jnp.minimum(jnp.where(over, max_occ, s_col), MAXO + 1)
        step = jnp.where(over, s_col // jnp.maximum(max_occ, 1), 1)
        cum = jnp.cumsum(cnt, axis=1)
        cum0 = jnp.concatenate([jnp.zeros((B, 1), dt), cum[:, :-1]], axis=1)
        occ_total = cum[:, -1].astype(I32)
        oo = jnp.arange(MAXO, dtype=dt)[None, :]

        def fill(j, rows):
            lo = jax.lax.dynamic_index_in_dim(cum0, j, 1)
            hi = jax.lax.dynamic_index_in_dim(cum, j, 1)
            x0j = jax.lax.dynamic_index_in_dim(x0_col, j, 1)
            stj = jax.lax.dynamic_index_in_dim(step, j, 1)
            m = (oo >= lo) & (oo < hi)
            return jnp.where(m, x0j + (oo - lo) * stj, rows)

        rows = jax.lax.fori_loop(0, MAXM, fill, jnp.zeros((B, MAXO), dt))
        idx = jnp.clip(rows, 0, ndfm.sa_dense.shape[0] - 1).astype(I32)
        occ_sa = ndfm.sa_dense[idx].astype(dt)
        return occ_sa, occ_total

    (occ_sa, occ_total), t_sa = t_it(fused_sa, memsf, n_mem)
    print(f"fused SA enumerate+gather: {t_sa*1e3:.1f} ms")

    @jax.jit
    def packit(mems, n_mem, occ_sa, occ_total):
        return sj._pack_ragged(mems, n_mem, jnp.zeros(B, I32), occ_sa,
                               occ_total, B)

    _, t_pack = t_it(packit, memsf, n_mem, occ_sa, occ_total)
    print(f"ragged pack: {t_pack*1e3:.1f} ms")

    total = t_p1 + t_setup + t_fwd + t_post + t_merge + t_sort + t_sa + t_pack
    print(f"sum of phases: {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
