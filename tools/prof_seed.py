#!/usr/bin/env python
"""Profile the device SMEM seeding machine phase by phase on the TPU.

Splits collect_intv_device (ops/smem_jax.py) into its sub-phases, each
under its own jit, and times them on realistic reads so the round-3
seeding work attacks the measured wall, not a guess. Also reports the
while-loop trip counts and occ-row volumes of each phase.
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
from bwa_flow_tpu.ops.fm_jax import DeviceFM
from bwa_flow_tpu.utils.opts import MemOpt

sys.path.insert(0, str(ROOT / "tools"))
from build_ref import make_genome

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
L = 160
READ_LEN = 151
GENOME_LEN = 2_000_000

CODE = np.full(256, 4, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    CODE[_c] = _i


def main():
    print(f"# devices: {jax.devices()}  B={B}", file=sys.stderr)
    rng = np.random.default_rng(1)
    opt = MemOpt()
    g = make_genome(GENOME_LEN, 0xBE7C, n_islands=2)
    g[g == 4] = 0
    genome = np.frombuffer(b"ACGT", np.uint8)[g]
    from bwa_flow_tpu.index.build import build_index
    npz = ROOT / f".cache/bench_index_rep_{GENOME_LEN}.npz"
    if npz.exists():
        from bwa_flow_tpu.index.fmindex import (FMIndex, ReferenceMeta,
                                                Annotation)
        d = np.load(npz)
        bns = ReferenceMeta(l_pac=int(d["l_pac"]),
                            anns=[Annotation("chr1", "", 0, int(d["l_pac"]), 0)],
                            ambs=[], pac=d["pac"])
        fm = FMIndex(seq_len=int(d["seq_len"]), primary=int(d["primary"]),
                     L2=d["L2"], fm_blocks=d["fm_blocks"],
                     sa_intv=int(d["sa_intv"]), sa=d["sa"], bns=bns)
    else:
        fm = build_index([("chr1", "", genome.tobytes())])
    dfm = DeviceFM.from_host(fm)
    ndfm = sj._narrow_dfm(dfm)

    reads = []
    for _ in range(B):
        pos = int(rng.integers(0, len(genome) - READ_LEN))
        r = CODE[genome[pos:pos + READ_LEN]].astype(np.int32)
        m = rng.random(READ_LEN) < 0.01
        r[m] = (r[m] + rng.integers(1, 4, m.sum())) % 4
        reads.append(r.astype(np.uint8))
    q, qlen = sj.pad_reads(reads, L)
    q_dev, qlen_dev = jnp.asarray(q), jnp.asarray(qlen)

    # ---- full machine (the production call) ----------------------------
    def full():
        h = sj.seed_dispatch(opt, fm, dfm, reads, L=L,
                             padded=(q_dev, qlen_dev))
        sj.seed_collect_batch(h)

    full()
    t0 = time.time(); full(); t_full = time.time() - t0
    print(f"full seed_dispatch+collect: {t_full*1e3:.1f} ms  "
          f"({B/t_full:.0f} reads/s)")

    # ---- phase decomposition -------------------------------------------
    dt = ndfm.L2.dtype
    MAXB, MAXM, ITERS = 64, 128, L * 16
    NB = max(MAXB, 128)
    NB2, NP3 = 32, 24
    PBUD1, TBUD, PBUD2 = 48 * B, 2 * B, 16 * B
    CS = min(B // 2, 4096)
    I32 = jnp.int32
    params = (jnp.asarray(opt.min_seed_len, I32),
              jnp.asarray(opt.split_len, I32),
              jnp.asarray(opt.split_width, I32),
              jnp.asarray(opt.max_mem_intv, jnp.int64),
              jnp.asarray(opt.max_occ, jnp.int64))
    min_seed_len, split_len, split_width, max_mem_intv, max_occ = params
    max_mem_intv = max_mem_intv.astype(dt)
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
    def phase_p1p3():
        st3 = dict(mode=jnp.zeros(B, I32), x=jnp.zeros(B, I32),
                   i=jnp.zeros(B, I32), ik=jnp.zeros((B, 3), dt),
                   mems=jnp.zeros((B, 4, NP3), dt), n_mem=jnp.zeros(B, I32),
                   ovf=jnp.zeros(B, bool), it=jnp.zeros((), I32))
        s1, p3out = sj._p1p3_machine(
            ndfm, L, NB, ITERS, q_flat, rid, qlen_dev, fresh(B, NB), qq,
            qlen_dev, c3, min_seed_len, max_mem_intv, st3)
        return s1, p3out

    s1, p3out = jax.block_until_ready(phase_p1p3())
    t0 = time.time(); jax.block_until_ready(phase_p1p3())
    t_p13 = time.time() - t0
    nb_host = np.asarray(s1["nb"])
    print(f"p1+p3 fused fwd scan: {t_p13*1e3:.1f} ms  it={int(s1['it'])} "
          f"breaks mean={nb_host.mean():.1f} p99="
          f"{np.percentile(nb_host, 99):.0f} max={nb_host.max()}")

    # per-read forward steps actually needed (p1): recompute on host
    # pass1 backward phase
    @jax.jit
    def phase_bwd(s1):
        return sj._smem_pass_post(ndfm, L, NB, q_flat, rid,
                                  jnp.ones(B, dt), min_seed_len, s1,
                                  PBUD1, CS)

    out_b = jax.block_until_ready(phase_bwd(s1))
    t0 = time.time(); jax.block_until_ready(phase_bwd(s1))
    t_bwd = time.time() - t0
    mems1, n1, ovf_f1, ovf_p1 = out_b
    n1h = np.asarray(n1)
    print(f"p1 backward pool+emit: {t_bwd*1e3:.1f} ms  "
          f"n1 mean={n1h.mean():.1f}")

    # backward walk only (isolate from emission/sort machinery)
    slot = jnp.arange(NB, dtype=I32)[None, :]
    valid = slot < s1["nb"][:, None]
    doa = valid & (s1["brk_x"] == 0)
    src, dstc, lane_ok, dropped = sj._compact((valid & ~doa).reshape(-1),
                                              PBUD1)
    lane_nl = src // NB
    bst0 = s1["brk_kls"].transpose(0, 2, 1).reshape(B * NB, 3)[src]
    i_b0 = (s1["brk_x"] - 1).reshape(-1)[src]
    rid_b = rid[lane_nl]
    mi_b = jnp.ones(B, dt)[lane_nl]

    @jax.jit
    def walk_only(bst0, i_b0, rid_b, mi_b, lane_ok):
        return sj._bwd_walk_machine(ndfm, L, q_flat, rid_b, bst0, i_b0,
                                    mi_b, lane_ok, CS)

    w = jax.block_until_ready(walk_only(bst0, i_b0, rid_b, mi_b, lane_ok))
    t0 = time.time()
    jax.block_until_ready(walk_only(bst0, i_b0, rid_b, mi_b, lane_ok))
    t_walk = time.time() - t0
    n_live = int(np.asarray(lane_ok).sum())
    i_b0h = np.asarray(i_b0)[np.asarray(lane_ok)]
    r_h = np.asarray(w[0])[np.asarray(lane_ok)]
    steps = i_b0h - r_h
    print(f"p1 bwd walk only: {t_walk*1e3:.1f} ms  live_lanes={n_live} "
          f"({n_live/B:.1f}/read)  steps mean={steps.mean():.1f} "
          f"p99={np.percentile(steps,99):.0f} max={steps.max()}  "
          f"chunks={n_live//CS + 1} CS={CS}")

    # full pipeline timing share
    print(f"  => sum p1p3+bwd = {(t_p13+t_bwd)*1e3:.1f} ms of "
          f"{t_full*1e3:.1f} ms full")

    # pass-2 cost = full - (p1p3 + bwd + rest); measure collect_intv
    # directly for the all-in number
    @jax.jit
    def whole():
        return sj.collect_intv_device(ndfm, L, MAXB, MAXM, ITERS, q_dev,
                                      qlen_dev, *params, pack_H=32)

    jax.block_until_ready(whole())
    t0 = time.time(); jax.block_until_ready(whole())
    t_whole = time.time() - t0
    print(f"collect_intv_device total: {t_whole*1e3:.1f} ms  "
          f"(pass2+sort+pack = {(t_whole-t_p13-t_bwd)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
