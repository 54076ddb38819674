"""Device (JAX/XLA) SMEM seeding — a batched FM-index state machine.

TPU-native replacement for the reference seeding front-end
(mem_collect_intv, bwa/bwamem.c:120-168; FPGA variant
/root/reference/src/bwa_wrapper.cpp:207-246 + the SMEM FPGA kernel fed by
SMemTask, /root/reference/src/fpga/SMemTask.cpp). The FPGA restructure's key
insight — replace bwa's coupled backward list-pruning pass with an
*independent backward walk per forward break interval* — is what makes the
algorithm fixed-shape; this module keeps that insight but derives its own
emission rule so the output is *exactly* bwa's bwt_smem1a semantics (not
the FPGA's flagstat-level approximation):

  For break intervals processed longest-forward-first, backward death
  steps r_j are non-increasing (containment), and bwa emits exactly the
  first interval of each distinct-r cohort, with its own (k, l, s) state at
  maximal backward reach. So: walk each break independently, emit when
  r < r_prev. Total extend count equals bwa's backward pass.

Execution model: one unified `lax.while_loop` state machine, vectorized
over a batch of reads. Every iteration performs exactly one batched
bwt_extend (two occ row-gathers) for all lanes; each lane interprets it
according to its mode (pivot-scan / forward-walk / backward-walk / done).
Fixed budgets (break slots, mem slots, iterations) with per-lane overflow
flags; overflowing reads are redone on host by the golden implementation,
mirroring the reference's FPGA redo-on-overflow
(/root/reference/src/fpga/FPGAPipeline.cpp:706-714).

Three passes, matching mem_collect_intv: (1) all SMEMs from scanning
pivots; (2) re-seed long low-occ SMEMs from their middle with
min_intv = s+1; (3) LAST-like forward-only seeding (bwa/bwt.c:358-379).
Results are sorted by `info` on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import FMIndex
from ..utils.opts import MemOpt
from . import smem as smem_golden
from .fm_jax import DeviceFM, occ4_batch, set_intv_batch

I32 = jnp.int32
I64 = jnp.int64
BIG32 = jnp.int32(1 << 30)


def bwt_extend_dir_batch(dfm: DeviceFM, ik: jnp.ndarray,
                         is_back: jnp.ndarray) -> jnp.ndarray:
    """bwt_extend with a per-lane direction flag (bwa/bwt.c:262-275).

    ik: int64[B, 3]; is_back: bool[B]. Returns ok int64[B, 4, 3].
    The two occ probes are shared between directions."""
    probe = jnp.where(is_back, ik[:, 0], ik[:, 1])
    s = ik[:, 2]
    # flat [2B] probe coords: 1-D-index gathers lower to the fast TPU
    # gather path (2-D index shapes fall back to per-row dynamic slices)
    both = jnp.concatenate([probe - 1, probe - 1 + s], axis=0)
    occ2 = occ4_batch(dfm, both)
    tk, tl = occ2[: probe.shape[0]], occ2[probe.shape[0]:]
    ok_probe = dfm.L2[:4] + 1 + tk                       # [B, 4]
    ok_s = tl - tk
    crosses = ((probe <= dfm.primary) & (probe + s - 1 >= dfm.primary)
               ).astype(I64)
    base = jnp.where(is_back, ik[:, 1], ik[:, 0]) + crosses
    b3 = base
    b2 = b3 + ok_s[:, 3]
    b1 = b2 + ok_s[:, 2]
    b0 = b1 + ok_s[:, 1]
    derived = jnp.stack([b0, b1, b2, b3], axis=-1)
    isb = is_back[:, None]
    ok_k = jnp.where(isb, ok_probe, derived)
    ok_l = jnp.where(isb, derived, ok_probe)
    return jnp.stack([ok_k, ok_l, ok_s], axis=-1)


class _MachineConsts(NamedTuple):
    L: int
    MAXB: int
    MAXM: int
    ITERS: int


def _take1(arr, idx):
    """arr[b, idx[b]] along axis 1 (idx assumed clamped) — as a one-hot
    select; batched take_along_axis gathers lower to slow per-row code."""
    oh = jnp.arange(arr.shape[1], dtype=I32)[None, :] == idx[:, None]
    return (arr * oh.astype(arr.dtype)).sum(axis=1, dtype=arr.dtype)


def _take_row(arr, idx):
    """arr[b, idx[b], :] for [B, 4, 3] arrays (idx in [0, 4)) — unrolled
    4-way select."""
    out = arr[:, 0, :]
    for cc in range(1, arr.shape[1]):
        out = jnp.where((idx == cc)[:, None], arr[:, cc, :], out)
    return out


def _scatter_slot(arr, idx, val, do):
    """arr[b, :, idx[b]] = val[b, :] where do[b] — masked one-hot select.

    Two TPU lowering rules shape this: (a) variadic scatters lower to B
    sequential row updates, so writes are dense selects; (b) the minor
    dimension tiles to 128 vector lanes, so the slot axis is kept MINOR
    ([B, K, N_slots]) — a [B, N, K<=4] layout wastes ~32x on tile padding."""
    sel = (jnp.arange(arr.shape[2], dtype=I32)[None, :] == idx[:, None]) \
        & do[:, None]
    return jnp.where(sel[:, None, :], val[:, :, None], arr)


def _take_slot(arr, idx):
    """arr[b, :, idx[b]] for [B, K, N] slot-minor buffers."""
    oh = jnp.arange(arr.shape[2], dtype=I32)[None, :] == idx[:, None]
    return (arr * oh[:, None, :].astype(arr.dtype)).sum(axis=2,
                                                        dtype=arr.dtype)


def _scatter1(arr, idx, val, do):
    sel = (jnp.arange(arr.shape[1], dtype=I32)[None, :] == idx[:, None]) \
        & do[:, None]
    return jnp.where(sel, val[:, None], arr)


def _pass12_machine(dfm: DeviceFM, c: _MachineConsts, q, qlen,
                    min_seed_len, st0, task_mode: bool,
                    task_x=None, task_mi=None, n_task=None):
    """Shared pass-1/pass-2 SMEM machine. In task_mode, pivots come from a
    per-lane (x, min_intv) task list; otherwise pivots scan the read with
    the bwa jump rule (x <- end of longest match)."""
    B = q.shape[0]
    jl = jnp.arange(c.L, dtype=I32)[None, :]
    valid_base = (jl < qlen[:, None]) & (q < 4)  # loop-invariant

    def cond(s):
        return (s["it"] < c.ITERS) & jnp.any(s["mode"] != 3)

    def step(s):
        mode = s["mode"]
        # ---------------- mode 0: acquire next pivot ----------------
        m0 = mode == 0
        if task_mode:
            has = s["tcur"] < n_task
            nx = _take1(task_x, jnp.clip(s["tcur"], 0, c.MAXM - 1))
            nmi = _take1(task_mi, jnp.clip(s["tcur"], 0, c.MAXM - 1))
            new_x = jnp.where(m0 & has, nx, s["x"])
            new_mi = jnp.where(m0 & has, nmi, s["min_intv"])
            tcur = jnp.where(m0, s["tcur"] + 1, s["tcur"])
            found = has
        else:
            ok_piv = (jl >= s["x"][:, None]) & valid_base
            cand = jnp.min(jnp.where(ok_piv, jl, BIG32), axis=1)
            found = cand < BIG32
            new_x = jnp.where(m0 & found, cand, s["x"])
            new_mi = s["min_intv"]
            tcur = s["tcur"]
        qx = _take1(q, jnp.clip(new_x, 0, c.L - 1))
        init_ik = set_intv_batch(dfm, jnp.clip(qx, 0, 3))
        start_fwd = m0 & found
        mode = jnp.where(m0, jnp.where(found, 1, 3), mode)
        x = new_x
        ik = jnp.where(start_fwd[:, None], init_ik, s["ik"])
        ik_info = jnp.where(start_fwd, x + 1, s["ik_info"])
        i = jnp.where(start_fwd, x + 1, s["i"])
        nb = jnp.where(start_fwd, 0, s["nb"])

        # ---------------- the one shared extend ----------------
        m1 = mode == 1
        m2 = mode == 2
        ext_in = jnp.where(m2[:, None], s["bst"], ik)
        ok = bwt_extend_dir_batch(dfm, ext_in, m2)

        # ---------------- mode 1: forward walk ----------------
        q_i = _take1(q, jnp.clip(i, 0, c.L - 1))
        end_now = m1 & ((i >= qlen) | (q_i > 3))
        cf = jnp.clip(3 - q_i, 0, 3)
        okc_f = _take_row(ok, cf)
        changed = okc_f[:, 2] != ik[:, 2]
        die_small = changed & (okc_f[:, 2] < new_mi)
        push = m1 & (end_now | changed)
        to_back = m1 & (end_now | die_small)
        adv = m1 & ~to_back

        nb_ovf = push & (nb >= c.MAXB)
        curr_kls = _scatter_slot(s["curr_kls"], nb, ik, push & ~nb_ovf)
        curr_end = _scatter1(s["curr_end"], nb, ik_info, push & ~nb_ovf)
        nb = jnp.where(push & ~nb_ovf, nb + 1, nb)

        ik = jnp.where(adv[:, None], okc_f, ik)
        ik_info = jnp.where(adv, i + 1, ik_info)
        i = jnp.where(adv, i + 1, i)

        # fwd -> back transition (nb >= 1 always: something was pushed)
        last = jnp.clip(nb - 1, 0, c.MAXB - 1)
        pivot_next = jnp.where(to_back, _take1(curr_end, last),
                               s["pivot_next"])
        slot = jnp.where(to_back, nb - 1, s["slot"])
        bst = jnp.where(to_back[:, None], _take_slot(curr_kls, last),
                        s["bst"])
        i_b = jnp.where(to_back, x - 1, s["i_b"])
        r_prev = jnp.where(to_back, BIG32, s["r_prev"])
        mode = jnp.where(to_back, 2, mode)

        # ---------------- mode 2: backward walk ----------------
        q_b = _take1(q, jnp.clip(i_b, 0, c.L - 1))
        valid_c = (i_b >= 0) & (q_b < 4)
        cb = jnp.clip(q_b, 0, 3)
        okc_b = _take_row(ok, cb)
        dead = m2 & (~valid_c | (okc_b[:, 2] < new_mi))
        walk = m2 & ~dead
        bst = jnp.where(walk[:, None], okc_b, bst)
        i_b2 = jnp.where(walk, i_b - 1, i_b)

        # death: cohort emission (see module docstring)
        r = i_b
        e_slot = _take1(curr_end, jnp.clip(slot, 0, c.MAXB - 1))
        emit = dead & (r < s["r_prev"]) \
            & ((e_slot - (r + 1)) >= min_seed_len)
        info = (((r + 1).astype(I64) << 32)
                | e_slot.astype(I64))
        new_mem = jnp.concatenate([bst, info[:, None]], axis=1)
        mem_ovf = emit & (s["n_mem"] >= c.MAXM)
        mems = _scatter_slot(s["mems"], s["n_mem"], new_mem, emit & ~mem_ovf)
        n_mem = jnp.where(emit & ~mem_ovf, s["n_mem"] + 1, s["n_mem"])
        r_prev = jnp.where(dead, r, r_prev)

        slot2 = jnp.where(dead, slot - 1, slot)
        more = dead & (slot2 >= 0)
        nxt = jnp.clip(slot2, 0, c.MAXB - 1)
        bst = jnp.where(more[:, None], _take_slot(curr_kls, nxt), bst)
        i_b2 = jnp.where(more, x - 1, i_b2)
        back_done = dead & (slot2 < 0)
        mode = jnp.where(back_done, 0, mode)
        if not task_mode:  # bwa pivot jump: x <- end of longest match
            x = jnp.where(back_done, pivot_next, x)

        ovf = s["ovf"] | nb_ovf | mem_ovf
        mode = jnp.where(nb_ovf | mem_ovf, 3, mode)
        return dict(mode=mode, x=x, i=i, ik=ik, ik_info=ik_info,
                    min_intv=new_mi, nb=nb, curr_kls=curr_kls,
                    curr_end=curr_end, slot=slot2, bst=bst, i_b=i_b2,
                    r_prev=r_prev, pivot_next=pivot_next, tcur=tcur,
                    mems=mems, n_mem=n_mem, ovf=ovf, it=s["it"] + 1)

    out = jax.lax.while_loop(cond, step, st0)
    out["ovf"] = out["ovf"] | (out["mode"] != 3)  # iteration budget blown
    return out


def _pass3_machine(dfm: DeviceFM, c: _MachineConsts, q, qlen,
                   min_seed_len, max_mem_intv, mems, n_mem, ovf):
    """LAST-like third pass (bwt_seed_strategy1, bwa/bwt.c:358-379)."""
    B = q.shape[0]
    jl = jnp.arange(c.L, dtype=I32)[None, :]
    valid_base = (jl < qlen[:, None]) & (q < 4)  # loop-invariant
    st0 = dict(mode=jnp.zeros(B, I32), x=jnp.zeros(B, I32),
               i=jnp.zeros(B, I32),
               ik=jnp.zeros((B, 3), I64), mems=mems, n_mem=n_mem,
               ovf=ovf, it=jnp.zeros((), I32))

    def cond(s):
        return (s["it"] < c.ITERS) & jnp.any(s["mode"] != 3)

    def step(s):
        mode = s["mode"]
        m0 = mode == 0
        ok_piv = (jl >= s["x"][:, None]) & valid_base
        cand = jnp.min(jnp.where(ok_piv, jl, BIG32), axis=1)
        found = cand < BIG32
        x = jnp.where(m0 & found, cand, s["x"])
        qx = _take1(q, jnp.clip(x, 0, c.L - 1))
        init_ik = set_intv_batch(dfm, jnp.clip(qx, 0, 3))
        start = m0 & found
        mode = jnp.where(m0, jnp.where(found, 1, 3), mode)
        ik = jnp.where(start[:, None], init_ik, s["ik"])
        i = jnp.where(start, x + 1, s["i"])

        m1 = mode == 1
        ended = m1 & (i >= qlen)          # loop exhausted: jump to len
        q_i = _take1(q, jnp.clip(i, 0, c.L - 1))
        amb = m1 & ~ended & (q_i > 3)     # N base: jump to i+1, no seed
        live = m1 & ~ended & ~amb
        ok = bwt_extend_dir_batch(dfm, ik, jnp.zeros(ik.shape[0], bool))
        cf = jnp.clip(3 - q_i, 0, 3)
        okc = _take_row(ok, cf)
        hit = live & (okc[:, 2] < max_mem_intv) & ((i - x) >= min_seed_len)
        emit = hit & (okc[:, 2] > 0)
        info = ((x.astype(I64) << 32) | (i + 1).astype(I64))
        new_mem = jnp.concatenate([okc, info[:, None]], axis=1)
        mem_ovf = emit & (s["n_mem"] >= c.MAXM)
        mems2 = _scatter_slot(s["mems"], s["n_mem"], new_mem,
                             emit & ~mem_ovf)
        n_mem = jnp.where(emit & ~mem_ovf, s["n_mem"] + 1, s["n_mem"])

        walk = live & ~hit
        ik = jnp.where(walk[:, None], okc, ik)
        i2 = jnp.where(walk, i + 1, i)
        # pivot jumps
        x = jnp.where(ended, qlen, jnp.where(amb | hit, i + 1, x))
        mode = jnp.where(ended | amb | hit, 0, mode)
        return dict(mode=mode, x=x, i=i2, ik=ik, mems=mems2, n_mem=n_mem,
                    ovf=s["ovf"] | mem_ovf, it=s["it"] + 1)

    out = jax.lax.while_loop(cond, step, st0)
    return out["mems"], out["n_mem"], out["ovf"] | (out["mode"] != 3)


MAXO = 64  # per-read SA-occurrence budget for the fused seed+SA output


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def collect_intv_device(dfm: DeviceFM, L: int, MAXB: int, MAXM: int,
                        ITERS: int, q: jnp.ndarray, qlen: jnp.ndarray,
                        min_seed_len: jnp.ndarray, split_len: jnp.ndarray,
                        split_width: jnp.ndarray, max_mem_intv: jnp.ndarray,
                        max_occ: jnp.ndarray
                        ) -> tuple[jnp.ndarray, ...]:
    """All seeding intervals for a batch of reads (mem_collect_intv,
    bwa/bwamem.c:120-168), sorted by info.

    q: int32[B, L] (0..4; pad >= 4 beyond qlen); qlen int32[B].
    Returns (mems int64[B, 4, MAXM] = (k, l, s, info) rows, n_mem int32[B],
    overflow bool[B], occ_sa int64[B, MAXO], occ_total int32[B]).

    When the genome carries a dense device SA, the call also resolves the
    seed occurrences' SA values on device (mem_chain's x0+k enumeration,
    capped at max_occ per interval) so a typical batch needs NO separate
    SA round trip; reads whose total occurrence count exceeds MAXO are
    resolved by the caller through the probe path."""
    B = q.shape[0]
    c = _MachineConsts(L, MAXB, MAXM, ITERS)

    def fresh(mems, n_mem, ovf, min_intv):
        return dict(
            mode=jnp.zeros(B, I32), x=jnp.zeros(B, I32),
            i=jnp.zeros(B, I32), ik=jnp.zeros((B, 3), I64),
            ik_info=jnp.zeros(B, I32), min_intv=min_intv,
            nb=jnp.zeros(B, I32),
            curr_kls=jnp.zeros((B, 3, MAXB), I64),
            curr_end=jnp.zeros((B, MAXB), I32),
            slot=jnp.zeros(B, I32), bst=jnp.zeros((B, 3), I64),
            i_b=jnp.zeros(B, I32), r_prev=jnp.full(B, BIG32, I32),
            pivot_next=jnp.zeros(B, I32), tcur=jnp.zeros(B, I32),
            mems=mems, n_mem=n_mem, ovf=ovf, it=jnp.zeros((), I32))

    mems0 = jnp.zeros((B, 4, MAXM), I64)
    n0 = jnp.zeros(B, I32)
    ovf0 = jnp.zeros(B, bool)

    # pass 1: scan pivots, min_intv = 1
    s1 = _pass12_machine(dfm, c, q, qlen, min_seed_len,
                         fresh(mems0, n0, ovf0, jnp.ones(B, I64)),
                         task_mode=False)
    mems, n_mem, ovf = s1["mems"], s1["n_mem"], s1["ovf"]

    # pass 2: re-seed long low-occ SMEMs from the middle, min_intv = s+1
    slot_i = jnp.arange(MAXM, dtype=I32)[None, :]
    start = (mems[:, 3, :] >> 32).astype(I32)
    end = (mems[:, 3, :] & 0xFFFFFFFF).astype(I32)
    want = (slot_i < n_mem[:, None]) \
        & ((end - start) >= split_len) \
        & (mems[:, 2, :] <= split_width.astype(I64))
    order = jnp.argsort(~want, axis=1, stable=True)
    mid = ((start + end) >> 1).astype(I32)
    task_x = jnp.take_along_axis(mid, order, axis=1)
    task_mi = jnp.take_along_axis(mems[:, 2, :] + 1, order, axis=1)
    n_task = want.sum(axis=1).astype(I32)

    s2 = _pass12_machine(dfm, c, q, qlen, min_seed_len,
                         fresh(mems, n_mem, ovf, jnp.ones(B, I64)),
                         task_mode=True, task_x=task_x, task_mi=task_mi,
                         n_task=n_task)
    mems, n_mem, ovf = s2["mems"], s2["n_mem"], s2["ovf"]

    # pass 3: LAST-like forward-only seeding (skipped if max_mem_intv <= 0)
    mems3, n3, ovf3 = _pass3_machine(dfm, c, q, qlen, min_seed_len,
                                     max_mem_intv, mems, n_mem, ovf)
    use3 = max_mem_intv > 0
    mems = jnp.where(use3, mems3, mems)
    n_mem = jnp.where(use3, n3, n_mem)
    ovf = jnp.where(use3, ovf3, ovf)

    # final sort by info (ks_introsort mem_intv semantics)
    key = jnp.where(slot_i < n_mem[:, None], mems[:, 3, :],
                    jnp.iinfo(jnp.int64).max)
    order = jnp.argsort(key, axis=1)
    mems = jnp.take_along_axis(mems, order[:, None, :], axis=2)

    # fused on-device SA resolution of the occurrence enumeration
    if dfm.sa_dense is not None:
        valid = slot_i < n_mem[:, None]
        s_col = jnp.where(valid, mems[:, 2, :], 0)           # [B, MAXM]
        x0_col = mems[:, 0, :]
        over = s_col > max_occ
        cnt = jnp.where(over, max_occ, s_col)
        step = jnp.where(over, s_col // jnp.maximum(max_occ, 1), 1)
        cum = jnp.cumsum(cnt, axis=1)
        cum0 = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int64), cum[:, :-1]], axis=1)
        occ_total = cum[:, -1].astype(I32)
        oo = jnp.arange(MAXO, dtype=jnp.int64)[None, :]      # [1, MAXO]

        def fill(j, rows):
            lo = jax.lax.dynamic_index_in_dim(cum0, j, 1)     # [B, 1]
            hi = jax.lax.dynamic_index_in_dim(cum, j, 1)
            x0j = jax.lax.dynamic_index_in_dim(x0_col, j, 1)
            stj = jax.lax.dynamic_index_in_dim(step, j, 1)
            m = (oo >= lo) & (oo < hi)
            return jnp.where(m, x0j + (oo - lo) * stj, rows)

        rows = jax.lax.fori_loop(0, MAXM, fill,
                                 jnp.zeros((B, MAXO), jnp.int64))
        idx = jnp.clip(rows, 0, dfm.sa_dense.shape[0] - 1).astype(I32)
        occ_sa = dfm.sa_dense[idx].astype(jnp.int64)
    else:
        occ_sa = jnp.zeros((B, MAXO), jnp.int64)
        occ_total = jnp.full((B,), -1, I32)   # sentinel: not resolved
    return mems, n_mem, ovf, occ_sa, occ_total


_OPT_CACHE: dict = {}


@jax.jit
def _pack_meta(n_mem, ovf, occ_total):
    return jnp.stack([n_mem.astype(I32), ovf.astype(I32), occ_total])


def pad_reads(reads: list[np.ndarray], L: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """Pad reads to a [B, L] int32 batch (pad symbol 4), B a power-of-two
    bucket so read counts share compiled programs."""
    B = 64
    while B < len(reads):
        B <<= 1
    q = np.full((B, L), 4, dtype=np.int32)
    qlen = np.zeros(B, dtype=np.int32)
    for b, r in enumerate(reads):
        n = min(len(r), L)
        q[b, :n] = r[:n]
        qlen[b] = n
    return q, qlen


SEED_HEAD = 32  # slots fetched eagerly; reads rarely use more


@functools.partial(jax.jit, static_argnums=(1,))
def _mems_slice(mems, width: int):
    return mems[:, :, :width]


def _start_fetch(arr):
    try:
        arr.copy_to_host_async()
    except AttributeError:
        pass
    return arr


def seed_dispatch(opt: MemOpt, fm: FMIndex, dfm: DeviceFM,
                  reads: list[np.ndarray], L: int = 256,
                  MAXB: int = 64, MAXM: int = 128,
                  iters_factor: int = 16, padded=None) -> dict:
    """Dispatch the device SMEM machine for a batch and START the
    device->host fetches of the meta row and the leading SEED_HEAD mem
    slots (the tunnel pipelines overlapping transfers); returns a handle
    for seed_collect. The padded read batch is kept in the handle so the
    extension stage can address it (descriptor-only waves)."""
    if padded is not None:
        q, qlen = padded
        q_dev, qlen_dev = q, qlen
    else:
        q, qlen = pad_reads(reads, L)
        q_dev, qlen_dev = jnp.asarray(q), jnp.asarray(qlen)
    key = (id(opt), opt.min_seed_len, opt.split_len, opt.split_width,
           opt.max_mem_intv, opt.max_occ)
    params = _OPT_CACHE.get(key)
    if params is None:
        params = (jnp.asarray(opt.min_seed_len, I32),
                  jnp.asarray(opt.split_len, I32),
                  jnp.asarray(opt.split_width, I32),
                  jnp.asarray(opt.max_mem_intv, I64),
                  jnp.asarray(opt.max_occ, I64))
        _OPT_CACHE[key] = params
    mems, n_mem, ovf, occ_sa, occ_total = collect_intv_device(
        dfm, L, MAXB, MAXM, L * iters_factor, q_dev, qlen_dev, *params)
    return dict(
        reads=reads, opt=opt, fm=fm, L=L, MAXM=MAXM,
        q_dev=q_dev, mems=mems,
        meta=_start_fetch(_pack_meta(n_mem, ovf, occ_total)),
        occ_sa=_start_fetch(occ_sa),
        head=_start_fetch(_mems_slice(mems, min(SEED_HEAD, MAXM))))


def seed_collect(handle: dict, fetch=np.asarray
                 ) -> list[list[smem_golden.Intv]]:
    """Finish a seed_dispatch: unpack Intv lists; overflowed reads are
    redone with the golden implementation (reference redo pattern,
    FPGAPipeline.cpp:706-714)."""
    opt, fm, reads = handle["opt"], handle["fm"], handle["reads"]
    L, MAXM = handle["L"], handle["MAXM"]
    meta = fetch(handle["meta"])
    n_mem = meta[0]
    ovf = meta[1] != 0
    occ_total = meta[2]
    used = int(n_mem.max()) if len(n_mem) else 0
    if used <= min(SEED_HEAD, MAXM):
        mems = fetch(handle["head"])
    else:  # rare: some read used more slots than the eager head fetch
        width = SEED_HEAD
        while width < used:
            width <<= 1
        width = min(width, MAXM)
        mems = fetch(_start_fetch(_mems_slice(handle["mems"], width)))
    out = []
    # per-read fused SA values (device enumeration) or None when the read
    # must go through the probe path (redone on host / budget exceeded /
    # no dense SA)
    sa_vals: list = [None] * len(reads)
    occ_np = None
    Intv = smem_golden.Intv
    for b, r in enumerate(reads):
        if ovf[b] or len(r) > L:
            out.append(smem_golden.collect_intv(opt, fm, r))
            continue
        rows = mems[b, :, :n_mem[b]].T.tolist()  # one bulk conversion
        out.append([Intv(k, l, s, info) for k, l, s, info in rows])
        t = int(occ_total[b])
        if 0 <= t <= MAXO:
            if occ_np is None:
                occ_np = fetch(handle["occ_sa"])
            sa_vals[b] = occ_np[b, :t]
    handle["sa_vals"] = sa_vals
    return out


def collect_intv_batch(opt: MemOpt, fm: FMIndex, dfm: DeviceFM,
                       reads: list[np.ndarray], L: int = 256,
                       MAXB: int = 64, MAXM: int = 128,
                       iters_factor: int = 16, padded=None
                       ) -> list[list[smem_golden.Intv]]:
    # NB: shrinking MAXB/MAXM below 64/128 measured *slower* on v5e (the
    # slot axis maps to vector lanes; 128 tiles cleanly), so the budget
    # defaults stay at the reference's FPGA task shape (SMemTask.cpp:26-28).
    """Synchronous wrapper: seed_dispatch + seed_collect."""
    h = seed_dispatch(opt, fm, dfm, reads, L, MAXB, MAXM, iters_factor,
                      padded)
    return seed_collect(h)
