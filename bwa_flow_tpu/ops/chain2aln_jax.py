"""Device coupled seed-extension tasks — the TPU analog of the FPGA seed_proc.

One task = one seed of one chain: left extension (reversed query prefix vs
reversed reference window) then right extension seeded with the
left-extension score, each with bwa's 2-round band doubling
(mem_chain2aln, bwa/bwamem.c:716-779; FPGA seed_proc
/root/reference/src/fpga/kernel/smithwaterman.cpp:318-445). Unlike the FPGA
kernel (hardcoded scoring), this runs exact ksw_extend2 semantics via
ops/extend_jax.extend_core, four traced invocations fused in one jit:
left try0 -> masked left try1 (2w) -> right try0 -> masked right try1.

Outputs are the raw per-side 6-tuples plus the band width actually used;
the host applies the local/vs/to-end decision and absolute coordinates
(pipeline/batch.py), keeping bit-exact AlnReg construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .extend_jax import extend_core

MAX_BAND_TRY = 2  # bwa/bwamem.c MAX_BAND_TRY


def _two_tries(qmax, tmax, q, ql, t, tl, h0, mat, o_del, e_del, o_ins,
               e_ins, w0, end_bonus, zdrop, prev0):
    """bwa band-doubling: try w, retry 2w when the score moved from its
    entry value (`prev0`: -1 for the left extension, the incoming score for
    the right) and max_off >= w/2+w/4 (bwamem.c:737-744).
    Returns the selected 6-tuple + aw."""
    r0 = extend_core(qmax, tmax, q, ql, t, tl, h0, mat, o_del, e_del,
                     o_ins, e_ins, w0, end_bonus, zdrop)
    aw0 = jnp.broadcast_to(w0, ql.shape)
    need = (r0[0] != prev0) & (r0[5] >= ((aw0 >> 1) + (aw0 >> 2)))
    aw1 = aw0 * 2
    r1 = extend_core(qmax, tmax, q, ql, t, tl, h0, mat, o_del, e_del,
                     o_ins, e_ins, aw1, end_bonus, zdrop)
    out = tuple(jnp.where(need, b, a) for a, b in zip(r0, r1))
    aw = jnp.where(need, aw1, aw0)
    return out, aw


@functools.partial(jax.jit, static_argnums=(0, 1))
def seed_extend_batch(qmax: int, tmax: int,
                      ql_q: jnp.ndarray, ql_n: jnp.ndarray,
                      tl_t: jnp.ndarray, tl_n: jnp.ndarray,
                      qr_q: jnp.ndarray, qr_n: jnp.ndarray,
                      tr_t: jnp.ndarray, tr_n: jnp.ndarray,
                      h0: jnp.ndarray, mat: jnp.ndarray,
                      o_del: jnp.ndarray, e_del: jnp.ndarray,
                      o_ins: jnp.ndarray, e_ins: jnp.ndarray,
                      w: jnp.ndarray, pen_clip5: jnp.ndarray,
                      pen_clip3: jnp.ndarray, zdrop: jnp.ndarray
                      ) -> tuple[jnp.ndarray, ...]:
    """Batched coupled seed extension.

    ql_*/tl_*: reversed left query/target ([B, qmax]/[B, tmax] + lengths;
    length 0 = no left extension). qr_*/tr_*: right query/target.
    h0: seed_len * a. Returns
      (lscore, lqle, ltle, lgtle, lgscore, aw0,
       rscore, rqle, rtle, rgtle, rgscore, aw1)
    where lanes without a left extension report lscore = h0, aw0 = w (the
    host then applies bwamem.c:714-779 coordinate logic)."""
    lres, aw0 = _two_tries(qmax, tmax, ql_q, ql_n, tl_t, tl_n, h0, mat,
                           o_del, e_del, o_ins, e_ins, w, pen_clip5, zdrop,
                           jnp.full_like(h0, -1))
    has_left = ql_n > 0
    # score entering the right extension: left score, or seed score
    lscore = jnp.where(has_left, lres[0], h0)
    aw0 = jnp.where(has_left, aw0, jnp.broadcast_to(w, aw0.shape))
    rres, aw1 = _two_tries(qmax, tmax, qr_q, qr_n, tr_t, tr_n, lscore, mat,
                           o_del, e_del, o_ins, e_ins, w, pen_clip3, zdrop,
                           lscore)
    has_right = qr_n > 0
    rscore = jnp.where(has_right, rres[0], lscore)
    aw1 = jnp.where(has_right, aw1, jnp.broadcast_to(w, aw1.shape))
    return (lscore, lres[1], lres[2], lres[3], lres[4], aw0,
            rscore, rres[1], rres[2], rres[3], rres[4], aw1)


class SeedExtendTaskBuffer:
    """Fixed-shape host-side packing buffer for seed-extension tasks
    (the SWTask analog, /root/reference/src/fpga/SWTask.cpp)."""

    def __init__(self, cap: int, qmax: int, tmax: int):
        self.cap, self.qmax, self.tmax = cap, qmax, tmax
        self.ql_q = np.zeros((cap, qmax), np.int32)
        self.ql_n = np.zeros(cap, np.int32)
        self.tl_t = np.zeros((cap, tmax), np.int32)
        self.tl_n = np.zeros(cap, np.int32)
        self.qr_q = np.zeros((cap, qmax), np.int32)
        self.qr_n = np.zeros(cap, np.int32)
        self.tr_t = np.zeros((cap, tmax), np.int32)
        self.tr_n = np.zeros(cap, np.int32)
        self.h0 = np.ones(cap, np.int32)
        self.n = 0

    def reset(self):
        self.n = 0
        self.ql_n[:] = 0
        self.tl_n[:] = 0
        self.qr_n[:] = 0
        self.tr_n[:] = 0
        self.h0[:] = 1

    def add(self, q_left: np.ndarray, t_left: np.ndarray,
            q_right: np.ndarray, t_right: np.ndarray, h0: int) -> int:
        """Sequences already direction-ordered (left ones reversed).
        Returns the task slot, or -1 if any piece exceeds the buffer shape
        (caller falls back to host, packReadData-style)."""
        if (len(q_left) > self.qmax or len(q_right) > self.qmax
                or len(t_left) > self.tmax or len(t_right) > self.tmax
                or self.n >= self.cap):
            return -1
        i = self.n
        self.ql_q[i, :len(q_left)] = q_left
        self.ql_n[i] = len(q_left)
        self.tl_t[i, :len(t_left)] = t_left
        self.tl_n[i] = len(t_left)
        self.qr_q[i, :len(q_right)] = q_right
        self.qr_n[i] = len(q_right)
        self.tr_t[i, :len(t_right)] = t_right
        self.tr_n[i] = len(t_right)
        self.h0[i] = h0
        self.n += 1
        return i

    def run(self, opt) -> tuple[np.ndarray, ...]:
        out = seed_extend_batch(
            self.qmax, self.tmax,
            jnp.asarray(self.ql_q), jnp.asarray(self.ql_n),
            jnp.asarray(self.tl_t), jnp.asarray(self.tl_n),
            jnp.asarray(self.qr_q), jnp.asarray(self.qr_n),
            jnp.asarray(self.tr_t), jnp.asarray(self.tr_n),
            jnp.asarray(self.h0),
            jnp.asarray(opt.mat[:5, :5], dtype=jnp.int32),
            jnp.asarray(opt.o_del, jnp.int32), jnp.asarray(opt.e_del, jnp.int32),
            jnp.asarray(opt.o_ins, jnp.int32), jnp.asarray(opt.e_ins, jnp.int32),
            jnp.asarray(opt.w, jnp.int32), jnp.asarray(opt.pen_clip5, jnp.int32),
            jnp.asarray(opt.pen_clip3, jnp.int32), jnp.asarray(opt.zdrop, jnp.int32))
        return tuple(np.asarray(o) for o in out)
