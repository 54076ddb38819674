"""Pallas TPU kernel for batched exact ksw_extend2 (banded affine SW).

Drop-in replacement for ops/extend_jax.extend_core's row loop with the DP
state held in VMEM: the XLA formulation materializes ~20 intermediate
[T, qmax] tensors in HBM per target row (fori_loop body), which makes the
wave HBM-bound at ~100 us/row; here one grid program owns a TILE of tasks
(tasks on the 128-lane axis, query positions on sublanes), keeps
ehH/ehE [qmax+8, TILE] resident in VMEM, and loops target rows in-kernel
with a while_loop that exits when every lane is done (m==0 / z-drop /
tlen reached) — so short tasks don't pay for the padded tmax.

Semantics are exactly bwa's ksw_extend2 (bwa/ksw.c:380-479) including the
collapsed-band row bookkeeping; the differential fuzz suite
(tests/test_ksw_oracle.py) checks this kernel against the genuine C
implementation via the interpreter, and the compiled TPU path is covered
by the real-chip verify drive.

Mosaic notes (observed through the axon remote-compile): boolean vectors
cannot be while_loop carries (scf.yield legalization), so all lane masks
carry as int32; 1-D iota is illegal, so every index ramp is a 2-D
broadcasted_iota; the F-scan prefix max runs as log2(qmax) sublane
shift-max steps (no native cummax needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
NEG = -(1 << 28)


def _prefix_max(a, n_rows):
    """Inclusive prefix max along the sublane (row) axis via log shifts."""
    k = 1
    while k < n_rows:
        sh = jnp.concatenate(
            [jnp.full((k, a.shape[1]), NEG, I32), a[:-k, :]], axis=0)
        a = jnp.maximum(a, sh)
        k <<= 1
    return a


def _make_kernel(qmax: int, tmax: int, tile: int):
    QP0 = qmax            # row ops span j in [0, qmax)
    QP1 = qmax + 8        # eh state spans j in [0, qmax] (+pad to x8)

    def kernel(scal_ref, lane_ref, qp_ref, t_ref, out_ref, ehH, ehE):
        # x64 is enabled package-wide; bare Python int literals trace as
        # weak i64 scalars, whose i64->i32 converts send this jax
        # version's Mosaic lowering into unbounded recursion — so every
        # literal operand below is an explicit int32 constant.
        Z = jnp.int32(0)
        M1 = jnp.int32(-1)
        NEGC = jnp.int32(NEG)
        QBIG = jnp.int32(qmax + 2)
        o_del = scal_ref[0, 0]
        e_del = scal_ref[0, 1]
        o_ins = scal_ref[0, 2]
        e_ins = scal_ref[0, 3]
        zdrop = scal_ref[0, 4]
        oe_del = o_del + e_del
        oe_ins = o_ins + e_ins

        qlen = lane_ref[0:1, :]          # [1, TILE]
        tlen = lane_ref[1:2, :]
        h0 = lane_ref[2:3, :]
        wv = lane_ref[3:4, :]

        j1 = jax.lax.broadcasted_iota(I32, (QP1, tile), 0)
        jq = jax.lax.broadcasted_iota(I32, (QP0, tile), 0)

        # first H row (ksw.c:390-396): eh[0]=h0; eh[j>=1] decays by e_ins
        # from h0-oe_ins while positive
        ehH0 = jnp.where(j1 == Z, h0,
                         jnp.maximum(h0 - oe_ins - (j1 - 1) * e_ins, Z))
        ehH[:] = jnp.where(j1 <= qlen, ehH0, Z)
        ehE[:] = jnp.zeros((QP1, tile), I32)

        zero = jnp.zeros((1, tile), I32)
        init = (jnp.int32(0),                      # i
                zero,                              # beg
                qlen + Z,                          # end
                h0 + Z,                            # maxv
                zero + M1,                         # max_i
                zero + M1,                         # max_j
                zero + M1,                         # max_ie
                zero + M1,                         # gscore
                zero,                              # max_off
                ((qlen == Z) | (tlen == Z)).astype(I32))  # done

        def cond(c):
            i, beg, end, maxv, mi, mj_, mie, gsc, moff, done = c
            # scalar reduction over int32 (Mosaic routes bool-any through
            # an f64 reduce, which it cannot squeeze to a scalar)
            live = ((done == Z) & (i < tlen)).astype(I32)
            return (i < tmax) & (jnp.max(live) > Z)

        def body(c):
            i, beg, end, maxv, mi, mj_, mie, gsc, moff, done = c
            active0 = (done == Z) & (i < tlen)
            beg = jnp.where(active0, jnp.maximum(beg, i - wv), beg)
            end = jnp.where(active0,
                            jnp.minimum(jnp.minimum(end, i + wv + 1), qlen),
                            end)
            degen = beg >= end
            active = active0 & ~degen

            trow = t_ref[pl.ds(i, 1), :]           # [1, TILE]
            qrow = jnp.zeros((QP0, tile), I32)
            for cc in range(5):
                qrow = jnp.where(trow == cc,
                                 qp_ref[cc * qmax:(cc + 1) * qmax, :], qrow)

            band = (jq >= beg) & (jq < end)        # [QP0, TILE]
            Hd = ehH[0:QP0, :]
            Ein = ehE[0:QP0, :]
            M = jnp.where(Hd != Z, Hd + qrow, Z)
            M = jnp.where(band, M, Z)
            Ein_b = jnp.where(band, Ein, Z)

            # F scan: F[j] = max_{beg<=k<j}(max(M[k]-oe_ins,0)-(j-1-k)e_ins)
            T_ins = jnp.maximum(M - oe_ins, Z)
            A = jnp.where(band, T_ins + jq * e_ins, NEGC)
            run = _prefix_max(A, QP0)
            runs = jnp.concatenate(
                [jnp.full((1, tile), NEG, I32), run[:-1, :]], axis=0)
            F = jnp.maximum(runs - (jq - 1) * e_ins, NEGC)
            F = jnp.where(jq == beg, Z, F)
            F = jnp.where(band, F, Z)
            F = jnp.maximum(F, Z)

            H = jnp.maximum(jnp.maximum(M, Ein_b), F)
            H = jnp.where(band, H, Z)
            Eout = jnp.maximum(jnp.maximum(M - oe_del, Z), Ein_b - e_del)
            Eout = jnp.where(band, Eout, Z)

            h1_init = jnp.where(
                beg == Z,
                jnp.maximum(h0 - (o_del + e_del * (i + jnp.int32(1))), Z), Z)

            # write-back: ehH[beg]=h1_init; ehH[j]=H[j-1] for beg<j<=end;
            # ehE[j]=Eout[j] in band; ehE[end]=0
            Hshift = jnp.concatenate(
                [jnp.zeros((1, tile), I32), H,
                 jnp.zeros((QP1 - QP0 - 1, tile), I32)], axis=0)
            in_write = (j1 > beg) & (j1 <= end)
            new_ehH = jnp.where(j1 == beg, h1_init,
                                jnp.where(in_write, Hshift, ehH[:]))
            band_e = (j1 >= beg) & (j1 < end)
            Epad = jnp.concatenate([Eout, jnp.zeros((8, tile), I32)], axis=0)
            new_ehE = jnp.where(band_e, Epad,
                                jnp.where(j1 == end, Z, ehE[:]))

            h1 = jnp.sum(jnp.where(j1 == end, Hshift, Z),
                         axis=0, dtype=I32)[None, :]
            mrow = jnp.max(jnp.where(band, H, Z), axis=0)[None, :]
            att = band & (H == mrow)
            mj = jnp.max(jnp.where(att, jq, M1), axis=0)[None, :]
            mj = jnp.where(mrow > Z, mj, end - jnp.int32(1))

            # collapsed-band rows still do the eh[end]/gscore bookkeeping
            # before m==0 breaks them (ksw.c:451-456)
            j_after = jnp.where(degen, beg, end)
            h1_eff = jnp.where(degen, h1_init, h1)
            to_end = active0 & (j_after == qlen)
            upd_ie = to_end & (h1_eff >= gsc)
            mie = jnp.where(upd_ie, i, mie)
            gsc = jnp.where(to_end, jnp.maximum(gsc, h1_eff), gsc)

            break_zero = mrow == Z
            improved = mrow > maxv
            n_maxv = jnp.where(improved, mrow, maxv)
            n_mi = jnp.where(improved, i, mi)
            n_mj = jnp.where(improved, mj, mj_)
            n_moff = jnp.where(improved,
                               jnp.maximum(moff, jnp.abs(mj - i)), moff)
            di = i - mi
            dj = mj - mj_
            # select the int32 drop value, then compare once (a bool-
            # valued select lowers to an unsupported i8->i1 truncation)
            zd_val = jnp.where(di > dj,
                               maxv - mrow - (di - dj) * e_del,
                               maxv - mrow - (dj - di) * e_ins)
            zd = zd_val > zdrop
            break_z = (~improved) & (zdrop > Z) & zd
            broke = break_zero | break_z

            # band shrink on the post-write arrays
            nz = (new_ehH != Z) | (new_ehE != Z)
            fwd = nz & (j1 >= beg) & (j1 < end)
            first_nz = jnp.min(jnp.where(fwd, j1, QBIG), axis=0)[None, :]
            beg_s = jnp.minimum(first_nz, end)
            bwd = nz & (j1 >= beg_s) & (j1 <= end)
            last_nz = jnp.max(jnp.where(bwd, j1, beg_s - jnp.int32(1)),
                              axis=0)[None, :]
            end_s = jnp.minimum(last_nz + jnp.int32(2), qlen)

            act2 = active
            deg2 = active0 & degen
            at_end = j1 == end
            ehH[:] = jnp.where(act2, new_ehH,
                               jnp.where(deg2 & at_end, h1_init, ehH[:]))
            ehE[:] = jnp.where(act2, new_ehE,
                               jnp.where(deg2 & at_end, Z, ehE[:]))

            keep = active & ~broke
            upd = active & ~break_zero
            return (i + 1,
                    jnp.where(keep, beg_s, beg),
                    jnp.where(keep, end_s, end),
                    jnp.where(upd, n_maxv, maxv),
                    jnp.where(upd, n_mi, mi),
                    jnp.where(upd, n_mj, mj_),
                    mie, gsc,
                    jnp.where(upd, n_moff, moff),
                    jnp.maximum(done, ((degen & active0) | (active & broke)
                                       ).astype(I32)))

        i, beg, end, maxv, mi, mj_, mie, gsc, moff, done = \
            jax.lax.while_loop(cond, body, init)
        out_ref[0:1, :] = maxv
        out_ref[1:2, :] = mj_ + 1
        out_ref[2:3, :] = mi + 1
        out_ref[3:4, :] = mie + 1
        out_ref[4:5, :] = gsc
        out_ref[5:6, :] = moff
        out_ref[6:7, :] = jnp.zeros((1, tile), I32)
        out_ref[7:8, :] = jnp.zeros((1, tile), I32)

    return kernel


NEG16 = -(1 << 13)


def _make_kernel16(qmax: int, tmax: int, tile: int):
    """int16 row-space variant of _make_kernel: the DP rows (ehH/ehE, the
    query profile, every [qmax, tile] intermediate) run as int16 vectors,
    halving the VPU register count per op — DP scores are bounded by
    qmax*max(mat)+end_bonus, far under 2^15 for real scoring (the caller
    guards). Per-lane reductions and while-loop carries stay int32."""
    QP0 = qmax
    QP1 = qmax + 16       # eh state spans [0, qmax] (+pad to x16 tiles)
    DT = jnp.int16

    def kernel(scal_ref, lane_ref, qp_ref, t_ref, out_ref, ehH, ehE):
        Z = jnp.int32(0)
        Z6 = DT(0)
        M1 = jnp.int32(-1)
        NEGC = DT(NEG16)
        QBIG = DT(qmax + 2)
        o_del = scal_ref[0, 0]
        e_del = scal_ref[0, 1]
        o_ins = scal_ref[0, 2]
        e_ins = scal_ref[0, 3]
        zdrop = scal_ref[0, 4]
        oe_ins6 = DT(0) + (o_ins + e_ins).astype(DT)
        e_ins6 = e_ins.astype(DT)
        oe_del6 = (o_del + e_del).astype(DT)
        e_del6 = e_del.astype(DT)

        qlen = lane_ref[0:1, :]          # [1, TILE] i32
        tlen = lane_ref[1:2, :]
        h0 = lane_ref[2:3, :]
        wv = lane_ref[3:4, :]

        # hardware has no 16-bit iota: generate int32 and narrow
        j1 = jax.lax.broadcasted_iota(I32, (QP1, tile), 0).astype(DT)
        jq = jax.lax.broadcasted_iota(I32, (QP0, tile), 0).astype(DT)
        # Mosaic cannot relayout replicated-sublane i1/i16 rows against
        # (16, 128)-tiled full vectors in EITHER direction ("Invalid
        # relayout" internal error): a bare broadcast_to of a [1, tile]
        # row stays lazily sublane-replicated, and any mask/select mixing
        # it with full vectors trips the bug. Force every broadcast row
        # to a materially full layout by adding a non-foldable full-
        # layout zero (min(iota, 0) — iota is never replicated).
        # arith.minsi/maxsi on i16 vectors do not legalize in this
        # Mosaic release: spell max as compare+select (cmpi/arith.select
        # legalize fine)
        def mx6(a, b):
            return jnp.where(a > b, a, b)

        # iota is nonnegative, so max(-iota, 0) is a full-layout zero
        z_full = mx6(-j1, j1 * Z6)
        z_full0 = mx6(-jq, jq * Z6)

        def full1(row, shape_full):
            return jnp.broadcast_to(row.astype(DT), shape_full.shape) \
                + shape_full

        qlen6 = full1(qlen, z_full)
        h06 = full1(h0, z_full)

        ehH0 = jnp.where(j1 == Z6, h06,
                         mx6(h06 - oe_ins6 - (j1 - DT(1)) * e_ins6,
                             z_full))
        ehH[:] = jnp.where(j1 <= qlen6, ehH0, Z6)
        ehE[:] = jnp.zeros((QP1, tile), DT)

        zero = jnp.zeros((1, tile), I32)
        init = (jnp.int32(0), zero, qlen + Z, h0 + Z, zero + M1,
                zero + M1, zero + M1, zero + M1, zero,
                ((qlen == Z) | (tlen == Z)).astype(I32))

        def cond(c):
            i, beg, end, maxv, mi, mj_, mie, gsc, moff, done = c
            live = ((done == Z) & (i < tlen)).astype(I32)
            return (i < tmax) & (jnp.max(live) > Z)

        def body(c):
            i, beg, end, maxv, mi, mj_, mie, gsc, moff, done = c
            active0 = (done == Z) & (i < tlen)
            beg = jnp.where(active0, jnp.maximum(beg, i - wv), beg)
            end = jnp.where(active0,
                            jnp.minimum(jnp.minimum(end, i + wv + 1), qlen),
                            end)
            degen = beg >= end
            active = active0 & ~degen
            beg6 = full1(beg, z_full0)
            end6 = full1(end, z_full0)
            beg6w = full1(beg, z_full)
            end6w = full1(end, z_full)

            # t stays int32: Mosaic cannot vector.load a single i16
            # sublane row at a dynamic offset ((16,128) tiling)
            trow = full1(t_ref[pl.ds(i, 1), :], z_full0)
            qrow = jnp.zeros((QP0, tile), DT)
            for cc in range(5):
                qrow = jnp.where(trow == DT(cc),
                                 qp_ref[cc * qmax:(cc + 1) * qmax, :], qrow)

            band = (jq >= beg6) & (jq < end6)      # [QP0, TILE]
            Hd = ehH[0:QP0, :]
            Ein = ehE[0:QP0, :]
            M = jnp.where(Hd != Z6, Hd + qrow, Z6)
            M = jnp.where(band, M, Z6)
            Ein_b = jnp.where(band, Ein, Z6)

            T_ins = mx6(M - oe_ins6, z_full0)
            A = jnp.where(band, T_ins + jq * e_ins6, NEGC)
            run = A
            k = 1
            while k < QP0:
                sh = jnp.concatenate(
                    [jnp.full((k, tile), NEG16, DT), run[:-k, :]], axis=0)
                run = mx6(run, sh)
                k <<= 1
            runs = jnp.concatenate(
                [jnp.full((1, tile), NEG16, DT), run[:-1, :]], axis=0)
            F = mx6(runs - (jq - DT(1)) * e_ins6, z_full0 + NEGC)
            F = jnp.where(jq == beg6, Z6, F)
            F = jnp.where(band, F, Z6)
            F = mx6(F, z_full0)

            H = mx6(mx6(M, Ein_b), F)
            H = jnp.where(band, H, Z6)
            Eout = mx6(mx6(M - oe_del6, z_full0),
                       Ein_b - e_del6)
            Eout = jnp.where(band, Eout, Z6)

            h1_init32 = jnp.where(
                beg == Z,
                jnp.maximum(h0 - (o_del + e_del * (i + jnp.int32(1))), Z),
                Z)
            h1_init = full1(h1_init32, z_full)

            Hshift = jnp.concatenate(
                [jnp.zeros((1, tile), DT), H,
                 jnp.zeros((QP1 - QP0 - 1, tile), DT)], axis=0)
            in_write = (j1 > beg6w) & (j1 <= end6w)
            new_ehH = jnp.where(j1 == beg6w, h1_init,
                                jnp.where(in_write, Hshift, ehH[:]))
            band_e = (j1 >= beg6w) & (j1 < end6w)
            Epad = jnp.concatenate(
                [Eout, jnp.zeros((QP1 - QP0, tile), DT)], axis=0)
            new_ehE = jnp.where(band_e, Epad,
                                jnp.where(j1 == end6w, Z6, ehE[:]))

            # Mosaic has no int16 reductions: cast reduce operands to
            # int32 at the boundary (5 casts vs ~40 row ops)
            h1 = jnp.sum(jnp.where(j1 == end6w, Hshift, Z6).astype(I32),
                         axis=0, dtype=I32)[None, :]
            mrow = jnp.max(jnp.where(band, H, Z6).astype(I32),
                           axis=0)[None, :]
            att = band & (H == full1(mrow, z_full0))
            mj = jnp.max(jnp.where(att, jq, DT(-1)).astype(I32),
                         axis=0)[None, :]
            mj = jnp.where(mrow > Z, mj, end - jnp.int32(1))

            j_after = jnp.where(degen, beg, end)
            h1_eff = jnp.where(degen, h1_init32, h1)
            to_end = active0 & (j_after == qlen)
            upd_ie = to_end & (h1_eff >= gsc)
            mie = jnp.where(upd_ie, i, mie)
            gsc = jnp.where(to_end, jnp.maximum(gsc, h1_eff), gsc)

            break_zero = mrow == Z
            improved = mrow > maxv
            n_maxv = jnp.where(improved, mrow, maxv)
            n_mi = jnp.where(improved, i, mi)
            n_mj = jnp.where(improved, mj, mj_)
            n_moff = jnp.where(improved,
                               jnp.maximum(moff, jnp.abs(mj - i)), moff)
            di = i - mi
            dj = mj - mj_
            zd_val = jnp.where(di > dj,
                               maxv - mrow - (di - dj) * e_del,
                               maxv - mrow - (dj - di) * e_ins)
            zd = zd_val > zdrop
            break_z = (~improved) & (zdrop > Z) & zd
            broke = break_zero | break_z

            nz = (new_ehH != Z6) | (new_ehE != Z6)
            fwd = nz & (j1 >= beg6w) & (j1 < end6w)
            first_nz = jnp.min(jnp.where(fwd, j1, QBIG).astype(I32),
                               axis=0)[None, :]
            beg_s = jnp.minimum(first_nz, end)
            beg_s6 = full1(beg_s, z_full)
            bwd = nz & (j1 >= beg_s6) & (j1 <= end6w)
            last_nz = jnp.max(
                jnp.where(bwd, j1, beg_s6 - DT(1)).astype(I32),
                axis=0)[None, :]
            end_s = jnp.minimum(last_nz + jnp.int32(2), qlen)

            # boolean rows broadcast through int16 + full-layout zero
            # (a bare broadcast_to(i1) stays replicated -> relayout bug)
            act2 = full1(active.astype(DT), z_full) != Z6
            deg2 = full1((active0 & degen).astype(DT), z_full) != Z6
            at_end = j1 == end6w
            ehH[:] = jnp.where(act2, new_ehH,
                               jnp.where(deg2 & at_end, h1_init, ehH[:]))
            ehE[:] = jnp.where(act2, new_ehE,
                               jnp.where(deg2 & at_end, Z6, ehE[:]))

            keep = active & ~broke
            upd = active & ~break_zero
            return (i + 1,
                    jnp.where(keep, beg_s, beg),
                    jnp.where(keep, end_s, end),
                    jnp.where(upd, n_maxv, maxv),
                    jnp.where(upd, n_mi, mi),
                    jnp.where(upd, n_mj, mj_),
                    mie, gsc,
                    jnp.where(upd, n_moff, moff),
                    jnp.maximum(done, ((degen & active0) | (active & broke)
                                       ).astype(I32)))

        i, beg, end, maxv, mi, mj_, mie, gsc, moff, done = \
            jax.lax.while_loop(cond, body, init)
        out_ref[0:1, :] = maxv
        out_ref[1:2, :] = mj_ + 1
        out_ref[2:3, :] = mi + 1
        out_ref[3:4, :] = mie + 1
        out_ref[4:5, :] = gsc
        out_ref[5:6, :] = moff
        out_ref[6:7, :] = jnp.zeros((1, tile), I32)
        out_ref[7:8, :] = jnp.zeros((1, tile), I32)

    return kernel


def fits_i16(qmax: int, h0max: int, max_mat: int, end_bonus: int) -> bool:
    """True when every DP row value is bounded inside int16 for this
    scoring: cells are at most h0max (the largest starting score a task
    can carry, seed_len*a <= smem_L*a in the wave path) plus
    (qmax+2)*max_mat of match gain plus the end bonus, and the F-scan
    offset ramp stays above NEG16.

    PARKED off by default: the int16 kernel is exact under the Pallas
    interpreter (see /tmp-free fuzz in tests) but cannot compile on the
    current Mosaic. Round-4 finding chain (each wall hit after dodging
    the previous one on the real toolchain):
      1. "Invalid relayout ... vector<176x256xi1>" on masks mixing
         lazily-replicated broadcast_to rows with full vectors — DODGED
         by materializing every broadcast row through a full-layout zero
         (max(-iota, 0)) and deriving bool rows via int16 compares.
      2. "16-bit iota not supported by hardware" — DODGED (int32 iota,
         narrow).
      3. arith.minsi/maxsi on vector<8x128x2xi16> "failed to legalize"
         — DODGED (compare+select mx6).
      4. arith.cmpi on vector<8x128x2xi16>: "Target does not support
         this comparison" — NOT dodgeable: Mosaic keeps i16 in the
         packed (8,128,2) layout on v5e and supports no comparison
         there, and every DP step needs band masks from compares.
    The restructured kernel is kept for newer toolchains (enable with
    BWA_TPU_EXTEND16=1); the round-4 throughput work went to task-size
    sorting + shape-bucketed kernel variants instead, which give the
    same order of win without fighting the compiler."""
    import os
    if not os.environ.get("BWA_TPU_EXTEND16"):
        return False
    return h0max + (qmax + 2) * max(max_mat, 1) + max(end_bonus, 0) \
        < (1 << 13) - 256


def _extend_pallas(qmax: int, tmax: int, tile: int, interpret: bool,
                   q, qlen, t, tlen, h0, mat, o_del, e_del, o_ins, e_ins,
                   w, end_bonus, zdrop, use16: bool = False):
    """extend_core-compatible entry: q int32[B, qmax] (0..4), t int32[B,
    tmax], per-lane qlen/tlen/h0/w; returns 6 int32[B] vectors
    (score, qle, tle, gtle, gscore, max_off)."""
    B = q.shape[0]
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # per-lane band cap (ksw.c:399-407)
    max_sc = jnp.max(mat).astype(f64)
    qf = qlen.astype(f64)
    ebf = jnp.asarray(end_bonus).astype(f64)
    max_ins = (qf * max_sc + ebf - o_ins.astype(f64)) / e_ins.astype(f64) + 1.
    max_del = (qf * max_sc + ebf - o_del.astype(f64)) / e_del.astype(f64) + 1.
    wv = jnp.minimum(jnp.broadcast_to(w, (B,)),
                     jnp.maximum(max_ins.astype(I32), 1))
    wv = jnp.minimum(wv, jnp.maximum(max_del.astype(I32), 1))

    # pad lanes to the tile and transpose to lane-minor layout
    Bp = -(-B // tile) * tile
    pad = Bp - B

    def padv(v, fill=0):
        return jnp.pad(v.astype(I32), (0, pad), constant_values=fill)

    qT = jnp.pad(q.astype(I32), ((0, pad), (0, 0))).T        # [qmax, Bp]
    tT = jnp.pad(t.astype(I32), ((0, pad), (0, 0))).T        # [tmax, Bp]
    # query profile qp[c*qmax + j, lane] = mat[c, q[lane, j]]
    mat5 = mat[:5, :5].astype(I32)
    qp = mat5[jnp.arange(5, dtype=I32)[:, None, None],
              jnp.clip(qT, 0, 4)[None, :, :]]                # [5, qmax, Bp]
    qp = qp.reshape(5 * qmax, Bp)
    lane = jnp.stack([padv(qlen), padv(tlen), padv(jnp.maximum(h0, 1)),
                      padv(wv, 1),
                      jnp.zeros(Bp, I32), jnp.zeros(Bp, I32),
                      jnp.zeros(Bp, I32), jnp.zeros(Bp, I32)])  # [8, Bp]
    # padding lanes: qlen=0 -> done at init
    scal = jnp.stack([o_del, e_del, o_ins, e_ins,
                      jnp.asarray(zdrop)]).astype(I32).reshape(1, 5)

    grid = (Bp // tile,)

    def _imap(i):
        # x64 makes naive index maps return weak i64 scalars, which
        # Mosaic cannot legalize in func.return
        return (jnp.int32(0), jnp.asarray(i, I32))

    DT = jnp.int16 if use16 else I32
    out = pl.pallas_call(
        (_make_kernel16 if use16 else _make_kernel)(qmax, tmax, tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 5), lambda i: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), _imap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * qmax, tile), _imap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tmax, tile), _imap,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), _imap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Bp), I32),
        scratch_shapes=[
            pltpu.VMEM((qmax + (16 if use16 else 8), tile), DT),
            pltpu.VMEM((qmax + (16 if use16 else 8), tile), DT)],
        interpret=interpret,
    )(scal, lane, qp.astype(DT), tT)
    res = out[:, :B]
    # restore the degenerate-lane contract (qlen==0 or tlen==0):
    # (h0, 0, 0, 0, -1, 0) — matches extend_core's init fall-through
    return (res[0], res[1], res[2], res[3], res[4], res[5])


_extend_pallas_jit = functools.partial(
    jax.jit, static_argnums=(0, 1, 2, 3),
    static_argnames=("use16",))(_extend_pallas)


def extend_core_pallas(qmax: int, tmax: int, q, qlen, t, tlen, h0, mat,
                       o_del, e_del, o_ins, e_ins, w, end_bonus, zdrop,
                       tile: int = 256, interpret: bool | None = None):
    """extend_core-compatible wrapper; interpret defaults to True off-TPU
    (CPU tests drive the Mosaic-free interpreter). The interpret path
    runs unjitted: jit-of-interpreted-pallas trips CPython 3.12's C
    recursion guard while flattening the giant traced loop state."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    fn = _extend_pallas if interpret else _extend_pallas_jit
    return fn(qmax, tmax, tile, interpret, q, qlen, t, tlen,
              h0, mat, o_del, e_del, o_ins, e_ins, w,
              end_bonus, zdrop)
