"""Multi-chip scaling: device mesh, read sharding, collective merges.

The reference scales with MPI pull-based scatter of read batches plus
per-rank output (/root/reference/src/mpi/MPIChannel.cpp:138-193,
mpi_main.cpp:220-318). The TPU-native equivalent (SURVEY.md §5/§7):

  - data parallelism over reads: batches sharded over a 1-D `dp` mesh axis
    (the MPI scatter analog, but compiler-scheduled over ICI);
  - the FM-index is *replicated* per device, exactly as the reference
    uploads the reference genome to every FPGA DDR
    (/root/reference/src/fpga/BWAOCLEnv.h:67-216);
  - cross-device statistics (insert-size stats for PE pairing, duplicate
    signatures) merge with psum/all_gather collectives instead of the
    reference's mutex/serialized-MPI paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.chain2aln_jax import seed_extend_batch
from ..ops.fm_jax import DeviceFM
from ..ops.smem_jax import collect_intv_device


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicate_fm(dfm: DeviceFM, mesh: Mesh) -> DeviceFM:
    """Replicate the index on every device of the mesh (BWAOCLEnv analog)."""
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), dfm)


def shard_reads(q: np.ndarray, qlen: np.ndarray, mesh: Mesh,
                axis: str = "dp"):
    """Place a [B, L] read batch with B sharded over the mesh axis."""
    sq = NamedSharding(mesh, P(axis, None))
    sl = NamedSharding(mesh, P(axis))
    return (jax.device_put(jnp.asarray(q), sq),
            jax.device_put(jnp.asarray(qlen), sl))


def sharded_seed_step(mesh: Mesh, L: int, MAXB: int, MAXM: int, ITERS: int,
                      axis: str = "dp"):
    """Build the jitted multi-chip seeding step: per-device SMEM machine on
    the local read shard + a psum'd seed-count histogram (the collective
    merge that PE insert-size inference and markdup signature exchange ride
    on in the full pipeline)."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(axis, None, None), P(axis), P(axis), P()),
        # while_loop carries start as unvarying constants and become
        # device-varying; skip the static VMA check
        check_vma=False)
    def step(dfm, q, qlen):
        mems, n_mem, ovf, _occ_sa, _occ_total = collect_intv_device(
            dfm, L, MAXB, MAXM, ITERS, q, qlen,
            jnp.asarray(19, jnp.int32), jnp.asarray(28, jnp.int32),
            jnp.asarray(10, jnp.int32), jnp.asarray(20, jnp.int64),
            jnp.asarray(500, jnp.int64))
        # global seed-count histogram over all chips (pestat-merge analog)
        hist = jnp.zeros((MAXM + 1,), jnp.int32).at[
            jnp.clip(n_mem, 0, MAXM)].add(1)
        hist = jax.lax.psum(hist, axis)
        return mems, n_mem, ovf, hist

    return jax.jit(step)


def sharded_align_step(mesh: Mesh, L: int, MAXB: int, MAXM: int,
                       ITERS: int, QMAX: int, TMAX: int, axis: str = "dp"):
    """The FULL per-batch device step, sharded over the dp mesh: the SMEM
    seeding machine *and* the coupled banded-extension kernel on each
    chip's read shard, plus the two collective merges the production
    pipeline rides on — a psum'd seed histogram (markdup-signature merge
    analog) and a psum'd extension-score sum (global PE insert-size /
    pestat merge analog). This is the multi-chip analog of the
    reference's per-node compute_flow (mpi_main.cpp:309-317) with XLA
    collectives replacing the MPI channels."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis),
                  P(axis, None), P(axis), P(axis, None), P(axis),
                  P(axis), P()),
        out_specs=(P(axis, None, None), P(axis), P(axis, None), P(), P()),
        check_vma=False)
    def step(dfm, q, qlen, qr_q, qr_n, tr_t, tr_n, h0, mat):
        i32 = lambda v: jnp.asarray(v, jnp.int32)
        mems, n_mem, ovf, _occ_sa, _occ_total = collect_intv_device(
            dfm, L, MAXB, MAXM, ITERS, q, qlen,
            i32(19), i32(28), i32(10),
            jnp.asarray(20, jnp.int64), jnp.asarray(500, jnp.int64))
        B = q.shape[0]
        z_t = jnp.zeros((B, TMAX), jnp.int32)
        ext = seed_extend_batch(
            QMAX, TMAX, jnp.zeros((B, QMAX), jnp.int32),
            jnp.zeros(B, jnp.int32), z_t, jnp.zeros(B, jnp.int32),
            qr_q, qr_n, tr_t, tr_n, h0, mat,
            i32(6), i32(1), i32(6), i32(1), i32(100), i32(5), i32(5),
            i32(100))
        rscore = ext[6]
        hist = jnp.zeros((MAXM + 1,), jnp.int32).at[
            jnp.clip(n_mem, 0, MAXM)].add(1)
        hist = jax.lax.psum(hist, axis)
        score_sum = jax.lax.psum(rscore.sum(dtype=jnp.int64), axis)
        return mems, n_mem, jnp.stack([rscore,
                                       ovf.astype(rscore.dtype)], axis=1), \
            hist, score_sum

    return jax.jit(step)
