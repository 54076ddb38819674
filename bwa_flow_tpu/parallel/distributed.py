"""Multi-host execution — the MPI master/worker analog (jax.distributed).

The reference scales across nodes with a pull-based MPI scatter of read
batches, per-rank output directories, one Bcast and a final Barrier
(/root/reference/src/mpi/MPIChannel.cpp:138-193, mpi_main.cpp:220-318).
The TPU-native equivalent:

  - `jax.distributed.initialize` forms the process group (coordinator
    address from env or flags) — replacing MPI_Init;
  - input sharding is strided over batch index (each host reads the
    FASTQ and keeps every num_processes-th chunk) — replacing the pull
    scatter; read ids stay globally consistent so hashing/tie-breaks
    match a single-host run;
  - each host runs the full align pipeline and writes its own output
    (the reference's per-rank `<host>-<pid>` dirs);
  - cross-host reductions (stats, duplicate-signature union) ride
    `multihost_utils.process_allgather` over ICI/DCN — replacing the
    mutex/serialized-MPI paths. NB the reference performs markdup
    *per rank* with no cross-rank exchange; `merge_markdup_signatures`
    is an optional strictness improvement over it.
"""

from __future__ import annotations

import os

import numpy as np


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """MPI_Init analog. Returns (process_id, num_processes)."""
    import jax
    if num_processes is None:
        num_processes = int(os.environ.get("BWA_TPU_NPROCS", "1"))
    if num_processes <= 1:
        return 0, 1
    if process_id is None:
        process_id = int(os.environ["BWA_TPU_PROC_ID"])
    if coordinator is None:
        coordinator = os.environ.get("BWA_TPU_COORDINATOR",
                                     "localhost:9911")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return process_id, num_processes


def shard_batches(batches, process_id: int, num_processes: int):
    """Strided batch assignment (the scatter analog). Every host consumes
    the same read-id numbering; only its own shard is aligned."""
    for i, batch in enumerate(batches):
        if i % num_processes == process_id:
            yield batch


def allgather_i64(rows: np.ndarray) -> np.ndarray:
    """All-gather variable-length int64[N, K] rows across hosts (pads to
    the global max and strips). Single-process: identity."""
    import jax
    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils as mhu
    n = np.asarray([rows.shape[0]], dtype=np.int64)
    counts = np.asarray(mhu.process_allgather(n)).reshape(-1)
    cap = int(counts.max())
    k = rows.shape[1] if rows.size else 3
    pad = np.zeros((cap, k), dtype=np.int64)
    pad[:rows.shape[0]] = rows
    gathered = np.asarray(mhu.process_allgather(pad))
    out = [gathered[p, :int(c)] for p, c in enumerate(counts)]
    return np.concatenate(out, axis=0) if out else rows


def merge_markdup_signatures(state) -> None:
    """Union all hosts' duplicate signatures into this host's state
    (optional strictness pass; the reference keeps markdup per rank)."""
    rows = np.asarray(state.signature_items(), dtype=np.int64)
    if rows.size == 0:
        rows = np.zeros((0, 3), dtype=np.int64)
    merged = allgather_i64(rows)
    state.merge(merged.tolist())


def reduce_stats(stats: dict) -> dict:
    """Sum numeric pipeline counters across hosts (final-report analog)."""
    import jax
    if jax.process_count() == 1:
        return dict(stats)
    keys = sorted(stats)
    vals = np.asarray([[float(stats[k]) for k in keys]])
    from jax.experimental import multihost_utils as mhu
    allv = np.asarray(mhu.process_allgather(vals)).reshape(
        jax.process_count(), len(keys))
    return {k: allv[:, i].sum() for i, k in enumerate(keys)}


def barrier() -> None:
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils as mhu
        mhu.sync_global_devices("bwa_flow_tpu_barrier")
