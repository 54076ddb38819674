"""Production multi-chip data parallelism (round-4 verdict task 7): the
PRODUCTION pipeline sharded over a virtual CPU device mesh must produce
byte-identical SAM to the single-device run.

conftest forces JAX_PLATFORMS=cpu with xla_force_host_platform_device
_count=8, so jax.local_devices() exposes 8 virtual devices; BatchAligner
(n_local_devices=N) replicates the index per device and splits every
batch into per-device shards with their own seed machines, SA walks and
wave drivers — the reference's one-work-queue-feeding-every-PE model
(/root/reference/src/fpga/BWAOCLEnv.h:232-269)."""

import numpy as np
import pytest

import oracle as orc

pytestmark = pytest.mark.skipif(orc.build_oracle() is None,
                                reason="fixture tooling unavailable")


def _make_fixture(seed, n_reads=96, glen=30000):
    rng = np.random.default_rng(seed)
    contigs = orc.make_ref(rng, [("chr1", glen)], repeat_frac=0.15)
    from bwa_flow_tpu.index.build import build_index
    fm = build_index([(n, "", s) for n, s in contigs])
    reads = orc.sample_se(rng, contigs, n_reads, read_len=101)
    from bwa_flow_tpu.io.sam import Read
    code = np.full(256, 4, np.uint8)
    for i, c in enumerate(b"ACGT"):
        code[c] = i
    rds = [Read(name=nm, seq=code[np.frombuffer(sq, np.uint8)],
                qual=q.decode(), id=i)
           for i, (nm, sq, q) in enumerate(reads)]
    return fm, rds


def _run(fm, reads, n_dev):
    from bwa_flow_tpu.pipeline.dataflow import AlignPipeline
    from bwa_flow_tpu.utils.opts import MemOpt
    opt = MemOpt()
    pipe = AlignPipeline(opt, fm, paired=False, n_workers=0,
                         aligner_kw=dict(n_local_devices=n_dev,
                                         wave_cap=256, smem_L=128))
    done = []
    try:
        pipe.run(iter([reads[i:i + 48] for i in range(0, len(reads), 48)]),
                 done.extend)
    finally:
        pipe.close()
    assert pipe.ba.stats["device_errors"] == 0, pipe.ba.stats
    return [r.sam for r in done], pipe.ba.stats


def test_two_device_production_equality():
    import jax
    assert len(jax.local_devices()) >= 2
    fm, reads = _make_fixture(91)
    one, _ = _run(fm, [r for r in reads], None)
    import copy
    fm2, reads2 = _make_fixture(91)
    two, stats = _run(fm2, reads2, 2)
    assert two == one
    # the shards really ran (both devices' drivers packed work)
    assert stats["reads"] == len(reads)


def test_three_device_sharding_smoke():
    """Non-pow2 device count: shard bounds cover the batch exactly."""
    import jax
    assert len(jax.local_devices()) >= 3
    fm, reads = _make_fixture(92, n_reads=50)
    one, _ = _run(fm, [r for r in reads], None)
    fm2, reads2 = _make_fixture(92, n_reads=50)
    three, _ = _run(fm2, reads2, 3)
    assert three == one
