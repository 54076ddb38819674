"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (mirrors how the driver
validates multi-chip sharding without real chips)."""

import os

# Force CPU. Two traps in this environment:
#  1. the session env pins JAX_PLATFORMS to the real-TPU tunnel (axon);
#  2. /root/.axon_site/sitecustomize.py runs at interpreter start, imports
#     jax and calls jax.config.update("jax_platforms", "axon,cpu") — which
#     OVERRIDES the env var. So env manipulation alone is not enough; the
#     config must be re-updated after import. Without this, "CPU" tests
#     silently run on the TPU through the remote-compile tunnel (large
#     programs hang for minutes there).
os.environ["JAX_PLATFORMS"] = os.environ.get("BWA_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms",
                  os.environ.get("BWA_TPU_TEST_PLATFORM", "cpu"))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xB3A)


def make_genome(rng, length, n_contigs=1, with_n=False):
    """Random multi-contig genome as FASTA-style contig tuples."""
    contigs = []
    per = length // n_contigs
    for i in range(n_contigs):
        bases = rng.integers(0, 4, size=per)
        seq = np.frombuffer(b"ACGT", dtype=np.uint8)[bases].copy()
        if with_n and per > 50:
            # sprinkle an N run
            start = int(rng.integers(10, per - 20))
            seq[start:start + 5] = ord("N")
        contigs.append((f"ctg{i}", "", seq.tobytes()))
    return contigs


@pytest.fixture(scope="session")
def small_index(rng):
    from bwa_flow_tpu.index.build import build_index
    contigs = make_genome(rng, 6000, n_contigs=2, with_n=True)
    return build_index(contigs), contigs
