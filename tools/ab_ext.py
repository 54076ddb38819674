#!/usr/bin/env python
"""A/B: BWA_TPU_EXT=host vs waves on the production SE pipeline, same
process, interleaved passes (round-4 verdict task 3: the device must
earn the hot kernel or the host default must be proven on numbers)."""
import os
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".cache/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, str(ROOT / "tools"))
import bench  # noqa: E402  (repo-root bench.py)


def main():
    rng = np.random.default_rng(1)
    fm, genome = bench.get_index()
    opt = bench.MemOpt()
    reads = bench.make_se_reads(rng, genome, bench.N_E2E)

    runners = {}
    for mode in ("host", "waves"):
        os.environ["BWA_TPU_EXT"] = mode
        runners[mode] = bench.E2ERunner(opt, fm, reads)
        runners[mode].run_pass()     # warm+first timed
    for i in range(3):               # interleaved passes
        for mode in ("host", "waves"):
            got = runners[mode].run_pass()
            print(f"# pass {i} {mode}: {got:.0f} reads/s", flush=True)
    for mode, r in runners.items():
        st = r.pipe.ba.stats
        print(f"{mode:>6}: median {r.rps:.0f} best {r.best_rps:.0f} "
              f"reads/s  ext_dev={st['ext_tasks_device']} "
              f"ext_host={st['ext_tasks_host']}", flush=True)
        r.close()


if __name__ == "__main__":
    main()
