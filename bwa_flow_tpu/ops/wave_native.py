"""Native wave-driver wrapper: the extension stage with zero Python in
the per-task loop.

Chains come straight from _chain.chain_batch_packed as flat arrays; the
_wave driver holds every read's extension state machine (seed ordering,
skip heuristics, band-retry stages, inline scalar fallback for
oversized/non-resident tasks) and the Python side only moves descriptor
waves to the device and results back. Long reads the seed-SW filter
applies to are spliced in from the golden Python path.
"""

from __future__ import annotations

import numpy as np

from ..index.fmindex import FMIndex
from ..utils.opts import MemOpt
from . import chain_native, region_native

try:
    from .. import _wave as _ext
except ImportError:
    _ext = None


def available() -> bool:
    return (_ext is not None and chain_native.available()
            and region_native.available())


_BNS_CACHE: dict = {}


def _bns_arrays(fm: FMIndex):
    """(ann_off, pac_or_capsule): when the extension provides make_ref,
    pac+ann copy ONCE into a shared C++ RefBlock capsule that every
    per-batch driver borrows (the per-batch pac copy measured ~1 s on a
    1 Gbp genome); otherwise the raw arrays are passed and copied."""
    key = id(fm)
    c = _BNS_CACHE.get(key)
    if c is None:
        anns = fm.bns.anns
        ann_off = np.array([a.offset for a in anns], np.int64)
        pac = np.ascontiguousarray(fm.bns.pac, np.uint8)
        if hasattr(_ext, "make_ref"):
            c = (ann_off, _ext.make_ref(pac, ann_off))
        else:  # pragma: no cover - stale extension build
            c = (ann_off, pac)
        _BNS_CACHE[key] = c
    return c


def create_driver(opt: MemOpt, fm: FMIndex, seqs, all_intvs, sa_flat,
                  dev_flags: np.ndarray, qmax: int, tmax: int, cap: int):
    """Returns (driver_capsule, needs_py list). needs_py reads have no
    chains in the driver and must be spliced in by the caller."""
    vals, off, _ = sa_flat
    n = len(seqs)
    l_query = np.fromiter((len(s) for s in seqs), np.int32, n)
    iv_off, x0, sv, st, en = chain_native.intv_arrays(all_intvs)
    ann_off, pac = _bns_arrays(fm)
    ann_off_c, ann_alt = chain_native.ann_arrays(fm)
    from .. import _chain as _chain_ext
    needs_py_b, chain_off, chain_rid, chain_frac, seed_off, seeds = \
        _chain_ext.chain_batch_packed(
            l_query, iv_off, x0, sv, st, en,
            np.ascontiguousarray(off, np.int64),
            np.ascontiguousarray(vals, np.int64),
            ann_off_c, ann_alt, fm.bns.l_pac,
            opt.min_seed_len, opt.max_occ, opt.max_chain_gap, opt.w,
            opt.min_chain_weight, opt.max_chain_extend,
            float(opt.drop_ratio), float(opt.mask_level))
    seq_off = np.zeros(n + 1, np.int64)
    for r, sq in enumerate(seqs):
        seq_off[r + 1] = seq_off[r] + len(sq)
    seq_cat = np.concatenate(
        [np.ascontiguousarray(sq, np.uint8) for sq in seqs]) if n else \
        np.zeros(0, np.uint8)
    opti = np.array([opt.a, opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                     opt.w, opt.zdrop, opt.pen_clip5, opt.pen_clip3],
                    np.int64)
    mat = np.ascontiguousarray(opt.mat[:5, :5], np.int8)
    ann_arg = None if not isinstance(pac, np.ndarray) else ann_off
    wd = _ext.create(seq_cat, seq_off, np.ascontiguousarray(dev_flags),
                     chain_off, chain_rid, chain_frac, seed_off, seeds,
                     pac, fm.bns.l_pac, ann_arg, opti, mat,
                     qmax, tmax, cap)
    needs = [r for r in range(n) if needs_py_b[r]]
    return wd, needs


def pack(wd, stream, reserve=0, qsmall=0):
    """Pack the next wave: (slots bytes, desc bytes, n_small) or None.
    qsmall > 0 partitions slots [0:n_small) as the small-shape class
    (both query sides <= qsmall) for the caller's small kernel variant;
    slots are cost-sorted within each class for tile homogeneity."""
    return _ext.pack(wd, stream, reserve, qsmall)


host_tasks = lambda wd: _ext.host_tasks(wd)
n_pending = lambda wd: _ext.n_pending(wd)


def can_steal() -> bool:
    """Guard for stale _wave builds predating the harvester API."""
    return _ext is not None and hasattr(_ext, "steal")


def steal(wd, max_reads: int) -> int:
    """Claim up to max_reads pending reads and run them to completion on
    the exact scalar kernel (GIL released) — harvester-thread entry for
    CPU+device work sharing (the reference's accx_priority,
    kflow/include/kflow/MapStage.h:78-116)."""
    return _ext.steal(wd, max_reads)
apply_results = lambda wd, stream, out: _ext.apply(
    wd, stream, np.ascontiguousarray(out))


def can_drain() -> bool:
    """Guard for stale _wave builds predating drain/n_pending (an
    AttributeError mid-run would otherwise silently degrade the whole
    run to the host path)."""
    return _ext is not None and hasattr(_ext, "drain") \
        and hasattr(_ext, "n_pending")


def drain(wd) -> int:
    """Finish every pending (not in-flight) read on the exact scalar
    kernel; returns tasks run. Near-empty tail waves cost a full device
    round trip but only ~ms on the host."""
    return _ext.drain(wd)


def finish(wd):
    rows_b, frac_b, off_b = _ext.finish(wd)
    rows = np.frombuffer(rows_b, np.int64).reshape(-1, 12)
    frac = np.frombuffer(frac_b, np.float64)
    off = np.frombuffer(off_b, np.int64)
    return rows, frac, off


def splice(rows, frac, off, py_regs: dict):
    """Replace the (empty) entries of needs_py reads with Python regs."""
    if not py_regs:
        return rows, frac, off
    n = len(off) - 1
    lists = region_native.unpack_regs(rows, frac, off)
    for r, regs in py_regs.items():
        lists[r] = regs
    return region_native.pack_regs(lists)
