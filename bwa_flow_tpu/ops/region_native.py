"""Native tail-stage wrapper: batched dedup/primary/MAPQ/CIGAR/SAM in C++.

The post-extension tail (RegionsToSam analog) runs in the _region
extension (native/_region.cpp — a byte-exact C++ port of ops/region.py +
ops/align.py + io/sam.py's SE path) with the GIL released, so the tail
thread genuinely overlaps the device driver. PE pairing stays in Python;
its phase-1 dedup uses dedup_batch here.
"""

from __future__ import annotations

import numpy as np

from ..index.fmindex import FMIndex
from ..utils.opts import MEM_F_REF_HDR, MemOpt
from .region import AlnReg

try:
    from .. import _region as _ext
except ImportError:
    _ext = None

_REG_NF = 12


def available() -> bool:
    return _ext is not None


_BNS_CACHE: dict = {}


def _bns_arrays(fm: FMIndex):
    key = id(fm)
    c = _BNS_CACHE.get(key)
    if c is None:
        anns = fm.bns.anns
        ann_off = np.array([a.offset for a in anns], np.int64)
        ann_alt = np.array([1 if a.is_alt else 0 for a in anns], np.uint8)
        names = [a.name.encode() for a in anns]
        name_off = np.zeros(len(names) + 1, np.int64)
        for i, nm in enumerate(names):
            name_off[i + 1] = name_off[i] + len(nm)
        name_cat = b"".join(names)
        pac = np.ascontiguousarray(fm.bns.pac, np.uint8)
        c = (ann_off, ann_alt, name_cat, name_off, pac)
        _BNS_CACHE[key] = c
    return c


def _opt_arrays(opt: MemOpt):
    opti = np.array([opt.a, opt.b, opt.o_del, opt.e_del, opt.o_ins,
                     opt.e_ins, opt.w, opt.T, opt.flag, opt.min_seed_len,
                     opt.max_chain_gap, opt.max_XA_hits,
                     opt.max_XA_hits_alt, opt.mapQ_coef_fac], np.int64)
    optf = np.array([opt.mask_level, opt.mask_level_redun, opt.drop_ratio,
                     opt.XA_drop_ratio, opt.mapQ_coef_len], np.float64)
    mat = np.ascontiguousarray(opt.mat[:5, :5], np.int8)
    return opti, optf, mat


def pack_regs(reg_lists) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """AlnReg lists -> (rows int64[NR,12], frac f64[NR], off int64[n+1])."""
    n = len(reg_lists)
    off = np.zeros(n + 1, np.int64)
    total = sum(len(r) for r in reg_lists)
    rows = np.zeros((total, _REG_NF), np.int64)
    frac = np.zeros(total, np.float64)
    w = 0
    for r, regs in enumerate(reg_lists):
        for p in regs:
            rows[w] = (p.rb, p.re, p.qb, p.qe, p.rid, p.score, p.truesc,
                       p.w, p.seedcov, p.seedlen0, p.csub, p.is_alt)
            frac[w] = p.frac_rep
            w += 1
        off[r + 1] = w
    return rows, frac, off


def unpack_regs(rows_b, frac_b, off_b) -> list:
    """bytes or ndarray packed regions -> AlnReg lists."""
    rows = np.frombuffer(rows_b, np.int64).reshape(-1, _REG_NF) \
        if isinstance(rows_b, bytes) else rows_b.reshape(-1, _REG_NF)
    frac = np.frombuffer(frac_b, np.float64) \
        if isinstance(frac_b, bytes) else frac_b
    off = np.frombuffer(off_b, np.int64) \
        if isinstance(off_b, bytes) else off_b
    out = []
    for r in range(len(off) - 1):
        regs = []
        for i in range(off[r], off[r + 1]):
            f = rows[i]
            regs.append(AlnReg(
                rb=int(f[0]), re=int(f[1]), qb=int(f[2]), qe=int(f[3]),
                rid=int(f[4]), score=int(f[5]), truesc=int(f[6]),
                w=int(f[7]), seedcov=int(f[8]), seedlen0=int(f[9]),
                csub=int(f[10]), is_alt=int(f[11]),
                frac_rep=float(frac[i]), n_comp=1))
        out.append(regs)
    return out


def se_tail_ok(opt: MemOpt, reads) -> bool:
    """Native SE tail handles the default emission path; the rare XR
    (-V) annotation tag and qual-less (FASTA) reads take Python."""
    if _ext is None or (opt.flag & MEM_F_REF_HDR):
        return False
    return all(r.qual is not None for r in reads)


def se_tail_batch(opt: MemOpt, fm: FMIndex, reads, reg_lists,
                  rg_id: str = "", packed=None) -> list[str]:
    """SAM text per read: dedup + alt flags + primary + (-5 reorder) +
    reg2sam, all native. `packed=(rows, frac, off)` skips AlnReg
    marshaling entirely (native wave driver output feeds straight in)."""
    assert _ext is not None
    n = len(reads)
    seq_off = np.zeros(n + 1, np.int64)
    for i, r in enumerate(reads):
        seq_off[i + 1] = seq_off[i] + len(r.seq)
    seq_cat = np.concatenate([np.ascontiguousarray(r.seq, np.uint8)
                              for r in reads]) if n else \
        np.zeros(0, np.uint8)
    qual_cat = "".join(r.qual for r in reads).encode()
    names = [r.name.encode() for r in reads]
    name_off = np.zeros(n + 1, np.int64)
    for i, nm in enumerate(names):
        name_off[i + 1] = name_off[i] + len(nm)
    name_cat = b"".join(names)
    comments = [(r.comment or "").encode() for r in reads]
    com_off = np.zeros(n + 1, np.int64)
    for i, cm in enumerate(comments):
        com_off[i + 1] = com_off[i] + len(cm)
    com_cat = b"".join(comments)
    ids = np.array([r.id for r in reads], np.int64)
    if packed is not None:
        rows, frac, off = packed
        rows = np.ascontiguousarray(rows.reshape(-1, _REG_NF))
    else:
        rows, frac, off = pack_regs(reg_lists)
    ann_off, ann_alt, ann_name_cat, ann_name_off, pac = _bns_arrays(fm)
    opti, optf, mat = _opt_arrays(opt)
    sams = _ext.se_tail_batch(
        seq_cat, seq_off, qual_cat, name_cat, name_off, com_cat, com_off,
        ids, np.ascontiguousarray(rows), frac, off, pac, fm.bns.l_pac,
        ann_off, ann_alt, ann_name_cat, ann_name_off, rg_id.encode(),
        opti, optf, mat)
    return [s.decode() for s in sams]


def dedup_batch(opt: MemOpt, fm: FMIndex, seqs, reg_lists) -> list:
    """Native dedup/patch (+ALT flagging) for PE phase 1; returns AlnReg
    lists."""
    assert _ext is not None
    n = len(seqs)
    seq_off = np.zeros(n + 1, np.int64)
    for i, s in enumerate(seqs):
        seq_off[i + 1] = seq_off[i] + len(s)
    seq_cat = np.concatenate([np.ascontiguousarray(s, np.uint8)
                              for s in seqs]) if n else np.zeros(0, np.uint8)
    rows, frac, off = pack_regs(reg_lists)
    ann_off, ann_alt, _, _, pac = _bns_arrays(fm)
    opti, optf, mat = _opt_arrays(opt)
    rows_b, frac_b, off_b = _ext.dedup_batch(
        seq_cat, seq_off, np.ascontiguousarray(rows), frac, off, pac,
        fm.bns.l_pac, ann_off, ann_alt, opti, optf, mat)
    return unpack_regs(rows_b, frac_b, off_b)


def pe_tail_ok(opt: MemOpt, reads) -> bool:
    if _ext is None or (opt.flag & MEM_F_REF_HDR):
        return False
    return all(r.qual is not None for r in reads)


def _pes_array(pes) -> np.ndarray:
    out = np.zeros(20, np.float64)
    for d in range(4):
        p = pes[d]
        out[d * 5:d * 5 + 5] = (p.low, p.high, p.failed, p.avg, p.std)
    return out


def pe_tail_batch(opt: MemOpt, fm: FMIndex, reads, reg_lists,
                  rg_id: str = "", packed=None, pes0=None):
    """PE tail fully native: dedup + per-batch pestat + mate rescue +
    pairing + SAM for interleaved pairs; GIL released throughout.
    Returns (sams list[str], pes list[PeStat] actually used)."""
    assert _ext is not None
    from .pe import PeStat
    n = len(reads)
    seq_off = np.zeros(n + 1, np.int64)
    for i, r in enumerate(reads):
        seq_off[i + 1] = seq_off[i] + len(r.seq)
    seq_cat = np.concatenate([np.ascontiguousarray(r.seq, np.uint8)
                              for r in reads]) if n else \
        np.zeros(0, np.uint8)
    qual_cat = "".join(r.qual for r in reads).encode()
    names = [r.name.encode() for r in reads]
    name_off = np.zeros(n + 1, np.int64)
    for i, nm in enumerate(names):
        name_off[i + 1] = name_off[i] + len(nm)
    name_cat = b"".join(names)
    comments = [(r.comment or "").encode() for r in reads]
    com_off = np.zeros(n + 1, np.int64)
    for i, cm in enumerate(comments):
        com_off[i + 1] = com_off[i] + len(cm)
    com_cat = b"".join(comments)
    ids = np.array([r.id for r in reads], np.int64)
    if packed is not None:
        rows, frac, off = packed
        rows = np.ascontiguousarray(rows.reshape(-1, _REG_NF))
    else:
        rows, frac, off = pack_regs(reg_lists)
    ann_off, ann_alt, ann_name_cat, ann_name_off, pac = _bns_arrays(fm)
    opti, optf, mat = _opt_arrays(opt)
    pe_ints = np.array([opt.pen_unpaired, opt.max_matesw, opt.max_ins],
                       np.int64)
    pes_in = _pes_array(pes0) if pes0 is not None else None
    sams, pes_b = _ext.pe_tail_batch(
        seq_cat, seq_off, qual_cat, name_cat, name_off, com_cat, com_off,
        ids, np.ascontiguousarray(rows), frac, off, pac, fm.bns.l_pac,
        ann_off, ann_alt, ann_name_cat, ann_name_off, rg_id.encode(),
        opti, optf, mat, pe_ints, pes_in)
    pv = np.frombuffer(pes_b, np.float64)
    pes_used = []
    for d in range(4):
        p = PeStat(low=int(pv[d * 5]), high=int(pv[d * 5 + 1]),
                   failed=int(pv[d * 5 + 2]), avg=float(pv[d * 5 + 3]),
                   std=float(pv[d * 5 + 4]))
        pes_used.append(p)
    return [s.decode() for s in sams], pes_used
