// bwa_flow_tpu native SE tail stage (CPython extension).
//
// Post-extension host work for a BATCH of reads: region dedup/patch,
// primary marking, MAPQ, CIGAR/NM/MD generation and SAM text emission —
// the RegionsToSam role the reference runs in C
// (src/Pipeline.cpp:546-648 over bwa/bwamem.c). C++ port of this repo's
// own golden Python specification (ops/region.py, ops/align.py,
// io/sam.py) — byte-exact against it, enforced by
// tests/test_native_region.py and the real-bwa oracle suite. The heavy
// loop runs with the GIL released so the tail thread truly overlaps the
// device driver.
//
// Build: python setup.py build_ext --inplace  (g++, no external deps)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "introsort.h"
#include "ksw_impl.h"

namespace {

using bwaflow::ks_introsort;

constexpr double PATCH_MAX_R_BW = 0.05;
constexpr double PATCH_MIN_SC_RATIO = 0.90;
constexpr double MEM_MAPQ_COEF = 30.0;
constexpr int32_t INT32_MAXV = 0x7fffffff;

// MEM_F_* flags (golden: utils/opts.py)
constexpr int F_ALL = 0x8;
constexpr int F_NO_MULTI = 0x10;
constexpr int F_PRIMARY5 = 0x800;
constexpr int F_KEEP_SUPP_MAPQ = 0x1000;
constexpr int F_SOFTCLIP = 0x200;
constexpr int F_XB = 0x2000;

struct Opt {
  int32_t a, b, o_del, e_del, o_ins, e_ins, w, T, flag, min_seed_len,
      max_chain_gap, max_XA_hits, max_XA_hits_alt, mapQ_coef_fac;
  double mask_level, mask_level_redun, drop_ratio, XA_drop_ratio,
      mapQ_coef_len;
  int8_t mat[25];
};

struct Bns {
  const uint8_t* pac;
  int64_t l_pac;
  const int64_t* offsets;
  int64_t n_ctg;
  const char* name_cat;
  const int64_t* name_off;

  int32_t pos2rid(int64_t pos_f) const {
    const int64_t* e = offsets + n_ctg;
    return (int32_t)(std::upper_bound(offsets, e, pos_f) - offsets) - 1;
  }
  std::string name(int32_t rid) const {
    return std::string(name_cat + name_off[rid],
                       name_cat + name_off[rid + 1]);
  }
  // golden fmindex.get_seq: bases [beg, end) of the fw-rev coordinate
  // space; empty when bridging the strand boundary
  void get_seq(int64_t beg, int64_t end, std::vector<uint8_t>* out) const {
    out->clear();
    if (end < beg) std::swap(beg, end);
    end = std::min(end, l_pac << 1);
    beg = std::max(beg, (int64_t)0);
    if (beg < l_pac && end > l_pac) return;  // bridges
    bool rev = beg >= l_pac;
    int64_t bf = rev ? (l_pac << 1) - end : beg;
    int64_t ef = rev ? (l_pac << 1) - beg : end;
    out->reserve(ef - bf);
    for (int64_t p = bf; p < ef; ++p)
      out->push_back((pac[p >> 2] >> ((~p & 3) << 1)) & 3);
    if (rev) {
      std::reverse(out->begin(), out->end());
      for (uint8_t& c : *out) c = 3 - c;
    }
  }
};

// mem_alnreg_t equivalent (golden: ops/region.py AlnReg)
struct Reg {
  int64_t rb, re;
  int32_t qb, qe, rid, score, truesc, sub, alt_sc, csub, sub_n, w, seedcov,
      secondary, secondary_all, seedlen0, n_comp, is_alt;
  double frac_rep;
  uint64_t hash;
};

// golden region.py hash_64 (bwa/utils.h:98-108)
uint64_t hash_64(uint64_t key) {
  key = key + ~(key << 32);
  key ^= key >> 22;
  key = key + ~(key << 13);
  key ^= key >> 8;
  key = key + (key << 3);
  key ^= key >> 15;
  key = key + ~(key << 27);
  key ^= key >> 31;
  return key;
}

// golden align.py:40-45
int64_t infer_bw(int64_t l1, int64_t l2, int64_t score, int64_t a,
                 int64_t q, int64_t r) {
  if (l1 == l2 && l1 * a - score < ((q + r - a) << 1)) return 0;
  int64_t w = (int64_t)((double)(std::min(l1, l2) * a - score - q) / r + 2.0);
  return std::max(w, (int64_t)std::llabs(l1 - l2));
}

struct CigarOp { int op, len; };

// golden align.py gen_cigar2 (bwa_gen_cigar2 semantics)
int64_t gen_cigar2(const Opt& opt, const Bns& bns, int64_t w_,
                   int32_t l_query, const uint8_t* query_in, int64_t rb,
                   int64_t re, bool want_cigar,
                   std::vector<CigarOp>* cigar, int32_t* NM,
                   std::string* md) {
  cigar->clear();
  *NM = -1;
  md->clear();
  if (l_query <= 0 || rb >= re || (rb < bns.l_pac && re > bns.l_pac))
    return 0;
  std::vector<uint8_t> rseq;
  bns.get_seq(rb, re, &rseq);
  int64_t rlen = (int64_t)rseq.size();
  if (re - rb != rlen) return 0;
  std::vector<uint8_t> query(query_in, query_in + l_query);
  if (rb >= bns.l_pac) {
    std::reverse(query.begin(), query.end());
    std::reverse(rseq.begin(), rseq.end());
  }
  int64_t score;
  if (l_query == re - rb && w_ == 0) {  // no-gap shortcut
    if (want_cigar) cigar->push_back({0, l_query});
    score = 0;
    for (int32_t i = 0; i < l_query; ++i)
      score += opt.mat[rseq[i] * 5 + query[i]];
  } else {
    int64_t max_ins = (int64_t)((double)(((l_query + 1) >> 1) * opt.mat[0]
                                         - opt.o_ins) / opt.e_ins + 1.0);
    int64_t max_del = (int64_t)((double)(((l_query + 1) >> 1) * opt.mat[0]
                                         - opt.o_del) / opt.e_del + 1.0);
    int64_t max_gap = std::max(std::max(max_ins, max_del), (int64_t)1);
    int64_t w = (max_gap + std::llabs(rlen - l_query) + 1) >> 1;
    w = std::min(w, w_);
    int64_t min_w = std::llabs(rlen - l_query) + 3;
    w = std::max(w, min_w);
    std::vector<std::pair<int, int>> cg;
    score = bwaflow::ksw_global2(l_query, query.data(), (int)rlen,
                                 rseq.data(), opt.mat, 5, opt.o_del,
                                 opt.e_del, opt.o_ins, opt.e_ins, (int)w,
                                 want_cigar, &cg);
    for (auto& pr : cg) cigar->push_back({pr.first, pr.second});
  }
  if (want_cigar) {  // NM + MD
    static const char* FWD = "ACGTN";
    static const char* REV = "TGCAN";
    const char* int2base = rb < bns.l_pac ? FWD : REV;
    int64_t n_mm = 0, n_gap = 0, x = 0, y = 0, u = 0;
    char buf[32];
    for (size_t k = 0; k < cigar->size(); ++k) {
      int op = (*cigar)[k].op, ln = (*cigar)[k].len;
      if (op == 0) {
        for (int i = 0; i < ln; ++i) {
          if (query[x + i] != rseq[y + i]) {
            snprintf(buf, sizeof buf, "%lld", (long long)u);
            *md += buf;
            *md += int2base[rseq[y + i]];
            ++n_mm;
            u = 0;
          } else {
            ++u;
          }
        }
        x += ln; y += ln;
      } else if (op == 2) {
        if (k > 0 && k + 1 < cigar->size()) {
          snprintf(buf, sizeof buf, "%lld", (long long)u);
          *md += buf;
          *md += '^';
          for (int i = 0; i < ln; ++i) *md += int2base[rseq[y + i]];
          u = 0;
          n_gap += ln;
        }
        y += ln;
      } else if (op == 1) {
        x += ln;
        n_gap += ln;
      }
    }
    snprintf(buf, sizeof buf, "%lld", (long long)u);
    *md += buf;
    *NM = (int32_t)(n_mm + n_gap);
  }
  return score;
}

// golden region.py mem_approx_mapq_se
int32_t approx_mapq_se(const Opt& opt, const Reg& a) {
  int64_t sub = a.sub ? a.sub : (int64_t)opt.min_seed_len * opt.a;
  sub = std::max((int64_t)a.csub, sub);
  if (sub >= a.score) return 0;
  int64_t l = std::max((int64_t)(a.qe - a.qb), a.re - a.rb);
  double identity =
      1.0 - (double)(l * opt.a - a.score) / (opt.a + opt.b) / l;
  int64_t mapq;
  if (a.score == 0) {
    mapq = 0;
  } else if (opt.mapQ_coef_len > 0) {
    double tmp = l < opt.mapQ_coef_len
                     ? 1.0
                     : (double)opt.mapQ_coef_fac / std::log((double)l);
    tmp *= identity * identity;
    mapq = (int64_t)(6.02 * (a.score - sub) / opt.a * tmp * tmp + 0.499);
  } else {
    mapq = (int64_t)(MEM_MAPQ_COEF * (1.0 - (double)sub / a.score) *
                         std::log((double)a.seedcov) + 0.499);
    if (identity < 0.95)
      mapq = (int64_t)(mapq * identity * identity + 0.499);
  }
  if (a.sub_n > 0)
    mapq -= (int64_t)(4.343 * std::log((double)a.sub_n + 1) + 0.499);
  mapq = std::min(mapq, (int64_t)60);
  mapq = std::max(mapq, (int64_t)0);
  return (int32_t)(mapq * (1.0 - a.frac_rep) + 0.499);
}

// golden region.py mem_patch_reg
int64_t patch_reg(const Opt& opt, const Bns& bns, const uint8_t* query,
                  const Reg& a, const Reg& b, int64_t* w_out) {
  if (a.rb < bns.l_pac && bns.l_pac <= b.rb) return 0;
  if (a.qb >= b.qb || a.qe >= b.qe || a.re >= b.re) return 0;
  int64_t w = std::llabs((a.re - b.rb) - (int64_t)(a.qe - b.qb));
  double r = std::fabs((double)(a.re - b.rb) / (b.re - a.rb) -
                       (double)(a.qe - b.qb) / (b.qe - a.qb));
  if (a.re < b.rb || a.qe < b.qb) {
    if (w > (int64_t)opt.w << 1 || r >= PATCH_MAX_R_BW) return 0;
  } else if (w > (int64_t)opt.w << 2 || r >= PATCH_MAX_R_BW * 2) {
    return 0;
  }
  w += a.w + b.w;
  w = std::min(w, (int64_t)opt.w << 2);
  std::vector<CigarOp> cg;
  int32_t NM;
  std::string md;
  int64_t score = gen_cigar2(opt, bns, w, b.qe - a.qb, query + a.qb, a.rb,
                             b.re, false, &cg, &NM, &md);
  int64_t q_s = (int64_t)((double)(b.qe - a.qb) /
                              ((b.qe - b.qb) + (a.qe - a.qb)) *
                              (b.score + a.score) + 0.499);
  int64_t r_s = (int64_t)((double)(b.re - a.rb) /
                              ((b.re - b.rb) + (a.re - a.rb)) *
                              (b.score + a.score) + 0.499);
  if ((double)score / std::max(q_s, r_s) < PATCH_MIN_SC_RATIO) return 0;
  *w_out = w;
  return score;
}

// golden region.py mem_sort_dedup_patch
void dedup_patch(const Opt& opt, const Bns& bns, const uint8_t* query,
                 std::vector<Reg>& regs) {
  int64_t n = (int64_t)regs.size();
  if (n <= 1) return;
  std::vector<Reg>& a = regs;
  ks_introsort(a, [](const Reg& x, const Reg& y) { return x.re < y.re; });
  for (Reg& p : a) p.n_comp = 1;
  for (int64_t i = 1; i < n; ++i) {
    Reg& p = a[i];
    if (p.rid != a[i - 1].rid || p.rb >= a[i - 1].re + opt.max_chain_gap)
      continue;
    for (int64_t j = i - 1;
         j >= 0 && p.rid == a[j].rid && p.rb < a[j].re + opt.max_chain_gap;
         --j) {
      Reg& q = a[j];
      if (q.qe == q.qb) continue;  // excluded
      int64_t o_r = q.re - p.rb;
      int64_t o_q = q.qb < p.qb ? (int64_t)(q.qe - p.qb)
                                : (int64_t)(p.qe - q.qb);
      int64_t m_r = std::min(q.re - q.rb, p.re - p.rb);
      int64_t m_q = std::min((int64_t)(q.qe - q.qb), (int64_t)(p.qe - p.qb));
      if (o_r > opt.mask_level_redun * m_r &&
          o_q > opt.mask_level_redun * m_q) {
        if (p.score < q.score) {
          p.qe = p.qb;
          break;
        } else {
          q.qe = q.qb;
        }
      } else if (q.rb < p.rb) {
        int64_t w = 0;
        int64_t score = patch_reg(opt, bns, query, q, p, &w);
        if (score > 0) {  // merge q into p
          p.n_comp += q.n_comp + 1;
          p.seedcov = std::max(p.seedcov, q.seedcov);
          p.sub = std::max(p.sub, q.sub);
          p.csub = std::max(p.csub, q.csub);
          p.qb = q.qb;
          p.rb = q.rb;
          p.truesc = p.score = (int32_t)score;
          p.w = (int32_t)w;
          q.qb = q.qe;
        }
      }
    }
  }
  std::vector<Reg> kept;
  kept.reserve(a.size());
  for (Reg& p : a)
    if (p.qe > p.qb) kept.push_back(p);
  a.swap(kept);
  ks_introsort(a, [](const Reg& x, const Reg& y) {
    return x.score > y.score ||
           (x.score == y.score &&
            (x.rb < y.rb || (x.rb == y.rb && x.qb < y.qb)));
  });
  for (size_t i = 1; i < a.size(); ++i)
    if (a[i].score == a[i - 1].score && a[i].rb == a[i - 1].rb &&
        a[i].qb == a[i - 1].qb)
      a[i].qe = a[i].qb;
  kept.clear();
  for (size_t i = 0; i < a.size(); ++i)
    if (i == 0 || a[i].qe > a[i].qb) kept.push_back(a[i]);
  a.swap(kept);
}

// golden region.py _mark_primary_core
void mark_primary_core(const Opt& opt, std::vector<Reg>& a, int64_t n) {
  int64_t tmp = std::max((int64_t)opt.a + opt.b,
                         std::max((int64_t)opt.o_del + opt.e_del,
                                  (int64_t)opt.o_ins + opt.e_ins));
  std::vector<int64_t> z{0};
  for (int64_t i = 1; i < n; ++i) {
    int64_t found = -1;
    for (int64_t k : z) {
      int64_t b_max = std::max(a[k].qb, a[i].qb);
      int64_t e_min = std::min(a[k].qe, a[i].qe);
      if (e_min > b_max) {
        int64_t min_l = std::min((int64_t)(a[i].qe - a[i].qb),
                                 (int64_t)(a[k].qe - a[k].qb));
        if (e_min - b_max >= min_l * opt.mask_level) {
          if (a[k].sub == 0) a[k].sub = a[i].score;
          if (a[k].score - a[i].score <= tmp &&
              (a[k].is_alt || !a[i].is_alt))
            ++a[k].sub_n;
          found = k;
          break;
        }
      }
    }
    if (found < 0) z.push_back(i);
    else a[i].secondary = (int32_t)found;
  }
}

// golden region.py mem_mark_primary_se
int64_t mark_primary_se(const Opt& opt, std::vector<Reg>& a, int64_t rid_) {
  int64_t n = (int64_t)a.size();
  if (n == 0) return 0;
  int64_t n_pri = 0;
  for (int64_t i = 0; i < n; ++i) {
    Reg& p = a[i];
    p.sub = p.alt_sc = 0;
    p.secondary = p.secondary_all = -1;
    p.hash = hash_64((uint64_t)(rid_ + i));
    if (!p.is_alt) ++n_pri;
  }
  ks_introsort(a, [](const Reg& x, const Reg& y) {  // alnreg_hlt
    return x.score > y.score ||
           (x.score == y.score &&
            (x.is_alt < y.is_alt ||
             (x.is_alt == y.is_alt && x.hash < y.hash)));
  });
  mark_primary_core(opt, a, n);
  for (int64_t i = 0; i < n; ++i) {
    Reg& p = a[i];
    p.secondary_all = (int32_t)i;
    if (!p.is_alt && p.secondary >= 0 && a[p.secondary].is_alt)
      p.alt_sc = a[p.secondary].score;
  }
  if (0 <= n_pri && n_pri < n) {
    if (n_pri > 0) {
      ks_introsort(a, [](const Reg& x, const Reg& y) {  // alnreg_hlt2
        return x.is_alt < y.is_alt ||
               (x.is_alt == y.is_alt &&
                (x.score > y.score ||
                 (x.score == y.score && x.hash < y.hash)));
      });
    }
    std::vector<int64_t> z(n);
    for (int64_t i = 0; i < n; ++i) z[a[i].secondary_all] = i;
    for (int64_t i = 0; i < n; ++i) {
      Reg& p = a[i];
      if (p.secondary >= 0) {
        p.secondary_all = (int32_t)z[p.secondary];
        if (p.is_alt) p.secondary = INT32_MAXV;
      } else {
        p.secondary_all = -1;
      }
    }
    if (n_pri > 0) {
      for (int64_t i = 0; i < n_pri; ++i) {
        a[i].sub = 0;
        a[i].secondary = -1;
      }
      mark_primary_core(opt, a, n_pri);
    }
  } else {
    for (Reg& p : a) p.secondary_all = p.secondary;
  }
  return n_pri;
}

// golden region.py mem_reorder_primary5
void reorder_primary5(int32_t T, std::vector<Reg>& a) {
  int64_t n_pri = 0;
  for (const Reg& p : a)
    if (p.secondary < 0 && !p.is_alt && p.score >= T) ++n_pri;
  if (n_pri <= 1) return;
  int64_t left_st = INT32_MAXV, left_k = -1;
  for (int64_t k = 0; k < (int64_t)a.size(); ++k) {
    const Reg& p = a[k];
    if (p.secondary >= 0 || p.is_alt || p.score < T) continue;
    if (p.qb < left_st) { left_st = p.qb; left_k = k; }
  }
  if (left_k == 0) return;
  std::swap(a[0], a[left_k]);
  for (int64_t k = 1; k < (int64_t)a.size(); ++k) {
    Reg& p = a[k];
    if (p.secondary == 0) p.secondary = (int32_t)left_k;
    else if (p.secondary == left_k) p.secondary = 0;
    if (p.secondary_all == 0) p.secondary_all = (int32_t)left_k;
    else if (p.secondary_all == left_k) p.secondary_all = 0;
  }
}

// mem_aln_t equivalent (golden: ops/align.py Aln)
struct AlnT {
  int64_t pos = -1;
  int32_t rid = -1, flag = 0, is_rev = 0, is_alt = 0, mapq = 0, NM = -1;
  std::vector<CigarOp> cigar;
  std::string MD;
  std::string XA;   // empty = none
  int32_t score = -1, sub = -1, alt_sc = 0;
};

// golden align.py mem_reg2aln
AlnT reg2aln(const Opt& opt, const Bns& bns, int32_t l_query,
             const uint8_t* query, const Reg* ar) {
  AlnT a;
  if (ar == nullptr || ar->rb < 0 || ar->re < 0) {
    a.rid = -1;
    a.pos = -1;
    a.flag |= 0x4;
    a.score = 0;
    a.sub = 0;
    return a;
  }
  int32_t qb = ar->qb, qe = ar->qe;
  int64_t rb = ar->rb, re = ar->re;
  a.mapq = ar->secondary < 0 ? approx_mapq_se(opt, *ar) : 0;
  if (ar->secondary >= 0) a.flag |= 0x100;
  int64_t tmp = infer_bw(qe - qb, re - rb, ar->truesc, opt.a, opt.o_del,
                         opt.e_del);
  int64_t w2 = infer_bw(qe - qb, re - rb, ar->truesc, opt.a, opt.o_ins,
                        opt.e_ins);
  w2 = std::max(w2, tmp);
  if (w2 > opt.w) w2 = std::min(w2, (int64_t)ar->w);
  int64_t last_sc = -(1ll << 30);
  int i = 0;
  int32_t NM = -1;
  std::vector<CigarOp> cigar;
  std::string md;
  int64_t score = 0;
  while (true) {
    w2 = std::min(w2, (int64_t)opt.w << 2);
    score = gen_cigar2(opt, bns, w2, qe - qb, query + qb, rb, re, true,
                       &cigar, &NM, &md);
    if (score == last_sc || w2 == (int64_t)opt.w << 2) break;
    last_sc = score;
    w2 <<= 1;
    ++i;
    if (i >= 3 || score >= ar->truesc - opt.a) break;
  }
  a.NM = NM;
  a.MD = md;
  int64_t p0 = rb < bns.l_pac ? rb : re - 1;
  bool is_rev = p0 >= bns.l_pac;
  int64_t pos = is_rev ? (bns.l_pac << 1) - 1 - p0 : p0;
  a.is_rev = is_rev ? 1 : 0;
  if (!cigar.empty()) {  // squeeze out leading/trailing deletions
    if (cigar[0].op == 2) {
      pos += cigar[0].len;
      cigar.erase(cigar.begin());
    } else if (cigar.back().op == 2) {
      cigar.pop_back();
    }
  }
  if (qb != 0 || qe != l_query) {  // clipping
    int32_t clip5 = is_rev ? l_query - qe : qb;
    int32_t clip3 = is_rev ? qb : l_query - qe;
    if (clip5) cigar.insert(cigar.begin(), {3, clip5});
    if (clip3) cigar.push_back({3, clip3});
  }
  a.cigar = std::move(cigar);
  a.rid = bns.pos2rid(pos);
  a.pos = pos - bns.offsets[a.rid];
  a.score = ar->score;
  a.sub = std::max(ar->sub, ar->csub);
  a.is_alt = ar->is_alt;
  a.alt_sc = ar->alt_sc;
  return a;
}

static const char CIGAR_CHARS[] = "MIDSH";
static const char CIGAR_CHARS_N[] = "MIDSHN";

// golden sam.py _cigar_str (add_cigar)
void cigar_str(const Opt& opt, const AlnT& p, int which, std::string* out) {
  if (p.cigar.empty()) { *out += '*'; return; }
  char buf[24];
  for (const CigarOp& co : p.cigar) {
    int c = co.op;
    if (!(opt.flag & F_SOFTCLIP) && !p.is_alt && (c == 3 || c == 4))
      c = which ? 4 : 3;
    snprintf(buf, sizeof buf, "%d%c", co.len, CIGAR_CHARS[c]);
    *out += buf;
  }
}

int64_t get_rlen(const std::vector<CigarOp>& cig) {
  int64_t n = 0;
  for (const CigarOp& co : cig)
    if (co.op == 0 || co.op == 2) n += co.len;
  return n;
}

// golden sam.py get_pri_idx
int64_t get_pri_idx(double xa_drop, const std::vector<Reg>& a, int64_t i) {
  int64_t k = a[i].secondary_all;
  if (k >= 0 && a[i].score >= a[k].score * xa_drop) return k;
  return -1;
}

// golden sam.py mem_gen_alt (XA strings per primary hit)
void gen_alt(const Opt& opt, const Bns& bns, const std::vector<Reg>& a,
             int32_t l_query, const uint8_t* query,
             std::vector<std::string>* XA) {
  int64_t n = (int64_t)a.size();
  XA->assign(n, std::string());
  std::vector<int32_t> cnt(n, 0);
  std::vector<uint8_t> has_alt(n, 0);
  int64_t tot = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = get_pri_idx(opt.XA_drop_ratio, a, i);
    if (r >= 0) {
      ++cnt[r];
      ++tot;
      if (a[i].is_alt) has_alt[r] = 1;
    }
  }
  if (tot == 0) return;
  char buf[64];
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = get_pri_idx(opt.XA_drop_ratio, a, i);
    if (r < 0) continue;
    if (cnt[r] > opt.max_XA_hits_alt ||
        (!has_alt[r] && cnt[r] > opt.max_XA_hits))
      continue;
    AlnT t = reg2aln(opt, bns, l_query, query, &a[i]);
    std::string& out = (*XA)[r];
    out += bns.name(t.rid);
    snprintf(buf, sizeof buf, ",%c%lld,", "+-"[t.is_rev],
             (long long)(t.pos + 1));
    out += buf;
    for (const CigarOp& co : t.cigar) {
      snprintf(buf, sizeof buf, "%d%c", co.len, CIGAR_CHARS_N[co.op]);
      out += buf;
    }
    snprintf(buf, sizeof buf, ",%d", t.NM);
    out += buf;
    if (opt.flag & F_XB) {
      snprintf(buf, sizeof buf, ",%d", t.score);
      out += buf;
    }
    out += ';';
  }
}

// golden sam.py mem_aln2sam (SE: no mate)
void aln2sam(const Opt& opt, const Bns& bns, const std::string& name,
             int32_t l_seq, const uint8_t* seq, const char* qual,
             const std::string& comment, int64_t n_alns,
             const std::vector<AlnT>& alns, int64_t which,
             const std::string& rg_id, std::string* out) {
  AlnT p = alns[which];  // copy (flag mutations are local)
  p.flag |= (p.rid < 0) ? 0x4 : 0;
  p.flag |= p.is_rev ? 0x10 : 0;
  char buf[64];
  *out += name;
  snprintf(buf, sizeof buf, "\t%d\t",
           (p.flag & 0xFFFF) | ((p.flag & 0x10000) ? 0x100 : 0));
  *out += buf;
  if (p.rid >= 0) {
    *out += bns.name(p.rid);
    snprintf(buf, sizeof buf, "\t%lld\t%d\t", (long long)(p.pos + 1),
             p.mapq);
    *out += buf;
    cigar_str(opt, p, (int)which, out);
  } else {
    *out += "*\t0\t0\t*";
  }
  *out += "\t*\t0\t0\t";
  // SEQ + QUAL
  static const char* FWD = "ACGTN";
  static const char* REV = "TGCAN";
  if (p.flag & 0x100) {
    *out += "*\t*";
  } else {
    int32_t qb = 0, qe = l_seq;
    bool clip = !p.cigar.empty() && which && !(opt.flag & F_SOFTCLIP) &&
                !p.is_alt;
    if (!p.is_rev) {
      if (clip) {
        if (p.cigar[0].op == 3 || p.cigar[0].op == 4) qb += p.cigar[0].len;
        if (p.cigar.back().op == 3 || p.cigar.back().op == 4)
          qe -= p.cigar.back().len;
      }
      for (int32_t i = qb; i < qe; ++i) *out += FWD[seq[i]];
      *out += '\t';
      if (qual) out->append(qual + qb, qual + qe);
      else *out += '*';
    } else {
      if (clip) {
        if (p.cigar[0].op == 3 || p.cigar[0].op == 4) qe -= p.cigar[0].len;
        if (p.cigar.back().op == 3 || p.cigar.back().op == 4)
          qb += p.cigar.back().len;
      }
      for (int32_t i = qe - 1; i >= qb; --i) *out += REV[seq[i]];
      *out += '\t';
      if (qual) {
        for (int32_t i = qe - 1; i >= qb; --i) *out += qual[i];
      } else {
        *out += '*';
      }
    }
  }
  // optional tags
  if (!p.cigar.empty()) {
    snprintf(buf, sizeof buf, "\tNM:i:%d\tMD:Z:", p.NM);
    *out += buf;
    *out += p.MD;
  }
  if (p.score >= 0) {
    snprintf(buf, sizeof buf, "\tAS:i:%d", p.score);
    *out += buf;
  }
  if (p.sub >= 0) {
    snprintf(buf, sizeof buf, "\tXS:i:%d", p.sub);
    *out += buf;
  }
  if (!rg_id.empty()) {
    *out += "\tRG:Z:";
    *out += rg_id;
  }
  if (!(p.flag & 0x100)) {
    bool others = false;
    for (int64_t i = 0; i < n_alns; ++i)
      if (i != which && !(alns[i].flag & 0x100)) { others = true; break; }
    if (others) {
      *out += "\tSA:Z:";
      for (int64_t i = 0; i < n_alns; ++i) {
        const AlnT& r = alns[i];
        if (i == which || (r.flag & 0x100)) continue;
        *out += bns.name(r.rid);
        snprintf(buf, sizeof buf, ",%lld,%c,", (long long)(r.pos + 1),
                 "+-"[r.is_rev]);
        *out += buf;
        for (const CigarOp& co : r.cigar) {
          snprintf(buf, sizeof buf, "%d%c", co.len, CIGAR_CHARS[co.op]);
          *out += buf;
        }
        snprintf(buf, sizeof buf, ",%d,%d;", r.mapq, r.NM);
        *out += buf;
      }
    }
    if (p.alt_sc > 0) {
      snprintf(buf, sizeof buf, "\tpa:f:%.3f",
               (double)p.score / p.alt_sc);
      *out += buf;
    }
  }
  if (!p.XA.empty()) {
    *out += (opt.flag & F_XB) ? "\tXB:Z:" : "\tXA:Z:";
    *out += p.XA;
  }
  if (!comment.empty()) {
    *out += '\t';
    *out += comment;
  }
  *out += '\n';
}

// golden sam.py mem_reg2sam (SE path: extra_flag=0, no mate)
void reg2sam_se(const Opt& opt, const Bns& bns, const std::string& name,
                int32_t l_seq, const uint8_t* seq, const char* qual,
                const std::string& comment, std::vector<Reg>& a,
                const std::string& rg_id, std::string* sam) {
  std::vector<std::string> XA;
  bool want_xa = !(opt.flag & F_ALL);
  if (want_xa) gen_alt(opt, bns, a, l_seq, seq, &XA);
  std::vector<AlnT> aa;
  int64_t l = 0;
  for (int64_t k = 0; k < (int64_t)a.size(); ++k) {
    Reg& p = a[k];
    if (p.score < opt.T) continue;
    if (p.secondary >= 0 && (p.is_alt || !(opt.flag & F_ALL))) continue;
    if (p.secondary >= 0 && p.secondary < INT32_MAXV &&
        p.score < a[p.secondary].score * opt.drop_ratio)
      continue;
    AlnT q = reg2aln(opt, bns, l_seq, seq, &p);
    if (want_xa) q.XA = XA[k];
    if (p.secondary >= 0) q.sub = -1;
    if (l && p.secondary < 0)
      q.flag |= (opt.flag & F_NO_MULTI) ? 0x10000 : 0x800;
    if (!(opt.flag & F_KEEP_SUPP_MAPQ) && l && !p.is_alt &&
        q.mapq > aa[0].mapq)
      q.mapq = aa[0].mapq;
    ++l;
    aa.push_back(std::move(q));
  }
  if (aa.empty()) {
    AlnT t = reg2aln(opt, bns, l_seq, seq, nullptr);
    std::vector<AlnT> one{std::move(t)};
    aln2sam(opt, bns, name, l_seq, seq, qual, comment, 1, one, 0, rg_id,
            sam);
  } else {
    for (int64_t k = 0; k < (int64_t)aa.size(); ++k)
      aln2sam(opt, bns, name, l_seq, seq, qual, comment,
              (int64_t)aa.size(), aa, k, rg_id, sam);
  }
}

// ------------------------------------------------------------------
// binding
// ------------------------------------------------------------------

bool get_buf(PyObject* obj, Py_buffer* view, const char* name) {
  if (PyObject_GetBuffer(obj, view, PyBUF_SIMPLE) != 0) {
    PyErr_Format(PyExc_TypeError, "%s: expected a contiguous buffer", name);
    return false;
  }
  return true;
}

constexpr int REG_NF = 12;  // rb re qb qe rid score truesc w seedcov
                            // seedlen0 csub is_alt

void load_regs(const int64_t* rows, const double* fr, int64_t lo,
               int64_t hi, std::vector<Reg>* out) {
  out->clear();
  for (int64_t i = lo; i < hi; ++i) {
    const int64_t* f = rows + i * REG_NF;
    Reg r{};
    r.rb = f[0]; r.re = f[1];
    r.qb = (int32_t)f[2]; r.qe = (int32_t)f[3];
    r.rid = (int32_t)f[4]; r.score = (int32_t)f[5];
    r.truesc = (int32_t)f[6]; r.w = (int32_t)f[7];
    r.seedcov = (int32_t)f[8]; r.seedlen0 = (int32_t)f[9];
    r.csub = (int32_t)f[10]; r.is_alt = (int32_t)f[11];
    r.sub = 0; r.alt_sc = 0; r.sub_n = 0;
    r.secondary = -1; r.secondary_all = -1; r.n_comp = 0;
    r.frac_rep = fr[i];
    out->push_back(r);
  }
}

// se_tail_batch(seq_cat u8, seq_off i64[n+1], qual_cat bytes|None,
//               name_cat bytes, name_off i64[n+1],
//               comment_cat bytes, comment_off i64[n+1],
//               ids i64[n],
//               reg_rows i64[NR, 12], reg_frac f64[NR], reg_off i64[n+1],
//               pac u8, l_pac, ann_off i64[nc], ann_alt u8[nc],
//               ann_name_cat bytes, ann_name_off i64[nc+1],
//               rg_id bytes, opt_ints i64[14], opt_floats f64[5],
//               mat i8[25])
//  -> list[bytes] SAM text per read
PyObject* py_se_tail_batch(PyObject*, PyObject* args) {
  PyObject *seq_o, *seqoff_o, *qual_o, *name_o, *nameoff_o, *com_o,
      *comoff_o, *ids_o, *regs_o, *frac_o, *regoff_o, *pac_o, *annoff_o,
      *annalt_o, *annname_o, *annnameoff_o, *optint_o, *optflt_o, *mat_o;
  const char* rg_id_c;
  Py_ssize_t rg_len;
  long long l_pac;
  if (!PyArg_ParseTuple(args, "OOOOOOOOOOOOLOOOOy#OOO", &seq_o, &seqoff_o,
                        &qual_o, &name_o, &nameoff_o, &com_o, &comoff_o,
                        &ids_o, &regs_o, &frac_o, &regoff_o, &pac_o,
                        &l_pac, &annoff_o, &annalt_o, &annname_o,
                        &annnameoff_o, &rg_id_c, &rg_len, &optint_o,
                        &optflt_o, &mat_o))
    return nullptr;
  PyObject* objs[] = {seq_o,  seqoff_o,  name_o,     nameoff_o,
                      com_o,  comoff_o,  ids_o,      regs_o,
                      frac_o, regoff_o,  pac_o,      annoff_o,
                      annalt_o, annname_o, annnameoff_o, optint_o,
                      optflt_o, mat_o};
  const int NB = 18;
  Py_buffer bufs[NB];
  for (int i = 0; i < NB; ++i) {
    if (!get_buf(objs[i], &bufs[i], "arg")) {
      for (int j = 0; j < i; ++j) PyBuffer_Release(&bufs[j]);
      return nullptr;
    }
  }
  Py_buffer qualb;
  bool has_qual = qual_o != Py_None;
  if (has_qual && !get_buf(qual_o, &qualb, "qual")) {
    for (int j = 0; j < NB; ++j) PyBuffer_Release(&bufs[j]);
    return nullptr;
  }

  const uint8_t* seq_cat = (const uint8_t*)bufs[0].buf;
  const int64_t* seq_off = (const int64_t*)bufs[1].buf;
  const char* name_cat = (const char*)bufs[2].buf;
  const int64_t* name_off = (const int64_t*)bufs[3].buf;
  const char* com_cat = (const char*)bufs[4].buf;
  const int64_t* com_off = (const int64_t*)bufs[5].buf;
  const int64_t* ids = (const int64_t*)bufs[6].buf;
  const int64_t* reg_rows = (const int64_t*)bufs[7].buf;
  const double* reg_frac = (const double*)bufs[8].buf;
  const int64_t* reg_off = (const int64_t*)bufs[9].buf;
  const char* qual_cat = has_qual ? (const char*)qualb.buf : nullptr;
  const int64_t* opti = (const int64_t*)bufs[15].buf;
  const double* optf = (const double*)bufs[16].buf;

  Opt opt;
  opt.a = (int32_t)opti[0]; opt.b = (int32_t)opti[1];
  opt.o_del = (int32_t)opti[2]; opt.e_del = (int32_t)opti[3];
  opt.o_ins = (int32_t)opti[4]; opt.e_ins = (int32_t)opti[5];
  opt.w = (int32_t)opti[6]; opt.T = (int32_t)opti[7];
  opt.flag = (int32_t)opti[8]; opt.min_seed_len = (int32_t)opti[9];
  opt.max_chain_gap = (int32_t)opti[10];
  opt.max_XA_hits = (int32_t)opti[11];
  opt.max_XA_hits_alt = (int32_t)opti[12];
  opt.mapQ_coef_fac = (int32_t)opti[13];
  opt.mask_level = optf[0];
  opt.mask_level_redun = optf[1];
  opt.drop_ratio = optf[2];
  opt.XA_drop_ratio = optf[3];
  opt.mapQ_coef_len = optf[4];
  std::memcpy(opt.mat, bufs[17].buf, 25);

  Bns bns{(const uint8_t*)bufs[10].buf, (int64_t)l_pac,
          (const int64_t*)bufs[11].buf,
          (int64_t)(bufs[11].len / sizeof(int64_t)),
          (const char*)bufs[13].buf, (const int64_t*)bufs[14].buf};
  const uint8_t* ann_alt = (const uint8_t*)bufs[12].buf;
  std::string rg_id(rg_id_c, rg_id_c + rg_len);
  int64_t n = (int64_t)(bufs[6].len / sizeof(int64_t));

  std::vector<std::string> sams((size_t)n);
  Py_BEGIN_ALLOW_THREADS
  std::vector<Reg> regs;
  for (int64_t r = 0; r < n; ++r) {
    const uint8_t* seq = seq_cat + seq_off[r];
    int32_t l_seq = (int32_t)(seq_off[r + 1] - seq_off[r]);
    load_regs(reg_rows, reg_frac, reg_off[r], reg_off[r + 1], &regs);
    dedup_patch(opt, bns, seq, regs);
    for (Reg& p : regs)
      if (p.rid >= 0 && ann_alt[p.rid]) p.is_alt = 1;
    mark_primary_se(opt, regs, ids[r]);
    if (opt.flag & F_PRIMARY5) reorder_primary5(opt.T, regs);
    std::string name(name_cat + name_off[r], name_cat + name_off[r + 1]);
    std::string comment(com_cat + com_off[r], com_cat + com_off[r + 1]);
    reg2sam_se(opt, bns, name, l_seq, seq,
               has_qual ? qual_cat + seq_off[r] : nullptr, comment, regs,
               rg_id, &sams[r]);
  }
  Py_END_ALLOW_THREADS

  PyObject* out = PyList_New((Py_ssize_t)n);
  for (int64_t r = 0; r < n; ++r)
    PyList_SET_ITEM(out, (Py_ssize_t)r,
                    PyBytes_FromStringAndSize(sams[r].data(),
                                              (Py_ssize_t)sams[r].size()));
  for (int j = 0; j < NB; ++j) PyBuffer_Release(&bufs[j]);
  if (has_qual) PyBuffer_Release(&qualb);
  return out;
}

// dedup_batch: dedup/patch only (phase 1 of the PE tail; pestat must see
// dedup'd regions). Returns per-read [NR2, 13] int64 rows
// (REG_NF + n_comp... actually the 12 input fields with post-dedup
// values) + frac stays per-row.
PyObject* py_dedup_batch(PyObject*, PyObject* args) {
  PyObject *seq_o, *seqoff_o, *regs_o, *frac_o, *regoff_o, *pac_o,
      *annoff_o, *annalt_o, *optint_o, *optflt_o, *mat_o;
  long long l_pac;
  if (!PyArg_ParseTuple(args, "OOOOOOLOOOOO", &seq_o, &seqoff_o, &regs_o,
                        &frac_o, &regoff_o, &pac_o, &l_pac, &annoff_o,
                        &annalt_o, &optint_o, &optflt_o, &mat_o))
    return nullptr;
  PyObject* objs[] = {seq_o, seqoff_o, regs_o, frac_o, regoff_o,
                      pac_o, annoff_o, annalt_o, optint_o, optflt_o,
                      mat_o};
  const int NB = 11;
  Py_buffer bufs[NB];
  for (int i = 0; i < NB; ++i) {
    if (!get_buf(objs[i], &bufs[i], "arg")) {
      for (int j = 0; j < i; ++j) PyBuffer_Release(&bufs[j]);
      return nullptr;
    }
  }
  const uint8_t* seq_cat = (const uint8_t*)bufs[0].buf;
  const int64_t* seq_off = (const int64_t*)bufs[1].buf;
  const int64_t* reg_rows = (const int64_t*)bufs[2].buf;
  const double* reg_frac = (const double*)bufs[3].buf;
  const int64_t* reg_off = (const int64_t*)bufs[4].buf;
  const int64_t* opti = (const int64_t*)bufs[8].buf;
  const double* optf = (const double*)bufs[9].buf;
  Opt opt{};
  opt.a = (int32_t)opti[0]; opt.b = (int32_t)opti[1];
  opt.o_del = (int32_t)opti[2]; opt.e_del = (int32_t)opti[3];
  opt.o_ins = (int32_t)opti[4]; opt.e_ins = (int32_t)opti[5];
  opt.w = (int32_t)opti[6]; opt.T = (int32_t)opti[7];
  opt.flag = (int32_t)opti[8]; opt.min_seed_len = (int32_t)opti[9];
  opt.max_chain_gap = (int32_t)opti[10];
  opt.max_XA_hits = (int32_t)opti[11];
  opt.max_XA_hits_alt = (int32_t)opti[12];
  opt.mapQ_coef_fac = (int32_t)opti[13];
  opt.mask_level = optf[0];
  opt.mask_level_redun = optf[1];
  opt.drop_ratio = optf[2];
  opt.XA_drop_ratio = optf[3];
  opt.mapQ_coef_len = optf[4];
  std::memcpy(opt.mat, bufs[10].buf, 25);
  Bns bns{(const uint8_t*)bufs[5].buf, (int64_t)l_pac,
          (const int64_t*)bufs[6].buf,
          (int64_t)(bufs[6].len / sizeof(int64_t)), nullptr, nullptr};
  const uint8_t* ann_alt = (const uint8_t*)bufs[7].buf;
  int64_t n = (int64_t)(bufs[1].len / sizeof(int64_t)) - 1;

  std::vector<std::vector<Reg>> all((size_t)n);
  Py_BEGIN_ALLOW_THREADS
  for (int64_t r = 0; r < n; ++r) {
    const uint8_t* seq = seq_cat + seq_off[r];
    load_regs(reg_rows, reg_frac, reg_off[r], reg_off[r + 1], &all[r]);
    dedup_patch(opt, bns, seq, all[r]);
    for (Reg& p : all[r])
      if (p.rid >= 0 && ann_alt[p.rid]) p.is_alt = 1;
  }
  Py_END_ALLOW_THREADS

  // pack results: rows [NR2, 14] (the 12 fields + n_comp + sub/csub kept
  // via fields), frac f64[NR2], off i64[n+1]
  int64_t total = 0;
  for (auto& v : all) total += (int64_t)v.size();
  PyObject* rows_b = PyBytes_FromStringAndSize(
      nullptr, (Py_ssize_t)(total * REG_NF * 8));
  PyObject* frac_b = PyBytes_FromStringAndSize(nullptr,
                                               (Py_ssize_t)(total * 8));
  PyObject* off_b = PyBytes_FromStringAndSize(nullptr,
                                              (Py_ssize_t)((n + 1) * 8));
  int64_t* orows = (int64_t*)PyBytes_AS_STRING(rows_b);
  double* ofrac = (double*)PyBytes_AS_STRING(frac_b);
  int64_t* ooff = (int64_t*)PyBytes_AS_STRING(off_b);
  int64_t w = 0;
  ooff[0] = 0;
  for (int64_t r = 0; r < n; ++r) {
    for (const Reg& p : all[r]) {
      int64_t* f = orows + w * REG_NF;
      f[0] = p.rb; f[1] = p.re; f[2] = p.qb; f[3] = p.qe; f[4] = p.rid;
      f[5] = p.score; f[6] = p.truesc; f[7] = p.w; f[8] = p.seedcov;
      f[9] = p.seedlen0; f[10] = p.csub; f[11] = p.is_alt;
      ofrac[w] = p.frac_rep;
      ++w;
    }
    ooff[r + 1] = w;
  }
  for (int j = 0; j < NB; ++j) PyBuffer_Release(&bufs[j]);
  return Py_BuildValue("(NNN)", rows_b, frac_b, off_b);
}

PyMethodDef methods[] = {
    {"se_tail_batch", py_se_tail_batch, METH_VARARGS,
     "batched SE tail: dedup + primary + mapq + cigar + SAM text"},
    {"dedup_batch", py_dedup_batch, METH_VARARGS,
     "batched region dedup/patch (PE phase 1)"},
    {nullptr, nullptr, 0, nullptr}};

struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_region",
                                "bwa_flow_tpu native tail stage", -1,
                                methods};

}  // namespace

PyMODINIT_FUNC PyInit__region(void) { return PyModule_Create(&moduledef); }
