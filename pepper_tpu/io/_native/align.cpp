#include "align.h"

#ifndef _GNU_SOURCE
#define _GNU_SOURCE  // memmem (perfect-match fast path)
#endif
#include <string.h>

#include <algorithm>
#include <vector>

#ifdef __SSE2__
#include <emmintrin.h>
#endif
#ifdef __AVX2__
#include <immintrin.h>
#endif

namespace {

enum Trace : uint8_t {
  TRACE_NONE = 0,
  TRACE_DIAG = 1,
  TRACE_UP = 2,    // vertical gap (F): consume query, emits 'I'
  TRACE_LEFT = 3,  // horizontal gap (E): consume target, emits 'D'
};

// run-length CIGAR with soft clips from a reversed op string ('='/'X'/'I'/
// 'D'), shared by the scalar and striped engines
std::string build_cigar(const std::string& ops_reversed, int64_t query_begin,
                        int64_t query_end, int64_t query_len) {
  std::string cigar;
  auto append_run = [&cigar](char op, int64_t count) {
    if (count > 0) cigar += std::to_string(count) + op;
  };
  append_run('S', query_begin);
  int64_t run = 0;
  char run_op = 0;
  for (auto it = ops_reversed.rbegin(); it != ops_reversed.rend(); ++it) {
    if (*it == run_op) {
      ++run;
    } else {
      append_run(run_op, run);
      run_op = *it;
      run = 1;
    }
  }
  append_run(run_op, run);
  append_run('S', query_len - 1 - query_end);
  return cigar;
}

}  // namespace

AlignmentResult smith_waterman_scalar(const std::string& target,
                                      const std::string& query,
                                      int match_score, int mismatch_penalty,
                                      int gap_open_penalty,
                                      int gap_extend_penalty) {
  AlignmentResult result;
  const int64_t n = static_cast<int64_t>(target.size());
  const int64_t m = static_cast<int64_t>(query.size());
  if (n == 0 || m == 0) return result;

  // H: best score ending at (i, j); E: gap in target (left), F: gap in
  // query (up).  Row-major (m+1) x (n+1) with i over query, j over target.
  const int64_t width = n + 1;
  std::vector<int32_t> h_prev(width, 0), h_curr(width, 0);
  std::vector<int32_t> e_row(width, 0);  // E carried per column? E is
  // gap-in-query along the row (left moves), computed per row; F carried
  // down columns.
  std::vector<int32_t> f_col(width, 0);
  // tracebacks: which move produced H, and whether E/F were extensions
  std::vector<uint8_t> trace_h((m + 1) * width, TRACE_NONE);
  std::vector<uint8_t> trace_e((m + 1) * width, 0);  // 1 = E extended
  std::vector<uint8_t> trace_f((m + 1) * width, 0);  // 1 = F extended

  int32_t best = 0;
  int64_t best_i = -1, best_j = -1;

  for (int64_t i = 1; i <= m; ++i) {
    int32_t e = 0;  // E(i, j): gap in target ending at (i, j)
    const char qc = query[i - 1];
    for (int64_t j = 1; j <= n; ++j) {
      // E: open from H(i, j-1) or extend E(i, j-1)
      const int32_t e_open = h_curr[j - 1] - gap_open_penalty;
      const int32_t e_ext = e - gap_extend_penalty;
      const bool e_is_ext = e_ext > e_open;
      e = std::max(e_open, e_ext);
      trace_e[i * width + j] = e_is_ext ? 1 : 0;
      // F: open from H(i-1, j) or extend F(i-1, j)
      const int32_t f_open = h_prev[j] - gap_open_penalty;
      const int32_t f_ext = f_col[j] - gap_extend_penalty;
      const bool f_is_ext = f_ext > f_open;
      f_col[j] = std::max(f_open, f_ext);
      trace_f[i * width + j] = f_is_ext ? 1 : 0;

      const int32_t diag =
          h_prev[j - 1] +
          (qc == target[j - 1] ? match_score : -mismatch_penalty);

      int32_t score = diag;
      uint8_t move = TRACE_DIAG;
      if (e > score) {
        score = e;
        move = TRACE_LEFT;
      }
      if (f_col[j] > score) {
        score = f_col[j];
        move = TRACE_UP;
      }
      if (score <= 0) {
        score = 0;
        move = TRACE_NONE;
      }
      h_curr[j] = score;
      trace_h[i * width + j] = move;
      if (score > best) {
        best = score;
        best_i = i;
        best_j = j;
      }
    }
    std::swap(h_prev, h_curr);
    h_curr[0] = 0;
  }

  result.best_score = best;
  if (best <= 0) return result;

  // traceback from (best_i, best_j)
  std::string ops;
  int64_t i = best_i, j = best_j;
  result.ref_end = best_j - 1;
  result.query_end = best_i - 1;
  while (i > 0 && j > 0) {
    const uint8_t move = trace_h[i * width + j];
    if (move == TRACE_NONE) break;
    if (move == TRACE_DIAG) {
      ops.push_back(query[i - 1] == target[j - 1] ? '=' : 'X');
      --i;
      --j;
    } else if (move == TRACE_LEFT) {
      // gap in query relative to target: consume target (deletion)
      while (j > 0 && trace_e[i * width + j]) {
        ops.push_back('D');
        --j;
      }
      if (j > 0) {
        ops.push_back('D');
        --j;
      }
    } else {  // TRACE_UP: insertion in query
      while (i > 0 && trace_f[i * width + j]) {
        ops.push_back('I');
        --i;
      }
      if (i > 0) {
        ops.push_back('I');
        --i;
      }
    }
  }
  result.ref_begin = j;
  result.query_begin = i;
  result.cigar = build_cigar(ops, result.query_begin, result.query_end, m);
  return result;
}

#ifdef __SSE2__

namespace {

// Striped (Farrar-layout) affine-gap local alignment over int16 lanes,
// templated on the vector width (SSE2: 8 lanes, AVX2: 16 lanes).
//
// Produces results bit-identical to smith_waterman_scalar (fuzz-asserted
// in tests/test_align.py) by construction: the DP streams the EXACT
// H/E/F int16 value rows to memory (three plain vector stores per
// segment-column — round 4 replaced the five packed predicate bitplanes,
// whose compare+movemask extraction was ~45% of the DP wall) and the
// traceback recomputes every one of the scalar engine's comparisons
// verbatim from the stored values.  Streaming (non-temporal) stores keep
// the ~6 MB/alignment of trace values out of the cache the DP is using.
// The vertical gap state F is computed EXACTLY (including its negative
// values, which the traceback predicates need) via a prefix-max scan
// instead of the classic lazy-F loop: with gap_open >= gap_extend,
// opening from an F-derived H cell never beats extending, so
//   F(i,j) = max over k < i of H0(k,j) - open - (i-1-k)*ext
//            (plus the virtual row-0 chain -i*ext)
// where H0 = max(diag, E, 0) — a running max of G(k) = H0(k) + k*ext.
//
// Striped element mapping: query index q (0-based) lives at segment
// s = q % seg_len, lane l = q / seg_len (each lane covers a contiguous
// query block, so in-lane segment order is query order).
// Trace state: the exact H value plane plus ONE bitplane ("E == H").
// That is sufficient to replay the scalar walk exactly:
//  - H(i,j) == 0            -> TRACE_NONE (stop)
//  - H(i,j) == diag(i,j)    -> TRACE_DIAG (e,f <= H == diag can never win
//                              the scalar's strict comparisons)
//  - else e==H bit set      -> TRACE_LEFT (e > diag and the f > e check
//                              fails: f <= H == e)
//  - else                   -> TRACE_UP   (f == H > e, diag)
// Gap runs never need stored E/F either: at a LEFT entry E(i,j) = H(i,j),
// and the scalar's extension predicate E(i,j-1)-ext > H(i,j-1)-open is
// equivalent to E(i,j) > H(i,j-1)-open (strict max selection), after
// which E(i,j-1) = E(i,j)+ext continues the chain — symmetrically for F
// on UP runs.  All comparisons use the scalar engine's exact values, so
// CIGARs stay bit-identical by construction.
struct TracePlanes {
  int64_t seg_len;
  int64_t lanes;
  int64_t stride;  // seg_len * lanes elements per target column
  const int16_t* h;
  const uint32_t* e_eq_h;  // movemask_epi8 of cmpeq(e, h): lane l -> bit 2l
  // boundary row/column 0 is all zeros in the scalar engine
  int32_t H(int64_t i, int64_t j) const {
    if (i < 1 || j < 1) return 0;
    const int64_t q = i - 1;
    return h[(j - 1) * stride + (q % seg_len) * lanes + (q / seg_len)];
  }
  bool left_bit(int64_t i, int64_t j) const {
    const int64_t q = i - 1;
    return (e_eq_h[(j - 1) * seg_len + (q % seg_len)] >>
            (2 * (q / seg_len))) & 1;
  }
};

// reusable 32-byte-aligned plane storage (per thread); oversized requests
// release their memory after the call instead of pinning it forever
constexpr size_t kPlaneReuseCap = size_t(16) << 20;

template <typename T>
inline T* aligned_plane(std::vector<T>& backing, size_t need) {
  backing.resize(need + 32 / sizeof(T));
  return reinterpret_cast<T*>(
      (reinterpret_cast<uintptr_t>(backing.data()) + 31) &
      ~static_cast<uintptr_t>(31));
}

struct Sse2Ops {
  using V = __m128i;
  static constexpr int kLanes = 8;
  static V zero() { return _mm_setzero_si128(); }
  static V set1(int16_t v) { return _mm_set1_epi16(v); }
  static V load(const int16_t* p) {
    return _mm_load_si128(reinterpret_cast<const __m128i*>(p));
  }
  static void store(int16_t* p, V v) {
    _mm_store_si128(reinterpret_cast<__m128i*>(p), v);
  }
  static V add(V a, V b) { return _mm_add_epi16(a, b); }
  static V sub(V a, V b) { return _mm_sub_epi16(a, b); }
  static V max(V a, V b) { return _mm_max_epi16(a, b); }
  static V cmpgt(V a, V b) { return _mm_cmpgt_epi16(a, b); }
  static V cmpeq(V a, V b) { return _mm_cmpeq_epi16(a, b); }
  static V blend(V a, V b, V mask) {
    return _mm_or_si128(_mm_and_si128(mask, b), _mm_andnot_si128(mask, a));
  }
  // shift up by one query element (lane 0 receives 0)
  static V shift_one(V v) { return _mm_slli_si128(v, 2); }
  static void stream(int16_t* p, V v) {
    _mm_stream_si128(reinterpret_cast<__m128i*>(p), v);
  }
  // raw byte movemask of cmpeq over int16 lanes: lane l -> bits 2l, 2l+1
  static uint32_t eq_mask(V a, V b) {
    return static_cast<uint32_t>(
        _mm_movemask_epi8(_mm_cmpeq_epi16(a, b)));
  }
};

#ifdef __AVX2__
struct Avx2Ops {
  using V = __m256i;
  static constexpr int kLanes = 16;
  static V zero() { return _mm256_setzero_si256(); }
  static V set1(int16_t v) { return _mm256_set1_epi16(v); }
  static V load(const int16_t* p) {
    return _mm256_load_si256(reinterpret_cast<const __m256i*>(p));
  }
  static void store(int16_t* p, V v) {
    _mm256_store_si256(reinterpret_cast<__m256i*>(p), v);
  }
  static V add(V a, V b) { return _mm256_add_epi16(a, b); }
  static V sub(V a, V b) { return _mm256_sub_epi16(a, b); }
  static V max(V a, V b) { return _mm256_max_epi16(a, b); }
  static V cmpgt(V a, V b) { return _mm256_cmpgt_epi16(a, b); }
  static V cmpeq(V a, V b) { return _mm256_cmpeq_epi16(a, b); }
  static V blend(V a, V b, V mask) {
    return _mm256_blendv_epi8(a, b, mask);
  }
  // whole-register one-element shift: [0, v0..v14] (alignr works per
  // 128-bit lane, so feed it [zero, v_low] as the carry-in register)
  static V shift_one(V v) {
    const V carry = _mm256_permute2x128_si256(v, v, 0x08);
    return _mm256_alignr_epi8(v, carry, 14);
  }
  static void stream(int16_t* p, V v) {
    _mm256_stream_si256(reinterpret_cast<__m256i*>(p), v);
  }
  static uint32_t eq_mask(V a, V b) {
    return static_cast<uint32_t>(
        _mm256_movemask_epi8(_mm256_cmpeq_epi16(a, b)));
  }
};
#endif  // __AVX2__

template <typename Ops>
AlignmentResult smith_waterman_striped_impl(const std::string& target,
                                            const std::string& query,
                                            int match_score,
                                            int mismatch_penalty,
                                            int gap_open_penalty,
                                            int gap_extend_penalty) {
  using V = typename Ops::V;
  AlignmentResult result;
  const int64_t n = static_cast<int64_t>(target.size());
  const int64_t m = static_cast<int64_t>(query.size());
  const int64_t lanes = Ops::kLanes;
  const int64_t seg_len = (m + lanes - 1) / lanes;

  const V v_gap_open = Ops::set1(static_cast<int16_t>(gap_open_penalty));
  const V v_gap_ext = Ops::set1(static_cast<int16_t>(gap_extend_penalty));
  const V v_match = Ops::set1(static_cast<int16_t>(match_score));
  const V v_mism = Ops::set1(static_cast<int16_t>(-mismatch_penalty));
  const V v_zero = Ops::zero();

  // striped query codes (padding -1 never matches a target byte)
  std::vector<V> v_qcode(seg_len);
  // per-element constants: (i-1)*ext + open, i*ext, i*ext for G
  std::vector<V> v_open_decay(seg_len), v_virtual(seg_len);
  std::vector<V> v_idx_ext(seg_len);
  {
    alignas(32) int16_t buf[Ops::kLanes];
    for (int64_t s = 0; s < seg_len; ++s) {
      for (int64_t l = 0; l < lanes; ++l) {
        const int64_t q = l * seg_len + s;
        buf[l] = q < m ? static_cast<int16_t>(
                             static_cast<unsigned char>(query[q]))
                       : static_cast<int16_t>(-1);
      }
      v_qcode[s] = Ops::load(buf);
      for (int64_t l = 0; l < lanes; ++l) {
        const int64_t i = l * seg_len + s + 1;  // 1-based query row
        buf[l] = static_cast<int16_t>((i - 1) * gap_extend_penalty +
                                      gap_open_penalty);
      }
      v_open_decay[s] = Ops::load(buf);
      for (int64_t l = 0; l < lanes; ++l) {
        const int64_t i = l * seg_len + s + 1;
        buf[l] = static_cast<int16_t>(-i * gap_extend_penalty);
      }
      v_virtual[s] = Ops::load(buf);
      for (int64_t l = 0; l < lanes; ++l) {
        const int64_t i = l * seg_len + s + 1;
        buf[l] = static_cast<int16_t>(i * gap_extend_penalty);
      }
      v_idx_ext[s] = Ops::load(buf);
    }
  }

  std::vector<V> h_prev(seg_len, v_zero), e_prev(seg_len, v_zero);
  std::vector<V> h_new(seg_len), e_new(seg_len), f_new(seg_len);
  std::vector<V> diag(seg_len), pref(seg_len);
  std::vector<V> v_best(seg_len, v_zero), v_best_j(seg_len, v_zero);

  static thread_local std::vector<int16_t> tl_h;
  static thread_local std::vector<uint32_t> tl_bits;
  const int64_t stride = seg_len * lanes;
  const size_t plane_elems = static_cast<size_t>(n) * stride;
  TracePlanes planes;
  planes.seg_len = seg_len;
  planes.lanes = lanes;
  planes.stride = stride;
  int16_t* h_plane = aligned_plane(tl_h, plane_elems);
  uint32_t* bit_plane =
      aligned_plane(tl_bits, static_cast<size_t>(n) * seg_len);
  planes.h = h_plane;
  planes.e_eq_h = bit_plane;

  for (int64_t j = 1; j <= n; ++j) {
    const V v_tc = Ops::set1(static_cast<int16_t>(
        static_cast<unsigned char>(target[j - 1])));
    int16_t* h_col = h_plane + (j - 1) * stride;
    uint32_t* bit_col = bit_plane + (j - 1) * seg_len;
    // E (horizontal gap) from column j-1 finals; diag; H0; G prefix max
    for (int64_t s = 0; s < seg_len; ++s) {
      const V e_ext_v = Ops::sub(e_prev[s], v_gap_ext);
      const V e_open_v = Ops::sub(h_prev[s], v_gap_open);
      e_new[s] = Ops::max(e_ext_v, e_open_v);
      // diag candidate: H(i-1, j-1) + substitution
      const V h_diag =
          s == 0 ? Ops::shift_one(h_prev[seg_len - 1]) : h_prev[s - 1];
      const V eq = Ops::cmpeq(v_qcode[s], v_tc);
      diag[s] = Ops::add(h_diag, Ops::blend(v_mism, v_match, eq));
      // H0 = max(diag, E, 0); G = H0 + i*ext; in-lane inclusive prefix max
      const V h0 = Ops::max(Ops::max(diag[s], e_new[s]), v_zero);
      h_new[s] = h0;  // F folded in below
      const V g = Ops::add(h0, v_idx_ext[s]);
      pref[s] = s == 0 ? g : Ops::max(pref[s - 1], g);
    }
    // cross-lane exclusive carry of the G prefix (k = 0 virtual row -> 0)
    alignas(32) int16_t totals[Ops::kLanes], carries[Ops::kLanes];
    Ops::store(totals, pref[seg_len - 1]);
    int16_t running = 0;
    for (int64_t l = 0; l < lanes; ++l) {
      carries[l] = running;
      running = std::max(running, totals[l]);
    }
    const V v_carry = Ops::load(carries);
    // F, final H, the e==H bit, best tracking
    const V v_j = Ops::set1(static_cast<int16_t>(j));
    for (int64_t s = 0; s < seg_len; ++s) {
      const V excl =
          s == 0 ? v_carry : Ops::max(v_carry, pref[s - 1]);
      const V f_scan = Ops::sub(excl, v_open_decay[s]);
      f_new[s] = Ops::max(f_scan, v_virtual[s]);
      const V h_final = Ops::max(h_new[s], f_new[s]);
      Ops::stream(h_col + s * lanes, h_final);
      bit_col[s] = Ops::eq_mask(e_new[s], h_final);
      h_new[s] = h_final;
      const V better = Ops::cmpgt(h_final, v_best[s]);
      v_best[s] = Ops::max(v_best[s], h_final);
      v_best_j[s] = Ops::blend(v_best_j[s], v_j, better);
    }
    h_prev.swap(h_new);
    e_prev.swap(e_new);
  }
  _mm_sfence();  // streaming stores must land before the traceback reads

  // best cell: minimal (i, j) among maxima — scan per-element bests in
  // query-major order (the scalar's first-strict-improvement order)
  std::vector<int16_t> best_scores(lanes * seg_len), best_js(lanes * seg_len);
  for (int64_t s = 0; s < seg_len; ++s) {
    alignas(32) int16_t b[Ops::kLanes], bj[Ops::kLanes];
    Ops::store(b, v_best[s]);
    Ops::store(bj, v_best_j[s]);
    for (int64_t l = 0; l < lanes; ++l) {
      best_scores[l * seg_len + s] = b[l];
      best_js[l * seg_len + s] = bj[l];
    }
  }
  int32_t best = 0;
  int64_t best_i = -1, best_j = -1;
  for (int64_t q = 0; q < m; ++q) {
    if (best_scores[q] > best) {
      best = best_scores[q];
      best_i = q + 1;
      best_j = best_js[q];
    }
  }
  result.best_score = best;
  const auto release_oversized = [&]() {
    if (plane_elems > kPlaneReuseCap) {
      tl_h.clear();
      tl_h.shrink_to_fit();
      tl_bits.clear();
      tl_bits.shrink_to_fit();
    }
  };
  if (best <= 0) {
    release_oversized();
    return result;
  }

  // traceback: replay the scalar walk exactly from the H plane + e==H bit
  // (see TracePlanes for the move-decision proof); E/F values along gap
  // runs are reconstructed incrementally (+ext per extension step)
  const int gap_open = gap_open_penalty;
  const int gap_ext = gap_extend_penalty;
  std::string ops;
  int64_t i = best_i, j = best_j;
  result.ref_end = best_j - 1;
  result.query_end = best_i - 1;
  while (i > 0 && j > 0) {
    const int32_t h = planes.H(i, j);
    if (h == 0) break;  // the scalar's TRACE_NONE
    const int32_t diag_v =
        planes.H(i - 1, j - 1) +
        (query[i - 1] == target[j - 1] ? match_score : -mismatch_penalty);
    if (h == diag_v) {  // TRACE_DIAG (h >= max(e, f) blocks both gates)
      ops.push_back(query[i - 1] == target[j - 1] ? '=' : 'X');
      --i;
      --j;
    } else if (planes.left_bit(i, j)) {  // TRACE_LEFT: E(i,j) == h
      // scalar e_ext(i,j) = E(i,j-1)-ext > H(i,j-1)-open, equivalent to
      // E(i,j) > H(i,j-1)-open by strict-max selection
      int32_t e_val = h;
      while (j > 0 && e_val > planes.H(i, j - 1) - gap_open) {
        ops.push_back('D');
        --j;
        e_val += gap_ext;
      }
      if (j > 0) {
        ops.push_back('D');
        --j;
      }
    } else {  // TRACE_UP: F(i,j) == h > e, diag
      int32_t f_val = h;
      while (i > 0 && f_val > planes.H(i - 1, j) - gap_open) {
        ops.push_back('I');
        --i;
        f_val += gap_ext;
      }
      if (i > 0) {
        ops.push_back('I');
        --i;
      }
    }
  }
  result.ref_begin = j;
  result.query_begin = i;
  result.cigar = build_cigar(ops, result.query_begin, result.query_end, m);
  release_oversized();
  return result;
}

AlignmentResult smith_waterman_striped(const std::string& target,
                                       const std::string& query,
                                       int match_score, int mismatch_penalty,
                                       int gap_open_penalty,
                                       int gap_extend_penalty) {
#ifdef __AVX2__
  return smith_waterman_striped_impl<Avx2Ops>(
      target, query, match_score, mismatch_penalty, gap_open_penalty,
      gap_extend_penalty);
#else
  return smith_waterman_striped_impl<Sse2Ops>(
      target, query, match_score, mismatch_penalty, gap_open_penalty,
      gap_extend_penalty);
#endif
}

}  // namespace

AlignmentResult smith_waterman_striped_narrow(const std::string& target,
                                              const std::string& query,
                                              int match_score,
                                              int mismatch_penalty,
                                              int gap_open_penalty,
                                              int gap_extend_penalty) {
  return smith_waterman_striped_impl<Sse2Ops>(
      target, query, match_score, mismatch_penalty, gap_open_penalty,
      gap_extend_penalty);
}

#else  // !__SSE2__

AlignmentResult smith_waterman_striped_narrow(const std::string& target,
                                              const std::string& query,
                                              int match_score,
                                              int mismatch_penalty,
                                              int gap_open_penalty,
                                              int gap_extend_penalty) {
  return smith_waterman_scalar(target, query, match_score, mismatch_penalty,
                               gap_open_penalty, gap_extend_penalty);
}

#endif  // __SSE2__

AlignmentResult smith_waterman(const std::string& target,
                               const std::string& query, int match_score,
                               int mismatch_penalty, int gap_open_penalty,
                               int gap_extend_penalty) {
  // Perfect-match fast path (the sound core of the reference's own
  // fast-pass idea, aligner.cpp:71-120): a full-length exact occurrence
  // of the query that is UNIQUE in the target is provably the unique
  // optimum — any local alignment scores <= match*m with equality only
  // for a full-length penalty-free (i.e. exact) occurrence, and
  // uniqueness satisfies the engines' first-maximal-cell tie-break.
  // Skips the O(n*m) DP entirely; mismatched/gapped reads (any real
  // error process) fall through to the full engines.
  {
    const int64_t n = static_cast<int64_t>(target.size());
    const int64_t m = static_cast<int64_t>(query.size());
    // Require a strictly positive 1-base gap cost (open+extend > 0):
    // with free gaps a non-contiguous alignment can also reach match*m,
    // so the exact occurrence would no longer be the *unique* optimum
    // and the DP engines' first-maximal-cell tie-break could disagree.
    if (m > 0 && n >= m && match_score > 0 && mismatch_penalty >= 0 &&
        gap_open_penalty >= 0 && gap_extend_penalty >= 0 &&
        gap_open_penalty + gap_extend_penalty > 0 &&
        static_cast<int64_t>(match_score) * m <= 2000000000LL) {
      const char* base = target.data();
      const void* hit = memmem(base, n, query.data(), m);
      if (hit != nullptr) {
        const int64_t off = static_cast<const char*>(hit) - base;
        const void* second =
            (off + 1 <= n - m)
                ? memmem(base + off + 1, n - off - 1, query.data(), m)
                : nullptr;
        if (second == nullptr) {
          AlignmentResult result;
          result.best_score = static_cast<int>(match_score * m);
          result.ref_begin = off;
          result.ref_end = off + m - 1;
          result.query_begin = 0;
          result.query_end = m - 1;
          result.cigar = std::to_string(m) + "=";
          return result;
        }
      }
    }
  }
#ifdef __SSE2__
  const int64_t n = static_cast<int64_t>(target.size());
  const int64_t m = static_cast<int64_t>(query.size());
  const int64_t max_h =
      static_cast<int64_t>(match_score) * std::min(m, n);
  // every quantity the striped engine holds in int16 lanes must stay in
  // range: scores/decays bounded by the ext*len + open terms (which also
  // bound m and n, since gap_extend >= 1 is required), target index j in
  // the best-cell tracker bounded by n, and the raw penalties themselves
  // value-plane memory guard: the striped engine stores the exact int16 H
  // plane plus one e==H bit per cell (~2.25 bytes/cell over n x padded-m
  // cells, ~36 MB transient at the 1<<24 cap); beyond that the scalar
  // engine is the better citizen
  const int64_t padded_m = (m + 15) / 16 * 16;
  if (m > 0 && n > 0 && gap_open_penalty >= gap_extend_penalty &&
      gap_extend_penalty >= 1 && mismatch_penalty >= 0 &&
      mismatch_penalty <= 30000 && match_score <= 30000 &&
      gap_open_penalty <= 30000 && n <= 30000 &&
      n * padded_m <= (int64_t(1) << 24) &&
      max_h + gap_extend_penalty * m <= 30000 &&
      gap_extend_penalty * n + gap_open_penalty <= 30000 &&
      max_h <= 30000) {
    return smith_waterman_striped(target, query, match_score,
                                  mismatch_penalty, gap_open_penalty,
                                  gap_extend_penalty);
  }
#endif
  return smith_waterman_scalar(target, query, match_score, mismatch_penalty,
                               gap_open_penalty, gap_extend_penalty);
}
