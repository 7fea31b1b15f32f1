#include "align.h"

#ifndef _GNU_SOURCE
#define _GNU_SOURCE  // memmem (perfect-match fast path)
#endif
#include <string.h>

#include <algorithm>
#include <atomic>
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
  // shift down by one element (last lane receives 0) — banded engine deps
  static V shift_one_down(V v) { return _mm_srli_si128(v, 2); }
  static V insert_last(V v, int16_t x) { return _mm_insert_epi16(v, x, 7); }
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
  // one-element down-shift: [v1..v15, 0] (carry-in register [v_hi, zero])
  static V shift_one_down(V v) {
    const V carry = _mm256_permute2x128_si256(v, v, 0x81);
    return _mm256_alignr_epi8(carry, v, 2);
  }
  static V insert_last(V v, int16_t x) {
    return _mm256_insert_epi16(v, x, 15);
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

// ---------------- banded engine (diagonal coordinates) ----------------
//
// Realigned reads come from a mapped BAM, so the expected diagonal is
// known per read (d0 = mapped offset of the query start in the target,
// the reference's own fast-pass idea — aligner.cpp:71-120 tries the
// cheap aligned-first hypothesis before the expensive fallback).  The DP
// is restricted to band rows k in [0, band), where element k tracks the
// matrix diagonal i - j + d0 + band/2 == k.  In these coordinates the
// recurrences become column-local:
//   diag H(i-1,j-1)  -> same element k, previous column
//   E    (i,  j-1)   -> element k+1,  previous column (one down-shift)
//   F    (i-1,j)     -> element k-1,  same column — the same
//                       prefix-max-of-(H0 + k*ext) scan as the striped
//                       engine (gap_open >= gap_extend lemma unchanged)
// The query character of element k shifts down one element per column
// (one new char enters at the band bottom).  Rows outside [1, m] are
// phantoms: i < 1 behaves exactly like the scalar boundary (H == 0 falls
// out of the recurrence with the -1 padding code), i > m is masked to an
// exact 0 so it can never contribute a score or reach the best tracker.
// Out-of-band dependencies are truncated (H -> 0, E -> -inf): every path
// the band accounts is a real path, so banded H <= true H cell-wise while
// being exact for any path that stays in the band.
//
// EXACTNESS GATE.  Any alignment path that touches a cell outside the
// band has score <= U = ms * max(m + d0 - band/2, n - d0 - band/2 - 1)
// (a path through out-of-band cell (i,j) scores at most
// ms * [min(i,j) + min(m-i, n-j)] <= ms * min(n + (i-j), m - (i-j)),
// maximized at the band boundary).  If banded_best > U, every global
// maximum lies in-band with banded H equal to true H at each maximum, so
// the banded score, best cell AND tie-breaking provably equal the full
// DP's.  The traceback additionally requires the whole replayed path to
// stay >= 1 element away from the band edges (so every compared neighbor
// is in-band).  Any gate failure returns false and the caller runs the
// full engine.  Residual risk: an equal-score CIGAR tie decided through
// a cell whose banded value underestimates a just-outside-band prefix is
// theoretically possible; the 800-case dual-engine fuzz plus the polish
// FASTA byte-equality suites guard it empirically (PEPPER_NO_BAND=1
// forces the full engine).
constexpr int16_t kBandNegInf = -20000;

// banded-path observability: attempts vs certified successes (fallbacks =
// attempts - hits); exported via pepper_band_stats for diagnostics/bench
std::atomic<long long> g_band_attempts{0}, g_band_hits{0};

template <typename Ops>
bool smith_waterman_banded_impl(const std::string& target,
                                const std::string& query, int match_score,
                                int mismatch_penalty, int gap_open_penalty,
                                int gap_extend_penalty, int64_t d0,
                                int64_t band, AlignmentResult* out) {
  using V = typename Ops::V;
  const int64_t n = static_cast<int64_t>(target.size());
  const int64_t m = static_cast<int64_t>(query.size());
  const int64_t lanes = Ops::kLanes;
  const int64_t seg_len = band / lanes;
  const int64_t half = band / 2;

  const V v_gap_open = Ops::set1(static_cast<int16_t>(gap_open_penalty));
  const V v_gap_ext = Ops::set1(static_cast<int16_t>(gap_extend_penalty));
  const V v_match = Ops::set1(static_cast<int16_t>(match_score));
  const V v_mism = Ops::set1(static_cast<int16_t>(-mismatch_penalty));
  const V v_zero = Ops::zero();
  // -inf injected at the vacated last lane of a down-shift (out-of-band E)
  alignas(32) int16_t fill_buf[Ops::kLanes] = {};
  fill_buf[Ops::kLanes - 1] = kBandNegInf;
  const V v_last_neg = Ops::load(fill_buf);

  // per-element band indices and derived constants
  std::vector<V> v_kidx(seg_len), v_open_decay(seg_len), v_kext(seg_len);
  std::vector<V> v_qcode(seg_len);
  {
    alignas(32) int16_t buf[Ops::kLanes];
    for (int64_t s = 0; s < seg_len; ++s) {
      for (int64_t l = 0; l < lanes; ++l) {
        const int64_t k = l * seg_len + s;
        buf[l] = static_cast<int16_t>(k);
      }
      v_kidx[s] = Ops::load(buf);
      for (int64_t l = 0; l < lanes; ++l) {
        const int64_t k = l * seg_len + s;
        buf[l] = static_cast<int16_t>((k - 1) * gap_extend_penalty +
                                      gap_open_penalty);
      }
      v_open_decay[s] = Ops::load(buf);
      for (int64_t l = 0; l < lanes; ++l) {
        const int64_t k = l * seg_len + s;
        buf[l] = static_cast<int16_t>(k * gap_extend_penalty);
      }
      v_kext[s] = Ops::load(buf);
      // query codes for the j == 0 state: element k holds row
      // i(0, k) = -d0 - half + k (out-of-range rows pad with -1)
      for (int64_t l = 0; l < lanes; ++l) {
        const int64_t i0 = -d0 - half + (l * seg_len + s);
        buf[l] = (i0 >= 1 && i0 <= m)
                     ? static_cast<int16_t>(
                           static_cast<unsigned char>(query[i0 - 1]))
                     : static_cast<int16_t>(-1);
      }
      v_qcode[s] = Ops::load(buf);
    }
  }

  std::vector<V> h_prev(seg_len, v_zero), e_prev(seg_len, v_zero);
  std::vector<V> h_new(seg_len), e_new(seg_len), diag(seg_len),
      pref(seg_len);
  std::vector<V> v_best(seg_len, v_zero), v_best_j(seg_len, v_zero);

  static thread_local std::vector<int16_t> tl_band_h;
  static thread_local std::vector<uint32_t> tl_band_bits;
  const size_t plane_elems = static_cast<size_t>(n) * band;
  int16_t* h_plane = aligned_plane(tl_band_h, plane_elems);
  uint32_t* bit_plane =
      aligned_plane(tl_band_bits, static_cast<size_t>(n) * seg_len);

  for (int64_t j = 1; j <= n; ++j) {
    // shift the query-code window down one element; the band-bottom
    // element (k = band-1) receives the newly entering row
    {
      const V q0 = v_qcode[0];
      for (int64_t s = 0; s + 1 < seg_len; ++s) v_qcode[s] = v_qcode[s + 1];
      const int64_t i_bot = j - d0 - half + band - 1;
      const int16_t c_bot =
          (i_bot >= 1 && i_bot <= m)
              ? static_cast<int16_t>(
                    static_cast<unsigned char>(query[i_bot - 1]))
              : static_cast<int16_t>(-1);
      v_qcode[seg_len - 1] =
          Ops::insert_last(Ops::shift_one_down(q0), c_bot);
    }
    const V h_dep_last = Ops::shift_one_down(h_prev[0]);  // out-of-band: 0
    const V e_dep_last =
        Ops::add(Ops::shift_one_down(e_prev[0]), v_last_neg);

    const V v_tc = Ops::set1(static_cast<int16_t>(
        static_cast<unsigned char>(target[j - 1])));
    int16_t* h_col = h_plane + (j - 1) * band;
    uint32_t* bit_col = bit_plane + (j - 1) * seg_len;

    // pass 1: E, diag, H0, in-lane inclusive G prefix
    for (int64_t s = 0; s < seg_len; ++s) {
      const V h_dep = (s + 1 < seg_len) ? h_prev[s + 1] : h_dep_last;
      const V e_dep = (s + 1 < seg_len) ? e_prev[s + 1] : e_dep_last;
      e_new[s] = Ops::max(Ops::sub(e_dep, v_gap_ext),
                          Ops::sub(h_dep, v_gap_open));
      const V eq = Ops::cmpeq(v_qcode[s], v_tc);
      diag[s] = Ops::add(h_prev[s], Ops::blend(v_mism, v_match, eq));
      const V h0 = Ops::max(Ops::max(diag[s], e_new[s]), v_zero);
      h_new[s] = h0;
      const V g = Ops::add(h0, v_kext[s]);
      pref[s] = s == 0 ? g : Ops::max(pref[s - 1], g);
    }
    // cross-lane exclusive carry; above-band is out-of-band -> -inf
    alignas(32) int16_t totals[Ops::kLanes], carries[Ops::kLanes];
    Ops::store(totals, pref[seg_len - 1]);
    int16_t running = kBandNegInf;
    for (int64_t l = 0; l < lanes; ++l) {
      carries[l] = running;
      running = std::max(running, totals[l]);
    }
    const V v_carry = Ops::load(carries);

    // pass 2: F, final H, i > m masking, plane stores, best tracking
    const int64_t k_lim = m + d0 + half - j;  // largest k with i(j,k) <= m
    const V v_klim = Ops::set1(static_cast<int16_t>(
        std::max<int64_t>(-1, std::min<int64_t>(k_lim, 32000))));
    const V v_j = Ops::set1(static_cast<int16_t>(j));
    for (int64_t s = 0; s < seg_len; ++s) {
      const V excl = s == 0 ? v_carry : Ops::max(v_carry, pref[s - 1]);
      const V f_scan = Ops::sub(excl, v_open_decay[s]);
      V h_final = Ops::max(h_new[s], f_scan);
      const V invalid = Ops::cmpgt(v_kidx[s], v_klim);
      h_final = Ops::blend(h_final, v_zero, invalid);
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
  _mm_sfence();

  const auto release_oversized = [&]() {
    if (plane_elems > kPlaneReuseCap) {
      tl_band_h.clear();
      tl_band_h.shrink_to_fit();
      tl_band_bits.clear();
      tl_band_bits.shrink_to_fit();
    }
  };

  // global best with the scalar's row-major (i, j) tie-breaking: each
  // element's tracked j is its earliest maximum (strict-improvement
  // blending), which on a fixed diagonal is also its earliest i
  int32_t best = 0;
  int64_t best_i = -1, best_j = -1;
  {
    alignas(32) int16_t b[Ops::kLanes], bj[Ops::kLanes];
    for (int64_t s = 0; s < seg_len; ++s) {
      Ops::store(b, v_best[s]);
      Ops::store(bj, v_best_j[s]);
      for (int64_t l = 0; l < lanes; ++l) {
        const int32_t score = b[l];
        if (score < best) continue;
        const int64_t k = l * seg_len + s;
        const int64_t jj = bj[l];
        const int64_t ii = jj - d0 - half + k;
        if (score > best ||
            (score == best && (ii < best_i ||
                               (ii == best_i && jj < best_j)))) {
          best = score;
          best_i = ii;
          best_j = jj;
        }
      }
    }
  }

  // gate A: certify that no out-of-band path can reach the banded best
  const int64_t u_bound =
      static_cast<int64_t>(match_score) *
      std::max<int64_t>(m + d0 - half, n - d0 - half - 1);
  if (best <= u_bound || best <= 0) {
    release_oversized();
    return false;
  }

  // traceback (the striped engine's exact replay), gated to stay one
  // element inside the band so every compared neighbor is in-band
  const auto k_of = [&](int64_t i, int64_t jj) { return i - jj + d0 + half; };
  const auto h_at = [&](int64_t i, int64_t jj) -> int32_t {
    if (i < 1 || jj < 1) return 0;
    const int64_t k = k_of(i, jj);
    return h_plane[(jj - 1) * band + (k % seg_len) * lanes + (k / seg_len)];
  };
  const auto left_bit = [&](int64_t i, int64_t jj) -> bool {
    const int64_t k = k_of(i, jj);
    return (bit_plane[(jj - 1) * seg_len + (k % seg_len)] >>
            (2 * (k / seg_len))) & 1;
  };
  const auto interior = [&](int64_t i, int64_t jj) {
    const int64_t k = k_of(i, jj);
    return k >= 1 && k <= band - 2;
  };

  const int gap_open = gap_open_penalty;
  const int gap_ext = gap_extend_penalty;
  std::string ops;
  int64_t i = best_i, j = best_j;
  if (!interior(i, j)) {
    release_oversized();
    return false;
  }
  out->best_score = best;
  out->ref_end = best_j - 1;
  out->query_end = best_i - 1;
  while (i > 0 && j > 0) {
    if (!interior(i, j)) {
      release_oversized();
      return false;
    }
    const int32_t h = h_at(i, j);
    if (h == 0) break;
    const int32_t diag_v =
        h_at(i - 1, j - 1) +
        (query[i - 1] == target[j - 1] ? match_score : -mismatch_penalty);
    if (h == diag_v) {
      ops.push_back(query[i - 1] == target[j - 1] ? '=' : 'X');
      --i;
      --j;
    } else if (left_bit(i, j)) {
      int32_t e_val = h;
      while (j > 0 && e_val > h_at(i, j - 1) - gap_open) {
        ops.push_back('D');
        --j;
        e_val += gap_ext;
        if (j > 0 && !interior(i, j)) {
          release_oversized();
          return false;
        }
      }
      if (j > 0) {
        ops.push_back('D');
        --j;
      }
    } else {
      int32_t f_val = h;
      while (i > 0 && f_val > h_at(i - 1, j) - gap_open) {
        ops.push_back('I');
        --i;
        f_val += gap_ext;
        if (i > 0 && !interior(i, j)) {
          release_oversized();
          return false;
        }
      }
      if (i > 0) {
        ops.push_back('I');
        --i;
      }
    }
  }
  out->ref_begin = j;
  out->query_begin = i;
  out->cigar = build_cigar(ops, out->query_begin, out->query_end, m);
  release_oversized();
  return true;
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

namespace {

// Perfect-match fast path (the sound core of the reference's own
// fast-pass idea, aligner.cpp:71-120): a full-length exact occurrence
// of the query that is UNIQUE in the target is provably the unique
// optimum — any local alignment scores <= match*m with equality only
// for a full-length penalty-free (i.e. exact) occurrence, and
// uniqueness satisfies the engines' first-maximal-cell tie-break.
// Skips the O(n*m) DP entirely; mismatched/gapped reads (any real
// error process) fall through to the full engines.
bool try_perfect_match(const std::string& target, const std::string& query,
                       int match_score, int mismatch_penalty,
                       int gap_open_penalty, int gap_extend_penalty,
                       AlignmentResult* out) {
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
        out->best_score = static_cast<int>(match_score * m);
        out->ref_begin = off;
        out->ref_end = off + m - 1;
        out->query_begin = 0;
        out->query_end = m - 1;
        out->cigar = std::to_string(m) + "=";
        return true;
      }
    }
  }
  return false;
}

}  // namespace

AlignmentResult smith_waterman(const std::string& target,
                               const std::string& query, int match_score,
                               int mismatch_penalty, int gap_open_penalty,
                               int gap_extend_penalty) {
  {
    AlignmentResult pm;
    if (try_perfect_match(target, query, match_score, mismatch_penalty,
                          gap_open_penalty, gap_extend_penalty, &pm))
      return pm;
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

AlignmentResult smith_waterman_hint(const std::string& target,
                                    const std::string& query,
                                    int match_score, int mismatch_penalty,
                                    int gap_open_penalty,
                                    int gap_extend_penalty,
                                    int64_t expected_offset) {
  {
    AlignmentResult pm;
    if (try_perfect_match(target, query, match_score, mismatch_penalty,
                          gap_open_penalty, gap_extend_penalty, &pm))
      return pm;
  }
#ifdef __SSE2__
  const int64_t n = static_cast<int64_t>(target.size());
  const int64_t m = static_cast<int64_t>(query.size());
  const int64_t max_h =
      static_cast<int64_t>(match_score) * std::min(m, n);
  constexpr int64_t kBand = 320;  // see the banded-engine gate analysis
  // Certification precheck: the gate can only pass when the out-of-band
  // score bound U sits below the best score a real (error-carrying) read
  // can reach, which requires the band to cover essentially every
  // placement able to use the full query — i.e. m close to n with a
  // small expected offset (window-spanning reads, the bulk of the DP
  // cells in the polish realign stage).  Reads clipped well inside the
  // window can never certify (a distant placement could use all m bases),
  // so skip the banded attempt instead of paying banded + full.
  const int64_t cert_margin = m / 16;  // ~6% score-deficit allowance
  const bool certifiable =
      m + expected_offset - kBand / 2 <= std::min(m, n) - cert_margin &&
      n - expected_offset - kBand / 2 - 1 <= std::min(m, n) - cert_margin;
  // banded is worthwhile only when the band is well under the query, and
  // it requires the same int16 guards as the striped engine
  if (certifiable && expected_offset >= 0 && expected_offset <= n &&
      m >= kBand + 256 &&
      m > 0 && n > 0 && gap_open_penalty >= gap_extend_penalty &&
      gap_extend_penalty >= 1 && mismatch_penalty >= 0 &&
      mismatch_penalty <= 30000 && match_score >= 1 &&
      match_score <= 30000 && gap_open_penalty <= 30000 && n <= 30000 &&
      max_h + gap_extend_penalty * m <= 30000 &&
      gap_extend_penalty * n + gap_open_penalty <= 30000 &&
      max_h <= 30000) {
    AlignmentResult banded;
    g_band_attempts.fetch_add(1, std::memory_order_relaxed);
#ifdef __AVX2__
    const bool ok = smith_waterman_banded_impl<Avx2Ops>(
        target, query, match_score, mismatch_penalty, gap_open_penalty,
        gap_extend_penalty, expected_offset, kBand, &banded);
#else
    const bool ok = smith_waterman_banded_impl<Sse2Ops>(
        target, query, match_score, mismatch_penalty, gap_open_penalty,
        gap_extend_penalty, expected_offset, kBand, &banded);
#endif
    if (ok) {
      g_band_hits.fetch_add(1, std::memory_order_relaxed);
      return banded;
    }
  }
#endif
  return smith_waterman(target, query, match_score, mismatch_penalty,
                        gap_open_penalty, gap_extend_penalty);
}

// exported via capi.cpp: banded attempts / certified hits since load
void pepper_band_stats_impl(long long* attempts, long long* hits) {
  *attempts = g_band_attempts.load(std::memory_order_relaxed);
  *hits = g_band_hits.load(std::memory_order_relaxed);
}
