#include "align.h"

#include <algorithm>
#include <vector>

namespace {

enum Trace : uint8_t {
  TRACE_NONE = 0,
  TRACE_DIAG = 1,
  TRACE_UP = 2,    // gap in query (deletion from target): consume target
  TRACE_LEFT = 3,  // gap in target (insertion in query): consume query
};

}  // namespace

AlignmentResult smith_waterman(const std::string& target,
                               const std::string& query, int match_score,
                               int mismatch_penalty, int gap_open_penalty,
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

  // build run-length cigar with soft clips for unaligned query ends
  std::string cigar;
  auto append_run = [&cigar](char op, int64_t count) {
    if (count > 0) cigar += std::to_string(count) + op;
  };
  append_run('S', result.query_begin);
  int64_t run = 0;
  char run_op = 0;
  for (auto it = ops.rbegin(); it != ops.rend(); ++it) {
    if (*it == run_op) {
      ++run;
    } else {
      append_run(run_op, run);
      run_op = *it;
      run = 1;
    }
  }
  append_run(run_op, run);
  append_run('S', m - 1 - result.query_end);
  result.cigar = cigar;
  return result;
}
