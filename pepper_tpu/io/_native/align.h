// Affine-gap local alignment (Smith-Waterman/Gotoh) — fills the role of
// the reference's vendored SSW library (pepper/modules/src/local_reassembly/
// ssw.c, scoring match=4 mismatch=6 gap_open=8 gap_ext=2, aligner.h:22-28)
// for read realignment and overlap stitching.  Clean-room scalar DP with
// traceback; the CIGAR uses SSW's conventions ('='/'X' ops, soft clips for
// unaligned query ends).
#pragma once

#include <cstdint>
#include <string>

struct AlignmentResult {
  int best_score = 0;
  int64_t ref_begin = -1, ref_end = -1;      // inclusive target window
  int64_t query_begin = -1, query_end = -1;  // inclusive query window
  std::string cigar;                         // e.g. "2S10=1X3I8=" (query)
};

// Auto-dispatch: striped SSE2 engine when in range (bit-identical to the
// scalar engine), scalar DP otherwise.
AlignmentResult smith_waterman(const std::string& target,
                               const std::string& query, int match_score,
                               int mismatch_penalty, int gap_open_penalty,
                               int gap_extend_penalty);

// The scalar golden engine (always available; used for parity fuzzing).
AlignmentResult smith_waterman_scalar(const std::string& target,
                                      const std::string& query,
                                      int match_score, int mismatch_penalty,
                                      int gap_open_penalty,
                                      int gap_extend_penalty);

// The 8-lane (SSE2-width) striped engine, exported so width parity can be
// fuzzed on AVX2 hosts where auto-dispatch would only ever exercise the
// 16-lane build.  Callers must respect the striped range guards; falls
// back to scalar when SSE2 is unavailable.
AlignmentResult smith_waterman_striped_narrow(const std::string& target,
                                              const std::string& query,
                                              int match_score,
                                              int mismatch_penalty,
                                              int gap_open_penalty,
                                              int gap_extend_penalty);
