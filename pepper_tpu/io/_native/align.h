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

// Auto-dispatch with a per-read diagonal hint (the query's expected
// offset in the target, e.g. a realigned read's original mapped offset):
// tries a certified-exact banded DP first (provable global-optimality
// gate + in-band traceback, ~2.7x fewer cells at 1 kb scale) and falls
// back to the full engines whenever the certificate fails.  Results are
// identical to smith_waterman() whenever the banded path is taken
// (fuzz-asserted in tests/test_align.py / tests/test_polish.py).
AlignmentResult smith_waterman_hint(const std::string& target,
                                    const std::string& query,
                                    int match_score, int mismatch_penalty,
                                    int gap_open_penalty,
                                    int gap_extend_penalty,
                                    int64_t expected_offset);

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

// Banded-path observability: cumulative certified-banded attempts and
// successes since library load (fallbacks = attempts - hits).
void pepper_band_stats_impl(long long* attempts, long long* hits);
