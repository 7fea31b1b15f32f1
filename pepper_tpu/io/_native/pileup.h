// Native pileup accumulation: the per-read scatter-accumulate walk
// (reference region_summary.cpp:337-566 / region_summary_hp.cpp:330-676)
// over a whole ReadBatch, producing the image matrix, count vectors and
// allele tallies in one pass.  Semantics must stay bit-identical to the
// Python golden walkers in pepper_tpu/ops/pileup_ref.py / pileup_hp.py
// (which are themselves exact to the reference) — fuzz-tested in
// tests/test_native_pileup.py.
#pragma once

#include <cstdint>
#include <map>
#include <string>
#include <utility>
#include <vector>

#include "bam.h"

struct AlleleTally {
  int32_t total = 0;
  int32_t fwd = 0, rev = 0;              // non-HP strand tallies
  int32_t fwd_hp1 = 0, rev_hp1 = 0;      // HP mode tallies
  int32_t fwd_hp2 = 0, rev_hp2 = 0;
};

struct PileupResult {
  int64_t n_rows = 0;
  int features = 0;
  // int32 keeps the hot accumulation working set (~10 MB per 100 kb
  // region) at half the memory traffic; magnitudes are bounded by the
  // per-region read cap so int32 never saturates
  std::vector<int32_t> image;            // row-major (n_rows x features)
  std::vector<int32_t> coverage, snp_count, insert_count, delete_count;
  // allele tallies sorted by (region_index, candidate string); columnar
  std::vector<int64_t> allele_pos;
  std::vector<int32_t> allele_total;
  std::vector<int32_t> allele_fwd, allele_rev;
  std::vector<int32_t> allele_fwd_hp1, allele_rev_hp1;
  std::vector<int32_t> allele_fwd_hp2, allele_rev_hp2;
  std::vector<int64_t> allele_str_offsets;  // n+1
  std::vector<char> allele_strs;
};

// hp_mode = 0: 26-feature variant image; 1: 48-feature HP image.
PileupResult pileup_run(const ReadBatch& batch, const std::string& ref_seq,
                        int64_t ref_start, int64_t ref_end,
                        double min_snp_baseq, double min_indel_baseq,
                        int hp_mode);

// Polish-mode summary walk (pepper summary_generator.cpp:60-140 semantics;
// golden spec: pepper_tpu/polish/summary.py _iterate_over_read).  Walks
// every read with mapq > 0, accumulating the 10-channel base/coverage
// dense arrays over [region_start, region_end] (incl. the
// deletion-coverage-at-anchor quirk) and emitting one (anchor_offset,
// insert_index, feature) int32 triple per in-region inserted base into
// insert_events.  Returns the number of triples written, or -1 if
// insert_cap (in triples) would be exceeded.
long long polish_summary_walk(
    const int64_t* pos, const int64_t* seq_offsets, const uint8_t* seq,
    const int64_t* cigar_offsets, const uint8_t* cigar_ops,
    const int32_t* cigar_lens, const int32_t* mapq, const int32_t* flag,
    int64_t n_reads, int64_t region_start, int64_t region_end,
    double* base_dense, double* cov_dense, int32_t* insert_events,
    int64_t insert_cap);

// Candidate-window emission for the inference path (golden spec:
// ops/pileup_ref.py generate_summary's per-candidate loop; Python engine
// under PEPPER_PY_WINDOWS=1).  See pileup.cpp for the contract.
long long emit_candidate_windows(
    const int8_t* image, int features, int64_t region_size,
    int window_size, int64_t n_positions, const int64_t* base_index,
    const int32_t* depth, const uint8_t* ref_base, const uint8_t* pass_mask,
    const int64_t* allele_lo, const int64_t* allele_hi,
    const char* allele_blob, const int64_t* allele_offsets,
    const int32_t* allele_total, const int32_t* allele_fwd,
    const int32_t* allele_rev, double support_threshold,
    double snp_freq_threshold, double indel_freq_threshold, int skip_indels,
    int8_t* out_images, int32_t* out_position_k, int64_t* out_allele_index,
    int32_t* out_freq, int64_t out_cap, int hp_mode,
    const int32_t* allele_fwd_hp2, const int32_t* allele_rev_hp2);
