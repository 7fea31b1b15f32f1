// C ABI surface consumed by pepper_tpu.io.native via ctypes.
#include <cstdlib>
#include <cstring>
#include <string>

#include "align.h"
#include "bam.h"
#include "fasta.h"
#include "inflate.h"
#include "pileup.h"

extern "C" {

// ---------------- raw-DEFLATE inflater (fuzz surface) ----------------

// Returns 0 on success; out must have capacity out_len + 8.
int pepper_inflate_raw(const unsigned char* in, long long in_len,
                       unsigned char* out, long long out_len) {
  return pepper_inflate(in, static_cast<size_t>(in_len), out,
                        static_cast<size_t>(out_len),
                        static_cast<size_t>(out_len) + 8);
}

// ---------------- BAM ----------------

void* pepper_bam_open(const char* path) {
  auto* reader = new BamReader(path);
  if (!reader->ok()) {
    delete reader;
    return nullptr;
  }
  return reader;
}

void pepper_bam_close(void* handle) { delete static_cast<BamReader*>(handle); }

int pepper_bam_n_targets(void* handle) {
  return static_cast<int>(static_cast<BamReader*>(handle)->target_names().size());
}

const char* pepper_bam_target_name(void* handle, int i) {
  return static_cast<BamReader*>(handle)->target_names()[i].c_str();
}

long long pepper_bam_target_len(void* handle, int i) {
  return static_cast<BamReader*>(handle)->target_lens()[i];
}

void* pepper_bam_get_reads(void* handle, const char* chrom, long long start,
                           long long stop, int include_supplementary,
                           int min_mapq, int min_baseq) {
  auto batch = static_cast<BamReader*>(handle)->get_reads(
      chrom, start, stop, include_supplementary != 0, min_mapq, min_baseq);
  return batch.release();
}

void pepper_readbatch_free(void* batch) {
  delete static_cast<ReadBatch*>(batch);
}

long long pepper_rb_n_reads(void* batch) {
  return static_cast<long long>(static_cast<ReadBatch*>(batch)->n_reads());
}

#define RB_FIELD(name, type, member)                         \
  const type* pepper_rb_##name(void* batch) {                \
    return static_cast<ReadBatch*>(batch)->member.data();    \
  }

RB_FIELD(pos, int64_t, pos)
RB_FIELD(pos_end, int64_t, pos_end)
RB_FIELD(mapq, int32_t, mapq)
RB_FIELD(flag, int32_t, flag)
RB_FIELD(hp, int32_t, hp)
RB_FIELD(seq_offsets, int64_t, seq_offsets)
RB_FIELD(seq, char, seq)
RB_FIELD(qual, uint8_t, qual)
RB_FIELD(cigar_offsets, int64_t, cigar_offsets)
RB_FIELD(cigar_ops, uint8_t, cigar_ops)
RB_FIELD(cigar_lens, int32_t, cigar_lens)
RB_FIELD(name_offsets, int64_t, name_offsets)
RB_FIELD(names, char, names)

#undef RB_FIELD

long long pepper_rb_seq_size(void* batch) {
  return static_cast<long long>(static_cast<ReadBatch*>(batch)->seq.size());
}
long long pepper_rb_cigar_size(void* batch) {
  return static_cast<long long>(
      static_cast<ReadBatch*>(batch)->cigar_ops.size());
}
long long pepper_rb_names_size(void* batch) {
  return static_cast<long long>(static_cast<ReadBatch*>(batch)->names.size());
}

// ---------------- Alignment ----------------

void* pepper_align(const char* target, const char* query, int match_score,
                   int mismatch_penalty, int gap_open, int gap_ext) {
  return new AlignmentResult(smith_waterman(target, query, match_score,
                                            mismatch_penalty, gap_open,
                                            gap_ext));
}

void* pepper_align_scalar(const char* target, const char* query,
                          int match_score, int mismatch_penalty,
                          int gap_open, int gap_ext) {
  return new AlignmentResult(smith_waterman_scalar(
      target, query, match_score, mismatch_penalty, gap_open, gap_ext));
}

void* pepper_align_narrow(const char* target, const char* query,
                          int match_score, int mismatch_penalty,
                          int gap_open, int gap_ext) {
  return new AlignmentResult(smith_waterman_striped_narrow(
      target, query, match_score, mismatch_penalty, gap_open, gap_ext));
}

// Batched realignment (polish realign_reads hot loop without per-read
// ctypes/string round-trips): aligns every read against one target and
// emits BAM-coded CIGAR arrays directly.  out_pos[i] = ref_begin (or -1
// when best_score <= 0 — caller keeps the original alignment);
// out_ref_span[i] = reference bases consumed (M/=/X/D).  Returns the
// total op count, or -1 if ops_cap would be exceeded or an unexpected
// CIGAR op appears (caller falls back to the Python engine).
long long pepper_align_batch(
    const char* target, long long target_len, const long long* seq_offsets,
    const unsigned char* seq, long long n_reads, int match_score,
    int mismatch_penalty, int gap_open, int gap_ext, long long* out_pos,
    long long* out_ref_span, unsigned char* out_ops, int* out_lens,
    long long* out_cigar_offsets, long long ops_cap,
    const long long* exp_offsets) {
  const std::string target_str(target, static_cast<size_t>(target_len));
  // exp_offsets (optional): per-read expected target offset — the mapped
  // position the read came from — enabling the certified banded DP;
  // PEPPER_NO_BAND=1 forces the full engines (A/B kill switch)
  const bool use_hint =
      exp_offsets != nullptr && getenv("PEPPER_NO_BAND") == nullptr;
  long long n_ops = 0;
  out_cigar_offsets[0] = 0;
  for (long long r = 0; r < n_reads; ++r) {
    const long long s = seq_offsets[r], e = seq_offsets[r + 1];
    const std::string query(reinterpret_cast<const char*>(seq + s),
                            static_cast<size_t>(e - s));
    AlignmentResult res =
        use_hint ? smith_waterman_hint(target_str, query, match_score,
                                       mismatch_penalty, gap_open, gap_ext,
                                       exp_offsets[r])
                 : smith_waterman(target_str, query, match_score,
                                  mismatch_penalty, gap_open, gap_ext);
    if (res.best_score <= 0) {
      out_pos[r] = -1;
      out_ref_span[r] = 0;
      out_cigar_offsets[r + 1] = n_ops;
      continue;
    }
    out_pos[r] = res.ref_begin;
    long long ref_span = 0;
    long long value = 0;
    for (const char ch : res.cigar) {
      if (ch >= '0' && ch <= '9') {
        value = value * 10 + (ch - '0');
        continue;
      }
      int op;
      switch (ch) {  // polish/realign.py _CIGAR_OP_CODE
        case 'M': op = 0; break;
        case 'I': op = 1; break;
        case 'D': op = 2; break;
        case 'S': op = 4; break;
        case '=': op = 7; break;
        case 'X': op = 8; break;
        // the aligner only emits the ops above; anything else would
        // corrupt ref_span/cigar codes, so signal the caller to fall
        // back to the per-read Python engine
        default: return -1;
      }
      if (op == 0 || op == 2 || op == 7 || op == 8) ref_span += value;
      if (n_ops >= ops_cap) return -1;
      out_ops[n_ops] = static_cast<unsigned char>(op);
      out_lens[n_ops] = static_cast<int>(value);
      ++n_ops;
      value = 0;
    }
    out_ref_span[r] = ref_span;
    out_cigar_offsets[r + 1] = n_ops;
  }
  return n_ops;
}

void pepper_align_free(void* a) { delete static_cast<AlignmentResult*>(a); }

void pepper_band_stats(long long* attempts, long long* hits) {
  pepper_band_stats_impl(attempts, hits);
}

int pepper_align_score(void* a) {
  return static_cast<AlignmentResult*>(a)->best_score;
}
long long pepper_align_ref_begin(void* a) {
  return static_cast<AlignmentResult*>(a)->ref_begin;
}
long long pepper_align_ref_end(void* a) {
  return static_cast<AlignmentResult*>(a)->ref_end;
}
long long pepper_align_query_begin(void* a) {
  return static_cast<AlignmentResult*>(a)->query_begin;
}
long long pepper_align_query_end(void* a) {
  return static_cast<AlignmentResult*>(a)->query_end;
}
const char* pepper_align_cigar(void* a) {
  return static_cast<AlignmentResult*>(a)->cigar.c_str();
}

// ---------------- Polish summary walk ----------------

long long pepper_polish_summary(
    const long long* pos, const long long* seq_offsets,
    const unsigned char* seq, const long long* cigar_offsets,
    const unsigned char* cigar_ops, const int* cigar_lens, const int* mapq,
    const int* flag, long long n_reads, long long region_start,
    long long region_end, double* base_dense, double* cov_dense,
    int* insert_events, long long insert_cap) {
  return polish_summary_walk(
      reinterpret_cast<const int64_t*>(pos),
      reinterpret_cast<const int64_t*>(seq_offsets), seq,
      reinterpret_cast<const int64_t*>(cigar_offsets), cigar_ops,
      reinterpret_cast<const int32_t*>(cigar_lens),
      reinterpret_cast<const int32_t*>(mapq),
      reinterpret_cast<const int32_t*>(flag), n_reads, region_start,
      region_end, base_dense, cov_dense,
      reinterpret_cast<int32_t*>(insert_events), insert_cap);
}

// ---------------- Candidate-window emission ----------------

long long pepper_emit_windows(
    const signed char* image, int features, long long region_size,
    int window_size, long long n_positions, const long long* base_index,
    const int* depth, const unsigned char* ref_base,
    const unsigned char* pass_mask, const long long* allele_lo,
    const long long* allele_hi, const char* allele_blob,
    const long long* allele_offsets, const int* allele_total,
    const int* allele_fwd, const int* allele_rev, double support_threshold,
    double snp_freq_threshold, double indel_freq_threshold, int skip_indels,
    signed char* out_images, int* out_position_k, long long* out_allele_index,
    int* out_freq, long long out_cap, int hp_mode,
    const int* allele_fwd_hp2, const int* allele_rev_hp2) {
  return emit_candidate_windows(
      reinterpret_cast<const int8_t*>(image), features, region_size,
      window_size, n_positions,
      reinterpret_cast<const int64_t*>(base_index),
      reinterpret_cast<const int32_t*>(depth), ref_base, pass_mask,
      reinterpret_cast<const int64_t*>(allele_lo),
      reinterpret_cast<const int64_t*>(allele_hi), allele_blob,
      reinterpret_cast<const int64_t*>(allele_offsets),
      reinterpret_cast<const int32_t*>(allele_total),
      reinterpret_cast<const int32_t*>(allele_fwd),
      reinterpret_cast<const int32_t*>(allele_rev), support_threshold,
      snp_freq_threshold, indel_freq_threshold, skip_indels,
      reinterpret_cast<int8_t*>(out_images),
      reinterpret_cast<int32_t*>(out_position_k),
      reinterpret_cast<int64_t*>(out_allele_index),
      reinterpret_cast<int32_t*>(out_freq), out_cap, hp_mode,
      reinterpret_cast<const int32_t*>(allele_fwd_hp2),
      reinterpret_cast<const int32_t*>(allele_rev_hp2));
}

// ---------------- Pileup ----------------

// Builds a ReadBatch view from packed arrays (so Python-side downsampled
// batches can run the native walk) and accumulates the pileup.
void* pepper_pileup_run(long long n_reads, const long long* pos,
                        const int* flag, const int* mapq, const int* hp,
                        const long long* seq_offsets, const char* seq,
                        const unsigned char* qual,
                        const long long* cigar_offsets,
                        const unsigned char* cigar_ops,
                        const int* cigar_lens, const char* ref_seq,
                        long long ref_start, long long ref_end,
                        double min_snp_baseq, double min_indel_baseq,
                        int hp_mode) {
  ReadBatch batch;
  batch.pos.assign(pos, pos + n_reads);
  batch.flag.assign(flag, flag + n_reads);
  batch.mapq.assign(mapq, mapq + n_reads);
  batch.hp.assign(hp, hp + n_reads);
  batch.seq_offsets.assign(seq_offsets, seq_offsets + n_reads + 1);
  const long long seq_size = seq_offsets[n_reads];
  batch.seq.assign(seq, seq + seq_size);
  batch.qual.assign(qual, qual + seq_size);
  batch.cigar_offsets.assign(cigar_offsets, cigar_offsets + n_reads + 1);
  const long long cigar_size = cigar_offsets[n_reads];
  batch.cigar_ops.assign(cigar_ops, cigar_ops + cigar_size);
  batch.cigar_lens.assign(cigar_lens, cigar_lens + cigar_size);
  batch.pos_end.assign(n_reads, 0);

  auto* result = new PileupResult(pileup_run(
      batch, std::string(ref_seq), ref_start, ref_end, min_snp_baseq,
      min_indel_baseq, hp_mode));
  return result;
}

void pepper_pileup_free(void* p) { delete static_cast<PileupResult*>(p); }

long long pepper_pileup_n_rows(void* p) {
  return static_cast<PileupResult*>(p)->n_rows;
}
int pepper_pileup_features(void* p) {
  return static_cast<PileupResult*>(p)->features;
}
long long pepper_pileup_n_alleles(void* p) {
  return static_cast<long long>(
      static_cast<PileupResult*>(p)->allele_pos.size());
}
long long pepper_pileup_strs_size(void* p) {
  return static_cast<long long>(
      static_cast<PileupResult*>(p)->allele_strs.size());
}

#define PILEUP_FIELD(name, type, member)                    \
  const type* pepper_pileup_##name(void* p) {               \
    return static_cast<PileupResult*>(p)->member.data();    \
  }

PILEUP_FIELD(image, int32_t, image)
PILEUP_FIELD(coverage, int32_t, coverage)
PILEUP_FIELD(snp_count, int32_t, snp_count)
PILEUP_FIELD(insert_count, int32_t, insert_count)
PILEUP_FIELD(delete_count, int32_t, delete_count)
PILEUP_FIELD(allele_pos, int64_t, allele_pos)
PILEUP_FIELD(allele_total, int32_t, allele_total)
PILEUP_FIELD(allele_fwd, int32_t, allele_fwd)
PILEUP_FIELD(allele_rev, int32_t, allele_rev)
PILEUP_FIELD(allele_fwd_hp1, int32_t, allele_fwd_hp1)
PILEUP_FIELD(allele_rev_hp1, int32_t, allele_rev_hp1)
PILEUP_FIELD(allele_fwd_hp2, int32_t, allele_fwd_hp2)
PILEUP_FIELD(allele_rev_hp2, int32_t, allele_rev_hp2)
PILEUP_FIELD(allele_str_offsets, int64_t, allele_str_offsets)
PILEUP_FIELD(allele_strs, char, allele_strs)

#undef PILEUP_FIELD

// ---------------- FASTA ----------------

void* pepper_fasta_open(const char* path) {
  auto* reader = new FastaReader(path);
  if (!reader->ok()) {
    delete reader;
    return nullptr;
  }
  return reader;
}

void pepper_fasta_close(void* handle) {
  delete static_cast<FastaReader*>(handle);
}

int pepper_fasta_n_sequences(void* handle) {
  return static_cast<int>(static_cast<FastaReader*>(handle)->names().size());
}

const char* pepper_fasta_sequence_name(void* handle, int i) {
  return static_cast<FastaReader*>(handle)->names()[i].c_str();
}

long long pepper_fasta_sequence_length(void* handle, const char* name) {
  return static_cast<FastaReader*>(handle)->sequence_length(name);
}

// Writes up to (stop-start) bytes into out; returns bytes written.
long long pepper_fasta_get_sequence(void* handle, const char* name,
                                    long long start, long long stop,
                                    char* out) {
  const std::string seq =
      static_cast<FastaReader*>(handle)->get_sequence(name, start, stop);
  std::memcpy(out, seq.data(), seq.size());
  return static_cast<long long>(seq.size());
}

}  // extern "C"
