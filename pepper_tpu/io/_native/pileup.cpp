#include <cstring>

#include "pileup.h"

#include <algorithm>
#include <cctype>
#include <cmath>

#ifdef __SSE2__
#include <emmintrin.h>
#endif

namespace {

// Length of the leading run where base==ref AND qual>=minq (byte-equality
// like the scalar walk; SSE2 16-lane compare + movemask).
inline int64_t good_run_length(const char* seq, const char* ref,
                               const uint8_t* qual, int minq, int64_t maxn) {
  int64_t n = 0;
#ifdef __SSE2__
  const __m128i v_thr = _mm_set1_epi8(static_cast<char>(
      static_cast<unsigned char>(minq)));
  while (n + 16 <= maxn) {
    const __m128i v_seq = _mm_loadu_si128(
        reinterpret_cast<const __m128i*>(seq + n));
    const __m128i v_ref = _mm_loadu_si128(
        reinterpret_cast<const __m128i*>(ref + n));
    const __m128i v_q = _mm_loadu_si128(
        reinterpret_cast<const __m128i*>(qual + n));
    const __m128i eq = _mm_cmpeq_epi8(v_seq, v_ref);
    const __m128i ge = _mm_cmpeq_epi8(_mm_max_epu8(v_q, v_thr), v_q);
    const int mask = _mm_movemask_epi8(_mm_and_si128(eq, ge));
    if (mask != 0xFFFF)
      return n + __builtin_ctz(~mask & 0xFFFF);
    n += 16;
  }
#endif
  while (n < maxn && seq[n] == ref[n] &&
         qual[n] >= static_cast<uint8_t>(minq))
    ++n;
  return n;
}

// 256-entry tables replace per-base toupper/switch calls in the hot loop.
struct BaseTables {
  bool valid_ref[256];
  int offset[256];
  constexpr BaseTables() : valid_ref(), offset() {
    for (int i = 0; i < 256; ++i) offset[i] = 7;
    const char upper[] = "ACGTID";
    const char lower[] = "acgtid";
    const int offs[] = {1, 2, 3, 4, 5, 6};
    for (int i = 0; i < 6; ++i) {
      offset[static_cast<unsigned char>(upper[i])] = offs[i];
      offset[static_cast<unsigned char>(lower[i])] = offs[i];
    }
    for (const char* p = "ACGTacgt"; *p; ++p)
      valid_ref[static_cast<unsigned char>(*p)] = true;
  }
};

constexpr BaseTables kBase;

inline bool valid_ref_base(char base) {
  return kBase.valid_ref[static_cast<unsigned char>(base)];
}

inline int base_offset(char base) {
  return kBase.offset[static_cast<unsigned char>(base)];
}

// Non-HP feature column (region_summary.cpp:201-230).
inline int feature_index(char ref_base, char base, bool is_reverse) {
  if (!valid_ref_base(ref_base)) return -1;
  return (is_reverse ? 18 : 7) + base_offset(base);
}

// HP feature column (region_summary_hp.cpp:191-240).
inline int feature_index_hp(char ref_base, char base, bool is_reverse,
                            int hp_block) {
  if (!valid_ref_base(ref_base)) return -1;
  const int start = (hp_block == 1) ? (is_reverse ? 18 : 7)
                                    : (is_reverse ? 40 : 29);
  return start + base_offset(base);
}

using AlleleKey = std::pair<int64_t, std::string>;

// ---------------- packed allele keys ----------------
// Per-observation allele recording previously built a std::string
// ("2"+alt / "3"+ref_allele) and walked a std::map with string
// comparisons — one heap allocation plus O(log n) string compares per
// observation, measured at ~37% of error-rich window generation
// (PERFORMANCE.md round 5).  Alleles whose content packs into 54 bits are
// instead keyed by a POD (position, code) pair in a small open-addressing
// table:  code = [type:4][len:6][content:54]
//   - SNP spill ("1"+base, non-ACGT bases only): one nibble of content
//   - INS ("2"+alt): alt packed 4 bits/char via the BAM nibble alphabet
//     "=ACMGRSVTWYHKDBN"; alt longer than 13 chars or containing a char
//     outside that alphabet falls back to the string map
//   - DEL ("3"+ref_allele): the content is ref-determined by
//     (anchor, substring length), so the code stores ONLY the length —
//     every deletion packs
// Candidate strings are reconstructed once at fold time and merged with
// the string-map spill and the flat SNP tallies in exact (pos, string)
// order, so the emitted columnar output is bit-identical to the
// map-only implementation (fuzzed in tests/test_native_pileup.py).
struct NibbleTables {
  uint8_t code[256];   // 0-15 for the BAM alphabet, 0xFF otherwise
  char chr[16];
  uint8_t rank[16];    // nibble code -> ASCII rank within the alphabet,
                       // so rank-packed integers order like the strings
  constexpr NibbleTables() : code(), chr(), rank() {
    for (int i = 0; i < 256; ++i) code[i] = 0xFF;
    const char* alphabet = "=ACMGRSVTWYHKDBN";
    for (int i = 0; i < 16; ++i) {
      chr[i] = alphabet[i];
      code[static_cast<unsigned char>(alphabet[i])] =
          static_cast<uint8_t>(i);
    }
    for (int i = 0; i < 16; ++i) {
      uint8_t r = 0;
      for (int j = 0; j < 16; ++j)
        if (alphabet[j] < alphabet[i]) ++r;
      rank[i] = r;
    }
  }
};

constexpr NibbleTables kNibble;

// Packs `len` chars of `s` plus a type digit into one uint64 key; false
// when the content does not fit or uses a non-BAM char (spill path).
inline bool pack_allele(const char* s, int64_t len, uint64_t type,
                        uint64_t* out) {
  if (len > 13) return false;
  uint64_t content = 0, bad = 0;
  for (int64_t i = 0; i < len; ++i) {
    const uint8_t c = kNibble.code[static_cast<unsigned char>(s[i])];
    bad |= c;
    content = (content << 4) | (c & 0xFu);
  }
  if (bad & 0x80u) return false;
  *out = (type << 60) | (static_cast<uint64_t>(len) << 54) | content;
  return true;
}

struct PackedTally {
  int64_t pos;
  uint64_t code;
  AlleleTally tally;
};

// Open-addressing (pos, code) -> tally table: linear probing over a
// power-of-two slot array of 1-based indices into a dense entry vector.
// Insertion-ordered entries make the fold deterministic before the final
// (pos, string) sort.
class PackedAlleleTable {
 public:
  PackedAlleleTable() : slots_(1024, 0), mask_(1023) {}

  AlleleTally& lookup(int64_t pos, uint64_t code) {
    if ((entries_.size() + 1) * 10 >= slots_.size() * 7) grow();
    size_t i = hash(pos, code) & mask_;
    while (true) {
      const int32_t s = slots_[i];
      if (s == 0) {
        entries_.push_back(PackedTally{pos, code, AlleleTally{}});
        slots_[i] = static_cast<int32_t>(entries_.size());
        return entries_.back().tally;
      }
      PackedTally& e = entries_[s - 1];
      if (e.pos == pos && e.code == code) return e.tally;
      i = (i + 1) & mask_;
    }
  }

  const std::vector<PackedTally>& entries() const { return entries_; }

 private:
  static size_t hash(int64_t pos, uint64_t code) {
    uint64_t x = static_cast<uint64_t>(pos) * 0x9E3779B97F4A7C15ull ^
                 code * 0xBF58476D1CE4E5B9ull;
    x ^= x >> 29;
    x *= 0x94D049BB133111EBull;
    x ^= x >> 32;
    return static_cast<size_t>(x);
  }

  void grow() {
    slots_.assign(slots_.size() * 2, 0);
    mask_ = slots_.size() - 1;
    for (size_t k = 0; k < entries_.size(); ++k) {
      size_t i = hash(entries_[k].pos, entries_[k].code) & mask_;
      while (slots_[i] != 0) i = (i + 1) & mask_;
      slots_[i] = static_cast<int32_t>(k + 1);
    }
  }

  std::vector<int32_t> slots_;
  std::vector<PackedTally> entries_;
  size_t mask_;
};

// Fast-path code for the 2-char SNP candidates "1A".."1T" — the dominant
// allele class (every mismatching base records one).  A/C/G/T map to a
// flat per-position tally array instead of a std::string + std::map
// lookup per observation; anything else (N, lowercase) falls back to the
// map.  The flat tallies are folded into the map once before emission,
// preserving the exact (position, candidate-string) output order.
inline int snp_code(char base) {
  switch (base) {
    case 'A':
      return 0;
    case 'C':
      return 1;
    case 'G':
      return 2;
    case 'T':
      return 3;
    default:
      return -1;
  }
}

struct Accumulator {
  PileupResult* out;
  std::map<AlleleKey, AlleleTally>* alleles;  // spill: unpackable alleles
  PackedAlleleTable* packed;
  // non-HP flat SNP tallies, (n_ref x 4 x {fwd,rev}): 8 bytes/tally keeps
  // the random-access working set cache-resident (total = fwd + rev in
  // non-HP mode, so it is not stored); HP mode uses the full AlleleTally
  // layout because hp_tag==0 observations bump both haplotype blocks
  int32_t* snp_fwd_rev;
  std::vector<AlleleTally>* snp_tallies;  // (n_ref x 4) flat, HP mode
  int64_t ref_start, ref_end;
  const std::string* ref_seq;
  double min_snp_baseq, min_indel_baseq;
  int hp_mode;

  void image_add(int64_t row, int col, int32_t delta) {
    out->image[row * out->features + col] += delta;
  }
};

// Branchless matching-base observation write for the non-HP run fast
// path: col = feature_index(rb, rb, strand) for ACGT refs (clamped to a
// real column otherwise) and delta 0 suppresses the write for non-ACGT
// refs — one L1 table lookup instead of validity branches.
struct MatchTables {
  int col_fwd[256];
  int col_rev[256];
  int col_hp2_fwd[256];   // HP block-2 observation columns
  int col_hp2_rev[256];
  int32_t delta[256];
  constexpr MatchTables()
      : col_fwd(), col_rev(), col_hp2_fwd(), col_hp2_rev(), delta() {
    for (int i = 0; i < 256; ++i) {
      const bool valid = kBase.valid_ref[i];
      col_fwd[i] = 7 + (valid ? kBase.offset[i] : 0);
      col_rev[i] = 18 + (valid ? kBase.offset[i] : 0);
      col_hp2_fwd[i] = 29 + (valid ? kBase.offset[i] : 0);
      col_hp2_rev[i] = 40 + (valid ? kBase.offset[i] : 0);
      delta[i] = valid ? 1 : 0;
    }
  }
};

constexpr MatchTables kMatch;

inline void bump_tally(AlleleTally& tally, bool is_reverse, int hp_tag,
                       int hp_mode) {
  tally.total += 1;
  if (hp_mode == 0) {
    if (is_reverse)
      tally.rev += 1;
    else
      tally.fwd += 1;
  } else {
    if (hp_tag == 0 || hp_tag == 1) {
      if (is_reverse)
        tally.rev_hp1 += 1;
      else
        tally.fwd_hp1 += 1;
    }
    if (hp_tag == 0 || hp_tag == 2) {
      if (is_reverse)
        tally.rev_hp2 += 1;
      else
        tally.fwd_hp2 += 1;
    }
  }
}

void record_allele(Accumulator& acc, int64_t region_index,
                   const std::string& candidate, bool is_reverse,
                   int hp_tag) {
  bump_tally((*acc.alleles)[{region_index, candidate}], is_reverse, hp_tag,
             acc.hp_mode);
}

// Allele content given by `content`/`content_len` (WITHOUT the leading
// type digit): packed-key fast path, string-map spill otherwise.
inline void record_content_allele(Accumulator& acc, int64_t region_index,
                                  uint64_t type, const char* content,
                                  int64_t content_len, bool is_reverse,
                                  int hp_tag) {
  uint64_t code;
  if (pack_allele(content, content_len, type, &code)) {
    bump_tally(acc.packed->lookup(region_index, code), is_reverse, hp_tag,
               acc.hp_mode);
  } else {
    std::string candidate;
    candidate.reserve(content_len + 1);
    candidate.push_back(static_cast<char>('0' + type));
    candidate.append(content, static_cast<size_t>(content_len));
    record_allele(acc, region_index, candidate, is_reverse, hp_tag);
  }
}

inline void record_snp_allele(Accumulator& acc, int64_t region_index,
                              char base, bool is_reverse, int hp_tag) {
  const int code = snp_code(base);
  if (code >= 0) {
    if (acc.hp_mode == 0) {
      acc.snp_fwd_rev[region_index * 8 + code * 2 + (is_reverse ? 1 : 0)]
          += 1;
    } else {
      bump_tally((*acc.snp_tallies)[region_index * 4 + code], is_reverse,
                 hp_tag, acc.hp_mode);
    }
  } else {
    record_content_allele(acc, region_index, 1, &base, 1, is_reverse,
                          hp_tag);
  }
}

// One read's walk — mirrors ops/pileup_ref.py::_populate_read and
// ops/pileup_hp.py::_populate_read exactly.
void populate_read(Accumulator& acc, const ReadBatch& batch, size_t r) {
  const int64_t seq_start = batch.seq_offsets[r];
  const int64_t seq_end = batch.seq_offsets[r + 1];
  const char* seq = batch.seq.data() + seq_start;
  const uint8_t* qual = batch.qual.data() + seq_start;
  const int64_t cigar_start = batch.cigar_offsets[r];
  const int64_t cigar_end = batch.cigar_offsets[r + 1];
  const bool is_reverse = (batch.flag[r] & 0x10) != 0;
  const int hp_tag = acc.hp_mode ? batch.hp[r] : 0;
  const std::string& ref = *acc.ref_seq;
  const int64_t ref_start = acc.ref_start;
  const int64_t ref_end = acc.ref_end;
  (void)seq_end;

  const bool hp = acc.hp_mode != 0;
  const bool in_hp1 = hp_tag == 0 || hp_tag == 1;
  const bool in_hp2 = hp_tag == 0 || hp_tag == 2;
  int hp_blocks[2];
  int n_blocks = 0;
  if (hp) {
    if (hp_tag == 0) {
      hp_blocks[n_blocks++] = 1;
      hp_blocks[n_blocks++] = 2;
    } else {
      hp_blocks[n_blocks++] = hp_tag;
    }
  }

  int64_t read_index = 0;
  int64_t ref_position = batch.pos[r];
  const int64_t n_ops = cigar_end - cigar_start;
  // integer threshold: for integer quals, q >= d  <=>  q >= ceil(d)
  const int min_snp_q = static_cast<int>(std::ceil(acc.min_snp_baseq));

  for (int64_t ci = 0; ci < n_ops; ++ci) {
    if (ref_position > ref_end) break;
    const uint8_t op = batch.cigar_ops[cigar_start + ci];
    const int64_t length = batch.cigar_lens[cigar_start + ci];
    switch (op) {
      case CIGAR_MATCH:
      case CIGAR_EQUAL:
      case CIGAR_DIFF: {
        int64_t start_i = 0;
        if (ref_position < ref_start) {
          start_i = std::min(ref_start - ref_position, length);
          read_index += start_i;
          ref_position += start_i;
        }
        // clamp the loop to the region so the body needs no bounds check;
        // cursors advance over the clamped tail afterwards
        const int64_t lim =
            std::min(length, start_i + std::max<int64_t>(
                                 0, ref_end - ref_position + 1));
        // exact per-base walk (all cases); the non-HP fast path below
        // routes only exceptional bases (mismatch / low-qual / protected
        // anchor) through it
        auto process_match_base = [&](int64_t i) {
          const int base_quality = qual[read_index];
          const char base = seq[read_index];
          const char ref_base = ref[ref_position - ref_start];
          const int64_t region_index = ref_position - ref_start;
          const int64_t base_index = region_index;  // no insert expansion
          if (base_quality >= min_snp_q) {
            acc.out->coverage[region_index] += 1;
            if (!hp) {
              // anchor quirk: last base of a non-final M op whose next
              // op is INS/DEL skips the coverage-row decrement
              bool draw = true;
              if (i == length - 1 && ci != n_ops - 1) {
                const uint8_t next_op = batch.cigar_ops[cigar_start + ci + 1];
                if (next_op == CIGAR_INS || next_op == CIGAR_DEL)
                  draw = false;
              }
              if (draw) acc.image_add(base_index, is_reverse ? 15 : 4, -1);
            } else {
              if (in_hp1) acc.image_add(base_index, is_reverse ? 15 : 4, -1);
              if (in_hp2)
                acc.image_add(base_index, is_reverse ? 37 : 26, -1);
            }
          }
          if (ref_base != base && base_quality >= min_snp_q) {
            acc.out->snp_count[region_index] += 1;
            if (!hp) {
              const int fi = feature_index(ref_base, base, is_reverse);
              if (fi >= 0) acc.image_add(base_index, fi, -1);
            }
            // HP mode: mismatches are NOT drawn into observation rows
            record_snp_allele(acc, region_index, base, is_reverse, hp_tag);
          } else if (base_quality >= min_snp_q) {
            if (!hp) {
              const int fi = feature_index(ref_base, base, is_reverse);
              if (fi >= 0) acc.image_add(base_index, fi, -1);
            } else {
              for (int b = 0; b < n_blocks; ++b) {
                const int fi = feature_index_hp(ref_base, base, is_reverse,
                                                hp_blocks[b]);
                if (fi >= 0) acc.image_add(base_index, fi, -1);
              }
            }
          }
        };
        if (!hp) {
          // run fast path: maximal runs of (base==ref && qual>=minq)
          // bases do exactly three adds each — coverage, the strand
          // coverage row, and the precomputed matching-observation cell
          int64_t protect = -1;  // op-final anchor base (quirk above)
          if (lim == length && ci != n_ops - 1) {
            const uint8_t next_op = batch.cigar_ops[cigar_start + ci + 1];
            if (next_op == CIGAR_INS || next_op == CIGAR_DEL)
              protect = length - 1;
          }
          int32_t* image = acc.out->image.data();
          int32_t* coverage = acc.out->coverage.data();
          const int features = acc.out->features;
          const int cov_col = is_reverse ? 15 : 4;
          const int* col_tab = is_reverse ? kMatch.col_rev : kMatch.col_fwd;
          int64_t i = start_i;
          while (i < lim) {
            const int64_t stop =
                (protect >= i && protect < lim) ? protect : lim;
            const int64_t run = good_run_length(
                seq + read_index,
                ref.data() + (ref_position - ref_start),
                qual + read_index, min_snp_q, stop - i);
            if (run > 0) {
              const int64_t ri0 = ref_position - ref_start;
              const char* run_ref = ref.data() + ri0;
              int32_t* row = image + ri0 * features;
              for (int64_t k = 0; k < run; ++k, row += features) {
                const unsigned char ref_byte =
                    static_cast<unsigned char>(run_ref[k]);
                coverage[ri0 + k] += 1;
                row[cov_col] -= 1;
                row[col_tab[ref_byte]] -= kMatch.delta[ref_byte];
              }
              i += run;
              read_index += run;
              ref_position += run;
              if (i >= lim) break;
            }
            process_match_base(i);
            ++i;
            ++read_index;
            ++ref_position;
          }
        } else {
          // HP run fast path (no anchor quirk in HP mode): a matching
          // qual-pass base decrements the per-haplotype coverage row and
          // the per-haplotype matching-observation cell
          int32_t* image = acc.out->image.data();
          int32_t* coverage = acc.out->coverage.data();
          const int features = acc.out->features;
          const int cov1 = is_reverse ? 15 : 4;
          const int cov2 = is_reverse ? 37 : 26;
          const int* col1_tab = is_reverse ? kMatch.col_rev : kMatch.col_fwd;
          const int* col2_tab =
              is_reverse ? kMatch.col_hp2_rev : kMatch.col_hp2_fwd;
          int64_t i = start_i;
          while (i < lim) {
            const int64_t run = good_run_length(
                seq + read_index,
                ref.data() + (ref_position - ref_start),
                qual + read_index, min_snp_q, lim - i);
            if (run > 0) {
              const int64_t ri0 = ref_position - ref_start;
              const char* run_ref = ref.data() + ri0;
              int32_t* row = image + ri0 * features;
              for (int64_t k = 0; k < run; ++k, row += features) {
                const unsigned char ref_byte =
                    static_cast<unsigned char>(run_ref[k]);
                coverage[ri0 + k] += 1;
                const int32_t observe = kMatch.delta[ref_byte];
                if (in_hp1) {
                  row[cov1] -= 1;
                  row[col1_tab[ref_byte]] -= observe;
                }
                if (in_hp2) {
                  row[cov2] -= 1;
                  row[col2_tab[ref_byte]] -= observe;
                }
              }
              i += run;
              read_index += run;
              ref_position += run;
              if (i >= lim) break;
            }
            process_match_base(i);
            ++i;
            ++read_index;
            ++ref_position;
          }
        }
        read_index += length - lim;
        ref_position += length - lim;
        break;
      }
      case CIGAR_INS: {
        const int64_t anchor = ref_position - 1;
        if (anchor >= ref_start && anchor <= ref_end && read_index - 1 >= 0) {
          const char ref_base = ref[anchor - ref_start];
          const int64_t base_index = anchor - ref_start;
          // alt = anchor base + inserted bases, (length+1) chars from the
          // read; the candidate string "2"+alt is only materialized on
          // the packed-key spill path
          const char* alt = seq + read_index - 1;
          if (!hp) {
            // anchor included: quality over length+1 bases from anchor
            const int64_t alt_len = length + 1;
            const int64_t start_index = read_index - 1;
            int64_t base_quality = 0;
            for (int64_t i = start_index; i < start_index + alt_len; ++i)
              base_quality += qual[i];
            if (base_quality >= acc.min_indel_baseq * alt_len &&
                qual[start_index] < min_snp_q)
              acc.out->coverage[anchor - ref_start] += 1;
            if (length + 2 <= 61 &&
                base_quality >= acc.min_indel_baseq * alt_len) {
              const int fi = feature_index(ref_base, 'I', is_reverse);
              if (fi >= 0) acc.image_add(base_index, fi, -1);
              acc.out->insert_count[anchor - ref_start] += 1;
              record_content_allele(acc, anchor - ref_start, 2, alt,
                                    length + 1, is_reverse, hp_tag);
            }
          } else {
            // HP: quality over the inserted bases only; failing inserts
            // DECREMENT coverage when the anchor base had passed
            const int64_t ins_len = length;
            int64_t base_quality = 0;
            for (int64_t i = 0; i < ins_len; ++i)
              base_quality += qual[read_index + i];
            if (base_quality < acc.min_indel_baseq * ins_len &&
                qual[read_index - 1] >= min_snp_q)
              acc.out->coverage[anchor - ref_start] -= 1;
            if (length + 2 <= 61 &&
                base_quality >= acc.min_indel_baseq * ins_len) {
              for (int b = 0; b < n_blocks; ++b) {
                const int fi = feature_index_hp(ref_base, 'I', is_reverse,
                                                hp_blocks[b]);
                if (fi >= 0) acc.image_add(base_index, fi, +1);
              }
              acc.out->insert_count[anchor - ref_start] += 1;
              record_content_allele(acc, anchor - ref_start, 2, alt,
                                    length + 1, is_reverse, hp_tag);
            }
          }
        }
        read_index += length;
        break;
      }
      case CIGAR_DEL: {
        const int64_t anchor = ref_position - 1;
        if (anchor >= ref_start && anchor <= ref_end) {
          const char ref_base = ref[anchor - ref_start];
          const int64_t base_index = anchor - ref_start;
          if (!hp) {
            const int fi = feature_index(ref_base, 'D', is_reverse);
            if (fi >= 0) acc.image_add(base_index, fi, -1);
          } else {
            for (int b = 0; b < n_blocks; ++b) {
              const int fi = feature_index_hp(ref_base, 'D', is_reverse,
                                              hp_blocks[b]);
              if (fi >= 0) acc.image_add(base_index, fi, +1);
            }
          }
          const int64_t avail = static_cast<int64_t>(ref.size())
                                - (anchor - ref_start);
          // the candidate "3" + ref_allele is fully determined by
          // (anchor, substring length), so the packed key stores only the
          // length — the string is rebuilt from ref at fold time
          const int64_t sub_len = std::min<int64_t>(length + 1, avail);
          if (sub_len + 1 <= 61) {
            acc.out->delete_count[anchor - ref_start] += 1;
            const uint64_t code =
                (3ull << 60) | (static_cast<uint64_t>(sub_len) << 54);
            bump_tally(acc.packed->lookup(anchor - ref_start, code),
                       is_reverse, hp_tag, acc.hp_mode);
          }
        }
        for (int64_t i = 0; i < length; ++i) {
          const int64_t pos = ref_position + i;
          if (pos >= ref_start && pos <= ref_end) {
            const char ref_base = ref[pos - ref_start];
            const int64_t base_index = pos - ref_start;
            if (!hp) {
              const int fi = feature_index(ref_base, '*', is_reverse);
              if (fi >= 0) acc.image_add(base_index, fi, -1);
            } else {
              for (int b = 0; b < n_blocks; ++b) {
                const int fi = feature_index_hp(ref_base, '*', is_reverse,
                                                hp_blocks[b]);
                if (fi >= 0) acc.image_add(base_index, fi, +1);
              }
            }
          }
        }
        ref_position += length;
        break;
      }
      case CIGAR_REF_SKIP:
      case CIGAR_PAD:
        // reference switch falls through to SOFT_CLIP: read cursor advances
        ref_position += length;
        read_index += length;
        break;
      case CIGAR_SOFT_CLIP:
        read_index += length;
        break;
      default:
        break;  // hard clip
    }
  }
}

}  // namespace

PileupResult pileup_run(const ReadBatch& batch, const std::string& ref_seq,
                        int64_t ref_start, int64_t ref_end,
                        double min_snp_baseq, double min_indel_baseq,
                        int hp_mode) {
  PileupResult result;
  const int64_t n_ref = ref_end - ref_start + 1;
  result.n_rows = n_ref + 1;  // region_size + 1 rows, no insert expansion
  result.features = hp_mode ? 48 : 26;
  result.image.assign(result.n_rows * result.features, 0);
  result.coverage.assign(n_ref, 0);
  result.snp_count.assign(n_ref, 0);
  result.insert_count.assign(n_ref, 0);
  result.delete_count.assign(n_ref, 0);

  std::map<AlleleKey, AlleleTally> alleles;
  PackedAlleleTable packed;
  std::vector<int32_t> snp_fwd_rev(
      hp_mode ? 0 : static_cast<size_t>(n_ref) * 8, 0);
  std::vector<AlleleTally> snp_tallies(
      hp_mode ? static_cast<size_t>(n_ref) * 4 : 0);
  Accumulator acc{&result, &alleles, &packed, snp_fwd_rev.data(),
                  &snp_tallies, ref_start, ref_end, &ref_seq,
                  min_snp_baseq, min_indel_baseq, hp_mode};

  for (size_t r = 0; r < batch.n_reads(); ++r) {
    if (batch.mapq[r] > 0) populate_read(acc, batch, r);
  }

  // fold: merge the flat SNP tallies, the packed table, and the
  // string-map spill into (pos, candidate-string) order — exactly what
  // the old map-only implementation emitted — without constructing a
  // std::string per entry.  Packed entries are counting-sorted by
  // position; within a position their order is given by a numeric key
  // whose integer order equals the candidate strings' byte order
  // (ASCII-rank nibbles, left-aligned, length tie-break; deletions all
  // share the ref-determined prefix so length alone orders them).  Flat
  // SNP entries come out pre-ordered (A<C<G<T) and merge against the
  // packed stream by the same key.  Only positions carrying a spill
  // entry (non-BAM chars or >13-char inserts — vanishingly rare) take a
  // per-position string sort.  Candidate bytes are written straight
  // into the output blob.
  const std::vector<PackedTally>& pe = packed.entries();
  const size_t n_packed = pe.size();

  std::vector<const std::pair<const AlleleKey, AlleleTally>*> spill;
  spill.reserve(alleles.size());
  for (const auto& kv : alleles) spill.push_back(&kv);

  // bucket packed + spill entries by position
  std::vector<int32_t> bucket_off(n_ref + 1, 0);
  for (const PackedTally& e : pe) bucket_off[e.pos + 1]++;
  for (const auto* s : spill) bucket_off[s->first.first + 1]++;
  for (int64_t i = 0; i < n_ref; ++i) bucket_off[i + 1] += bucket_off[i];
  std::vector<int32_t> order(n_packed + spill.size());
  {
    std::vector<int32_t> cursor(bucket_off.begin(), bucket_off.end() - 1);
    for (size_t k = 0; k < n_packed; ++k)
      order[cursor[pe[k].pos]++] = static_cast<int32_t>(k);
    for (size_t k = 0; k < spill.size(); ++k)
      order[cursor[spill[k]->first.first]++] =
          static_cast<int32_t>(n_packed + k);
  }

  // per-entry numeric sort keys for the packed entries
  std::vector<uint64_t> key1(n_packed), key2(n_packed);
  for (size_t k = 0; k < n_packed; ++k) {
    const uint64_t code = pe[k].code;
    const uint64_t type = code >> 60;
    const uint64_t len = (code >> 54) & 0x3F;
    uint64_t ranked = 0;
    if (type != 3) {
      for (int64_t i = static_cast<int64_t>(len) - 1; i >= 0; --i)
        ranked = (ranked << 4) | kNibble.rank[(code >> (4 * i)) & 0xF];
      ranked <<= 4 * (15 - len);  // left-align below the type nibble
    }
    key1[k] = (type << 60) | ranked;
    key2[k] = len;
  }

  static const char kSnpBases[4] = {'A', 'C', 'G', 'T'};
  // flat-SNP numeric keys for the merge: "1X" with X's ASCII rank
  uint64_t snp_key1[4];
  for (int code = 0; code < 4; ++code)
    snp_key1[code] =
        (1ull << 60) |
        (static_cast<uint64_t>(
             kNibble.rank[kNibble.code[static_cast<unsigned char>(
                 kSnpBases[code])]])
         << 56);

  const size_t total_reserve = n_packed + spill.size() + 1024;
  result.allele_pos.reserve(total_reserve);
  result.allele_total.reserve(total_reserve);
  result.allele_fwd.reserve(total_reserve);
  result.allele_rev.reserve(total_reserve);
  result.allele_str_offsets.reserve(total_reserve + 1);
  result.allele_strs.reserve(total_reserve * 3);
  result.allele_str_offsets.push_back(0);

  auto emit_columns = [&](int64_t pos, const AlleleTally& tally) {
    result.allele_pos.push_back(pos);
    result.allele_total.push_back(tally.total);
    result.allele_fwd.push_back(tally.fwd);
    result.allele_rev.push_back(tally.rev);
    result.allele_fwd_hp1.push_back(tally.fwd_hp1);
    result.allele_rev_hp1.push_back(tally.rev_hp1);
    result.allele_fwd_hp2.push_back(tally.fwd_hp2);
    result.allele_rev_hp2.push_back(tally.rev_hp2);
    result.allele_str_offsets.push_back(0);  // patched by the blob writer
  };
  auto close_blob = [&]() {
    result.allele_str_offsets.back() =
        static_cast<int64_t>(result.allele_strs.size());
  };
  auto emit_flat = [&](int64_t pos, int code, const AlleleTally& tally) {
    emit_columns(pos, tally);
    result.allele_strs.push_back('1');
    result.allele_strs.push_back(kSnpBases[code]);
    close_blob();
  };
  auto emit_packed = [&](const PackedTally& e) {
    emit_columns(e.pos, e.tally);
    const uint64_t type = e.code >> 60;
    const int64_t len = static_cast<int64_t>((e.code >> 54) & 0x3F);
    result.allele_strs.push_back(static_cast<char>('0' + type));
    if (type == 3) {
      const char* src = ref_seq.data() + e.pos;
      result.allele_strs.insert(result.allele_strs.end(), src, src + len);
    } else {
      for (int64_t i = len - 1; i >= 0; --i)
        result.allele_strs.push_back(
            kNibble.chr[(e.code >> (4 * i)) & 0xF]);
    }
    close_blob();
  };
  auto flat_tally = [&](int64_t i, int code, AlleleTally* out) -> bool {
    if (hp_mode == 0) {
      const int32_t fwd = snp_fwd_rev[i * 8 + code * 2];
      const int32_t rev = snp_fwd_rev[i * 8 + code * 2 + 1];
      if (fwd + rev == 0) return false;
      *out = AlleleTally{};
      out->total = fwd + rev;
      out->fwd = fwd;
      out->rev = rev;
      return true;
    }
    const AlleleTally& tally = snp_tallies[i * 4 + code];
    if (tally.total == 0) return false;
    *out = tally;
    return true;
  };
  // packed-entry candidate string (spill-position slow path only)
  auto packed_string = [&](const PackedTally& e) {
    const uint64_t type = e.code >> 60;
    const int64_t len = static_cast<int64_t>((e.code >> 54) & 0x3F);
    std::string cand(1, static_cast<char>('0' + type));
    if (type == 3) {
      cand.append(ref_seq, static_cast<size_t>(e.pos),
                  static_cast<size_t>(len));
    } else {
      for (int64_t i = len - 1; i >= 0; --i)
        cand.push_back(kNibble.chr[(e.code >> (4 * i)) & 0xF]);
    }
    return cand;
  };

  for (int64_t i = 0; i < n_ref; ++i) {
    const int32_t b0 = bucket_off[i], b1 = bucket_off[i + 1];
    bool has_spill = false;
    for (int32_t k = b0; k < b1; ++k)
      if (order[k] >= static_cast<int32_t>(n_packed)) {
        has_spill = true;
        break;
      }
    if (!has_spill) {
      if (b1 - b0 > 1)
        std::sort(order.begin() + b0, order.begin() + b1,
                  [&](int32_t a, int32_t b) {
                    return key1[a] != key1[b] ? key1[a] < key1[b]
                                              : key2[a] < key2[b];
                  });
      // merge the (pre-ordered) flat SNP stream with the packed stream
      int code = 0;
      int32_t k = b0;
      AlleleTally flat;
      while (code < 4 || k < b1) {
        const bool take_flat =
            code < 4 &&
            (k >= b1 || snp_key1[code] < key1[order[k]]);
        if (take_flat) {
          if (flat_tally(i, code, &flat)) emit_flat(i, code, flat);
          ++code;
        } else {
          emit_packed(pe[order[k]]);
          ++k;
        }
      }
    } else {
      // slow path: materialize strings for every entry at this position
      struct SlowEntry {
        std::string cand;
        AlleleTally tally;
      };
      std::vector<SlowEntry> slow;
      slow.reserve(b1 - b0 + 4);
      AlleleTally flat;
      for (int code = 0; code < 4; ++code)
        if (flat_tally(i, code, &flat))
          slow.push_back({std::string("1") + kSnpBases[code], flat});
      for (int32_t k = b0; k < b1; ++k) {
        const int32_t idx = order[k];
        if (idx < static_cast<int32_t>(n_packed))
          slow.push_back({packed_string(pe[idx]), pe[idx].tally});
        else
          slow.push_back({spill[idx - n_packed]->first.second,
                          spill[idx - n_packed]->second});
      }
      std::sort(slow.begin(), slow.end(),
                [](const SlowEntry& a, const SlowEntry& b) {
                  return a.cand < b.cand;
                });
      for (const SlowEntry& entry : slow) {
        emit_columns(i, entry.tally);
        result.allele_strs.insert(result.allele_strs.end(),
                                  entry.cand.begin(), entry.cand.end());
        close_blob();
      }
    }
  }
  return result;
}

// ---------------- polish-mode summary walk ----------------
// Semantics-exact to polish/summary.py _iterate_over_read (itself exact to
// pepper summary_generator.cpp:60-140): see pileup.h for the contract.

namespace {

struct PolishFeatureLuts {
  uint8_t fwd[256];
  uint8_t rev[256];
  PolishFeatureLuts() {
    for (int i = 0; i < 256; ++i) {
      fwd[i] = 9;
      rev[i] = 8;
    }
    const char* bases = "ACGT";
    for (int i = 0; i < 4; ++i) {
      const unsigned char upper = static_cast<unsigned char>(bases[i]);
      const unsigned char lower = static_cast<unsigned char>(bases[i] + 32);
      fwd[upper] = fwd[lower] = static_cast<uint8_t>(4 + i);
      rev[upper] = rev[lower] = static_cast<uint8_t>(i);
    }
  }
};

const PolishFeatureLuts& polish_luts() {
  static const PolishFeatureLuts luts;
  return luts;
}

}  // namespace

long long polish_summary_walk(
    const int64_t* pos, const int64_t* seq_offsets, const uint8_t* seq,
    const int64_t* cigar_offsets, const uint8_t* cigar_ops,
    const int32_t* cigar_lens, const int32_t* mapq, const int32_t* flag,
    int64_t n_reads, int64_t region_start, int64_t region_end,
    double* base_dense, double* cov_dense, int32_t* insert_events,
    int64_t insert_cap) {
  constexpr int kOpMatch = 0, kOpIns = 1, kOpDel = 2, kOpRefSkip = 3,
                kOpSoftClip = 4, kOpPad = 6, kOpEqual = 7, kOpDiff = 8;
  const PolishFeatureLuts& luts = polish_luts();
  int64_t n_events = 0;
  for (int64_t r = 0; r < n_reads; ++r) {
    if (mapq[r] <= 0) continue;
    const uint8_t* lut = (flag[r] & 0x10) ? luts.rev : luts.fwd;
    const int star_feature = (flag[r] & 0x10) ? 8 : 9;
    int64_t read_index = seq_offsets[r];
    int64_t ref_position = pos[r];
    const int64_t cigar_begin = cigar_offsets[r];
    const int64_t cigar_end = cigar_offsets[r + 1];
    for (int64_t c = cigar_begin; c < cigar_end; ++c) {
      if (ref_position > region_end) break;
      const int op = cigar_ops[c];
      const int64_t length = cigar_lens[c];
      if (op == kOpMatch || op == kOpEqual || op == kOpDiff) {
        int64_t start_i = 0;
        if (ref_position < region_start) {
          start_i = std::min(region_start - ref_position, length);
          read_index += start_i;
          ref_position += start_i;
        }
        const int64_t span =
            std::min(length - start_i, region_end - ref_position + 1);
        if (span > 0) {
          const int64_t row0 = ref_position - region_start;
          for (int64_t i = 0; i < span; ++i) {
            base_dense[(row0 + i) * 10 + lut[seq[read_index + i]]] += 1.0;
            cov_dense[row0 + i] += 1.0;
          }
        }
        read_index += length - start_i;
        ref_position += length - start_i;
      } else if (op == kOpIns) {
        const int64_t anchor = ref_position - 1;
        if (anchor >= region_start && anchor <= region_end) {
          if (n_events + length > insert_cap) return -1;
          const int32_t anchor_off =
              static_cast<int32_t>(anchor - region_start);
          for (int64_t i = 0; i < length; ++i) {
            insert_events[n_events * 3 + 0] = anchor_off;
            insert_events[n_events * 3 + 1] = static_cast<int32_t>(i);
            insert_events[n_events * 3 + 2] = lut[seq[read_index + i]];
            ++n_events;
          }
        }
        read_index += length;
      } else if (op == kOpDel || op == kOpRefSkip || op == kOpPad) {
        const int64_t lo = std::max(ref_position, region_start);
        const int64_t hi =
            std::min(ref_position + length - 1, region_end);
        if (hi >= lo) {
          for (int64_t p = lo; p <= hi; ++p)
            base_dense[(p - region_start) * 10 + star_feature] += 1.0;
          // reference quirk: coverage is booked at the deletion anchor,
          // once per in-region deleted base
          if (ref_position >= region_start && ref_position <= region_end)
            cov_dense[ref_position - region_start] +=
                static_cast<double>(hi - lo + 1);
        }
        ref_position += length;
      } else if (op == kOpSoftClip) {
        read_index += length;
      }
      // hard clip / others: nothing
    }
  }
  return n_events;
}

// ---------------- candidate-window emission (inference path) ----------------
// The per-candidate gate + window-image assembly loop of
// ops/pileup_ref.py generate_summary (itself exact to
// region_summary.cpp:568-916's candidate pass), for the inference path
// (train_mode=False, build_window_images=True).  The Python loop remains
// the golden engine (PEPPER_PY_WINDOWS=1) and the two must emit identical
// window sets (tests/test_native_pileup.py A/B).
//
// Inputs: the already-clamped int8 region image plus per-gate-passing-
// position arrays prepared by the (vectorized) Python caller; outputs:
// packed window images and (position, allele) indices the caller decodes
// into CandidateWindow objects.  Returns the emitted window count, or -1
// if out_cap would be exceeded.

namespace {

// ops/pileup_ref.py get_feature_index: fwd block col 7, rev col 18;
// -1 when the reference base is not ACGT (the Python loop then writes
// column -1 == features-1 — a preserved quirk)
inline int window_feature_index(uint8_t ref_base, uint8_t base,
                                bool is_reverse) {
  switch (ref_base) {
    case 'A': case 'C': case 'G': case 'T':
    case 'a': case 'c': case 'g': case 't':
      break;
    default:
      return -1;
  }
  int value;
  switch (base) {
    case 'A': case 'a': value = 1; break;
    case 'C': case 'c': value = 2; break;
    case 'G': case 'g': value = 3; break;
    case 'T': case 't': value = 4; break;
    case 'I': case 'i': value = 5; break;
    case 'D': case 'd': value = 6; break;
    default: value = 7; break;
  }
  return (is_reverse ? 18 : 7) + value;
}

inline int window_ref_feature_value(uint8_t base) {
  switch (base) {
    case 'A': case 'a': return 1;
    case 'C': case 'c': return 2;
    case 'G': case 'g': return 3;
    case 'T': case 't': return 4;
    default: return 5;
  }
}

// int8 negation with the numpy wrap semantics (-(-128) stays -128)
inline void window_negate(int8_t* row, int features, int index) {
  const int column = index < 0 ? features - 1 : index;
  row[column] = static_cast<int8_t>(
      static_cast<uint8_t>(0u - static_cast<uint8_t>(row[column])));
}

inline int8_t clamp_color_i8(int64_t v) {
  return static_cast<int8_t>(v < 125 ? v : 125);
}

}  // namespace

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
    const int32_t* allele_fwd_hp2, const int32_t* allele_rev_hp2) {
  const int rows_per_window = window_size + 1;
  const int half = window_size / 2;
  long long n_out = 0;
  for (int64_t k = 0; k < n_positions; ++k) {
    const int64_t lo = allele_lo[k], hi = allele_hi[k];
    const int32_t pos_depth = depth[k];
    const double denom = pos_depth > 1 ? static_cast<double>(pos_depth) : 1.0;
    for (int64_t i = lo; i < hi; ++i) {
      const int32_t total = allele_total[i];
      const double frequency = total / denom;
      const char* cand = allele_blob + allele_offsets[i];
      const int64_t cand_len = allele_offsets[i + 1] - allele_offsets[i];
      const char type_digit = cand_len > 0 ? cand[0] : 0;
      if (total < support_threshold) continue;
      if (type_digit != '1' && frequency < indel_freq_threshold) continue;
      if (type_digit == '1' && frequency < snp_freq_threshold) continue;
      if (type_digit != '1' && skip_indels) continue;
      const uint8_t mask = pass_mask[k];
      if ((type_digit == '1' && !(mask & 1)) ||
          (type_digit == '2' && !(mask & 2)) ||
          (type_digit == '3' && !(mask & 4)))
        continue;

      if (n_out >= out_cap) return -1;
      int8_t* window = out_images +
                       n_out * static_cast<int64_t>(rows_per_window) *
                           features;
      std::memset(window, 0,
                  static_cast<size_t>(rows_per_window) * features);
      const int64_t row0 = base_index[k] - half;
      const int64_t src_lo = std::max<int64_t>(0, row0);
      const int64_t src_hi =
          std::min<int64_t>(region_size + 1, base_index[k] + half + 1);
      if (src_hi > src_lo)
        std::memcpy(window + (src_lo - row0) * features,
                    image + src_lo * features,
                    static_cast<size_t>(src_hi - src_lo) * features);

      int8_t* mid = window + static_cast<int64_t>(half) * features;
      const uint8_t rb = ref_base[k];
      const int32_t depth_fwd = allele_fwd[i];
      const int32_t depth_rev = allele_rev[i];
      if (hp_mode) {
        // 48-channel HP mid-row (region_summary_hp.cpp:763-830 /
        // ops/pileup_hp.py window loop): per-haplotype depth columns,
        // positive values, no observation-cell negation, no deletion-run
        // star rows.  allele_fwd/rev carry the hp1 tallies here.
        const int32_t fwd_hp2 = allele_fwd_hp2[i];
        const int32_t rev_hp2 = allele_rev_hp2[i];
        if (type_digit == '1') {
          const uint8_t alt =
              cand_len > 1 ? static_cast<uint8_t>(cand[1]) : 0;
          mid[1] = static_cast<int8_t>(window_ref_feature_value(alt));
          mid[5] = clamp_color_i8(depth_fwd);
          mid[27] = clamp_color_i8(fwd_hp2);
          mid[16] = clamp_color_i8(depth_rev);
          mid[38] = clamp_color_i8(rev_hp2);
        } else if (type_digit == '2') {
          mid[2] = clamp_color_i8(cand_len - 1);
          mid[6] = clamp_color_i8(depth_fwd);
          mid[28] = clamp_color_i8(fwd_hp2);
          mid[17] = clamp_color_i8(depth_rev);
          mid[39] = clamp_color_i8(rev_hp2);
        } else {
          mid[3] = clamp_color_i8(cand_len - 1);
          mid[7] = clamp_color_i8(depth_fwd);
          mid[29] = clamp_color_i8(fwd_hp2);
          mid[18] = clamp_color_i8(depth_rev);
          mid[40] = clamp_color_i8(rev_hp2);
        }
      } else if (type_digit == '1') {
        const uint8_t alt = cand_len > 1
                                ? static_cast<uint8_t>(cand[1]) : 0;
        mid[1] = static_cast<int8_t>(window_ref_feature_value(alt));
        mid[5] = clamp_color_i8(depth_fwd);
        mid[16] = clamp_color_i8(depth_rev);
        window_negate(mid, features, window_feature_index(rb, alt, false));
        window_negate(mid, features, window_feature_index(rb, alt, true));
      } else if (type_digit == '2') {
        mid[2] = clamp_color_i8(cand_len - 1);
        mid[6] = clamp_color_i8(depth_fwd);
        mid[17] = clamp_color_i8(depth_rev);
        window_negate(mid, features, window_feature_index(rb, 'I', false));
        window_negate(mid, features, window_feature_index(rb, 'I', true));
      } else {
        const int64_t del_len = cand_len - 1;
        const int64_t end_index =
            std::min<int64_t>(half + del_len - 1, window_size - 1);
        mid[3] = clamp_color_i8(del_len);
        mid[7] = clamp_color_i8(depth_fwd);
        mid[18] = clamp_color_i8(depth_rev);
        window_negate(mid, features, window_feature_index(rb, 'D', false));
        window_negate(mid, features, window_feature_index(rb, 'D', true));
        const int star_fwd = window_feature_index(rb, '*', false);
        const int star_rev = window_feature_index(rb, '*', true);
        for (int64_t idx = half + 1; idx <= end_index; ++idx) {
          int8_t* row = window + idx * features;
          row[3] = clamp_color_i8(del_len);
          row[7] = clamp_color_i8(depth_fwd);
          row[18] = clamp_color_i8(depth_rev);
          window_negate(row, features, star_fwd);
          window_negate(row, features, star_rev);
        }
      }
      out_position_k[n_out] = static_cast<int32_t>(k);
      out_allele_index[n_out] = i;
      out_freq[n_out] = std::min<int32_t>(total, 125);
      ++n_out;
    }
  }
  return n_out;
}
