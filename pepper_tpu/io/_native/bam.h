// BAM reader with BAI index query and region-clipped read extraction.
//
// Behavioral reference: pepper_variant/modules/cpp/bam_handler.cpp:115-451
// (filters, CIGAR clipping, HP-tag parse).  Reads are returned as packed
// columnar arrays so Python/JAX sees flat buffers, not per-read objects.
#pragma once

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

#include "bgzf.h"

// CIGAR op codes (BAM encoding).
enum CigarOpCode : uint8_t {
  CIGAR_MATCH = 0,
  CIGAR_INS = 1,
  CIGAR_DEL = 2,
  CIGAR_REF_SKIP = 3,
  CIGAR_SOFT_CLIP = 4,
  CIGAR_HARD_CLIP = 5,
  CIGAR_PAD = 6,
  CIGAR_EQUAL = 7,
  CIGAR_DIFF = 8,
};

// Columnar batch of clipped reads for one region.
struct ReadBatch {
  std::vector<int64_t> pos;        // clipped alignment start (pos_start)
  std::vector<int64_t> pos_end;    // clipped alignment end
  std::vector<int32_t> mapq;
  std::vector<int32_t> flag;       // raw BAM flag
  std::vector<int32_t> hp;         // HP aux tag (0 when absent)
  std::vector<int64_t> seq_offsets;    // n+1 prefix offsets into seq/qual
  std::vector<char> seq;               // clipped bases, ASCII upper
  std::vector<uint8_t> qual;           // clipped base qualities
  std::vector<int64_t> cigar_offsets;  // n+1 prefix offsets into ops/lens
  std::vector<uint8_t> cigar_ops;      // clipped cigar op codes
  std::vector<int32_t> cigar_lens;
  std::vector<int64_t> name_offsets;   // n+1 offsets into names
  std::vector<char> names;             // concatenated query names

  size_t n_reads() const { return pos.size(); }
};

struct BaiIndex {
  struct Chunk {
    uint64_t beg, end;
  };
  // per reference: bin id -> chunks, plus 16kb linear index
  struct Ref {
    std::vector<std::pair<uint32_t, std::vector<Chunk>>> bins;
    std::vector<uint64_t> linear;
  };
  std::vector<Ref> refs;
  // CSI generalization (BAI == min_shift 14, depth 5); the pseudo-linear
  // index for CSI is rebuilt from leaf-bin loffsets at load time
  int min_shift = 14;
  int depth = 5;
  bool loaded = false;
};

class BamReader {
 public:
  explicit BamReader(const std::string& path);

  bool ok() const { return ok_; }
  const std::vector<std::string>& target_names() const { return names_; }
  const std::vector<int64_t>& target_lens() const { return lens_; }
  int target_id(const std::string& name) const;

  // Region-clipped read fetch; [start, stop) index overlap, bases clipped to
  // positions <= stop as the reference does.
  std::unique_ptr<ReadBatch> get_reads(const std::string& chrom,
                                       int64_t start, int64_t stop,
                                       bool include_supplementary,
                                       int min_mapq, int min_baseq);

 private:
  bool read_header();
  bool load_index(const std::string& path);
  bool load_csi(const std::string& path);

  std::string path_;
  std::unique_ptr<BgzfReader> bgzf_;
  std::vector<std::string> names_;
  std::vector<int64_t> lens_;
  BaiIndex index_;
  uint64_t data_start_voffset_ = 0;
  bool ok_ = false;
};
