// BGZF (blocked gzip) reader — htslib-free, zlib-backed.
//
// BAM/tabix files are sequences of <=64KiB gzip members whose EXTRA field
// carries the compressed block size (BSIZE).  Virtual file offsets are
// (compressed_block_offset << 16) | offset_within_uncompressed_block.
#pragma once

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

class BgzfReader {
 public:
  explicit BgzfReader(const std::string& path);
  ~BgzfReader();

  bool ok() const { return file_ != nullptr; }

  // Seek to a BGZF virtual offset.
  bool seek_virtual(uint64_t voffset);

  uint64_t tell_virtual() const {
    return (block_offset_ << 16) | static_cast<uint64_t>(block_pos_);
  }

  // Read exactly n bytes across block boundaries; returns bytes read
  // (short only at EOF).
  size_t read(void* dst, size_t n);

  // True when positioned at end of file (no more blocks).
  bool eof();

 private:
  bool load_block_at(int64_t coffset);
  bool next_block();

  FILE* file_ = nullptr;
  int64_t block_offset_ = 0;     // compressed offset of current block
  int64_t next_block_offset_ = 0;
  std::vector<uint8_t> block_;   // uncompressed payload of current block
  size_t block_pos_ = 0;         // cursor within block_
  bool at_eof_ = false;
};
