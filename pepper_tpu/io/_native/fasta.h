// faidx-backed FASTA reader (plain, uncompressed FASTA + .fai).
// Behavioral reference: pepper_variant/modules/cpp/fasta_handler.cpp:19-55.
#pragma once

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

class FastaReader {
 public:
  explicit FastaReader(const std::string& path);
  ~FastaReader();

  bool ok() const { return file_ != nullptr && !records_.empty(); }
  const std::vector<std::string>& names() const { return names_; }
  int64_t sequence_length(const std::string& name) const;
  // [start, stop) 0-based; returns uppercased sequence ('\0'-free).
  std::string get_sequence(const std::string& name, int64_t start,
                           int64_t stop) const;

 private:
  struct FaiRecord {
    int64_t length, offset, linebases, linewidth;
  };
  int find(const std::string& name) const;

  FILE* file_ = nullptr;
  std::vector<std::string> names_;
  std::vector<FaiRecord> records_;
};
