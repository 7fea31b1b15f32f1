#include "fasta.h"

#include <cctype>
#include <cstring>

FastaReader::FastaReader(const std::string& path) {
  file_ = std::fopen(path.c_str(), "rb");
  if (!file_) return;
  FILE* fai = std::fopen((path + ".fai").c_str(), "rb");
  if (!fai) {
    std::fclose(file_);
    file_ = nullptr;
    return;
  }
  char line[4096];
  while (std::fgets(line, sizeof(line), fai)) {
    char name[2048];
    FaiRecord record;
    if (std::sscanf(line, "%2047s\t%lld\t%lld\t%lld\t%lld", name,
                    reinterpret_cast<long long*>(&record.length),
                    reinterpret_cast<long long*>(&record.offset),
                    reinterpret_cast<long long*>(&record.linebases),
                    reinterpret_cast<long long*>(&record.linewidth)) == 5) {
      names_.emplace_back(name);
      records_.push_back(record);
    }
  }
  std::fclose(fai);
}

FastaReader::~FastaReader() {
  if (file_) std::fclose(file_);
}

int FastaReader::find(const std::string& name) const {
  for (size_t i = 0; i < names_.size(); ++i) {
    if (names_[i] == name) return static_cast<int>(i);
  }
  return -1;
}

int64_t FastaReader::sequence_length(const std::string& name) const {
  const int i = find(name);
  return i < 0 ? -1 : records_[i].length;
}

std::string FastaReader::get_sequence(const std::string& name, int64_t start,
                                      int64_t stop) const {
  const int i = find(name);
  if (i < 0 || !file_) return "";
  const FaiRecord& record = records_[i];
  start = std::max<int64_t>(0, start);
  stop = std::min(stop, record.length);
  if (start >= stop) return "";

  const int64_t file_start = record.offset + (start / record.linebases) *
                                                 record.linewidth +
                             (start % record.linebases);
  // bytes to read covering the span including newlines
  const int64_t n_bases = stop - start;
  const int64_t line_remainder = start % record.linebases;
  const int64_t full_span =
      ((line_remainder + n_bases + record.linebases - 1) / record.linebases) *
          record.linewidth;
  std::vector<char> buffer(static_cast<size_t>(full_span));
  if (std::fseek(file_, static_cast<long>(file_start), SEEK_SET) != 0)
    return "";
  const size_t got = std::fread(buffer.data(), 1, buffer.size(), file_);

  std::string out;
  out.reserve(n_bases);
  for (size_t j = 0; j < got && static_cast<int64_t>(out.size()) < n_bases;
       ++j) {
    const char c = buffer[j];
    if (c == '\n' || c == '\r') continue;
    out.push_back(static_cast<char>(std::toupper(c)));
  }
  return out;
}
