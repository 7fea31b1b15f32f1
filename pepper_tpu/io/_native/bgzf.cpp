#include "bgzf.h"

#include <zlib.h>

#include <cstdlib>
#include <cstring>

#include "inflate.h"

namespace {

// PEPPER_ZLIB_INFLATE=1 forces the zlib path (A/B testing, emergencies).
bool use_zlib_inflate() {
  static const bool force = [] {
    const char* env = std::getenv("PEPPER_ZLIB_INFLATE");
    return env != nullptr && env[0] == '1';
  }();
  return force;
}

bool zlib_inflate_block(const uint8_t* in, size_t in_len, uint8_t* out,
                        size_t out_len) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(in);
  zs.avail_in = static_cast<uInt>(in_len);
  zs.next_out = out;
  zs.avail_out = static_cast<uInt>(out_len);
  const int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END && zs.avail_out == 0;
}

}  // namespace

BgzfReader::BgzfReader(const std::string& path) {
  file_ = std::fopen(path.c_str(), "rb");
  if (file_) {
    load_block_at(0);
  }
}

BgzfReader::~BgzfReader() {
  if (file_) std::fclose(file_);
}

// Read one BGZF block header at coffset, inflate its payload into block_.
bool BgzfReader::load_block_at(int64_t coffset) {
  at_eof_ = false;
  if (std::fseek(file_, static_cast<long>(coffset), SEEK_SET) != 0) {
    return false;
  }
  uint8_t header[12];
  if (std::fread(header, 1, 12, file_) != 12) {
    at_eof_ = true;
    block_.clear();
    block_pos_ = 0;
    block_offset_ = coffset;
    next_block_offset_ = coffset;
    return false;
  }
  if (header[0] != 0x1f || header[1] != 0x8b) return false;
  const uint16_t xlen = static_cast<uint16_t>(header[10] | (header[11] << 8));
  std::vector<uint8_t> extra(xlen);
  if (std::fread(extra.data(), 1, xlen, file_) != xlen) return false;

  // Find the BC subfield carrying BSIZE (total block size - 1).
  int bsize = -1;
  for (size_t i = 0; i + 4 <= extra.size();) {
    const uint8_t si1 = extra[i], si2 = extra[i + 1];
    const uint16_t slen =
        static_cast<uint16_t>(extra[i + 2] | (extra[i + 3] << 8));
    if (si1 == 'B' && si2 == 'C' && slen == 2 && i + 6 <= extra.size()) {
      bsize = (extra[i + 4] | (extra[i + 5] << 8)) + 1;
      break;
    }
    i += 4 + slen;
  }
  if (bsize < 0) return false;

  const int cdata_len = bsize - 12 - xlen - 8;
  if (cdata_len < 0) return false;
  std::vector<uint8_t> cdata(cdata_len);
  if (std::fread(cdata.data(), 1, cdata_len, file_) !=
      static_cast<size_t>(cdata_len)) {
    return false;
  }
  uint8_t trailer[8];
  if (std::fread(trailer, 1, 8, file_) != 8) return false;
  const uint32_t isize = static_cast<uint32_t>(
      trailer[4] | (trailer[5] << 8) | (trailer[6] << 16) | (trailer[7] << 24));

  // +8 slack for pepper_inflate's word copies (BGZF ISIZE <= 64KiB, so
  // the reserve is one-time)
  block_.reserve(isize + 8);
  block_.resize(isize);
  if (isize > 0) {
    bool ok = false;
    if (!use_zlib_inflate()) {
      ok = pepper_inflate(cdata.data(), cdata.size(), block_.data(), isize,
                          block_.capacity()) == 0;
    }
    if (!ok &&
        !zlib_inflate_block(cdata.data(), cdata.size(), block_.data(),
                            isize)) {
      return false;
    }
  }
  block_offset_ = coffset;
  next_block_offset_ = coffset + bsize;
  block_pos_ = 0;
  return true;
}

bool BgzfReader::next_block() {
  // Skip zero-length blocks (the EOF marker payload is empty).
  int64_t offset = next_block_offset_;
  while (load_block_at(offset)) {
    if (!block_.empty()) return true;
    offset = next_block_offset_;
  }
  return false;
}

bool BgzfReader::seek_virtual(uint64_t voffset) {
  const int64_t coffset = static_cast<int64_t>(voffset >> 16);
  const size_t upos = static_cast<size_t>(voffset & 0xffff);
  if (block_offset_ != coffset || block_.empty()) {
    if (!load_block_at(coffset)) return false;
  }
  if (upos > block_.size()) return false;
  block_pos_ = upos;
  return true;
}

size_t BgzfReader::read(void* dst, size_t n) {
  uint8_t* out = static_cast<uint8_t*>(dst);
  size_t done = 0;
  while (done < n) {
    if (block_pos_ >= block_.size()) {
      if (!next_block()) break;
    }
    const size_t take =
        std::min(n - done, block_.size() - block_pos_);
    std::memcpy(out + done, block_.data() + block_pos_, take);
    block_pos_ += take;
    done += take;
  }
  return done;
}

bool BgzfReader::eof() {
  if (block_pos_ < block_.size()) return false;
  // Peek for a next non-empty block without consuming.
  const int64_t save_block = block_offset_;
  const size_t save_pos = block_pos_;
  const bool has_more = next_block();
  if (has_more) {
    // rewind
    load_block_at(save_block);
    block_pos_ = save_pos;
    return false;
  }
  return true;
}
