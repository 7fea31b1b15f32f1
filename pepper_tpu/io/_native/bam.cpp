#include "bam.h"

#include <algorithm>
#include <cstring>

#ifdef __SSSE3__
#include <tmmintrin.h>
#endif

namespace {

inline uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}
inline uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
inline uint64_t rd_u64(const uint8_t* p) {
  return static_cast<uint64_t>(rd_u32(p)) |
         (static_cast<uint64_t>(rd_u32(p + 4)) << 32);
}
inline int32_t rd_i32(const uint8_t* p) {
  return static_cast<int32_t>(rd_u32(p));
}

constexpr char kSeqNt16Str[] = "=ACMGRSVTWYHKDBN";

// Decode n packed 4-bit BAM bases starting at read index ri into dst
// (high nibble first, htslib layout).  SSSE3 path: unpack 8 source bytes
// to 16 interleaved nibbles and map through a pshufb LUT.
inline void decode_seq_span(char* dst, const uint8_t* seqi, int64_t ri,
                            int64_t n) {
  if (n <= 0) return;
  int64_t written = 0;
#ifdef __SSSE3__
  if (ri & 1) {  // align to an even base index (byte boundary)
    const uint8_t code = (seqi[ri >> 1] >> ((~ri & 1) << 2)) & 0xf;
    dst[written++] = kSeqNt16Str[code];
    ++ri;
  }
  const __m128i lut = _mm_loadu_si128(
      reinterpret_cast<const __m128i*>(kSeqNt16Str));
  const __m128i low_mask = _mm_set1_epi8(0x0f);
  while (written + 16 <= n) {
    const __m128i packed = _mm_loadl_epi64(
        reinterpret_cast<const __m128i*>(seqi + (ri >> 1)));
    const __m128i hi = _mm_and_si128(_mm_srli_epi16(packed, 4), low_mask);
    const __m128i lo = _mm_and_si128(packed, low_mask);
    const __m128i codes = _mm_unpacklo_epi8(hi, lo);
    _mm_storeu_si128(reinterpret_cast<__m128i*>(dst + written),
                     _mm_shuffle_epi8(lut, codes));
    written += 16;
    ri += 16;
  }
#endif
  for (; written < n; ++written, ++ri) {
    const uint8_t code = (seqi[ri >> 1] >> ((~ri & 1) << 2)) & 0xf;
    dst[written] = kSeqNt16Str[code];
  }
}

// BAM flags
constexpr int FLAG_UNMAPPED = 0x4;
constexpr int FLAG_REVERSE = 0x10;
constexpr int FLAG_SECONDARY = 0x100;
constexpr int FLAG_QCFAIL = 0x200;
constexpr int FLAG_DUP = 0x400;
constexpr int FLAG_SUPPLEMENTARY = 0x800;

// UCSC binning generalized to CSI parameters: list of bins overlapping
// [beg, end) for a scheme with `depth` levels below the root and leaf
// windows of 1 << min_shift bp.  min_shift=14, depth=5 reproduces the
// classic BAI bins exactly (htslib reg2bins role; CSI spec §"computing
// the bins").
void reg2bins(int64_t beg, int64_t end, int min_shift, int depth,
              std::vector<uint32_t>* bins) {
  if (beg >= end) return;
  end -= 1;
  int64_t t = 0;
  int s = min_shift + depth * 3;
  for (int level = 0; level <= depth; ++level) {
    for (int64_t k = t + (beg >> s); k <= t + (end >> s); ++k)
      bins->push_back(static_cast<uint32_t>(k));
    t += int64_t(1) << (level * 3);
    s -= 3;
  }
}

int aux_type_size(uint8_t type) {
  switch (type) {
    case 'A':
    case 'c':
    case 'C':
      return 1;
    case 's':
    case 'S':
      return 2;
    case 'i':
    case 'I':
    case 'f':
      return 4;
    default:
      return -1;
  }
}

// Parse the integer HP tag out of a BAM aux blob (bam_handler.cpp:313-428).
int parse_hp_tag(const uint8_t* aux, const uint8_t* aux_end) {
  const uint8_t* s = aux;
  while (aux_end - s >= 4) {
    const char t1 = static_cast<char>(s[0]);
    const char t2 = static_cast<char>(s[1]);
    const bool is_hp = (t1 == 'H' && t2 == 'P');
    s += 2;
    const uint8_t type = *s++;
    switch (type) {
      case 'A':
        s += 1;
        break;
      case 'c':
        if (is_hp) return *reinterpret_cast<const int8_t*>(s);
        s += 1;
        break;
      case 'C':
        if (is_hp) return *s;
        s += 1;
        break;
      case 's':
        if (is_hp) return static_cast<int16_t>(rd_u16(s));
        s += 2;
        break;
      case 'S':
        if (is_hp) return rd_u16(s);
        s += 2;
        break;
      case 'i':
        if (is_hp) return rd_i32(s);
        s += 4;
        break;
      case 'I':
        if (is_hp) return static_cast<int>(rd_u32(s));
        s += 4;
        break;
      case 'f':
        s += 4;
        break;
      case 'Z':
      case 'H':
        while (s < aux_end && *s) ++s;
        ++s;
        break;
      case 'B': {
        if (aux_end - s < 5) return 0;
        const int esize = aux_type_size(*s);
        if (esize < 0) return 0;
        const uint32_t n = rd_u32(s + 1);
        s += 5 + static_cast<int64_t>(n) * esize;
        break;
      }
      default:
        return 0;  // unknown tag type: stop scanning (tag_state_ok=false)
    }
  }
  return 0;
}

// Find the CG:B,I aux array carrying the real CIGAR of a long-CIGAR record
// (SAM spec §4.2.2). htslib restores these transparently, so the reference
// gets >65,535-op CIGARs for free (bam_handler.cpp:115-150 operates on the
// already-restored ops); we must do the restore ourselves.
bool find_cg_cigar(const uint8_t* aux, const uint8_t* aux_end,
                   const uint8_t** cg_data, uint32_t* cg_n) {
  const uint8_t* s = aux;
  while (aux_end - s >= 4) {
    const char t1 = static_cast<char>(s[0]);
    const char t2 = static_cast<char>(s[1]);
    s += 2;
    const uint8_t type = *s++;
    switch (type) {
      case 'A':
      case 'c':
      case 'C':
        s += 1;
        break;
      case 's':
      case 'S':
        s += 2;
        break;
      case 'i':
      case 'I':
      case 'f':
        s += 4;
        break;
      case 'Z':
      case 'H':
        while (s < aux_end && *s) ++s;
        ++s;
        break;
      case 'B': {
        if (aux_end - s < 5) return false;
        const uint8_t subtype = *s;
        const int esize = aux_type_size(subtype);
        if (esize < 0) return false;
        const uint32_t n = rd_u32(s + 1);
        if (t1 == 'C' && t2 == 'G' && subtype == 'I') {
          if (aux_end - (s + 5) < static_cast<int64_t>(n) * 4) return false;
          *cg_data = s + 5;
          *cg_n = n;
          return true;
        }
        s += 5 + static_cast<int64_t>(n) * esize;
        break;
      }
      default:
        return false;  // unknown tag type: stop scanning
    }
  }
  return false;
}

}  // namespace

BamReader::BamReader(const std::string& path) : path_(path) {
  bgzf_ = std::make_unique<BgzfReader>(path);
  if (!bgzf_->ok()) return;
  if (!read_header()) return;
  // Try <bam>.bai, <bam>.csi, then the <stem> variants (htslib looks up
  // both transparently; CSI carries contigs > 2^29 bp)
  if (!load_index(path + ".bai") && !load_csi(path + ".csi")) {
    const auto dot = path.rfind('.');
    if (dot != std::string::npos) {
      const std::string stem = path.substr(0, dot);
      if (!load_index(stem + ".bai")) load_csi(stem + ".csi");
    }
  }
  ok_ = true;
}

bool BamReader::read_header() {
  uint8_t magic[4];
  if (bgzf_->read(magic, 4) != 4) return false;
  if (std::memcmp(magic, "BAM\1", 4) != 0) return false;
  uint8_t buf[8];
  if (bgzf_->read(buf, 4) != 4) return false;
  const uint32_t l_text = rd_u32(buf);
  std::vector<uint8_t> text(l_text);
  if (bgzf_->read(text.data(), l_text) != l_text) return false;
  if (bgzf_->read(buf, 4) != 4) return false;
  const uint32_t n_ref = rd_u32(buf);
  names_.reserve(n_ref);
  lens_.reserve(n_ref);
  for (uint32_t i = 0; i < n_ref; ++i) {
    if (bgzf_->read(buf, 4) != 4) return false;
    const uint32_t l_name = rd_u32(buf);
    std::vector<char> name(l_name);
    if (bgzf_->read(name.data(), l_name) != l_name) return false;
    names_.emplace_back(name.data());  // NUL-terminated
    if (bgzf_->read(buf, 4) != 4) return false;
    lens_.push_back(rd_u32(buf));
  }
  data_start_voffset_ = bgzf_->tell_virtual();
  return true;
}

bool BamReader::load_index(const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(size);
  if (std::fread(data.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);

  const uint8_t* p = data.data();
  const uint8_t* end = p + size;
  if (size < 8 || std::memcmp(p, "BAI\1", 4) != 0) return false;
  p += 4;
  const uint32_t n_ref = rd_u32(p);
  p += 4;
  index_.refs.resize(n_ref);
  for (uint32_t r = 0; r < n_ref; ++r) {
    if (end - p < 4) return false;
    const uint32_t n_bin = rd_u32(p);
    p += 4;
    auto& ref = index_.refs[r];
    for (uint32_t b = 0; b < n_bin; ++b) {
      if (end - p < 8) return false;
      const uint32_t bin_id = rd_u32(p);
      const uint32_t n_chunk = rd_u32(p + 4);
      p += 8;
      std::vector<BaiIndex::Chunk> chunks;
      chunks.reserve(n_chunk);
      for (uint32_t c = 0; c < n_chunk; ++c) {
        if (end - p < 16) return false;
        chunks.push_back({rd_u64(p), rd_u64(p + 8)});
        p += 16;
      }
      if (bin_id != 37450) {  // skip the metadata pseudo-bin
        ref.bins.emplace_back(bin_id, std::move(chunks));
      }
    }
    if (end - p < 4) return false;
    const uint32_t n_intv = rd_u32(p);
    p += 4;
    ref.linear.reserve(n_intv);
    for (uint32_t i = 0; i < n_intv; ++i) {
      if (end - p < 8) return false;
      ref.linear.push_back(rd_u64(p));
      p += 8;
    }
  }
  index_.loaded = true;
  return true;
}

bool BamReader::load_csi(const std::string& path) {
  // CSI (.csi): the BAI scheme with parameterized (min_shift, depth),
  // BGZF-compressed, no separate linear index — each bin instead carries
  // loffset, the virtual offset of the first overlapping record.  A
  // pseudo-linear index is rebuilt from the LEAF bins' loffsets (leaf
  // windows are exactly the BAI 16kb windows at the default parameters);
  // forward-filled holes only shrink min_off relative to truth, so chunk
  // pruning stays sound.
  BgzfReader reader(path);
  if (!reader.ok()) return false;
  std::vector<uint8_t> data;
  uint8_t buf[4096];
  for (;;) {
    const int64_t got = reader.read(buf, sizeof(buf));
    if (got <= 0) break;
    data.insert(data.end(), buf, buf + got);
  }
  const uint8_t* p = data.data();
  const uint8_t* end = p + data.size();
  if (data.size() < 16 || std::memcmp(p, "CSI\1", 4) != 0) return false;
  const int32_t min_shift = rd_i32(p + 4);
  const int32_t depth = rd_i32(p + 8);
  const uint32_t l_aux = rd_u32(p + 12);
  p += 16;
  if (min_shift < 1 || min_shift > 32 || depth < 1 || depth > 10)
    return false;
  if (static_cast<size_t>(end - p) < l_aux + 4) return false;
  p += l_aux;
  const uint32_t n_ref = rd_u32(p);
  p += 4;
  const int64_t leaf_t =
      ((int64_t(1) << (3 * depth)) - 1) / 7;  // first leaf bin id
  const int64_t meta_bin =
      ((int64_t(1) << (3 * (depth + 1))) - 1) / 7 + 1;
  index_.refs.assign(n_ref, {});
  index_.min_shift = min_shift;
  index_.depth = depth;
  for (uint32_t r = 0; r < n_ref; ++r) {
    if (end - p < 4) return false;
    const uint32_t n_bin = rd_u32(p);
    p += 4;
    auto& ref = index_.refs[r];
    std::vector<std::pair<int64_t, uint64_t>> leaf_offsets;
    for (uint32_t b = 0; b < n_bin; ++b) {
      if (end - p < 16) return false;
      const uint32_t bin_id = rd_u32(p);
      const uint64_t loffset = rd_u64(p + 4);
      const uint32_t n_chunk = rd_u32(p + 12);
      p += 16;
      std::vector<BaiIndex::Chunk> chunks;
      chunks.reserve(n_chunk);
      for (uint32_t c = 0; c < n_chunk; ++c) {
        if (end - p < 16) return false;
        chunks.push_back({rd_u64(p), rd_u64(p + 8)});
        p += 16;
      }
      if (bin_id == meta_bin) continue;  // metadata pseudo-bin
      if (bin_id >= leaf_t && loffset > 0)
        leaf_offsets.emplace_back(bin_id - leaf_t, loffset);
      ref.bins.emplace_back(bin_id, std::move(chunks));
    }
    if (!leaf_offsets.empty()) {
      int64_t max_window = 0;
      for (const auto& entry : leaf_offsets)
        max_window = std::max(max_window, entry.first);
      ref.linear.assign(max_window + 1, 0);
      for (const auto& entry : leaf_offsets)
        ref.linear[entry.first] = entry.second;
      uint64_t fill = 0;
      for (auto& v : ref.linear) {
        if (v == 0)
          v = fill;
        else
          fill = v;
      }
    }
  }
  index_.loaded = true;
  return true;
}

int BamReader::target_id(const std::string& name) const {
  for (size_t i = 0; i < names_.size(); ++i) {
    if (names_[i] == name) return static_cast<int>(i);
  }
  return -1;
}

// min_baseq is accepted but intentionally unused: the reference collects
// "bad base" indices below this threshold into a vector that no live caller
// ever reads (bam_handler.cpp:216-222), so applying it here would *diverge*
// from reference behavior. Kept for signature parity.
std::unique_ptr<ReadBatch> BamReader::get_reads(const std::string& chrom,
                                                int64_t start, int64_t stop,
                                                bool include_supplementary,
                                                int min_mapq, int min_baseq) {
  auto batch = std::make_unique<ReadBatch>();
  batch->seq_offsets.push_back(0);
  batch->cigar_offsets.push_back(0);
  batch->name_offsets.push_back(0);

  const int tid = target_id(chrom);
  if (tid < 0) return batch;

  // Collect candidate chunks from the index (or scan whole file if absent).
  std::vector<BaiIndex::Chunk> chunks;
  if (index_.loaded && tid < static_cast<int>(index_.refs.size())) {
    const auto& ref = index_.refs[tid];
    uint64_t min_off = 0;
    if (!ref.linear.empty()) {
      size_t w = static_cast<size_t>(
          std::max<int64_t>(0, start) >> index_.min_shift);
      if (w >= ref.linear.size()) w = ref.linear.size() - 1;
      min_off = ref.linear[w];
    }
    std::vector<uint32_t> bins;
    reg2bins(start, stop, index_.min_shift, index_.depth, &bins);
    std::sort(bins.begin(), bins.end());
    for (const auto& entry : ref.bins) {
      if (!std::binary_search(bins.begin(), bins.end(), entry.first)) continue;
      for (const auto& chunk : entry.second) {
        if (chunk.end > min_off) chunks.push_back(chunk);
      }
    }
    std::sort(chunks.begin(), chunks.end(),
              [](const BaiIndex::Chunk& a, const BaiIndex::Chunk& b) {
                return a.beg < b.beg;
              });
    // merge overlapping/adjacent chunks
    std::vector<BaiIndex::Chunk> merged;
    for (const auto& chunk : chunks) {
      if (!merged.empty() && chunk.beg <= merged.back().end) {
        merged.back().end = std::max(merged.back().end, chunk.end);
      } else {
        merged.push_back(chunk);
      }
    }
    chunks = std::move(merged);
  } else {
    chunks.push_back({data_start_voffset_, ~0ull});
  }

  std::vector<uint8_t> rec;
  for (const auto& chunk : chunks) {
    if (!bgzf_->seek_virtual(chunk.beg)) continue;
    while (true) {
      const uint64_t voffset = bgzf_->tell_virtual();
      if (voffset >= chunk.end) break;
      uint8_t lenbuf[4];
      if (bgzf_->read(lenbuf, 4) != 4) break;
      const uint32_t block_size = rd_u32(lenbuf);
      rec.resize(block_size);
      if (bgzf_->read(rec.data(), block_size) != block_size) break;
      if (block_size < 32) continue;

      const int32_t ref_id = rd_i32(&rec[0]);
      const int64_t pos = rd_i32(&rec[4]);
      if (ref_id != tid) {
        if (ref_id > tid || ref_id < 0) goto done;  // coordinate-sorted
        continue;
      }
      if (pos >= stop) goto done;

      const uint8_t l_read_name = rec[8];
      const uint8_t mapq = rec[9];
      const uint16_t n_cigar = rd_u16(&rec[12]);
      const uint16_t flag = rd_u16(&rec[14]);
      const uint32_t l_seq = rd_u32(&rec[16]);

      // record layout offsets
      const size_t name_off = 32;
      const size_t cigar_off = name_off + l_read_name;
      const size_t seq_off = cigar_off + 4ull * n_cigar;
      const size_t qual_off = seq_off + (l_seq + 1) / 2;
      const size_t aux_off = qual_off + l_seq;
      if (aux_off > rec.size()) continue;

      // Effective CIGAR: inline ops, or the CG:B,I aux array when the inline
      // CIGAR is the long-record placeholder <l_seq>S<ref_len>N.
      const uint8_t* cig = &rec[cigar_off];
      uint32_t n_ops = n_cigar;
      if (n_cigar == 2) {
        const uint32_t v0 = rd_u32(cig);
        const uint32_t v1 = rd_u32(cig + 4);
        if ((v0 & 0xf) == CIGAR_SOFT_CLIP && (v0 >> 4) == l_seq &&
            (v1 & 0xf) == CIGAR_REF_SKIP) {
          const uint8_t* cg_data = nullptr;
          uint32_t cg_n = 0;
          if (find_cg_cigar(&rec[aux_off], rec.data() + rec.size(), &cg_data,
                            &cg_n) &&
              cg_n > 0) {
            cig = cg_data;
            n_ops = cg_n;
          }
        }
      }

      // overlap check: compute reference span from CIGAR
      int64_t ref_len = 0;
      for (uint32_t k = 0; k < n_ops; ++k) {
        const uint32_t v = rd_u32(cig + 4ull * k);
        const uint8_t op = v & 0xf;
        const uint32_t len = v >> 4;
        if (op == CIGAR_MATCH || op == CIGAR_DEL || op == CIGAR_REF_SKIP ||
            op == CIGAR_EQUAL || op == CIGAR_DIFF) {
          ref_len += len;
        }
      }
      if (pos + ref_len <= start) continue;

      // filters (bam_handler.cpp:139-150)
      if (flag & (FLAG_QCFAIL | FLAG_DUP | FLAG_SECONDARY | FLAG_UNMAPPED)) {
        continue;
      }
      if (!include_supplementary && (flag & FLAG_SUPPLEMENTARY)) continue;
      if (mapq < min_mapq) continue;

      // ---- region clipping (bam_handler.cpp:178-306) ----
      const uint8_t* seqi = &rec[seq_off];
      const uint8_t* quali = &rec[qual_off];
      int64_t current_read_pos = pos;
      int64_t current_read_index = 0;
      int64_t pos_start = -1, pos_end = -1;

      const size_t seq_base = batch->seq.size();
      const size_t cigar_base = batch->cigar_ops.size();

      for (uint32_t k = 0; k < n_ops; ++k) {
        if (current_read_pos > stop) break;
        const uint32_t v = rd_u32(cig + 4ull * k);
        const uint8_t op = v & 0xf;
        const int64_t cigar_len = v >> 4;
        int64_t modified = 0;
        switch (op) {
          case CIGAR_MATCH:
          case CIGAR_EQUAL:
          case CIGAR_DIFF: {
            int64_t idx = 0;
            if (current_read_pos < start) {
              idx = std::min(start - current_read_pos, cigar_len);
              current_read_index += idx;
              current_read_pos += idx;
            }
            // whole in-region span at once: memcpy quals, bulk-decode seq
            const int64_t span = std::min(cigar_len - idx,
                                          stop - current_read_pos + 1);
            if (span > 0) {
              if (pos_start == -1) {
                pos_start = current_read_pos;
                pos_end = pos_start;
              }
              batch->qual.insert(batch->qual.end(),
                                 quali + current_read_index,
                                 quali + current_read_index + span);
              const size_t out = batch->seq.size();
              batch->seq.resize(out + span);
              decode_seq_span(batch->seq.data() + out, seqi,
                              current_read_index, span);
              modified = span;
              pos_end += span;
              current_read_index += span;
              current_read_pos += span;
            }
            if (modified > 0) {
              batch->cigar_ops.push_back(op);
              batch->cigar_lens.push_back(static_cast<int32_t>(modified));
            }
            break;
          }
          case CIGAR_SOFT_CLIP:
          case CIGAR_INS: {
            if (current_read_pos >= start && current_read_pos <= stop &&
                pos_start != -1) {
              batch->qual.insert(batch->qual.end(),
                                 quali + current_read_index,
                                 quali + current_read_index + cigar_len);
              const size_t out = batch->seq.size();
              batch->seq.resize(out + cigar_len);
              decode_seq_span(batch->seq.data() + out, seqi,
                              current_read_index, cigar_len);
              modified = cigar_len;
              current_read_index += cigar_len;
            } else {
              current_read_index += cigar_len;
            }
            if (modified > 0) {
              batch->cigar_ops.push_back(op);
              batch->cigar_lens.push_back(static_cast<int32_t>(modified));
            }
            break;
          }
          case CIGAR_REF_SKIP:
          case CIGAR_DEL: {
            if (current_read_pos >= start && current_read_pos <= stop &&
                pos_start != -1) {
              for (int64_t i = 0; i < cigar_len; ++i) {
                if (current_read_pos <= stop) {
                  ++modified;
                  ++pos_end;
                } else {
                  break;
                }
                ++current_read_pos;
              }
            } else {
              current_read_pos += cigar_len;
            }
            if (modified > 0) {
              batch->cigar_ops.push_back(op);
              batch->cigar_lens.push_back(static_cast<int32_t>(modified));
            }
            break;
          }
          case CIGAR_HARD_CLIP:
          default:
            break;
        }
      }

      if (batch->seq.size() == seq_base) {
        // nothing survived clipping; roll back cigar too
        batch->cigar_ops.resize(cigar_base);
        batch->cigar_lens.resize(cigar_base);
        continue;
      }

      const int hp = parse_hp_tag(&rec[aux_off], rec.data() + rec.size());

      batch->pos.push_back(pos_start);
      batch->pos_end.push_back(pos_end);
      batch->mapq.push_back(mapq);
      batch->flag.push_back(flag);
      batch->hp.push_back(hp);
      batch->seq_offsets.push_back(static_cast<int64_t>(batch->seq.size()));
      batch->cigar_offsets.push_back(
          static_cast<int64_t>(batch->cigar_ops.size()));
      const char* qname = reinterpret_cast<const char*>(&rec[name_off]);
      const size_t qname_len = strnlen(qname, l_read_name);
      batch->names.insert(batch->names.end(), qname, qname + qname_len);
      batch->name_offsets.push_back(static_cast<int64_t>(batch->names.size()));
    }
  }
done:
  return batch;
}
