// Raw-DEFLATE decoder specialized for BGZF blocks (<=64KiB output, whole
// compressed payload in memory).  Design follows the public libdeflate
// recipe: one 64-bit bit-buffer refill per literal/match iteration (56
// buffered bits cover the worst case litlen 15 + extra 5 + dist 15 +
// extra 13 = 48 bits), two-level canonical Huffman tables (11-bit litlen /
// 8-bit distance roots), and 8-byte word copies for matches.  Replaces
// zlib's inflate() in BgzfReader (bgzf.cpp) — fuzz-equal on decompressed
// output (tests/test_io_robustness.py) with a zlib fallback on any parse
// error.
#include "inflate.h"

#include <cstring>
#include <vector>

namespace {

#if defined(__GNUC__)
#define PI_LIKELY(x) __builtin_expect(!!(x), 1)
#define PI_UNLIKELY(x) __builtin_expect(!!(x), 0)
#else
#define PI_LIKELY(x) (x)
#define PI_UNLIKELY(x) (x)
#endif

constexpr int kLitTB = 11;   // litlen root table bits
constexpr int kDistTB = 8;   // distance root table bits
constexpr int kClTB = 7;     // code-length table bits (max code len is 7)

// Table entry (uint32):
//   bits 0..7   bits to consume
//   bits 8..9   kind: 0=literal, 1=base+extra (length or distance),
//               2=end-of-block, 3=subtable pointer
//   bits 10..14 extra-bit count (kind 1) / subtable bits (kind 3)
//   bit  15     two-literal flag (litlen root only): consume covers BOTH
//               codes, payload low byte = first literal, high = second
//   bits 16..31 payload: literal byte(s) / base value / subtable offset
// entry == 0 means invalid code.
constexpr uint32_t kKindMask = 0x300u;
constexpr uint32_t kKindLen = 0x100u;
constexpr uint32_t kKindEob = 0x200u;
constexpr uint32_t kKindSub = 0x300u;
constexpr uint32_t kTwoLits = 0x8000u;

inline uint32_t make_entry(uint32_t consume, uint32_t kind, uint32_t extra,
                           uint32_t payload) {
  return consume | (kind << 8) | (extra << 10) | (payload << 16);
}

inline uint32_t bit_reverse(uint32_t code, int len) {
  code = ((code & 0x5555u) << 1) | ((code >> 1) & 0x5555u);
  code = ((code & 0x3333u) << 2) | ((code >> 2) & 0x3333u);
  code = ((code & 0x0f0fu) << 4) | ((code >> 4) & 0x0f0fu);
  code = ((code & 0x00ffu) << 8) | ((code >> 8) & 0x00ffu);
  return code >> (16 - len);
}

const uint16_t kLenBase[29] = {3,  4,  5,  6,  7,  8,  9,  10, 11,  13,
                               15, 17, 19, 23, 27, 31, 35, 43, 51,  59,
                               67, 83, 99, 115, 131, 163, 195, 227, 258};
const uint8_t kLenExtra[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
                               2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
const uint16_t kDistBase[30] = {1,    2,    3,    4,    5,    7,    9,
                                13,   17,   25,   33,   49,   65,   97,
                                129,  193,  257,  385,  513,  769,  1025,
                                1537, 2049, 3073, 4097, 6145, 8193, 12289,
                                16385, 24577};
const uint8_t kDistExtra[30] = {0, 0, 0,  0,  1,  1,  2,  2,  3,  3,
                                4, 4, 5,  5,  6,  6,  7,  7,  8,  8,
                                9, 9, 10, 10, 11, 11, 12, 12, 13, 13};
const uint8_t kClOrder[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                              11, 4, 12, 3, 13, 2, 14, 1, 15};

enum TableType { LITLEN, DIST, CODELEN };

struct HuffTable {
  uint32_t main[1 << kLitTB];
  uint32_t sub[8192];
};

// Entry payload/kind for a decoded symbol of a given table type.
inline uint32_t sym_entry(TableType type, int sym, uint32_t consume) {
  switch (type) {
    case CODELEN:
      return make_entry(consume, 0, 0, static_cast<uint32_t>(sym));
    case DIST:
      if (sym >= 30) return 0;  // reserved symbols: invalid at decode
      return make_entry(consume, 1, kDistExtra[sym], kDistBase[sym]);
    case LITLEN:
    default:
      if (sym < 256) return make_entry(consume, 0, 0, sym);
      if (sym == 256) return make_entry(consume, 2, 0, 0);
      if (sym >= 286) return 0;  // reserved
      return make_entry(consume, 1, kLenExtra[sym - 257],
                        kLenBase[sym - 257]);
  }
}

// Build a two-level decode table from canonical code lengths.  Returns
// false on an over-subscribed OR (for LITLEN/CODELEN) incomplete code,
// matching zlib's build-time strictness; only DIST keeps the historical
// leniency for incomplete codes (unused slots stay invalid and error if
// hit at decode time).
bool build_table(const uint8_t* lens, int n, int tablebits, TableType type,
                 HuffTable* t) {
  int count[16] = {0};
  for (int i = 0; i < n; i++) count[lens[i]]++;
  const int used = n - count[0];
  std::memset(t->main, 0, sizeof(uint32_t) << tablebits);
  if (used == 0) return type == DIST;  // no distance codes is legal

  int left = 1;
  for (int len = 1; len <= 15; len++) {
    left <<= 1;
    left -= count[len];
    if (left < 0) return false;  // over-subscribed
  }
  if (left > 0 && type != DIST) return false;  // incomplete litlen/codelen

  // canonical order: (length, symbol)
  int offs[17];
  offs[1] = 0;
  for (int len = 1; len < 16; len++) offs[len + 1] = offs[len] + count[len];
  uint16_t order[320];
  for (int sym = 0; sym < n; sym++)
    if (lens[sym]) order[offs[lens[sym]]++] = static_cast<uint16_t>(sym);

  uint32_t next_code[16];
  uint32_t code = 0;
  for (int len = 1; len <= 15; len++) {
    code = (code + count[len - 1]) << 1;
    next_code[len] = code;
  }

  const uint32_t main_mask = (1u << tablebits) - 1;
  // Pass 1: per-prefix subtable sizes for codes longer than the root.
  int sub_bits[1 << kLitTB];
  bool has_long = false;
  {
    uint32_t probe[16];
    std::memcpy(probe, next_code, sizeof(probe));
    for (int i = 0; i < used; i++) {
      const int sym = order[i];
      const int len = lens[sym];
      const uint32_t c = probe[len]++;
      if (len <= tablebits) continue;
      if (!has_long) {
        std::memset(sub_bits, 0, sizeof(int) << tablebits);
        has_long = true;
      }
      const uint32_t prefix = bit_reverse(c, len) & main_mask;
      const int sb = len - tablebits;
      if (sb > sub_bits[prefix]) sub_bits[prefix] = sb;
    }
  }
  // Pass 2: allocate subtables.
  int next_sub = 0;
  if (has_long) {
    for (uint32_t prefix = 0; prefix <= main_mask; prefix++) {
      if (!sub_bits[prefix]) continue;
      const int size = 1 << sub_bits[prefix];
      if (next_sub + size > static_cast<int>(sizeof(t->sub) / 4)) {
        return false;
      }
      std::memset(t->sub + next_sub, 0, sizeof(uint32_t) << sub_bits[prefix]);
      t->main[prefix] = make_entry(tablebits, 3, sub_bits[prefix],
                                   static_cast<uint32_t>(next_sub));
      next_sub += size;
    }
  }
  // Pass 3: fill.
  for (int i = 0; i < used; i++) {
    const int sym = order[i];
    const int len = lens[sym];
    const uint32_t c = next_code[len]++;
    const uint32_t rev = bit_reverse(c, len);
    if (len <= tablebits) {
      const uint32_t entry = sym_entry(type, sym, len);
      for (uint32_t slot = rev; slot <= main_mask; slot += 1u << len)
        t->main[slot] = entry;
    } else {
      const uint32_t prefix = rev & main_mask;
      const uint32_t base =
          t->main[prefix] >> 16;  // subtable offset allocated above
      const int sb = (t->main[prefix] >> 10) & 0x1f;
      const uint32_t entry = sym_entry(type, sym, len - tablebits);
      const uint32_t hi = rev >> tablebits;
      for (uint32_t slot = hi; slot < (1u << sb);
           slot += 1u << (len - tablebits))
        t->sub[base + slot] = entry;
    }
  }

  // Pass 4 (litlen root only): pack TWO literals into one entry wherever
  // the root slot's first code is a literal and the following code is a
  // literal short enough to also fit in the root window — the libdeflate
  // multi-literal trick that roughly doubles per-lookup throughput on
  // literal-heavy (quality-score-dense) streams.
  if (type == LITLEN) {
    static thread_local std::vector<uint32_t> orig;
    orig.assign(t->main, t->main + (size_t(1) << tablebits));
    for (uint32_t slot = 0; slot <= main_mask; slot++) {
      const uint32_t e1 = orig[slot];
      if (e1 == 0 || (e1 & kKindMask) != 0) continue;
      const uint32_t len1 = e1 & 0xffu;
      if (len1 == 0 || static_cast<int>(len1) >= tablebits) continue;
      const uint32_t e2 = orig[slot >> len1];  // zero-extended high bits
      if (e2 == 0 || (e2 & kKindMask) != 0) continue;
      const uint32_t len2 = e2 & 0xffu;
      if (len2 == 0 || len1 + len2 > static_cast<uint32_t>(tablebits))
        continue;
      t->main[slot] = (len1 + len2) | kTwoLits |
                      ((e1 >> 16) << 16) | ((e2 >> 16) << 24);
    }
  }
  return true;
}

// Fixed-Huffman tables (BTYPE=01), built once.
struct FixedTables {
  HuffTable litlen;
  HuffTable dist;
  bool ok;
  FixedTables() {
    uint8_t ll[288];
    for (int i = 0; i < 144; i++) ll[i] = 8;
    for (int i = 144; i < 256; i++) ll[i] = 9;
    for (int i = 256; i < 280; i++) ll[i] = 7;
    for (int i = 280; i < 288; i++) ll[i] = 8;
    uint8_t dd[32];
    for (int i = 0; i < 32; i++) dd[i] = 5;
    ok = build_table(ll, 288, kLitTB, LITLEN, &litlen) &&
         build_table(dd, 32, kDistTB, DIST, &dist);
  }
};

const FixedTables& fixed_tables() {
  static const FixedTables tables;
  return tables;
}

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  const uint8_t* begin;
  uint64_t bb = 0;
  int bc = 0;
  size_t pad = 0;  // virtual zero bytes fed past the end

  inline void refill() {
    if (PI_LIKELY(end - p >= 8)) {
      uint64_t w;
      std::memcpy(&w, p, 8);
      bb |= w << bc;
      p += (63 - bc) >> 3;
      bc |= 56;
    } else {
      while (bc <= 56) {
        uint8_t byte = 0;
        if (p < end) {
          byte = *p++;
        } else {
          pad++;
        }
        bb |= static_cast<uint64_t>(byte) << bc;
        bc += 8;
      }
    }
  }

  inline uint64_t bits(int n) {
    const uint64_t v = bb & ((1ull << n) - 1);
    bb >>= n;
    bc -= n;
    return v;
  }

  // True when more bits were consumed than the input holds.
  bool overrun() const {
    const int64_t consumed =
        (static_cast<int64_t>(p - begin) + static_cast<int64_t>(pad)) * 8 -
        bc;
    return consumed > static_cast<int64_t>(end - begin) * 8;
  }
};

}  // namespace

int pepper_inflate(const uint8_t* in, size_t in_len, uint8_t* out,
                   size_t out_len, size_t out_cap) {
  if (out_cap < out_len + 8) return -1;
  BitReader br;
  br.p = br.begin = in;
  br.end = in + in_len;
  uint8_t* const out_base = out;
  uint8_t* const out_limit = out + out_len;   // exact expected size
  uint8_t* const hard_end = out + out_cap;    // word-copy slack boundary

  // dynamic-table storage (40KB each; fine on an 8MB stack)
  static thread_local HuffTable dyn_litlen, dyn_dist;
  HuffTable cl_table;

  bool final_block = false;
  while (!final_block) {
    br.refill();
    final_block = br.bits(1) != 0;
    const int btype = static_cast<int>(br.bits(2));

    if (btype == 0) {  // stored
      br.bits(br.bc & 7);  // byte-align
      br.refill();
      const uint32_t len = static_cast<uint32_t>(br.bits(16));
      const uint32_t nlen = static_cast<uint32_t>(br.bits(16));
      if ((len ^ 0xffffu) != nlen) return -2;
      uint32_t remaining = len;
      if (out + remaining > out_limit) return -3;
      while (remaining > 0 && br.bc >= 8) {  // drain buffered bytes
        *out++ = static_cast<uint8_t>(br.bits(8));
        remaining--;
      }
      if (remaining > 0) {
        if (br.end - br.p < static_cast<ptrdiff_t>(remaining)) return -4;
        std::memcpy(out, br.p, remaining);
        out += remaining;
        br.p += remaining;
        // the fast refill loads 8 bytes but may advance p by only 7,
        // leaving a "bonus" byte buffered above bc; advancing p manually
        // invalidates it — discard the buffer (bc is 0 here: the stream
        // is byte-aligned and the drain loop emptied whole bytes)
        br.bb = 0;
        br.bc = 0;
      }
      continue;
    }
    if (btype == 3) return -5;

    const HuffTable* lt;
    const HuffTable* dt;
    if (btype == 1) {
      const FixedTables& ft = fixed_tables();
      if (!ft.ok) return -6;
      lt = &ft.litlen;
      dt = &ft.dist;
    } else {  // dynamic
      br.refill();
      const int hlit = static_cast<int>(br.bits(5)) + 257;
      const int hdist = static_cast<int>(br.bits(5)) + 1;
      const int hclen = static_cast<int>(br.bits(4)) + 4;
      uint8_t cl_lens[19] = {0};
      for (int i = 0; i < hclen; i++) {
        br.refill();
        cl_lens[kClOrder[i]] = static_cast<uint8_t>(br.bits(3));
      }
      if (!build_table(cl_lens, 19, kClTB, CODELEN, &cl_table)) return -7;

      uint8_t lens[288 + 32] = {0};
      const int total = hlit + hdist;
      int i = 0;
      while (i < total) {
        br.refill();
        uint32_t e = cl_table.main[br.bb & ((1u << kClTB) - 1)];
        if (e == 0) return -8;
        br.bits(e & 0xff);
        const uint32_t sym = e >> 16;
        if (sym < 16) {
          lens[i++] = static_cast<uint8_t>(sym);
        } else if (sym == 16) {
          if (i == 0) return -9;
          const int rep = 3 + static_cast<int>(br.bits(2));
          if (i + rep > total) return -10;
          const uint8_t prev = lens[i - 1];
          for (int r = 0; r < rep; r++) lens[i++] = prev;
        } else if (sym == 17) {
          const int rep = 3 + static_cast<int>(br.bits(3));
          if (i + rep > total) return -11;
          i += rep;  // already zero
        } else {
          const int rep = 11 + static_cast<int>(br.bits(7));
          if (i + rep > total) return -12;
          i += rep;
        }
      }
      if (!build_table(lens, hlit, kLitTB, LITLEN, &dyn_litlen)) return -13;
      if (!build_table(lens + hlit, hdist, kDistTB, DIST, &dyn_dist))
        return -14;
      lt = &dyn_litlen;
      dt = &dyn_dist;
    }

    // ---- decode: fast loop (3 literals per refill, unguarded copies in
    // a slack-bounded region) with a careful tail loop ----
    const uint32_t lit_mask = (1u << kLitTB) - 1;
    const uint32_t dist_mask = (1u << kDistTB) - 1;
    bool eob = false;

    // Fast region: room for 6 literals or one 258-byte match plus 8-byte
    // copy overshoot, and >= 8 input bytes so every refill is the fast
    // 8-byte load.  Three straight-line table lookups per refill (<= 15
    // bits each), each emitting 1 or 2 literals via the packed
    // two-literal entries.
    while (PI_LIKELY(out_limit - out > 270 && br.end - br.p >= 8)) {
      br.refill();
      uint32_t e = lt->main[br.bb & lit_mask];
      if (PI_UNLIKELY((e & kKindMask) == kKindSub)) {
        br.bits(kLitTB);
        e = lt->sub[(e >> 16) + (br.bb & ((1u << ((e >> 10) & 0x1f)) - 1))];
      }
      if (PI_UNLIKELY(e == 0)) return -15;
      br.bits(e & 0xff);
      if (PI_LIKELY((e & kKindMask) == 0)) {
        out[0] = static_cast<uint8_t>(e >> 16);
        out[1] = static_cast<uint8_t>(e >> 24);  // stray 0 if single; slack
        out += 1 + ((e >> 15) & 1u);
        // second lookup without refill (>= 41 bits buffered)
        e = lt->main[br.bb & lit_mask];
        if (PI_UNLIKELY((e & kKindMask) == kKindSub)) {
          br.bits(kLitTB);
          e = lt->sub[(e >> 16) +
                      (br.bb & ((1u << ((e >> 10) & 0x1f)) - 1))];
        }
        if (PI_UNLIKELY(e == 0)) return -15;
        br.bits(e & 0xff);
        if (PI_LIKELY((e & kKindMask) == 0)) {
          out[0] = static_cast<uint8_t>(e >> 16);
          out[1] = static_cast<uint8_t>(e >> 24);
          out += 1 + ((e >> 15) & 1u);
          // third lookup (>= 26 bits buffered)
          e = lt->main[br.bb & lit_mask];
          if (PI_UNLIKELY((e & kKindMask) == kKindSub)) {
            br.bits(kLitTB);
            e = lt->sub[(e >> 16) +
                        (br.bb & ((1u << ((e >> 10) & 0x1f)) - 1))];
          }
          if (PI_UNLIKELY(e == 0)) return -15;
          br.bits(e & 0xff);
          if (PI_LIKELY((e & kKindMask) == 0)) {
            out[0] = static_cast<uint8_t>(e >> 16);
            out[1] = static_cast<uint8_t>(e >> 24);
            out += 1 + ((e >> 15) & 1u);
            continue;
          }
        }
      }
      if (PI_UNLIKELY((e & kKindMask) == kKindEob)) {
        eob = true;
        break;
      }
      // match: refill so length-extra + dist + dist-extra (<= 33 bits)
      // always fit
      uint32_t length = e >> 16;
      const uint32_t lextra = (e >> 10) & 0x1f;
      br.refill();
      length += static_cast<uint32_t>(br.bits(lextra));
      uint32_t e2 = dt->main[br.bb & dist_mask];
      if (PI_UNLIKELY((e2 & kKindMask) == kKindSub)) {
        br.bits(kDistTB);
        e2 = dt->sub[(e2 >> 16) + (br.bb & ((1u << ((e2 >> 10) & 0x1f)) - 1))];
      }
      if (PI_UNLIKELY(e2 == 0 || (e2 & kKindMask) != kKindLen)) return -17;
      br.bits(e2 & 0xff);
      const uint32_t dist = (e2 >> 16) +
                            static_cast<uint32_t>(br.bits((e2 >> 10) & 0x1f));
      if (PI_UNLIKELY(dist > static_cast<size_t>(out - out_base))) return -18;

      const uint8_t* src = out - dist;
      if (dist == 1) {
        std::memset(out, *src, length);
      } else if (dist >= length) {
        std::memcpy(out, src, length);  // non-overlapping
      } else {
        // overlapping: prime one period, then doubling copies (chunk is
        // always a multiple of the period, so memcpy from the start of
        // the produced run stays correct and non-overlapping)
        std::memcpy(out, src, dist);
        uint32_t copied = dist;
        while (copied < length) {
          const uint32_t chunk =
              copied < length - copied ? copied : length - copied;
          std::memcpy(out + copied, out, chunk);
          copied += chunk;
        }
      }
      out += length;
    }

    // ---- careful tail loop (also handles near-end-of-input refills) ----
    while (!eob) {
      br.refill();
      uint32_t e = lt->main[br.bb & lit_mask];
      if (PI_UNLIKELY((e & kKindMask) == kKindSub)) {
        br.bits(kLitTB);
        e = lt->sub[(e >> 16) +
                    (br.bb & ((1u << ((e >> 10) & 0x1f)) - 1))];
      }
      if (PI_UNLIKELY(e == 0)) return -15;
      br.bits(e & 0xff);
      const uint32_t kind = e & kKindMask;
      if (PI_LIKELY(kind == 0)) {  // literal (possibly a packed pair)
        if (PI_UNLIKELY(out >= out_limit)) return -16;
        *out++ = static_cast<uint8_t>(e >> 16);
        if (e & kTwoLits) {
          if (PI_UNLIKELY(out >= out_limit)) return -16;
          *out++ = static_cast<uint8_t>(e >> 24);
        }
        continue;
      }
      if (PI_UNLIKELY(kind == kKindEob)) break;
      // match length
      uint32_t length = (e >> 16) +
                        static_cast<uint32_t>(br.bits((e >> 10) & 0x1f));
      // distance
      uint32_t e2 = dt->main[br.bb & dist_mask];
      if (PI_UNLIKELY((e2 & kKindMask) == kKindSub)) {
        br.bits(kDistTB);
        e2 = dt->sub[(e2 >> 16) +
                     (br.bb & ((1u << ((e2 >> 10) & 0x1f)) - 1))];
      }
      if (PI_UNLIKELY(e2 == 0 || (e2 & kKindMask) != kKindLen)) return -17;
      br.bits(e2 & 0xff);
      const uint32_t dist = (e2 >> 16) +
                            static_cast<uint32_t>(br.bits((e2 >> 10) & 0x1f));
      if (PI_UNLIKELY(dist > static_cast<size_t>(out - out_base))) return -18;
      if (PI_UNLIKELY(out + length > out_limit)) return -19;

      const uint8_t* src = out - dist;
      while (length--) *out++ = *src++;
      (void)hard_end;
    }
  }
  if (out != out_limit) return -20;
  if (br.overrun()) return -21;
  return 0;
}
