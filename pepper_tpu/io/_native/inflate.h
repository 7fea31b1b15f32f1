// Specialized raw-DEFLATE decoder for BGZF blocks (libdeflate-style:
// 64-bit bit buffer, two-level Huffman lookup tables, word copies).
//
// Fills the role of the htslib+libdeflate pairing the reference links
// (CMakeLists.txt:34-35, pepper/modules/htslib.cmake): BAM decompression
// is ~40% of window-generation wall with plain zlib inflate.
#pragma once

#include <cstddef>
#include <cstdint>

// Inflate a raw DEFLATE stream of in_len bytes into out.  The stream must
// produce EXACTLY out_len bytes (BGZF stores ISIZE, so the caller knows).
// out_cap must be >= out_len + 8: the match copier writes 8-byte chunks
// that may run up to 7 bytes past the last produced byte (within out_cap).
// Returns 0 on success, nonzero on any malformed input (caller may retry
// with zlib for a second opinion).
int pepper_inflate(const uint8_t* in, size_t in_len, uint8_t* out,
                   size_t out_len, size_t out_cap);
