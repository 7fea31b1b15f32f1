"""BGZF writer (pure Python, zlib) with virtual-offset tracking.

Used to write BAM test fixtures, bgzipped VCF output, and tabix indices.
"""

from __future__ import annotations

import struct
import zlib

MAX_BLOCK_UNCOMPRESSED = 65280

# 28-byte BGZF EOF marker block (fixed bytes per the SAM spec).
EOF_BLOCK = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def compress_one_block(chunk: bytes, level: int = 6) -> bytes:
    """One complete BGZF block (header + raw deflate + crc/isize trailer)
    for <= MAX_BLOCK_UNCOMPRESSED input bytes."""
    compressor = zlib.compressobj(level, zlib.DEFLATED, -15)
    cdata = compressor.compress(chunk) + compressor.flush()
    bsize = len(cdata) + 12 + 6 + 8  # header + extra + trailer
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1f, 0x8b, 8, 4,   # magic, CM=deflate, FLG=FEXTRA
        0, 0, 0xff,          # MTIME, XFL, OS
        6,                   # XLEN
        ord("B"), ord("C"), 2, bsize - 1)
    trailer = struct.pack("<II", zlib.crc32(chunk) & 0xffffffff,
                          len(chunk))
    return header + cdata + trailer


def compress_block_stream(blob: bytes, level: int = 6):
    """Compress `blob` as a stream of full BGZF blocks (the exact blocks a
    fresh BgzfWriter.write(blob)+flush() would emit).

    Returns (compressed_bytes, cum_csizes) where cum_csizes[k] is the
    compressed offset of block k (one entry past the last block), so the
    virtual offset of uncompressed position u within the stream is
    `cum_csizes[u // 65280] << 16 | u % 65280`."""
    blocks = [compress_one_block(blob[i:i + MAX_BLOCK_UNCOMPRESSED], level)
              for i in range(0, len(blob), MAX_BLOCK_UNCOMPRESSED)]
    sizes = [0] * (len(blocks) + 1)
    total = 0
    for i, block in enumerate(blocks):
        total += len(block)
        sizes[i + 1] = total
    return b"".join(blocks), sizes


class BgzfWriter:
    def __init__(self, fileobj, level: int = 6):
        self._file = fileobj
        self._buffer = bytearray()
        self._coffset = 0  # compressed bytes written so far
        self._level = level

    def tell_virtual(self) -> int:
        """Virtual offset of the next byte to be written."""
        return (self._coffset << 16) | len(self._buffer)

    def write(self, data: bytes) -> None:
        self._buffer.extend(data)
        while len(self._buffer) >= MAX_BLOCK_UNCOMPRESSED:
            self._flush_block(MAX_BLOCK_UNCOMPRESSED)

    def _flush_block(self, n: int) -> None:
        chunk = bytes(self._buffer[:n])
        del self._buffer[:n]
        block = compress_one_block(chunk, self._level)
        self._file.write(block)
        self._coffset += len(block)

    def flush(self) -> None:
        while self._buffer:
            self._flush_block(min(len(self._buffer), MAX_BLOCK_UNCOMPRESSED))

    def append_block_stream(self, data: bytes) -> int:
        """Append pre-compressed whole BGZF blocks verbatim (flushing any
        partial block first).  Returns the base to add to stream-local
        virtual offsets: local (coffset << 16 | intra) + base == the global
        virtual offset, since intra-block offsets are unchanged."""
        self.flush()
        base = self._coffset << 16
        self._file.write(data)
        self._coffset += len(data)
        return base

    def close(self, write_eof: bool = True) -> None:
        self.flush()
        if write_eof:
            self._file.write(EOF_BLOCK)
            self._coffset += len(EOF_BLOCK)
