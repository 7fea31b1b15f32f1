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


class BgzfWriter:
    def __init__(self, fileobj):
        self._file = fileobj
        self._buffer = bytearray()
        self._coffset = 0  # compressed bytes written so far

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
        compressor = zlib.compressobj(6, zlib.DEFLATED, -15)
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
        self._file.write(header + cdata + trailer)
        self._coffset += bsize

    def flush(self) -> None:
        while self._buffer:
            self._flush_block(min(len(self._buffer), MAX_BLOCK_UNCOMPRESSED))

    def close(self, write_eof: bool = True) -> None:
        self.flush()
        if write_eof:
            self._file.write(EOF_BLOCK)
            self._coffset += len(EOF_BLOCK)
