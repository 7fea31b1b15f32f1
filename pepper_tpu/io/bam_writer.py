"""Minimal BAM + BAI writer (pure Python) — generates aligned-read files for
tests and tools without any external dependency.

Record fields follow the SAM spec v1.6 BAM encoding; the BAI uses the UCSC
binning scheme with a 16kb linear index, compatible with both this package's
native reader and htslib.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .bgzf_writer import BgzfWriter

_NT16 = {"=": 0, "A": 1, "C": 2, "M": 3, "G": 4, "R": 5, "S": 6, "V": 7,
         "T": 8, "W": 9, "Y": 10, "H": 11, "K": 12, "D": 13, "B": 14,
         "N": 15}
_NT16_TABLE = np.full(256, 15, np.uint8)
for _base, _code in _NT16.items():
    _NT16_TABLE[ord(_base)] = _code
    _NT16_TABLE[ord(_base.lower())] = _code
_OP_CODE = {"M": 0, "I": 1, "D": 2, "N": 3, "S": 4, "H": 5, "P": 6, "=": 7,
            "X": 8}
_CONSUMES_REF = {0, 2, 3, 7, 8}


def parse_cigar(cigar: str) -> list[tuple[int, int]]:
    ops = []
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            ops.append((_OP_CODE[ch], int(num)))
            num = ""
    return ops


def reference_span(cigar_ops) -> int:
    return sum(length for op, length in cigar_ops if op in _CONSUMES_REF)


def reg2bin(beg: int, end: int, min_shift: int = 14,
            depth: int = 5) -> int:
    """Smallest bin containing [beg, end); parameterized like CSI
    (min_shift=14, depth=5 is the classic BAI scheme)."""
    end -= 1
    shift = min_shift
    offset = ((1 << (3 * depth)) - 1) // 7
    for level in range(depth, 0, -1):
        if beg >> shift == end >> shift:
            return offset + (beg >> shift)
        shift += 3
        offset -= 1 << (3 * (level - 1))
    return 0


@dataclass
class BamRecord:
    name: str
    ref_id: int
    pos: int                 # 0-based
    mapq: int
    cigar: str               # e.g. "10M2I5M"
    seq: str
    qual: list[int] | None = None   # phred values
    flag: int = 0
    hp: int | None = None
    tags: dict = field(default_factory=dict)
    # Emit the long-CIGAR form (placeholder <l_seq>S<span>N inline + real ops
    # in a CG:B,I aux tag, SAM spec §4.2.2) even when the op count fits the
    # 16-bit n_cigar field. Records with >65,535 ops switch automatically.
    force_cg: bool = False

    def encode(self) -> bytes:
        cigar_ops = parse_cigar(self.cigar) if self.cigar else []
        span = max(1, reference_span(cigar_ops))
        name_bytes = self.name.encode() + b"\0"
        l_seq = len(self.seq)
        codes = _NT16_TABLE[
            np.frombuffer(self.seq.encode("latin-1"), np.uint8)]
        if l_seq % 2:
            codes = np.append(codes, np.uint8(0))
        seq_bytes = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8) \
            .tobytes()
        qual = self.qual if self.qual is not None else [255] * l_seq
        aux = b""
        if self.hp is not None:
            aux += b"HP" + b"i" + struct.pack("<i", self.hp)
        inline_ops = cigar_ops
        if cigar_ops and (self.force_cg or len(cigar_ops) > 0xFFFF):
            inline_ops = [(_OP_CODE["S"], l_seq),
                          (_OP_CODE["N"], reference_span(cigar_ops))]
            packed = ((np.asarray([ln for _, ln in cigar_ops], np.uint32)
                       << 4)
                      | np.asarray([op for op, _ in cigar_ops], np.uint32))
            aux += (b"CGBI" + struct.pack("<I", len(cigar_ops))
                    + packed.astype("<u4").tobytes())
        body = struct.pack(
            "<iiBBHHHIiii",
            self.ref_id, self.pos, len(name_bytes), self.mapq,
            reg2bin(self.pos, self.pos + span), len(inline_ops), self.flag,
            l_seq, -1, -1, 0)
        body += name_bytes
        for op, length in inline_ops:
            body += struct.pack("<I", (length << 4) | op)
        body += bytes(seq_bytes)
        body += bytes(qual)
        body += aux
        return struct.pack("<I", len(body)) + body


def write_bam(path: str, references: list[tuple[str, int]],
              records: list[BamRecord], write_index: bool = True,
              index: str = "bai", min_shift: int = 14,
              depth: int = 5) -> None:
    """Write a coordinate-sorted BAM and its index (.bai, or .csi with
    index="csi" and optional custom min_shift/depth — the htslib CSI
    scheme for contigs beyond 2^29 bp).

    `records` must already be sorted by (ref_id, pos)."""
    n_ref = len(references)
    record_voffsets = []  # (ref_id, beg, end, voff_start, voff_end)

    with open(path, "wb") as raw:
        writer = BgzfWriter(raw)
        sam_header = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
            f"@SQ\tSN:{name}\tLN:{length}\n" for name, length in references)
        text = sam_header.encode()
        writer.write(b"BAM\1" + struct.pack("<I", len(text)) + text)
        writer.write(struct.pack("<i", n_ref))
        for name, length in references:
            name_bytes = name.encode() + b"\0"
            writer.write(struct.pack("<I", len(name_bytes)) + name_bytes +
                         struct.pack("<I", length))
        # flush so record voffsets are stable across block boundaries
        for record in records:
            voff_start = writer.tell_virtual()
            writer.write(record.encode())
            voff_end = writer.tell_virtual()
            span = max(1, reference_span(parse_cigar(record.cigar))
                       if record.cigar else 1)
            record_voffsets.append((record.ref_id, record.pos,
                                    record.pos + span, voff_start, voff_end))
        writer.close()

    if write_index:
        if index == "csi":
            _write_csi(path + ".csi", n_ref, record_voffsets, min_shift,
                       depth)
        else:
            _write_bai(path + ".bai", n_ref, record_voffsets)


def _write_bai(path: str, n_ref: int, entries) -> None:
    bins_per_ref = [{} for _ in range(n_ref)]
    linear_per_ref = [{} for _ in range(n_ref)]
    for ref_id, beg, end, voff_start, voff_end in entries:
        if ref_id < 0:
            continue
        b = reg2bin(beg, end)
        chunks = bins_per_ref[ref_id].setdefault(b, [])
        if chunks and chunks[-1][1] == voff_start:
            chunks[-1] = (chunks[-1][0], voff_end)
        else:
            chunks.append((voff_start, voff_end))
        linear = linear_per_ref[ref_id]
        for window in range(beg >> 14, ((end - 1) >> 14) + 1):
            if window not in linear or voff_start < linear[window]:
                linear[window] = voff_start
    with open(path, "wb") as f:
        f.write(b"BAI\1" + struct.pack("<i", n_ref))
        for ref_id in range(n_ref):
            bins = bins_per_ref[ref_id]
            f.write(struct.pack("<i", len(bins)))
            for bin_id in sorted(bins):
                chunks = bins[bin_id]
                f.write(struct.pack("<Ii", bin_id, len(chunks)))
                for beg_voff, end_voff in chunks:
                    f.write(struct.pack("<QQ", beg_voff, end_voff))
            linear = linear_per_ref[ref_id]
            n_intv = (max(linear) + 1) if linear else 0
            f.write(struct.pack("<i", n_intv))
            fill = 0
            for window in range(n_intv):
                if window in linear:
                    fill = linear[window]
                f.write(struct.pack("<Q", fill))


def _write_csi(path: str, n_ref: int, entries, min_shift: int = 14,
               depth: int = 5) -> None:
    """CSI index (hts-specs CSIv1): the BAI scheme with parameterized
    (min_shift, depth), BGZF-compressed, per-bin loffset instead of a
    separate linear index."""
    from .bgzf_writer import BgzfWriter

    bins_per_ref = [{} for _ in range(n_ref)]
    for ref_id, beg, end, voff_start, voff_end in entries:
        if ref_id < 0:
            continue
        b = reg2bin(beg, end, min_shift, depth)
        chunks = bins_per_ref[ref_id].setdefault(b, [])
        if chunks and chunks[-1][1] == voff_start:
            chunks[-1] = (chunks[-1][0], voff_end)
        else:
            chunks.append((voff_start, voff_end))
    with open(path, "wb") as raw:
        writer = BgzfWriter(raw)
        writer.write(b"CSI\1" + struct.pack("<iii", min_shift, depth, 0))
        writer.write(struct.pack("<i", n_ref))
        for ref_id in range(n_ref):
            bins = bins_per_ref[ref_id]
            writer.write(struct.pack("<i", len(bins)))
            for bin_id in sorted(bins):
                chunks = bins[bin_id]
                loffset = min(c[0] for c in chunks)
                writer.write(struct.pack("<IQi", bin_id, loffset,
                                         len(chunks)))
                for beg_voff, end_voff in chunks:
                    writer.write(struct.pack("<QQ", beg_voff, end_voff))
        writer.close()


def write_fasta(path: str, sequences: dict[str, str],
                line_width: int = 60) -> None:
    """Write a FASTA file and its .fai index."""
    fai_lines = []
    with open(path, "wb") as f:
        offset = 0
        for name, seq in sequences.items():
            header = f">{name}\n".encode()
            f.write(header)
            offset += len(header)
            fai_lines.append(
                f"{name}\t{len(seq)}\t{offset}\t{line_width}\t{line_width + 1}")
            for i in range(0, len(seq), line_width):
                line = seq[i:i + line_width].encode() + b"\n"
                f.write(line)
                offset += len(line)
    with open(path + ".fai", "w") as f:
        f.write("\n".join(fai_lines) + "\n")
