"""Tabix (.tbi) index writer for bgzipped VCFs — htslib-free.

Same UCSC binning + 16kb linear index as BAI; header per the tabix spec
(preset format=2 for VCF)."""

from __future__ import annotations

import struct

from .bam_writer import reg2bin


class TabixIndexBuilder:
    def __init__(self):
        self._names: list[str] = []
        self._bins: list[dict] = []
        self._linear: list[dict] = []

    def _ref_id(self, name: str) -> int:
        try:
            return self._names.index(name)
        except ValueError:
            self._names.append(name)
            self._bins.append({})
            self._linear.append({})
            return len(self._names) - 1

    def add(self, contig: str, beg: int, end: int, voff_start: int,
            voff_end: int) -> None:
        """Register a record spanning [beg, end) 0-based at the given BGZF
        virtual offsets."""
        ref = self._ref_id(contig)
        b = reg2bin(beg, end)
        chunks = self._bins[ref].setdefault(b, [])
        if chunks and chunks[-1][1] == voff_start:
            chunks[-1] = (chunks[-1][0], voff_end)
        else:
            chunks.append((voff_start, voff_end))
        linear = self._linear[ref]
        for window in range(beg >> 14, ((max(beg + 1, end) - 1) >> 14) + 1):
            if window not in linear or voff_start < linear[window]:
                linear[window] = voff_start

    def write(self, path: str) -> None:
        from .bgzf_writer import BgzfWriter

        names_blob = b"".join(name.encode() + b"\0" for name in self._names)
        with open(path, "wb") as raw:
            writer = BgzfWriter(raw)
            writer.write(b"TBI\1")
            writer.write(struct.pack("<iiiiiiii", len(self._names), 2, 1, 2,
                                     0, ord("#"), 0, len(names_blob)))
            writer.write(names_blob)
            for ref in range(len(self._names)):
                bins = self._bins[ref]
                writer.write(struct.pack("<i", len(bins)))
                for bin_id in sorted(bins):
                    chunks = bins[bin_id]
                    writer.write(struct.pack("<Ii", bin_id, len(chunks)))
                    for beg_voff, end_voff in chunks:
                        writer.write(struct.pack("<QQ", beg_voff, end_voff))
                linear = self._linear[ref]
                n_intv = (max(linear) + 1) if linear else 0
                writer.write(struct.pack("<i", n_intv))
                fill = 0
                for window in range(n_intv):
                    if window in linear:
                        fill = linear[window]
                    writer.write(struct.pack("<Q", fill))
            writer.close()
