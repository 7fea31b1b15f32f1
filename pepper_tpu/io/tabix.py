"""Tabix (.tbi) index writer for bgzipped VCFs — htslib-free.

Same UCSC binning + 16kb linear index as BAI; header per the tabix spec
(preset format=2 for VCF).

`add` is on the VCF-emission hot path, so it only appends to flat per-ref
lists; binning, chunk merging and the linear index are built vectorized in
`write` (records arrive in increasing virtual-offset order, which makes the
adjacent-chunk merge a stable-sort + boundary scan).
"""

from __future__ import annotations

import struct

import numpy as np

from .bam_writer import reg2bin

__all__ = ["TabixIndexBuilder", "reg2bin"]


def _reg2bin_vec(beg: np.ndarray, end: np.ndarray) -> np.ndarray:
    """Vectorized reg2bin (bam_writer.reg2bin semantics)."""
    end = end - 1
    bins = np.zeros(len(beg), np.int64)
    done = np.zeros(len(beg), bool)
    for shift, offset in ((14, (1 << 15) - 1), (17, (1 << 12) - 1),
                          (20, (1 << 9) - 1), (23, (1 << 6) - 1),
                          (26, (1 << 3) - 1)):
        hit = ~done & ((beg >> shift) == (end >> shift))
        bins[hit] = offset // 7 + (beg[hit] >> shift)
        done |= hit
    return bins


class TabixIndexBuilder:
    def __init__(self):
        self._names: list[str] = []
        self._name_ids: dict[str, int] = {}
        # per ref: [begs, ends, voff_starts, voff_ends] flat lists
        self._refs: list[list[list[int]]] = []

    def add(self, contig: str, beg: int, end: int, voff_start: int,
            voff_end: int) -> None:
        """Register a record spanning [beg, end) 0-based at the given BGZF
        virtual offsets.  Records must arrive in file-write order
        (increasing virtual offset), which VCF emission guarantees."""
        ref = self._name_ids.get(contig)
        if ref is None:
            ref = self._name_ids[contig] = len(self._names)
            self._names.append(contig)
            self._refs.append([[], [], [], []])
        begs, ends, starts, stops = self._refs[ref]
        begs.append(beg)
        ends.append(end)
        starts.append(voff_start)
        stops.append(voff_end)

    def _build_ref(self, ref: int):
        """-> (sorted {bin: [(voff_beg, voff_end), ...]}, linear_fill list)."""
        begs, ends, starts, stops = (np.asarray(c, np.int64)
                                     for c in self._refs[ref])
        n = len(begs)
        bins = _reg2bin_vec(begs, ends)

        # group records by bin, preserving arrival order within each bin;
        # merge chunks that are contiguous in virtual-offset space (equal to
        # the incremental chunks[-1][1] == voff_start merge: records between
        # two same-bin records always break voff contiguity)
        order = np.argsort(bins, kind="stable")
        b_sorted = bins[order]
        s_sorted = starts[order]
        e_sorted = stops[order]
        new_chunk = np.ones(n, bool)
        if n > 1:
            new_chunk[1:] = ((b_sorted[1:] != b_sorted[:-1])
                             | (s_sorted[1:] != e_sorted[:-1]))
        chunk_idx = np.flatnonzero(new_chunk)
        chunk_beg = s_sorted[chunk_idx]
        chunk_end = e_sorted[np.append(chunk_idx[1:] - 1, n - 1)] \
            if n else np.zeros(0, np.int64)
        chunk_bin = b_sorted[chunk_idx]
        bin_table = {}
        bin_starts = np.flatnonzero(
            np.concatenate([[True], chunk_bin[1:] != chunk_bin[:-1]])) \
            if len(chunk_bin) else np.zeros(0, np.int64)
        bin_bounds = np.append(bin_starts, len(chunk_bin))
        for i, start in enumerate(bin_starts):
            stop = bin_bounds[i + 1]
            bin_table[int(chunk_bin[start])] = list(
                zip(chunk_beg[start:stop].tolist(),
                    chunk_end[start:stop].tolist()))

        # linear index: min voff_start per overlapped 16kb window, then
        # forward-fill (missing windows inherit the previous value, 0 before
        # the first)
        if n == 0:
            return bin_table, []
        w0 = begs >> 14
        w1 = (np.maximum(begs + 1, ends) - 1) >> 14
        n_intv = int(w1.max()) + 1
        sentinel = np.iinfo(np.int64).max
        linear = np.full(n_intv, sentinel, np.int64)
        np.minimum.at(linear, w0, starts)
        spans = np.flatnonzero(w1 > w0)
        for i in spans.tolist():  # multi-window records are rare in VCF
            lo, hi = int(w0[i]) + 1, int(w1[i]) + 1
            np.minimum.at(linear, np.arange(lo, hi), starts[i])
        missing = linear == sentinel
        if missing.any():
            values = np.where(missing, 0, linear)
            idx = np.where(missing, 0, np.arange(n_intv))
            np.maximum.accumulate(idx, out=idx)
            linear = values[idx]
        return bin_table, linear.tolist()

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
                bins, linear = self._build_ref(ref)
                writer.write(struct.pack("<i", len(bins)))
                for bin_id in sorted(bins):
                    chunks = bins[bin_id]
                    writer.write(struct.pack("<Ii", bin_id, len(chunks)))
                    for beg_voff, end_voff in chunks:
                        writer.write(struct.pack("<QQ", beg_voff, end_voff))
                writer.write(struct.pack("<i", len(linear)))
                writer.write(struct.pack(f"<{len(linear)}Q", *linear))
            writer.close()
