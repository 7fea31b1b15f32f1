"""Tabix (.tbi) index writer for bgzipped VCFs — htslib-free.

Same UCSC binning + 16kb linear index as BAI; header per the tabix spec
(preset format=2 for VCF).

`add`/`add_many` are on the VCF-emission hot path, so they only append to
per-ref segment stores (plain lists for scalar adds, numpy arrays for bulk
adds); binning, chunk merging, the linear index and the serialized
bin/chunk stream are all built vectorized in `write` (records arrive in
increasing virtual-offset order, which makes the adjacent-chunk merge a
stable-sort + boundary scan).  Byte-identical to the incremental
reference algorithm (tests/test_tabix_builder.py).
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
        # per ref: list of segments; a segment is a 4-tuple of parallel
        # (begs, ends, voff_starts, voff_ends) — plain lists (scalar adds)
        # or int64 arrays (bulk adds), in arrival order
        self._refs: list[list[tuple]] = []

    def _segments(self, contig: str) -> list:
        ref = self._name_ids.get(contig)
        if ref is None:
            ref = self._name_ids[contig] = len(self._names)
            self._names.append(contig)
            self._refs.append([])
        return self._refs[ref]

    def add(self, contig: str, beg: int, end: int, voff_start: int,
            voff_end: int) -> None:
        """Register a record spanning [beg, end) 0-based at the given BGZF
        virtual offsets.  Records must arrive in file-write order
        (increasing virtual offset), which VCF emission guarantees."""
        segments = self._segments(contig)
        if not segments or not isinstance(segments[-1][0], list):
            segments.append(([], [], [], []))
        begs, ends, starts, stops = segments[-1]
        begs.append(beg)
        ends.append(end)
        starts.append(voff_start)
        stops.append(voff_end)

    def add_many(self, contig: str, begs, ends, voff_starts,
                 voff_ends) -> None:
        """Bulk `add` for one contig run (equal-length sequences, in
        increasing virtual-offset order)."""
        self._segments(contig).append(
            (np.asarray(begs, np.int64), np.asarray(ends, np.int64),
             np.asarray(voff_starts, np.int64),
             np.asarray(voff_ends, np.int64)))

    def _columns(self, ref: int):
        segments = self._refs[ref]
        if not segments:
            zeros = np.zeros(0, np.int64)
            return zeros, zeros, zeros, zeros
        if len(segments) == 1:
            return tuple(np.asarray(c, np.int64) for c in segments[0])
        return tuple(
            np.concatenate([np.asarray(seg[i], np.int64)
                            for seg in segments])
            for i in range(4))

    def _build_ref(self, ref: int):
        """-> (serialized bins+chunks bytes incl. n_bin header,
               linear index int64 array)."""
        begs, ends, starts, stops = self._columns(ref)
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

        # serialize [n_bin] {bin_id, n_chunk, chunks[16B]} in one buffer:
        # chunk pairs are already contiguous per ascending bin, so the
        # stream is the chunk-pair payload with an 8-byte header scattered
        # in at each bin start
        unique_bins, bin_counts = (np.unique(chunk_bin,
                                             return_counts=True)
                                   if len(chunk_bin)
                                   else (np.zeros(0, np.int64),
                                         np.zeros(0, np.int64)))
        n_bins = len(unique_bins)
        n_chunks = len(chunk_beg)
        blob = np.zeros(4 + 8 * n_bins + 16 * n_chunks, np.uint8)
        blob[:4].view("<i4")[0] = n_bins
        cum = np.concatenate([[0], np.cumsum(bin_counts)])
        header_off = 4 + 8 * np.arange(n_bins, dtype=np.int64) \
            + 16 * cum[:-1]
        headers = np.empty((n_bins, 2), "<u4")
        headers[:, 0] = unique_bins
        headers[:, 1] = bin_counts
        header_bytes = headers.view(np.uint8).reshape(n_bins, 8)
        blob[(header_off[:, None]
              + np.arange(8, dtype=np.int64)).ravel()] = \
            header_bytes.ravel()
        pairs = np.empty((n_chunks, 2), "<u8")
        pairs[:, 0] = chunk_beg
        pairs[:, 1] = chunk_end
        chunk_off = (np.repeat(header_off + 8, bin_counts)
                     + 16 * (np.arange(n_chunks, dtype=np.int64)
                             - np.repeat(cum[:-1], bin_counts)))
        blob[(chunk_off[:, None]
              + np.arange(16, dtype=np.int64)).ravel()] = \
            pairs.view(np.uint8).ravel()

        # linear index: min voff_start per overlapped 16kb window, then
        # forward-fill (missing windows inherit the previous value, 0 before
        # the first)
        if n == 0:
            return blob.tobytes(), np.zeros(0, np.int64)
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
        return blob.tobytes(), linear

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
                bins_blob, linear = self._build_ref(ref)
                writer.write(bins_blob)
                writer.write(struct.pack("<i", len(linear)))
                writer.write(linear.astype("<u8").tobytes())
            writer.close()
