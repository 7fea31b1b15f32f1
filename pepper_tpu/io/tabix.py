"""Tabix (.tbi) index writer for bgzipped VCFs — htslib-free.

Same UCSC binning + 16kb linear index as BAI; header per the tabix spec
(preset format=2 for VCF).

`add`/`add_many` fold records into compact per-ref state as they arrive
(bin -> merged chunk list, plus a min-voff linear-index array), so memory
is O(bins + 16kb windows) — flat in the record count, which matters for
WGS-scale streamed merges.  `add_many` stays vectorized per batch: records
arrive in increasing virtual-offset order, so the global stable-sort chunk
merge decomposes into per-batch merges plus a head-merge against each
bin's last chunk.  Byte-identical to the incremental reference algorithm
(tests/test_tabix_builder.py).
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


_SENTINEL = np.iinfo(np.int64).max


class TabixIndexBuilder:
    def __init__(self):
        self._names: list[str] = []
        self._name_ids: dict[str, int] = {}
        # per ref: bin id -> flat [beg0, end0, beg1, end1, ...] chunk list
        # (contiguity-merged on arrival) and a sentinel-filled min-voff
        # linear-index array grown geometrically
        self._bins: list[dict[int, list[int]]] = []
        self._linear: list[np.ndarray] = []
        self._n_intv: list[int] = []

    def _ref(self, contig: str) -> int:
        ref = self._name_ids.get(contig)
        if ref is None:
            ref = self._name_ids[contig] = len(self._names)
            self._names.append(contig)
            self._bins.append({})
            self._linear.append(np.full(64, _SENTINEL, np.int64))
            self._n_intv.append(0)
        return ref

    def _grow_linear(self, ref: int, need: int) -> np.ndarray:
        lin = self._linear[ref]
        if need > len(lin):
            grown = np.full(max(need, 2 * len(lin)), _SENTINEL, np.int64)
            grown[:len(lin)] = lin
            self._linear[ref] = lin = grown
        if need > self._n_intv[ref]:
            self._n_intv[ref] = need
        return lin

    def add(self, contig: str, beg: int, end: int, voff_start: int,
            voff_end: int) -> None:
        """Register a record spanning [beg, end) 0-based at the given BGZF
        virtual offsets.  Records must arrive in file-write order
        (increasing virtual offset), which VCF emission guarantees."""
        ref = self._ref(contig)
        chunks = self._bins[ref].setdefault(reg2bin(beg, end), [])
        if chunks and chunks[-1] == voff_start:
            chunks[-1] = voff_end
        else:
            chunks.append(voff_start)
            chunks.append(voff_end)
        w0 = beg >> 14
        w1 = (max(beg + 1, end) - 1) >> 14
        lin = self._grow_linear(ref, w1 + 1)
        if w1 == w0:
            if voff_start < lin[w0]:
                lin[w0] = voff_start
        else:
            seg = lin[w0:w1 + 1]
            np.minimum(seg, voff_start, out=seg)

    def add_many(self, contig: str, begs, ends, voff_starts,
                 voff_ends) -> None:
        """Bulk `add` for one contig run (equal-length sequences, in
        increasing virtual-offset order): the batch is chunk-merged
        vectorized (stable sort by bin + contiguity boundary scan), then
        folded into the per-bin state with a head merge — equivalent to
        per-record adds because records between two same-bin records
        always break voff contiguity."""
        begs = np.asarray(begs, np.int64)
        ends = np.asarray(ends, np.int64)
        starts = np.asarray(voff_starts, np.int64)
        stops = np.asarray(voff_ends, np.int64)
        n = len(begs)
        if n == 0:
            return
        ref = self._ref(contig)
        bins = _reg2bin_vec(begs, ends)
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
        chunk_end = e_sorted[np.append(chunk_idx[1:] - 1, n - 1)]
        chunk_bin = b_sorted[chunk_idx]

        bins_dict = self._bins[ref]
        bin_starts = np.flatnonzero(
            np.concatenate([[True], chunk_bin[1:] != chunk_bin[:-1]]))
        bounds = np.append(bin_starts, len(chunk_bin))
        for k in range(len(bin_starts)):
            lo, hi = int(bounds[k]), int(bounds[k + 1])
            flat = np.empty(2 * (hi - lo), np.int64)
            flat[0::2] = chunk_beg[lo:hi]
            flat[1::2] = chunk_end[lo:hi]
            pairs = flat.tolist()
            chunks = bins_dict.setdefault(int(chunk_bin[lo]), [])
            if chunks and chunks[-1] == pairs[0]:
                chunks[-1] = pairs[1]
                pairs = pairs[2:]
            chunks.extend(pairs)

        w0 = begs >> 14
        w1 = (np.maximum(begs + 1, ends) - 1) >> 14
        lin = self._grow_linear(ref, int(w1.max()) + 1)
        np.minimum.at(lin, w0, starts)
        for i in np.flatnonzero(w1 > w0).tolist():
            # multi-window records are rare in VCF
            seg = lin[int(w0[i]) + 1:int(w1[i]) + 1]
            np.minimum(seg, starts[i], out=seg)

    def _build_ref(self, ref: int):
        """-> (serialized bins+chunks bytes incl. n_bin header,
               linear index int64 array)."""
        bins_dict = self._bins[ref]
        bin_ids = sorted(bins_dict)
        parts = [struct.pack("<i", len(bin_ids))]
        for bin_id in bin_ids:
            flat = bins_dict[bin_id]
            parts.append(struct.pack("<Ii", bin_id, len(flat) // 2))
            parts.append(np.asarray(flat, "<u8").tobytes())

        n_intv = self._n_intv[ref]
        linear = self._linear[ref][:n_intv].copy()
        # forward-fill (missing windows inherit the previous value, 0
        # before the first)
        missing = linear == _SENTINEL
        if missing.any():
            values = np.where(missing, 0, linear)
            idx = np.where(missing, 0, np.arange(n_intv))
            np.maximum.accumulate(idx, out=idx)
            linear = values[idx]
        return b"".join(parts), linear

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
