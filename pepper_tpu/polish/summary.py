"""Polish-mode pileup summary: 10-channel normalized base-frequency images.

Semantics-exact to the reference's SummaryGenerator
(pepper/modules/src/pileup_summary/summary_generator.cpp):

* feature index (summary_generator.cpp:16-32): reverse strand A/C/G/T ->
  0..3, forward strand -> 4..7; '*'/other: reverse -> 8, forward -> 9.
* pixel = count / max(1, coverage[pos]) * 254, uint8 truncation
  (generate_image, :274-306).  NOTE coverage of insert columns divides by
  the anchor position's coverage.
* coverage counts match bases AND (quirk) deletions add coverage at the
  DELETION ANCHOR position for every deleted base (:107-110 adds to
  coverage[ref_position] inside the per-i loop, not ref_position+i).
* labels: 0 for */# (deleted), 1..4 ACGT (get_labels, :35-44); truth from a
  realigned truth read; insert labels padded with '#'
  (generate_labels, :142-216).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from ..io.bam import (
    OP_DEL, OP_DIFF, OP_EQUAL, OP_INS, OP_MATCH, OP_PAD,
    OP_REF_SKIP, OP_SOFT_CLIP, ReadBatch,
)
from ..options import PolishImageOptions

MAX_COLOR = 254.0


def get_feature_index(base: str, is_reverse: bool) -> int:
    base = base.upper()
    table = {"A": 0, "C": 1, "G": 2, "T": 3}
    if is_reverse:
        return table.get(base, 8)
    return table.get(base, 9) + (4 if base in table else 0)


def get_label(base: str) -> int:
    return {"A": 1, "C": 2, "G": 3, "T": 4}.get(base.upper(), 0)


# byte -> feature column LUTs (get_feature_index vectorized; lowercase
# folded like the scalar .upper())
_FWD_LUT = np.full(256, 9, np.int64)
_REV_LUT = np.full(256, 8, np.int64)
for _i, _b in enumerate("ACGT"):
    for _c in (_b, _b.lower()):
        _FWD_LUT[ord(_c)] = 4 + _i
        _REV_LUT[ord(_c)] = _i


_native_walk_fn = None


def _native_summary_walk(summary, batch: ReadBatch) -> bool:
    """Run the C summary walk (pileup.cpp polish_summary_walk) into the
    summary's dense/insert accumulators.  Returns False if the native
    library is unavailable (caller falls back to the Python loop)."""
    global _native_walk_fn
    if _native_walk_fn is None:
        try:
            import ctypes

            from ..io.native import get_lib

            lib = get_lib()
            fn = lib.pepper_polish_summary
            c = ctypes
            fn.restype = c.c_longlong
            fn.argtypes = [
                c.POINTER(c.c_longlong), c.POINTER(c.c_longlong),
                c.POINTER(c.c_ubyte), c.POINTER(c.c_longlong),
                c.POINTER(c.c_ubyte), c.POINTER(c.c_int),
                c.POINTER(c.c_int), c.POINTER(c.c_int), c.c_longlong,
                c.c_longlong, c.c_longlong, c.POINTER(c.c_double),
                c.POINTER(c.c_double), c.POINTER(c.c_int), c.c_longlong]
            _native_walk_fn = fn
        except (OSError, AttributeError):
            _native_walk_fn = False
    if _native_walk_fn is False:
        return False
    summary._ensure_dense()

    import ctypes

    def ptr(array, ctype):
        return array.ctypes.data_as(ctypes.POINTER(ctype))

    c = ctypes
    pos = np.ascontiguousarray(batch.pos, np.int64)
    seq_offsets = np.ascontiguousarray(batch.seq_offsets, np.int64)
    seq = np.ascontiguousarray(batch.seq, np.uint8)
    cigar_offsets = np.ascontiguousarray(batch.cigar_offsets, np.int64)
    cigar_ops = np.ascontiguousarray(batch.cigar_ops, np.uint8)
    cigar_lens = np.ascontiguousarray(batch.cigar_lens, np.int32)
    mapq = np.ascontiguousarray(batch.mapq, np.int32)
    flag = np.ascontiguousarray(batch.flag, np.int32)
    # one event per inserted base, 3 int32 each — seq length bounds it
    cap = int(len(seq)) + 16
    events = np.empty(3 * cap, np.int32)
    n_events = _native_walk_fn(
        ptr(pos, c.c_longlong), ptr(seq_offsets, c.c_longlong),
        ptr(seq, c.c_ubyte), ptr(cigar_offsets, c.c_longlong),
        ptr(cigar_ops, c.c_ubyte), ptr(cigar_lens, c.c_int),
        ptr(mapq, c.c_int), ptr(flag, c.c_int), len(pos),
        summary.ref_start, summary.ref_end,
        ptr(summary._base_dense, c.c_double),
        ptr(summary._cov_dense, c.c_double), ptr(events, c.c_int), cap)
    if n_events < 0:
        # the C walk has already mutated base_dense/cov_dense in place, so
        # falling back to the Python engine here would double-count; the
        # seq-length cap makes this unreachable (<=1 event per inserted
        # base), so an overflow means a logic bug — fail loudly
        raise RuntimeError(
            "polish_summary_walk event capacity exceeded "
            f"(cap={cap}); native/python accumulators out of sync")
    if n_events:
        triples = events[:3 * n_events].reshape(-1, 3)
        uniq, counts = np.unique(triples, axis=0, return_counts=True)
        for (anchor_off, i, feature), count in zip(uniq.tolist(),
                                                   counts.tolist()):
            anchor = summary.ref_start + anchor_off
            summary.insert_summaries[((anchor, i), feature)] += float(count)
            if i + 1 > summary.longest_insert_count[anchor]:
                summary.longest_insert_count[anchor] = i + 1
    return True


@dataclass
class PolishSummary:
    """Accumulates base/insert summaries for one region, then renders the
    (expanded_length, 10) uint8 image."""

    reference_sequence: str
    chromosome_name: str
    ref_start: int
    ref_end: int

    # dense accumulators (vectorized read walk); inserts stay keyed — they
    # are rare and the expanded layout depends on longest_insert_count
    insert_summaries: dict = field(default_factory=lambda: defaultdict(float))
    longest_insert_count: dict = field(
        default_factory=lambda: defaultdict(int))
    base_labels: dict = field(default_factory=dict)
    insert_labels: dict = field(default_factory=dict)

    image: list = field(default_factory=list)
    labels: list = field(default_factory=list)
    genomic_pos: list = field(default_factory=list)
    bad_label_positions: list = field(default_factory=list)

    def _ensure_dense(self) -> None:
        if getattr(self, "_base_dense", None) is None:
            n_ref = self.ref_end - self.ref_start + 1
            self._base_dense = np.zeros((n_ref, 10), np.float64)
            self._cov_dense = np.zeros(n_ref, np.float64)

    class _CoverageView:
        """dict-like position -> coverage view over the dense array (the
        old defaultdict interface, kept for subclasses/tests)."""

        def __init__(self, summary):
            self._summary = summary

        def __getitem__(self, pos):
            summary = self._summary
            summary._ensure_dense()
            offset = pos - summary.ref_start
            if 0 <= offset < len(summary._cov_dense):
                return float(summary._cov_dense[offset])
            return 0.0

    @property
    def coverage(self):
        return PolishSummary._CoverageView(self)

    def _iterate_over_read(self, batch: ReadBatch, r: int,
                           region_end: int) -> None:
        """Vectorized walk: whole in-region match/delete spans accumulate
        with one fancy-index add each (positions within an op are unique,
        so plain += is exact); inserts stay scalar.  Semantics match the
        old per-base loop incl. the deletion-coverage-at-anchor quirk and
        out-of-region anchors being dropped."""
        self._ensure_dense()
        seq_start = int(batch.seq_offsets[r])
        seq = batch.seq
        is_reverse = bool(batch.is_reverse[r])
        lut = _REV_LUT if is_reverse else _FWD_LUT
        star_feature = 8 if is_reverse else 9
        base_dense = self._base_dense
        cov_dense = self._cov_dense
        region_start, region_stop = self.ref_start, self.ref_end
        read_index = seq_start
        ref_position = int(batch.pos[r])
        for op, length in batch.read_cigar(r):
            if ref_position > region_end:
                break
            if op in (OP_MATCH, OP_EQUAL, OP_DIFF):
                start_i = 0
                if ref_position < region_start:
                    start_i = min(region_start - ref_position, length)
                    read_index += start_i
                    ref_position += start_i
                span = min(length - start_i,
                           region_stop - ref_position + 1)
                if span > 0:
                    row0 = ref_position - region_start
                    rows = np.arange(row0, row0 + span)
                    features = lut[seq[read_index:read_index + span]]
                    base_dense[rows, features] += 1.0
                    cov_dense[row0:row0 + span] += 1.0
                read_index += length - start_i
                ref_position += length - start_i
            elif op == OP_INS:
                anchor = ref_position - 1
                if region_start <= anchor <= region_stop:
                    alt = seq[read_index:read_index + length].tobytes() \
                        .decode()
                    for i, base in enumerate(alt):
                        self.insert_summaries[
                            ((anchor, i),
                             get_feature_index(base, is_reverse))] += 1.0
                    self.longest_insert_count[anchor] = max(
                        self.longest_insert_count[anchor], len(alt))
                read_index += length
            elif op in (OP_REF_SKIP, OP_PAD, OP_DEL):
                lo = max(ref_position, region_start)
                hi = min(ref_position + length - 1, region_stop)
                if hi >= lo:
                    base_dense[lo - region_start:hi - region_start + 1,
                               star_feature] += 1.0
                    # reference quirk: coverage goes to the anchor, once
                    # per in-region deleted base (out-of-region anchors
                    # were booked to keys the render never reads)
                    if region_start <= ref_position <= region_stop:
                        cov_dense[ref_position - region_start] += \
                            float(hi - lo + 1)
                ref_position += length
            elif op == OP_SOFT_CLIP:
                read_index += length
            # hard clip: nothing

    def _generate_labels(self, batch: ReadBatch, r: int,
                         region_end: int) -> None:
        """Project the realigned truth read onto labels
        (generate_labels, summary_generator.cpp:142-216)."""
        seq_start = int(batch.seq_offsets[r])
        seq = batch.seq[seq_start:int(batch.seq_offsets[r + 1])]
        read_index = 0
        ref_position = int(batch.pos[r])
        for op, length in batch.read_cigar(r):
            if ref_position > region_end:
                break
            if op in (OP_MATCH, OP_EQUAL, OP_DIFF):
                start_i = 0
                if ref_position < self.ref_start:
                    start_i = min(self.ref_start - ref_position, length)
                    read_index += start_i
                    ref_position += start_i
                for _ in range(start_i, length):
                    if self.ref_start <= ref_position <= self.ref_end:
                        self.base_labels[ref_position] = chr(seq[read_index])
                    read_index += 1
                    ref_position += 1
            elif op == OP_INS:
                anchor = ref_position - 1
                if self.ref_start <= anchor <= self.ref_end:
                    alt = seq[read_index:read_index + length].tobytes() \
                        .decode()
                    for i in range(self.longest_insert_count.get(anchor, 0)):
                        base = alt[i] if i < len(alt) else "#"
                        self.insert_labels[(anchor, i)] = base
                read_index += length
            elif op in (OP_REF_SKIP, OP_PAD, OP_DEL):
                if self.ref_start <= ref_position <= self.ref_end:
                    for i in range(length):
                        if (self.ref_start <= ref_position + i
                                <= self.ref_end):
                            self.base_labels[ref_position + i] = "*"
                ref_position += length
            elif op == OP_SOFT_CLIP:
                read_index += length

    @staticmethod
    def _pixel(value: float) -> int:
        # The reference assigns the double straight into uint8_t
        # (generate_image, :282); deleted columns can exceed 255 because
        # deletion coverage is booked at the anchor — the compiled C++
        # truncates to int and keeps the low byte, replicated here.
        return int(value) & 0xFF

    def _generate_image(self) -> None:
        self._ensure_dense()
        denom = np.maximum(1.0, self._cov_dense)
        pixels = (self._base_dense / denom[:, None]) * MAX_COLOR
        pixels = (pixels.astype(np.int64) & 0xFF).astype(np.uint8)
        if not self.longest_insert_count:
            self.image.extend(pixels)
            return
        for offset, pos in enumerate(range(self.ref_start,
                                           self.ref_end + 1)):
            self.image.append(pixels[offset])
            position_denom = denom[offset]
            for ii in range(self.longest_insert_count.get(pos, 0)):
                self.image.append([
                    self._pixel(self.insert_summaries[((pos, ii), j)]
                                / position_denom * MAX_COLOR)
                    for j in range(10)
                ])

    def _accumulate_batch(self, batch: ReadBatch) -> None:
        """All mapq>0 reads into the dense/insert accumulators — native C
        walk (io/_native/pileup.cpp polish_summary_walk, default) or the
        Python golden loop (PEPPER_PY_POLISH_SUMMARY=1); fuzz-equal
        (tests/test_polish.py)."""
        import os

        self._ensure_dense()
        if (os.environ.get("PEPPER_PY_POLISH_SUMMARY") == "1"
                or not _native_summary_walk(self, batch)):
            for r in range(batch.n_reads):
                if batch.mapq[r] > 0:
                    self._iterate_over_read(batch, r, self.ref_end)

    def generate_summary(self, batch: ReadBatch) -> None:
        """Inference-mode summary (generate_summary, :361-387)."""
        self._accumulate_batch(batch)
        for pos in range(self.ref_start, self.ref_end + 1):
            self.genomic_pos.append((pos, 0))
            for ii in range(self.longest_insert_count.get(pos, 0)):
                self.genomic_pos.append((pos, ii + 1))
        self._generate_image()

    def generate_train_summary(self, batch: ReadBatch,
                               truth_batch: ReadBatch,
                               truth_index: int) -> None:
        """Train-mode summary with labels from one realigned truth read
        (generate_train_summary, :293-358)."""
        self._accumulate_batch(batch)
        self._generate_labels(truth_batch, truth_index, self.ref_end + 1)

        def valid_label(base: str) -> bool:
            return base.upper() in "ACGT*#"

        for pos in range(self.ref_start, self.ref_end + 1):
            base = self.base_labels.get(pos, "\0")
            if self._cov_dense[pos - self.ref_start] > 0:
                self.labels.append(get_label(base))
            else:
                self.labels.append(get_label("*"))
            if not valid_label(base):
                self.bad_label_positions.append(len(self.labels))
            self.genomic_pos.append((pos, 0))
            for ii in range(self.longest_insert_count.get(pos, 0)):
                self.genomic_pos.append((pos, ii + 1))
                if (pos, ii) in self.insert_labels:
                    insert_base = self.insert_labels[(pos, ii)]
                    self.labels.append(get_label(insert_base))
                    if not valid_label(insert_base):
                        self.bad_label_positions.append(len(self.labels))
                else:
                    self.labels.append(get_label("#"))
        self.bad_label_positions.append(len(self.labels))
        self._generate_image()


def chunk_images(summary: PolishSummary, chunk_size: int = 1000,
                 chunk_overlap: int = 50):
    """Inference chunking (pepper AlignmentSummarizer.py:18-56): 1000-col
    chunks sliding by chunk_size - overlap, zero-padded at the tail."""
    height = PolishImageOptions.IMAGE_HEIGHT
    chunk_start = 0
    chunk_id = 0
    n = len(summary.genomic_pos)
    chunk_end = min(n, chunk_size)
    images, labels, positions, chunk_ids = [], [], [], []
    while True:
        image_chunk = list(summary.image[chunk_start:chunk_end])
        pos_chunk = list(summary.genomic_pos[chunk_start:chunk_end])
        label_chunk = [0] * (chunk_end - chunk_start)
        padding = chunk_size - len(image_chunk)
        if padding > 0:
            label_chunk += [0] * padding
            pos_chunk += [(-1, -1)] * padding
            image_chunk += [[0] * height] * padding
        images.append(np.asarray(image_chunk, np.uint8))
        labels.append(np.asarray(label_chunk, np.uint8))
        positions.append(np.asarray(pos_chunk, np.int64))
        chunk_ids.append(chunk_id)
        chunk_id += 1
        if chunk_end == n:
            break
        chunk_start = chunk_end - chunk_overlap
        chunk_end = min(n, chunk_start + chunk_size)
    return images, labels, positions, chunk_ids


def chunk_images_train(summary: PolishSummary, chunk_size: int = 1000,
                       chunk_overlap: int = 50):
    """Train chunking honoring bad-label segment boundaries
    (AlignmentSummarizer.py:58-103)."""
    images, labels, positions, chunk_ids = [], [], [], []
    bad_indices = summary.bad_label_positions
    chunk_start = 0
    chunk_id = 0
    for i in range(len(bad_indices)):
        chunk_end = min(chunk_start + chunk_size, bad_indices[i])
        while True:
            if chunk_end - chunk_start != chunk_size:
                padding_required = chunk_size - (chunk_end - chunk_start)
                chunk_start -= padding_required
                if chunk_start < 0:
                    break
                if i > 0 and chunk_start < bad_indices[i - 1]:
                    break
            images.append(np.asarray(
                summary.image[chunk_start:chunk_end], np.uint8))
            positions.append(np.asarray(
                summary.genomic_pos[chunk_start:chunk_end], np.int64))
            labels.append(np.asarray(
                summary.labels[chunk_start:chunk_end], np.uint8))
            chunk_ids.append(chunk_id)
            chunk_id += 1
            if chunk_end == bad_indices[i]:
                break
            chunk_start = chunk_end - chunk_overlap
            chunk_end = min(bad_indices[i], chunk_start + chunk_size)
        chunk_start = chunk_end + 1
    return images, labels, positions, chunk_ids
