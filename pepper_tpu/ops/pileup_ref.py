"""Golden (numpy/python) regional pileup summary encoder.

This is a semantics-exact re-implementation of the reference's
RegionalSummaryGenerator (pepper_variant/modules/cpp/region_summary.cpp) —
including its quirks, which downstream candidate parity depends on:

* GENERATE_INDELS is false in the live path (region_summary.h:50), so the
  expanded (position, insert_index) coordinate system degenerates to one
  column per reference base; the machinery is kept behind a flag.
* The anchor base of an upcoming INS/DEL is counted in the coverage vector
  but NOT in the fwd/rev coverage image rows 4/15 (region_summary.cpp:381-391).
* Insert candidates re-add coverage for reads whose anchor base failed the
  SNP base-quality gate (region_summary.cpp:452-454).
* Deletes have no base-quality gate and decrement the image even when the
  candidate string is over the 61-char SV cap (region_summary.cpp:497-511).
* After accumulation only feature columns [11, 25) are clamped to +-125
  (region_summary.cpp:648-653 with BASE_INDEX_START=11, BASE_INDEX_SIZE=14).
* Candidate depth is clamped to 125 BEFORE the frequency ratio
  (region_summary.cpp:682-689).
* Alleles at one site are emitted in lexicographic candidate-string order
  (std::set iteration, region_summary.cpp:670).

The hot accumulation loop has a native C++ twin (io/_native/pileup.cpp,
the production path) and TPU accumulation kernels (ops/pileup_kernel.py),
both golden-tested against this implementation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..io.bam import (
    OP_DEL, OP_EQUAL, OP_DIFF, OP_INS, OP_MATCH, OP_PAD,
    OP_REF_SKIP, OP_SOFT_CLIP, ReadBatch,
)
from ..options import ImageOptions

MAX_COLOR = ImageOptions.MAX_COLOR_VALUE
MIN_COLOR = ImageOptions.MIN_COLOR_VALUE

_BASE_LABELS = ImageOptions.DECODED_BASE_LABELS

# variant types
HOM_REF, SNP, INSERT, DELETE = 0, 1, 2, 3


@dataclass
class TruthRecord:
    contig: str
    pos_start: int
    pos_end: int
    ref: str
    alt: str


@dataclass
class CandidateWindow:
    contig: str
    position: int
    depth: int
    candidates: list[str]
    candidate_frequency: list[int]
    image: np.ndarray  # (window_size+1, feature_size) int8 (clamped +-125)
    base_label: int = 0
    type_label: int = 0


def get_reference_feature_value(base: str) -> int:
    """A/C/G/T/other -> 1..5 (region_summary.cpp:165-172)."""
    base = base.upper()
    return {"A": 1, "C": 2, "G": 3, "T": 4}.get(base, 5)


# vectorized ref-base encoding table (A/C/G/T upper+lower -> 1..4, else 5)
_REF_VALUE_TABLE = np.full(256, 5, np.int64)
for _b, _v in (("A", 1), ("C", 2), ("G", 3), ("T", 4)):
    _REF_VALUE_TABLE[ord(_b)] = _v
    _REF_VALUE_TABLE[ord(_b.lower())] = _v


def encode_reference_values(reference_sequence: str) -> np.ndarray:
    return _REF_VALUE_TABLE[
        np.frombuffer(reference_sequence.encode("latin-1"), np.uint8)]


_FEATURE_BY_BASE = {"A": 1, "C": 2, "G": 3, "T": 4, "I": 5, "D": 6}


def get_feature_index(ref_base: str, base: str, is_reverse: bool) -> int:
    """Feature column for an observed base (region_summary.cpp:201-230):
    fwd block starts col 7, rev block col 18; -1 if ref base not ACGT."""
    ref_base = ref_base.upper()
    if ref_base not in "ACGT":
        return -1
    start = 18 if is_reverse else 7
    return start + _FEATURE_BY_BASE.get(base.upper(), 7)


def get_label_index(base_h1: str, base_h2: str) -> int:
    """28-class base-pair label (region_summary.cpp:108-120)."""
    base_h1, base_h2 = base_h1.upper(), base_h2.upper()
    for i, pair in enumerate(_BASE_LABELS):
        if base_h1 == pair[0] and base_h2 == pair[1]:
            return i
        if base_h2 == pair[0] and base_h1 == pair[1]:
            return i
    return 0


_TYPE_PAIR_LABEL = {
    (HOM_REF, HOM_REF): 0, (HOM_REF, SNP): 1, (HOM_REF, INSERT): 2,
    (HOM_REF, DELETE): 3, (SNP, SNP): 4, (SNP, INSERT): 5, (SNP, DELETE): 6,
    (INSERT, INSERT): 7, (INSERT, DELETE): 8, (DELETE, DELETE): 9,
}


def get_variant_type_label_index(type_h1: int, type_h2: int) -> int:
    key = (min(type_h1, type_h2), max(type_h1, type_h2))
    return _TYPE_PAIR_LABEL[key]


_TYPE_PAIR_TABLE = np.zeros((4, 4), np.uint16)
for (_a, _b), _idx in _TYPE_PAIR_LABEL.items():
    _TYPE_PAIR_TABLE[_a, _b] = _idx

# 256x256 char-pair -> 28-class label table (symmetric lookup)
_PAIR_LABEL_TABLE = np.zeros((256, 256), np.uint16)
for _i, _pair in enumerate(_BASE_LABELS):
    for _c1 in (_pair[0], _pair[0].lower()):
        for _c2 in (_pair[1], _pair[1].lower()):
            _PAIR_LABEL_TABLE[ord(_c1), ord(_c2)] = _i
            _PAIR_LABEL_TABLE[ord(_c2), ord(_c1)] = _i


def compute_pair_labels(labels_hp1, labels_hp2) -> np.ndarray:
    """Vectorized get_label_index over two per-position char lists."""
    a = np.frombuffer("".join(labels_hp1).encode("latin-1"), np.uint8)
    b = np.frombuffer("".join(labels_hp2).encode("latin-1"), np.uint8)
    return _PAIR_LABEL_TABLE[a, b]


def _truth_candidate_string(record: TruthRecord) -> str:
    """Truth allele -> candidate-string form (region_summary.cpp:726-788)."""
    ref, alt = record.ref, record.alt
    if len(ref) > len(alt):
        allele, other, type_digit = ref, alt, "3"
    elif len(ref) < len(alt):
        allele, other, type_digit = alt, ref, "2"
    else:
        allele, other, type_digit = alt, ref, "1"
    if len(allele) > 1 and len(other) > 1:
        min_length = min(len(allele), len(other))
        allele = allele[: len(allele) - min_length + 1]
    return type_digit + allele


class EventMatrix:
    """Records scatter-accumulate writes as an event stream instead of
    mutating a dense matrix — the feed for the TPU accumulation kernels
    (ops/pileup_kernel.py).  Only ``m[r, c] -= 1`` / ``+= 1`` patterns are
    used by the walkers, so __getitem__ returns 0 and the subsequently
    stored value IS the delta."""

    __slots__ = ("rows", "cols", "deltas")

    def __init__(self):
        self.rows: list[int] = []
        self.cols: list[int] = []
        self.deltas: list[int] = []

    def __getitem__(self, key):
        return 0

    def __setitem__(self, key, value):
        row, col = key
        self.rows.append(row)
        self.cols.append(col)
        self.deltas.append(int(value))

    def arrays(self):
        return (np.asarray(self.rows, np.int32),
                np.asarray(self.cols, np.int32),
                np.asarray(self.deltas, np.int32))


class RegionalSummary:
    """Per-region pileup image + candidate generator.

    matrix_backend: None accumulates reads straight into the numpy matrix;
    otherwise a callable (rows, cols, deltas, shape) -> int array that
    performs the scatter-accumulate (e.g. the Pallas TPU kernel)."""

    def __init__(self, contig: str, ref_start: int, ref_end: int,
                 reference_sequence: str, generate_indels: bool = False,
                 matrix_backend=None, use_native: bool = False):
        self.matrix_backend = matrix_backend
        self.use_native = use_native and not generate_indels
        self.contig = contig
        self.ref_start = ref_start
        self.ref_end = ref_end
        self.reference_sequence = reference_sequence
        self.generate_indels = generate_indels
        n = ref_end - ref_start + 1
        self.max_observed_insert = np.zeros(n, np.int64)
        self.cumulative_observed_insert = np.zeros(n, np.int64)
        self.total_observed_insert_bases = 0
        self.positions: np.ndarray | None = None
        self.index: np.ndarray | None = None
        # training labels
        self._labels_hp1 = None
        self._labels_hp2 = None
        self._type_hp1 = None
        self._type_hp2 = None
        self._hp1_truth: dict[int, list[TruthRecord]] = {}
        self._hp2_truth: dict[int, list[TruthRecord]] = {}
        self.labels = None
        self.labels_variant_type = None

    # ---- coordinate system -------------------------------------------------

    def _observe_max_inserts(self, batch: ReadBatch) -> None:
        if not self.generate_indels:
            return
        for r in range(batch.n_reads):
            ref_position = int(batch.pos[r])
            for op, length in batch.read_cigar(r):
                if ref_position > self.ref_end:
                    break
                if op in (OP_MATCH, OP_EQUAL, OP_DIFF):
                    skip = 0
                    if ref_position < self.ref_start:
                        skip = min(self.ref_start - ref_position, length)
                        ref_position += skip
                    ref_position += length - skip
                elif op == OP_INS:
                    anchor = ref_position - 1
                    if self.ref_start <= anchor <= self.ref_end:
                        i = anchor - self.ref_start
                        self.max_observed_insert[i] = max(
                            self.max_observed_insert[i], length)
                elif op in (OP_REF_SKIP, OP_PAD, OP_DEL):
                    ref_position += length
                # soft/hard clips don't move the reference cursor

    def generate_max_insert_summary(self, batch: ReadBatch) -> None:
        """Build the expanded (position, insert_index) coordinate arrays
        (region_summary.cpp:69-96)."""
        self._observe_max_inserts(batch)
        n = len(self.max_observed_insert)
        self.cumulative_observed_insert[0] = 0
        if n > 1:
            self.cumulative_observed_insert[1:] = np.cumsum(
                self.max_observed_insert[:-1])
        self.total_observed_insert_bases = int(self.max_observed_insert.sum())

        # vectorized equivalent of the reference's per-position loop: each
        # position i expands to rows (i, 0..max_observed_insert[i])
        counts = self.max_observed_insert.astype(np.int64) + 1
        self.positions = np.repeat(
            np.arange(self.ref_start, self.ref_start + n, dtype=np.int64),
            counts)
        row_starts = np.cumsum(counts) - counts
        self.index = (np.arange(int(counts.sum()), dtype=np.int64)
                      - np.repeat(row_starts, counts)).astype(np.int32)

    def _base_index(self, pos: int) -> int:
        i = pos - self.ref_start
        return int(i + self.cumulative_observed_insert[i])

    # ---- truth labels (train mode) ----------------------------------------

    def generate_labels(self, hap1_records: list[TruthRecord],
                        hap2_records: list[TruthRecord]) -> None:
        """Project truth VCF haplotype records onto region coordinates
        (region_summary.cpp:234-334)."""
        region_size = (self.ref_end - self.ref_start
                       + self.total_observed_insert_bases + 1)
        self._labels_hp1 = ["*"] * (region_size + 1)
        self._labels_hp2 = ["*"] * (region_size + 1)
        self._type_hp1 = [HOM_REF] * (region_size + 1)
        self._type_hp2 = [HOM_REF] * (region_size + 1)
        self._hp1_truth = {}
        self._hp2_truth = {}

        for pos in range(self.ref_start, self.ref_end + 1):
            base_index = self._base_index(pos)
            self._labels_hp1[base_index] = "R"
            self._labels_hp2[base_index] = "R"

        for records, labels, types, truth in (
                (hap1_records, self._labels_hp1, self._type_hp1,
                 self._hp1_truth),
                (hap2_records, self._labels_hp2, self._type_hp2,
                 self._hp2_truth)):
            for record in records:
                in_region = (self.ref_start <= record.pos_start
                             <= self.ref_end)
                if len(record.ref) > len(record.alt):
                    if in_region:
                        base_index = self._base_index(record.pos_start)
                        types[base_index] = DELETE
                        labels[base_index] = "#"
                        truth.setdefault(base_index, []).append(record)
                elif len(record.ref) < len(record.alt):
                    if in_region:
                        base_index = self._base_index(record.pos_start)
                        types[base_index] = INSERT
                        labels[base_index] = "*"
                        truth.setdefault(base_index, []).append(record)
                else:
                    if in_region:
                        base_index = self._base_index(record.pos_start)
                        types[base_index] = SNP
                        truth.setdefault(base_index, []).append(record)
                    for pos in range(record.pos_start, record.pos_end):
                        if self.ref_start <= pos <= self.ref_end:
                            base_index = self._base_index(pos)
                            ref_base = self.reference_sequence[
                                pos - self.ref_start]
                            alt_base = record.alt[pos - record.pos_start]
                            labels[base_index] = ("R" if ref_base == alt_base
                                                  else alt_base)

    # ---- accumulation ------------------------------------------------------

    def _populate_read(self, state, r: int, batch: ReadBatch,
                       min_snp_baseq: float, min_indel_baseq: float) -> None:
        """One read's scatter-accumulate walk
        (region_summary.cpp:337-566)."""
        (image, coverage, snp_count, insert_count, delete_count,
         allele_map, allele_fwd, allele_rev) = state
        seq_start = int(batch.seq_offsets[r])
        seq = batch.seq[seq_start:int(batch.seq_offsets[r + 1])]
        qual = batch.qual[seq_start:int(batch.seq_offsets[r + 1])]
        cigar = batch.read_cigar(r)
        is_reverse = bool(batch.is_reverse[r])
        ref_seq = self.reference_sequence
        ref_start, ref_end = self.ref_start, self.ref_end

        read_index = 0
        ref_position = int(batch.pos[r])

        def record_allele(region_index: int, candidate: str) -> None:
            alleles = allele_map[region_index]
            if candidate in alleles:
                alleles[candidate] += 1
                if is_reverse:
                    allele_rev[region_index][candidate] += 1
                else:
                    allele_fwd[region_index][candidate] += 1
            else:
                alleles[candidate] = 1
                allele_fwd[region_index][candidate] = 0 if is_reverse else 1
                allele_rev[region_index][candidate] = 1 if is_reverse else 0

        n_ops = len(cigar)
        for cigar_i, (op, length) in enumerate(cigar):
            if ref_position > ref_end:
                break
            if op in (OP_MATCH, OP_EQUAL, OP_DIFF):
                start_i = 0
                if ref_position < ref_start:
                    start_i = min(ref_start - ref_position, length)
                    read_index += start_i
                    ref_position += start_i
                for i in range(start_i, length):
                    base_quality = qual[read_index]
                    if ref_start <= ref_position <= ref_end:
                        base = chr(seq[read_index])
                        ref_base = ref_seq[ref_position - ref_start]
                        region_index = ref_position - ref_start
                        base_index = self._base_index(ref_position)
                        feature_index = get_feature_index(ref_base, base,
                                                          is_reverse)
                        if base_quality >= min_snp_baseq:
                            coverage[region_index] += 1
                            if i == length - 1 and cigar_i != n_ops - 1:
                                next_op = cigar[cigar_i + 1][0]
                                if next_op not in (OP_INS, OP_DEL):
                                    image[base_index,
                                          15 if is_reverse else 4] -= 1
                            else:
                                image[base_index,
                                      15 if is_reverse else 4] -= 1
                        if ref_base != base and base_quality >= min_snp_baseq:
                            snp_count[region_index] += 1
                            if feature_index >= 0:
                                image[base_index, feature_index] -= 1
                            record_allele(region_index, "1" + base)
                        elif base_quality >= min_snp_baseq:
                            if feature_index >= 0:
                                image[base_index, feature_index] -= 1
                    read_index += 1
                    ref_position += 1
            elif op == OP_INS:
                anchor = ref_position - 1
                if ref_start <= anchor <= ref_end and read_index - 1 >= 0:
                    ref_base = ref_seq[anchor - ref_start]
                    base_index = self._base_index(anchor)
                    insert_feat = get_feature_index(ref_base, "I", is_reverse)
                    alt = seq[read_index - 1:read_index + length].tobytes() \
                        .decode()
                    alt_len = length + 1
                    start_index = read_index - 1
                    base_quality = int(
                        qual[start_index:start_index + alt_len]
                        .astype(np.int64).sum())
                    if (base_quality >= min_indel_baseq * alt_len
                            and qual[start_index] < min_snp_baseq):
                        coverage[anchor - ref_start] += 1
                    candidate = "2" + alt
                    if (len(candidate) <= 61
                            and base_quality >= min_indel_baseq * alt_len):
                        if insert_feat >= 0:
                            image[base_index, insert_feat] -= 1
                        insert_count[anchor - ref_start] += 1
                        record_allele(anchor - ref_start, candidate)
                read_index += length
            elif op == OP_DEL:
                anchor = ref_position - 1
                if ref_start <= anchor <= ref_end:
                    ref_base = ref_seq[anchor - ref_start]
                    base_index = self._base_index(anchor)
                    delete_feat = get_feature_index(ref_base, "D", is_reverse)
                    if delete_feat >= 0:
                        image[base_index, delete_feat] -= 1
                    ref_allele = ref_seq[anchor - ref_start:
                                         anchor - ref_start + length + 1]
                    candidate = "3" + ref_allele
                    if len(candidate) <= 61:
                        delete_count[anchor - ref_start] += 1
                        record_allele(anchor - ref_start, candidate)
                for i in range(length):
                    pos = ref_position + i
                    if ref_start <= pos <= ref_end:
                        base_index = self._base_index(pos)
                        feature_index = get_feature_index(
                            ref_seq[pos - ref_start], "*", is_reverse)
                        if feature_index >= 0:
                            image[base_index, feature_index] -= 1
                ref_position += length
            elif op in (OP_REF_SKIP, OP_PAD):
                # NOTE: the reference's switch falls through to SOFT_CLIP
                # here (region_summary.cpp:556-561), so the read cursor also
                # advances — replicated deliberately.
                ref_position += length
                read_index += length
            elif op == OP_SOFT_CLIP:
                read_index += length
            # hard clip: nothing

    # ---- main entry --------------------------------------------------------

    def generate_summary(self, batch: ReadBatch, *, min_snp_baseq: float,
                         min_indel_baseq: float, snp_freq_threshold: float,
                         insert_freq_threshold: float,
                         delete_freq_threshold: float,
                         min_coverage_threshold: float,
                         snp_candidate_freq_threshold: float,
                         indel_candidate_freq_threshold: float,
                         candidate_support_threshold: float,
                         skip_indels: bool,
                         candidate_region_start: int,
                         candidate_region_end: int,
                         candidate_window_size: int = 32,
                         feature_size: int = 26,
                         train_mode: bool = False,
                         build_window_images: bool = True,
                         ) -> list[CandidateWindow]:
        """Accumulate the region image and emit per-candidate windows
        (region_summary.cpp:568-916).

        build_window_images=False skips the per-window image assembly
        (windows carry image=None) for the fused device-window flow, which
        gathers + injects windows from self.image_int8 on the accelerator
        (ops/device_windows.py) using self.descriptor_rows."""
        n_ref = self.ref_end - self.ref_start + 1
        region_size = n_ref + self.total_observed_insert_bases

        from collections import defaultdict

        coverage = np.zeros(n_ref, np.int64)
        snp_count = np.zeros(n_ref, np.int64)
        insert_count = np.zeros(n_ref, np.int64)
        delete_count = np.zeros(n_ref, np.int64)
        allele_map = defaultdict(dict)
        allele_fwd = defaultdict(dict)
        allele_rev = defaultdict(dict)

        # reference channel 0 (region_summary.cpp:174-190); expanded rows
        # are position-major with insert slots adjacent (row(pos, j) =
        # base_index(pos) + j), so the whole channel is one repeat of the
        # reference values by (1 + max_insert)
        ref_values = encode_reference_values(self.reference_sequence[:n_ref])
        if self.total_observed_insert_bases != 0:
            ref_channel = np.repeat(ref_values,
                                    1 + self.max_observed_insert[:n_ref])
        else:
            ref_channel = ref_values

        native = None
        if self.use_native:
            from .native_pileup import run_native_pileup

            native = run_native_pileup(batch, self.reference_sequence,
                                       self.ref_start, self.ref_end,
                                       min_snp_baseq, min_indel_baseq,
                                       hp_mode=False)
            # native.image is an owned copy; accumulate the ref channel in
            # place instead of zeros + full-matrix add
            image = native.image
            image[:len(ref_channel), 0] += ref_channel
            coverage[:] = native.coverage
            snp_count[:] = native.snp_count
            insert_count[:] = native.insert_count
            delete_count[:] = native.delete_count
        else:
            image = np.zeros((region_size + 1, feature_size), np.int64)
            image[:len(ref_channel), 0] = ref_channel
            accumulator = (image if self.matrix_backend is None
                           else EventMatrix())
            state = (accumulator, coverage, snp_count, insert_count,
                     delete_count, allele_map, allele_fwd, allele_rev)
            for r in range(batch.n_reads):
                if batch.mapq[r] > 0:
                    self._populate_read(state, r, batch, min_snp_baseq,
                                        min_indel_baseq)
            if self.matrix_backend is not None:
                rows, cols, deltas = accumulator.arrays()
                image += self.matrix_backend(rows, cols, deltas, image.shape)

        # per-position frequency gates (region_summary.cpp:634-654),
        # vectorized over the (duplicated-at-insert-columns) position list
        denom = np.maximum(1.0, coverage.astype(np.float64))
        snp_fraction = snp_count / denom
        insert_fraction = insert_count / denom
        delete_fraction = delete_count / denom
        snp_hit = snp_fraction >= snp_freq_threshold
        insert_hit = insert_fraction >= insert_freq_threshold
        delete_hit = delete_fraction >= delete_freq_threshold
        any_hit = snp_hit | insert_hit | delete_hit
        eligible = any_hit & (coverage >= min_coverage_threshold)

        # expanded-coordinate view: the reference iterates positions[] which
        # repeats a position once per insert column (duplicates preserved)
        position_stream = self.positions[:region_size]
        region_stream = (position_stream - self.ref_start).astype(np.int64)
        in_candidate_region = ((position_stream >= candidate_region_start)
                               & (position_stream <= candidate_region_end))
        keep = eligible[region_stream] & in_candidate_region
        filtered_positions = position_stream[keep].tolist()
        snp_pass = np.zeros(n_ref, bool)
        insert_pass = np.zeros(n_ref, bool)
        delete_pass = np.zeros(n_ref, bool)
        kept_regions = region_stream[keep]
        snp_pass[kept_regions[snp_hit[kept_regions]]] = True
        insert_pass[kept_regions[insert_hit[kept_regions]]] = True
        delete_pass[kept_regions[delete_hit[kept_regions]]] = True

        # clamp only columns [11, 25) over the first region_size rows
        cs, ce = ImageOptions.CLAMP_COL_START, ImageOptions.CLAMP_COL_END
        np.clip(image[:region_size, cs:ce], MIN_COLOR, MAX_COLOR,
                out=image[:region_size, cs:ce])
        # one whole-image int8 cast so each window slice copies int8 bytes
        # directly (bit-identical to the old per-window astype: the mod-256
        # cast commutes elementwise with slicing, mid-row assignments are
        # pre-clamped to +-125, and negation commutes with the cast
        # including the -128 fixed point)
        image = image.astype(np.int8)
        # exposed for the fused device-window flow (ops/device_windows.py):
        # ship this image to HBM and gather/inject windows on-device
        self.image_int8 = image
        self.region_rows = region_size + 1

        self.labels = np.zeros(region_size + 1, np.uint16)
        self.labels_variant_type = np.zeros(region_size + 1, np.uint16)
        if train_mode and self._labels_hp1 is not None:
            self.labels = compute_pair_labels(self._labels_hp1,
                                              self._labels_hp2)
            type_h1 = np.asarray(self._type_hp1, np.int64)
            type_h2 = np.asarray(self._type_hp2, np.int64)
            self.labels_variant_type = _TYPE_PAIR_TABLE[
                np.minimum(type_h1, type_h2),
                np.maximum(type_h1, type_h2)].astype(np.uint16)

        if native is not None:
            # one vectorized searchsorted pair for every gate-passing
            # position (was two scalar searchsorted calls per position)
            allele_lo = np.searchsorted(native.allele_pos, kept_regions,
                                        side="left")
            allele_hi = np.searchsorted(native.allele_pos, kept_regions,
                                        side="right")

        def alleles_at(k, region_index):
            """(candidate, total, fwd, rev) at one position, in candidate-
            string order.  Native entries are decoded lazily — only for the
            few gate-passing positions, not the whole error tail."""
            if native is not None:
                return [(native.allele_string(i), int(native.allele_total[i]),
                         int(native.allele_fwd[i]), int(native.allele_rev[i]))
                        for i in range(int(allele_lo[k]),
                                       int(allele_hi[k]))]
            return [(c, allele_map[region_index][c],
                     allele_fwd[region_index][c],
                     allele_rev[region_index][c])
                    for c in sorted(allele_map[region_index].keys())]

        windows: list[CandidateWindow] = []
        # (position, candidate, depth_fwd, depth_rev) per emitted window —
        # the descriptors_from_candidates feed for the fused device path
        # (ops/device_windows.py); collected unconditionally (a few rows
        # per region)
        self.descriptor_rows = []
        half = candidate_window_size // 2
        # int8 scalar negation hits the -128 fixed point on deep pileups;
        # the wrap is the intended (reference astype) semantics — silence
        # numpy's scalar-overflow warning for the window loop
        saved_err = np.seterr(over="ignore")

        # native window emission: the whole gate loop + per-window image
        # assembly in one C call (pepper_emit_windows), identical output
        # to the Python loop below (A/B-tested in
        # tests/test_native_pileup.py; PEPPER_PY_WINDOWS=1 forces Python).
        # Train mode shares the same native call — the per-window labels
        # attach afterwards (emitted windows are few, the gate loop is the
        # cost; matches region_summary.cpp:828-916 which also labels
        # inside the emission walk)
        import os as _os

        if (native is not None and build_window_images
                and _os.environ.get("PEPPER_PY_WINDOWS") != "1"):
            from .native_pileup import emit_windows_native

            base_indices = (kept_regions
                            + self.cumulative_observed_insert[kept_regions])
            depths = np.minimum(coverage[kept_regions],
                                MAX_COLOR).astype(np.int32)
            ref_codes = np.frombuffer(
                self.reference_sequence.encode("latin-1"),
                np.uint8)[kept_regions]
            pass_masks = (snp_pass[kept_regions].astype(np.uint8)
                          + 2 * insert_pass[kept_regions].astype(np.uint8)
                          + 4 * delete_pass[kept_regions].astype(np.uint8))
            result = emit_windows_native(
                image, region_size, candidate_window_size, feature_size,
                base_indices, depths, ref_codes, pass_masks, allele_lo,
                allele_hi, native, candidate_support_threshold,
                snp_candidate_freq_threshold,
                indel_candidate_freq_threshold, skip_indels)
            if result is not None:
                out_images, pos_k, allele_idx, freqs = result
                pos_arr = filtered_positions
                for j in range(len(pos_k)):
                    k = int(pos_k[j])
                    i = int(allele_idx[j])
                    candidate = native.allele_string(i)
                    pos = pos_arr[k]
                    base_label, type_label = 0, 0
                    if train_mode:
                        base_index = int(base_indices[k])
                        truth_strings_h1 = [
                            _truth_candidate_string(t)
                            for t in self._hp1_truth.get(base_index, [])]
                        truth_strings_h2 = [
                            _truth_candidate_string(t)
                            for t in self._hp2_truth.get(base_index, [])]
                        found_h1 = candidate in truth_strings_h1
                        found_h2 = candidate in truth_strings_h2
                        type_label = (2 if (found_h1 and found_h2)
                                      else 1 if (found_h1 or found_h2)
                                      else 0)
                        base_label = int(self.labels[base_index])
                    self.descriptor_rows.append(
                        (pos, candidate, int(native.allele_fwd[i]),
                         int(native.allele_rev[i])))
                    windows.append(CandidateWindow(
                        contig=self.contig, position=pos,
                        depth=int(depths[k]), candidates=[candidate],
                        candidate_frequency=[int(freqs[j])],
                        image=out_images[j], base_label=base_label,
                        type_label=type_label))
                np.seterr(**saved_err)
                return windows

        for k, pos in enumerate(filtered_positions):
            region_index = pos - self.ref_start
            depth = int(min(coverage[region_index], MAX_COLOR))
            ref_base = self.reference_sequence[region_index]
            base_index = self._base_index(pos)
            for candidate, allele_depth, depth_fwd, depth_rev in \
                    alleles_at(k, region_index):
                frequency = allele_depth / max(1.0, float(depth))
                type_digit = candidate[0]
                if allele_depth < candidate_support_threshold:
                    continue
                if (type_digit != "1"
                        and frequency < indel_candidate_freq_threshold):
                    continue
                if (type_digit == "1"
                        and frequency < snp_candidate_freq_threshold):
                    continue
                if type_digit != "1" and skip_indels:
                    continue
                if ((type_digit == "1" and not snp_pass[region_index])
                        or (type_digit == "2" and not insert_pass[region_index])
                        or (type_digit == "3"
                            and not delete_pass[region_index])):
                    continue

                base_label, type_label = 0, 0
                if train_mode:
                    truth_strings_h1 = [
                        _truth_candidate_string(t)
                        for t in self._hp1_truth.get(base_index, [])]
                    truth_strings_h2 = [
                        _truth_candidate_string(t)
                        for t in self._hp2_truth.get(base_index, [])]
                    found_h1 = candidate in truth_strings_h1
                    found_h2 = candidate in truth_strings_h2
                    type_label = (2 if (found_h1 and found_h2)
                                  else 1 if (found_h1 or found_h2) else 0)
                    base_label = int(self.labels[base_index])

                if not build_window_images:
                    self.descriptor_rows.append((pos, candidate, depth_fwd,
                                                 depth_rev))
                    windows.append(CandidateWindow(
                        contig=self.contig, position=pos, depth=depth,
                        candidates=[candidate],
                        candidate_frequency=[
                            min(allele_depth, MAX_COLOR)],
                        image=None, base_label=base_label,
                        type_label=type_label))
                    continue
                window = np.zeros((candidate_window_size + 1, feature_size),
                                  np.int8)
                lo = base_index - half
                src_lo = max(0, lo)
                src_hi = min(region_size + 1, base_index + half + 1)
                if src_hi > src_lo:
                    window[src_lo - lo:src_hi - lo] = image[src_lo:src_hi]

                mid = half
                freq_clamped = min(allele_depth, MAX_COLOR)
                if type_digit == "1":
                    fwd_i = get_feature_index(ref_base, candidate[1], False)
                    rev_i = get_feature_index(ref_base, candidate[1], True)
                    window[mid, 1] = get_reference_feature_value(candidate[1])
                    window[mid, 5] = min(depth_fwd, MAX_COLOR)
                    window[mid, 16] = min(depth_rev, MAX_COLOR)
                    window[mid, fwd_i] = -window[mid, fwd_i]
                    window[mid, rev_i] = -window[mid, rev_i]
                elif type_digit == "2":
                    fwd_i = get_feature_index(ref_base, "I", False)
                    rev_i = get_feature_index(ref_base, "I", True)
                    window[mid, 2] = min(len(candidate) - 1, MAX_COLOR)
                    window[mid, 6] = min(depth_fwd, MAX_COLOR)
                    window[mid, 17] = min(depth_rev, MAX_COLOR)
                    window[mid, fwd_i] = -window[mid, fwd_i]
                    window[mid, rev_i] = -window[mid, rev_i]
                else:
                    del_len = len(candidate) - 1
                    end_index = min(mid + del_len - 1,
                                    candidate_window_size - 1)
                    fwd_i = get_feature_index(ref_base, "D", False)
                    rev_i = get_feature_index(ref_base, "D", True)
                    window[mid, 3] = min(del_len, MAX_COLOR)
                    window[mid, 7] = min(depth_fwd, MAX_COLOR)
                    window[mid, 18] = min(depth_rev, MAX_COLOR)
                    window[mid, fwd_i] = -window[mid, fwd_i]
                    window[mid, rev_i] = -window[mid, rev_i]
                    star_fwd = get_feature_index(ref_base, "*", False)
                    star_rev = get_feature_index(ref_base, "*", True)
                    for idx in range(mid + 1, end_index + 1):
                        window[idx, 3] = min(del_len, MAX_COLOR)
                        window[idx, 7] = min(depth_fwd, MAX_COLOR)
                        window[idx, 18] = min(depth_rev, MAX_COLOR)
                        window[idx, star_fwd] = -window[idx, star_fwd]
                        window[idx, star_rev] = -window[idx, star_rev]

                self.descriptor_rows.append((pos, candidate, depth_fwd,
                                             depth_rev))
                windows.append(CandidateWindow(
                    contig=self.contig, position=pos, depth=depth,
                    candidates=[candidate],
                    candidate_frequency=[freq_clamped],
                    image=window,  # int8 (clamped to +-125) halves-again
                                   # pool IPC
                    base_label=base_label, type_label=type_label))
        np.seterr(**saved_err)
        return windows
