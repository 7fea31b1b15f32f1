"""HP-mode (haplotagged) pileup encoder: 48-channel candidate images.

Semantics-exact to the reference's RegionalSummaryGeneratorHP
(pepper_variant/modules/cpp/region_summary_hp.cpp).  Channel layout
(region_summary_hp.h:23-70): col 0 = ref base; per-haplotype blocks —
HP1 fwd obs start 7 (cols 8..14), HP1 rev start 18 (19..25), HP2 fwd start
29 (30..36), HP2 rev start 40 (41..47); coverage rows 4/15 (HP1 fwd/rev)
and 26/37 (HP2); support rows 5/16 + 27/38 (SNP), 6/17 + 28/39 (INS),
7/18 + 29/40 (DEL).  Untagged reads (HP 0) count into BOTH blocks.

Deliberate divergences from the non-HP encoder, replicated exactly:
* match branch has NO anchor-before-indel coverage quirk
  (region_summary_hp.cpp:393-401);
* mismatching bases are NOT drawn into the observation rows — only the
  allele maps see them (:411-451 has no image write);
* insert quality sums the inserted bases only (len = cigar.length, no
  anchor; :480-484) and failing inserts DECREMENT coverage when their
  anchor base had passed (:487-488);
* observation rows accumulate POSITIVE counts (+= 1) for I/D/* (:500-506,
  :561-567, :638-646);
* after accumulation ALL 48 columns are clamped to +-125 (:763-768);
* window injections write per-haplotype support with NO sign flips and no
  delete-span fill (:965-1005).
"""

from __future__ import annotations

import numpy as np

from ..io.bam import (
    OP_DEL, OP_DIFF, OP_EQUAL, OP_INS, OP_MATCH, OP_PAD, OP_REF_SKIP,
    OP_SOFT_CLIP, ReadBatch,
)
from .pileup_ref import (
    CandidateWindow, RegionalSummary, _truth_candidate_string,
    get_label_index, get_reference_feature_value, MAX_COLOR, MIN_COLOR,
)

_FEATURE_BY_BASE = {"A": 1, "C": 2, "G": 3, "T": 4, "I": 5, "D": 6}


def get_feature_index_hp(ref_base: str, base: str, is_reverse: bool,
                         hp_tag: int) -> int:
    """(region_summary_hp.cpp:191-240)."""
    ref_base = ref_base.upper()
    if ref_base not in "ACGT":
        return -1
    if hp_tag == 1:
        start = 18 if is_reverse else 7
    else:
        start = 40 if is_reverse else 29
    return start + _FEATURE_BY_BASE.get(base.upper(), 7)


class RegionalSummaryHP(RegionalSummary):
    """48-channel HP pileup; coordinate machinery shared with the base
    encoder (identical in the reference)."""

    def _hp_blocks(self, hp_tag: int):
        """Which haplotype blocks a read contributes to (0 -> both)."""
        if hp_tag == 0:
            return (1, 2)
        return (hp_tag,)

    def _populate_read(self, state, r: int, batch: ReadBatch,
                       min_snp_baseq: float, min_indel_baseq: float) -> None:
        (image, coverage, snp_count, insert_count, delete_count,
         allele_map, allele_fwd_hp1, allele_rev_hp1, allele_fwd_hp2,
         allele_rev_hp2) = state
        seq_start = int(batch.seq_offsets[r])
        seq = batch.seq[seq_start:int(batch.seq_offsets[r + 1])]
        qual = batch.qual[seq_start:int(batch.seq_offsets[r + 1])]
        cigar = batch.read_cigar(r)
        is_reverse = bool(batch.is_reverse[r])
        hp_tag = int(batch.hp[r])
        blocks = self._hp_blocks(hp_tag)
        ref_seq = self.reference_sequence
        ref_start, ref_end = self.ref_start, self.ref_end

        in_hp1 = hp_tag in (0, 1)
        in_hp2 = hp_tag in (0, 2)

        def record_allele(region_index: int, candidate: str) -> None:
            alleles = allele_map[region_index]
            if candidate in alleles:
                alleles[candidate] += 1
                if in_hp1:
                    (allele_rev_hp1 if is_reverse
                     else allele_fwd_hp1)[region_index][candidate] += 1
                if in_hp2:
                    (allele_rev_hp2 if is_reverse
                     else allele_fwd_hp2)[region_index][candidate] += 1
            else:
                alleles[candidate] = 1
                for m in (allele_fwd_hp1, allele_rev_hp1, allele_fwd_hp2,
                          allele_rev_hp2):
                    m[region_index][candidate] = 0
                if in_hp1:
                    (allele_rev_hp1 if is_reverse
                     else allele_fwd_hp1)[region_index][candidate] = 1
                if in_hp2:
                    (allele_rev_hp2 if is_reverse
                     else allele_fwd_hp2)[region_index][candidate] = 1

        read_index = 0
        ref_position = int(batch.pos[r])
        for op, length in cigar:
            if ref_position > ref_end:
                break
            if op in (OP_MATCH, OP_EQUAL, OP_DIFF):
                start_i = 0
                if ref_position < ref_start:
                    start_i = min(ref_start - ref_position, length)
                    read_index += start_i
                    ref_position += start_i
                for _ in range(start_i, length):
                    base_quality = qual[read_index]
                    if ref_start <= ref_position <= ref_end:
                        base = chr(seq[read_index])
                        ref_base = ref_seq[ref_position - ref_start]
                        region_index = ref_position - ref_start
                        base_index = self._base_index(ref_position)
                        if base_quality >= min_snp_baseq:
                            coverage[region_index] += 1
                            if in_hp1:
                                image[base_index,
                                      15 if is_reverse else 4] -= 1
                            if in_hp2:
                                image[base_index,
                                      37 if is_reverse else 26] -= 1
                        if (ref_base != base
                                and base_quality >= min_snp_baseq):
                            snp_count[region_index] += 1
                            record_allele(region_index, "1" + base)
                        elif base_quality >= min_snp_baseq:
                            for block in blocks:
                                fi = get_feature_index_hp(ref_base, base,
                                                          is_reverse, block)
                                if fi >= 0:
                                    image[base_index, fi] -= 1
                    read_index += 1
                    ref_position += 1
            elif op == OP_INS:
                anchor = ref_position - 1
                if ref_start <= anchor <= ref_end and read_index - 1 >= 0:
                    ref_base = ref_seq[anchor - ref_start]
                    base_index = self._base_index(anchor)
                    alt = seq[read_index - 1:read_index + length].tobytes() \
                        .decode()
                    ins_len = length
                    base_quality = int(
                        qual[read_index:read_index + ins_len]
                        .astype(np.int64).sum())
                    if (base_quality < min_indel_baseq * ins_len
                            and qual[read_index - 1] >= min_snp_baseq):
                        coverage[anchor - ref_start] -= 1
                    candidate = "2" + alt
                    if (len(candidate) <= 61
                            and base_quality >= min_indel_baseq * ins_len):
                        for block in blocks:
                            fi = get_feature_index_hp(ref_base, "I",
                                                      is_reverse, block)
                            if fi >= 0:
                                image[base_index, fi] += 1
                        insert_count[anchor - ref_start] += 1
                        record_allele(anchor - ref_start, candidate)
                read_index += length
            elif op == OP_DEL:
                anchor = ref_position - 1
                if ref_start <= anchor <= ref_end:
                    ref_base = ref_seq[anchor - ref_start]
                    base_index = self._base_index(anchor)
                    for block in blocks:
                        fi = get_feature_index_hp(ref_base, "D", is_reverse,
                                                  block)
                        if fi >= 0:
                            image[base_index, fi] += 1
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
                        for block in blocks:
                            fi = get_feature_index_hp(
                                ref_seq[pos - ref_start], "*", is_reverse,
                                block)
                            if fi >= 0:
                                image[base_index, fi] += 1
                ref_position += length
            elif op in (OP_REF_SKIP, OP_PAD):
                ref_position += length
                read_index += length  # reference fallthrough, as in non-HP
            elif op == OP_SOFT_CLIP:
                read_index += length

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
                         candidate_window_size: int = 20,
                         feature_size: int = 48,
                         train_mode: bool = False,
                         ) -> list[CandidateWindow]:
        n_ref = self.ref_end - self.ref_start + 1
        region_size = n_ref + self.total_observed_insert_bases

        from collections import defaultdict

        from .pileup_ref import encode_reference_values

        coverage = np.zeros(n_ref, np.int64)
        snp_count = np.zeros(n_ref, np.int64)
        insert_count = np.zeros(n_ref, np.int64)
        delete_count = np.zeros(n_ref, np.int64)
        allele_map = defaultdict(dict)
        allele_fwd_hp1 = defaultdict(dict)
        allele_rev_hp1 = defaultdict(dict)
        allele_fwd_hp2 = defaultdict(dict)
        allele_rev_hp2 = defaultdict(dict)

        # ref channel: rows are position-major with insert slots adjacent,
        # so the expanded channel is one repeat by (1 + max_insert)
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
                                       hp_mode=True)
            image = native.image  # owned copy — accumulate in place
            image[:len(ref_channel), 0] += ref_channel
            coverage[:] = native.coverage
            snp_count[:] = native.snp_count
            insert_count[:] = native.insert_count
            delete_count[:] = native.delete_count
        else:
            from .pileup_ref import EventMatrix

            image = np.zeros((region_size + 1, feature_size), np.int64)
            image[:len(ref_channel), 0] = ref_channel

            accumulator = (image if self.matrix_backend is None
                           else EventMatrix())
            state = (accumulator, coverage, snp_count, insert_count,
                     delete_count, allele_map, allele_fwd_hp1,
                     allele_rev_hp1, allele_fwd_hp2, allele_rev_hp2)
            for r in range(batch.n_reads):
                if batch.mapq[r] > 0:
                    self._populate_read(state, r, batch, min_snp_baseq,
                                        min_indel_baseq)
            if self.matrix_backend is not None:
                rows, cols, deltas = accumulator.arrays()
                image += self.matrix_backend(rows, cols, deltas, image.shape)

        denom = np.maximum(1.0, coverage.astype(np.float64))
        snp_hit = (snp_count / denom) >= snp_freq_threshold
        insert_hit = (insert_count / denom) >= insert_freq_threshold
        delete_hit = (delete_count / denom) >= delete_freq_threshold
        eligible = ((snp_hit | insert_hit | delete_hit)
                    & (coverage >= min_coverage_threshold))
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

        # HP clamps EVERY feature column (region_summary_hp.cpp:763-768),
        # so the post-clamp image fits int8 exactly; cast once so window
        # slices copy int8 bytes directly
        np.clip(image[:region_size], MIN_COLOR, MAX_COLOR,
                out=image[:region_size])
        image = image.astype(np.int8)

        self.labels = np.zeros(region_size + 1, np.uint16)
        self.labels_variant_type = np.zeros(region_size + 1, np.uint16)
        if train_mode and self._labels_hp1 is not None:
            from .pileup_ref import _TYPE_PAIR_TABLE, compute_pair_labels

            self.labels = compute_pair_labels(self._labels_hp1,
                                              self._labels_hp2)
            type_h1 = np.asarray(self._type_hp1, np.int64)
            type_h2 = np.asarray(self._type_hp2, np.int64)
            self.labels_variant_type = _TYPE_PAIR_TABLE[
                np.minimum(type_h1, type_h2),
                np.maximum(type_h1, type_h2)].astype(np.uint16)

        def alleles_at(region_index):
            """(candidate, total, fwd1, rev1, fwd2, rev2) at one position,
            candidate-string order, native strings decoded lazily."""
            if native is not None:
                return [(native.allele_string(i), int(native.allele_total[i]),
                         int(native.allele_fwd_hp1[i]),
                         int(native.allele_rev_hp1[i]),
                         int(native.allele_fwd_hp2[i]),
                         int(native.allele_rev_hp2[i]))
                        for i in native.allele_range(region_index)]
            return [(c, allele_map[region_index][c],
                     allele_fwd_hp1[region_index][c],
                     allele_rev_hp1[region_index][c],
                     allele_fwd_hp2[region_index][c],
                     allele_rev_hp2[region_index][c])
                    for c in sorted(allele_map[region_index].keys())]

        windows: list[CandidateWindow] = []
        half = candidate_window_size // 2

        # native window emission (round 5): the HP gate loop + 48-channel
        # window assembly in one C call (pepper_emit_windows hp_mode=1),
        # identical output to the Python loop below (A/B-tested in
        # tests/test_native_pileup.py; PEPPER_PY_WINDOWS=1 forces Python);
        # matches region_summary_hp.cpp:191-236's in-walk emission
        import os as _os

        if (native is not None
                and _os.environ.get("PEPPER_PY_WINDOWS") != "1"):
            from .native_pileup import emit_windows_native

            allele_lo = np.searchsorted(native.allele_pos, kept_regions,
                                        side="left")
            allele_hi = np.searchsorted(native.allele_pos, kept_regions,
                                        side="right")
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
                indel_candidate_freq_threshold, skip_indels, hp_mode=True)
            if result is not None:
                out_images, pos_k, allele_idx, freqs = result
                for j in range(len(pos_k)):
                    k = int(pos_k[j])
                    i = int(allele_idx[j])
                    candidate = native.allele_string(i)
                    pos = filtered_positions[k]
                    base_label, type_label = 0, 0
                    if train_mode:
                        base_index = int(base_indices[k])
                        truth_h1 = [_truth_candidate_string(t) for t in
                                    self._hp1_truth.get(base_index, [])]
                        truth_h2 = [_truth_candidate_string(t) for t in
                                    self._hp2_truth.get(base_index, [])]
                        found_h1 = candidate in truth_h1
                        found_h2 = candidate in truth_h2
                        type_label = (2 if (found_h1 and found_h2)
                                      else 1 if (found_h1 or found_h2)
                                      else 0)
                        base_label = int(self.labels[base_index])
                    windows.append(CandidateWindow(
                        contig=self.contig, position=pos,
                        depth=int(depths[k]), candidates=[candidate],
                        candidate_frequency=[int(freqs[j])],
                        image=out_images[j], base_label=base_label,
                        type_label=type_label))
                return windows

        for pos in filtered_positions:
            region_index = pos - self.ref_start
            depth = int(min(coverage[region_index], MAX_COLOR))
            base_index = self._base_index(pos)
            for candidate, allele_depth, fwd_hp1, rev_hp1, fwd_hp2, \
                    rev_hp2 in alleles_at(region_index):
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
                        or (type_digit == "2"
                            and not insert_pass[region_index])
                        or (type_digit == "3"
                            and not delete_pass[region_index])):
                    continue

                base_label, type_label = 0, 0
                if train_mode:
                    truth_h1 = [_truth_candidate_string(t) for t in
                                self._hp1_truth.get(base_index, [])]
                    truth_h2 = [_truth_candidate_string(t) for t in
                                self._hp2_truth.get(base_index, [])]
                    found_h1 = candidate in truth_h1
                    found_h2 = candidate in truth_h2
                    type_label = (2 if (found_h1 and found_h2)
                                  else 1 if (found_h1 or found_h2) else 0)
                    base_label = int(self.labels[base_index])

                window = np.zeros((candidate_window_size + 1, feature_size),
                                  np.int8)
                lo = base_index - half
                src_lo = max(0, lo)
                src_hi = min(region_size + 1, base_index + half + 1)
                if src_hi > src_lo:
                    window[src_lo - lo:src_hi - lo] = image[src_lo:src_hi]

                mid = half
                if type_digit == "1":
                    window[mid, 1] = get_reference_feature_value(candidate[1])
                    window[mid, 5] = min(fwd_hp1, MAX_COLOR)
                    window[mid, 27] = min(fwd_hp2, MAX_COLOR)
                    window[mid, 16] = min(rev_hp1, MAX_COLOR)
                    window[mid, 38] = min(rev_hp2, MAX_COLOR)
                elif type_digit == "2":
                    window[mid, 2] = min(len(candidate) - 1, MAX_COLOR)
                    window[mid, 6] = min(fwd_hp1, MAX_COLOR)
                    window[mid, 28] = min(fwd_hp2, MAX_COLOR)
                    window[mid, 17] = min(rev_hp1, MAX_COLOR)
                    window[mid, 39] = min(rev_hp2, MAX_COLOR)
                else:
                    window[mid, 3] = min(len(candidate) - 1, MAX_COLOR)
                    window[mid, 7] = min(fwd_hp1, MAX_COLOR)
                    window[mid, 29] = min(fwd_hp2, MAX_COLOR)
                    window[mid, 18] = min(rev_hp1, MAX_COLOR)
                    window[mid, 40] = min(rev_hp2, MAX_COLOR)

                windows.append(CandidateWindow(
                    contig=self.contig, position=pos, depth=depth,
                    candidates=[candidate],
                    candidate_frequency=[min(allele_depth, MAX_COLOR)],
                    image=window,
                    base_label=base_label, type_label=type_label))
        return windows
