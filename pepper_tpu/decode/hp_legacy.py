"""Legacy HP candidate finder (the r0.7-era `--use_hp_info` decode path).

Semantics-exact re-implementation of the reference's CandidateFinderHP
(pepper_variant/modules/cpp/candidate_finder_hp.cpp): per-haplotype
5-class base-probability maps on the expanded (position, insert_index)
coordinate system are turned into per-candidate alt_prob_h1/h2 and
non_ref_prob — multiplicative across insert indices for inserts
(:338-435), per-position for SNPs (:341-372), non-delete evidence product
beyond the allele for deletes (:437-515) — then gated by the ONT linear
regression (:159-219 with ONTLinearRegression, candidate_finder_hp.h:23-47).

The r0.8 live path routes HP mode through the window classifier instead
(see COMPONENTS.md); this module preserves the older flow for parity.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from ..io.bam import (
    OP_DEL, OP_DIFF, OP_EQUAL, OP_INS, OP_MATCH, OP_PAD, OP_REF_SKIP,
    OP_SOFT_CLIP, ReadBatch,
)

SNP_TYPE, INSERT_TYPE, DELETE_TYPE = 1, 2, 3

# candidate_finder.h:15-21 CandidateFinder_options
MIN_BASE_QUALITY = 0
FREQ_THRESHOLD = 4          # percent
MIN_COUNT_THRESHOLD = 2


class ONTLinearRegression:
    SNP_NON_REF_PROB_COEF = -0.002397
    SNP_ALLELE_WEIGHT_COEF = 1.008378
    SNP_BIAS_TERM = 0.001291
    SNP_THRESHOLD = 0.01
    SNP_LOWER_FREQ_THRESHOLD = 0.10

    INSERT_NON_REF_PROB_COEF = 0.239488
    INSERT_ALLELE_WEIGHT_COEF = 0.822283
    INSERT_BIAS_TERM = 0.000298
    INSERT_THRESHOLD = 0.2
    IN_LOWER_FREQ_THRESHOLD = 0.10

    DELETE_NON_REF_PROB_COEF = 0.039434
    DELETE_ALLELE_WEIGHT_COEF = 0.765909
    DELETE_BIAS_TERM = -0.003304
    DELETE_THRESHOLD = 0.15
    DEL_LOWER_FREQ_THRESHOLD = 0.10


def get_index_from_base(base: str) -> int:
    return {"*": 0, "A": 1, "C": 2, "G": 3, "T": 4}[base.upper()]


@dataclass(frozen=True)
class HpAllele:
    ref: str
    alt: str
    alt_type: int


@dataclass
class HpCandidate:
    pos: int
    pos_end: int
    allele: HpAllele
    depth: int = 0
    read_support: int = 0
    alt_prob_h1: float = 0.0
    alt_prob_h2: float = 0.0
    non_ref_prob: float = 0.0


@dataclass
class PositionalCandidateRecord:
    chromosome_name: str
    pos_start: int
    pos_end: int
    candidates: list = field(default_factory=list)


ALT_PROB_THRESHOLD = 0.01  # CandidateFinderOptions.ALT_PROB_THRESHOLD


def hp_candidates_to_variants(candidates, contig):
    """Legacy HP site assembly (FindCandidates.py:16-110): pick the best
    haplotype-supported alleles, compose the genotype from h1/h2 winner
    indices, suffix-extend shorter alts against the longest ref allele.

    candidates: list of 13-field tuples (pos_start, pos_end, ref, alt,
    alt_type, depth, read_support, support_h0, support_h1, support_h2,
    alt_prob_h1, alt_prob_h2, non_ref_prob)."""
    max_h1_prob = max_h2_prob = 0.0
    h1_indx = h2_indx = -1
    min_pos_start = max_pos_end = -1
    ref_sequence = ""
    overall_non_ref_prob = -1.0

    for i, candidate in enumerate(candidates):
        (pos_start, pos_end, ref, alt, alt_type, depth, read_support,
         support_h0, support_h1, support_h2, alt_prob_h1, alt_prob_h2,
         non_ref_prob) = candidate
        if overall_non_ref_prob < 0:
            overall_non_ref_prob = non_ref_prob
        overall_non_ref_prob = min(non_ref_prob, overall_non_ref_prob)
        if min_pos_start == -1:
            min_pos_start = pos_start
        if max_pos_end == -1:
            max_pos_end = pos_end
        min_pos_start = min(min_pos_start, pos_start)
        max_pos_end = max(max_pos_end, pos_end)
        if max_pos_end == pos_end:
            ref_sequence = ref
        if alt_prob_h1 > ALT_PROB_THRESHOLD:
            if h1_indx == -1 or max_h1_prob < alt_prob_h1:
                h1_indx = i
                max_h1_prob = alt_prob_h1
        if alt_prob_h2 > ALT_PROB_THRESHOLD:
            if h2_indx == -1 or max_h2_prob < alt_prob_h2:
                h2_indx = i
                max_h2_prob = alt_prob_h2

    selected_alts, selected_dps, selected_gts, selected_ads = [], [], [], []
    other_alts, other_dps, other_gts, other_ads = [], [], [], []
    for i, candidate in enumerate(candidates):
        (pos_start, pos_end, ref, alt, alt_type, depth, read_support,
         support_h0, support_h1, support_h2, alt_prob_h1, alt_prob_h2,
         non_ref_prob) = candidate
        if pos_end < max_pos_end:
            bases_needed = max_pos_end - pos_end
            alt = alt + ref_sequence[-bases_needed:]
        if i in (h1_indx, h2_indx):
            selected_alts.append(alt)
            selected_dps.append(depth)
            selected_ads.append(read_support)
            selected_gts.append(max(alt_prob_h1, alt_prob_h2))
        else:
            other_alts.append(alt)
            other_dps.append(depth)
            other_ads.append(read_support)
            other_gts.append(max(alt_prob_h1, alt_prob_h2))

    indx_list = [i for i in (h1_indx, h2_indx) if i > -1]
    genotype = [0, 0]
    if len(indx_list) == 1:
        genotype = [0, 1]
    elif len(indx_list) == 2:
        genotype = [1, 1] if indx_list[0] == indx_list[1] else [1, 2]

    return (contig, min_pos_start, max_pos_end, ref_sequence,
            selected_alts + other_alts, genotype,
            selected_dps + other_dps, selected_gts + other_gts,
            selected_ads + other_ads, overall_non_ref_prob)


class CandidateFinderHP:
    def __init__(self, reference_sequence: str, chromosome_name: str,
                 region_start: int, region_end: int, ref_start: int,
                 ref_end: int):
        self.reference_sequence = reference_sequence
        self.chromosome_name = chromosome_name
        self.region_start = region_start
        self.region_end = region_end
        self.ref_start = ref_start
        self.ref_end = ref_end
        n = region_end - region_start + 1
        self.allele_map = [set() for _ in range(n)]
        self.allele_frequency = defaultdict(int)

    # ---- read-allele accumulation (candidate_finder_hp.cpp:25-157) ----

    def add_read_alleles(self, batch: ReadBatch, r: int,
                         coverage: np.ndarray) -> None:
        seq_start = int(batch.seq_offsets[r])
        seq = batch.seq[seq_start:int(batch.seq_offsets[r + 1])]
        qual = batch.qual[seq_start:int(batch.seq_offsets[r + 1])]
        cigar = batch.read_cigar(r)
        ref = self.reference_sequence
        region_start, region_end = self.region_start, self.region_end
        ref_start, ref_end = self.ref_start, self.ref_end

        def record(candidate_key):
            self.allele_frequency[candidate_key] += 1
            region_index = candidate_key[0] - region_start
            self.allele_map[region_index].add(candidate_key)

        read_index = 0
        ref_position = int(batch.pos[r])
        n_ops = len(cigar)
        for cigar_i, (op, length) in enumerate(cigar):
            if op in (OP_MATCH, OP_EQUAL, OP_DIFF):
                start_i = 0
                if ref_position < region_start:
                    start_i = min(region_start - ref_position, length)
                    read_index += start_i
                    ref_position += start_i
                for i in range(start_i, length):
                    reference_index = ref_position - ref_start
                    region_index = ref_position - region_start
                    base = chr(seq[read_index])
                    if (region_start <= ref_position <= region_end
                            and ref[reference_index] != base
                            and qual[read_index] >= MIN_BASE_QUALITY):
                        check_this_base = True
                        if i == length - 1 and cigar_i + 1 < n_ops:
                            next_op = cigar[cigar_i + 1][0]
                            if next_op in (OP_INS, OP_DEL):
                                coverage[region_index] += 1
                                check_this_base = False
                        if check_this_base:
                            record((ref_position, ref_position + 1,
                                    ref[reference_index], base, SNP_TYPE))
                            coverage[region_index] += 1
                    elif (ref_position <= region_end
                          and qual[read_index] >= MIN_BASE_QUALITY):
                        coverage[region_index] += 1
                    read_index += 1
                    ref_position += 1
            elif op == OP_INS:
                reference_index = ref_position - self.ref_start - 1
                if region_start <= ref_position - 1 <= region_end:
                    ref_base = self.reference_sequence[reference_index]
                    if read_index - 1 >= 0:
                        alt = seq[read_index - 1:read_index + length] \
                            .tobytes().decode()
                    else:
                        alt = ref_base + seq[read_index:read_index + length] \
                            .tobytes().decode()
                    record((ref_position - 1, ref_position, ref_base, alt,
                            INSERT_TYPE))
                read_index += length
            elif op == OP_DEL:
                reference_index = ref_position - self.ref_start - 1
                if (region_start <= ref_position - 1 <= region_end
                        and ref_position + length < ref_end):
                    ref_allele = ref[reference_index:
                                     reference_index + length + 1]
                    record((ref_position - 1, ref_position + length,
                            ref_allele, ref_allele[:1], DELETE_TYPE))
                ref_position += length
            elif op == OP_SOFT_CLIP:
                read_index += length
            elif op in (OP_REF_SKIP, OP_PAD):
                ref_position += length

    # ---- regression gate (candidate_finder_hp.cpp:159-219) ----

    @staticmethod
    def filter_candidate(candidate: HpCandidate, freq_based: bool,
                         freq: float) -> bool:
        allele_frequency = candidate.read_support / max(1.0,
                                                        float(candidate.depth))
        if freq_based:
            return allele_frequency >= freq
        allele_weight = max(candidate.alt_prob_h1, candidate.alt_prob_h2)
        R = ONTLinearRegression
        if candidate.allele.alt_type == SNP_TYPE:
            if allele_frequency < R.SNP_LOWER_FREQ_THRESHOLD:
                return False
            predicted = (allele_weight * R.SNP_ALLELE_WEIGHT_COEF
                         + candidate.non_ref_prob * R.SNP_NON_REF_PROB_COEF
                         + R.SNP_BIAS_TERM)
            return predicted >= R.SNP_THRESHOLD
        if candidate.allele.alt_type == INSERT_TYPE:
            if allele_frequency < R.IN_LOWER_FREQ_THRESHOLD:
                return False
            predicted = (allele_weight * R.INSERT_ALLELE_WEIGHT_COEF
                         + candidate.non_ref_prob
                         * R.INSERT_NON_REF_PROB_COEF + R.INSERT_BIAS_TERM)
            return predicted >= R.INSERT_THRESHOLD
        if candidate.allele.alt_type == DELETE_TYPE:
            if allele_frequency < R.DEL_LOWER_FREQ_THRESHOLD:
                return False
            predicted = (allele_weight * R.DELETE_ALLELE_WEIGHT_COEF
                         + candidate.non_ref_prob
                         * R.DELETE_NON_REF_PROB_COEF + R.DELETE_BIAS_TERM)
            return predicted >= R.DELETE_THRESHOLD
        return False

    # ---- main (candidate_finder_hp.cpp:222-521) ----

    def find_candidates(self, batch: ReadBatch, positions, indices,
                        base_predictions_h1, base_predictions_h2,
                        freq_based: bool = False, freq: float = 0.0):
        positions = np.asarray(positions, np.int64)
        indices = np.asarray(indices, np.int64)
        base_predictions_h1 = np.asarray(base_predictions_h1, np.int64)
        base_predictions_h2 = np.asarray(base_predictions_h2, np.int64)

        valid = positions >= 0
        local_region_start = int(positions[valid].min())
        local_region_end = int(positions[valid].max())
        local_size = local_region_end - local_region_start + 1

        max_observed_insert = np.zeros(local_size + 1, np.int64)
        for pos, index in zip(positions[valid], indices[valid]):
            offset = pos - local_region_start
            max_observed_insert[offset] = max(max_observed_insert[offset],
                                              index)
        cumulative = np.zeros(local_size + 1, np.int64)
        cumulative[1:] = np.cumsum(max_observed_insert[:-1])
        total_insert = int(max_observed_insert.sum())

        pred_h1 = np.zeros((local_size + total_insert + 1, 5), np.int64)
        pred_h2 = np.zeros_like(pred_h1)
        for i in range(len(positions)):
            if positions[i] < 0:
                continue
            offset = positions[i] - local_region_start
            position_index = int(offset + cumulative[offset] + indices[i])
            pred_h1[position_index] = base_predictions_h1[i]
            pred_h2[position_index] = base_predictions_h2[i]

        def sums(pred, position_index):
            return max(1.0, float(pred[position_index].sum()))

        coverage = np.zeros(self.region_end - self.region_start + 1,
                            np.int64)
        for r in range(batch.n_reads):
            self.add_read_alleles(batch, r, coverage)

        all_records = []
        for i in range(len(coverage)):
            allele_end = 1
            max_del_length = 0
            for key in self.allele_map[i]:
                support = self.allele_frequency[key]
                freq_can = (100.0 * support / coverage[i]
                            if coverage[i] > 0 else 0.0)
                if (freq_can >= FREQ_THRESHOLD
                        and support >= MIN_COUNT_THRESHOLD
                        and key[4] == DELETE_TYPE):
                    allele_end = max(allele_end, len(key[2]))
                    max_del_length = max(max_del_length, len(key[2]))

            record = PositionalCandidateRecord(
                chromosome_name=self.chromosome_name,
                pos_start=self.region_start + i,
                pos_end=self.region_start + i + allele_end)
            candidate_found = False

            for key in sorted(self.allele_map[i]):
                pos, pos_end, ref_allele, alt_allele, alt_type = key
                if pos > local_region_end or pos < local_region_start:
                    continue
                support = self.allele_frequency[key]
                alt_freq = int(100.0 * support / max(1.0,
                                                     float(coverage[i])))
                if (alt_freq < FREQ_THRESHOLD
                        or support < MIN_COUNT_THRESHOLD):
                    continue
                candidate_found = True
                candidate = HpCandidate(
                    pos=pos, pos_end=pos_end,
                    allele=HpAllele(ref_allele, alt_allele, alt_type),
                    depth=int(coverage[i]), read_support=support)

                offset = pos - local_region_start
                if alt_type == SNP_TYPE:
                    position_index = int(offset + cumulative[offset])
                    alt_index = get_index_from_base(alt_allele[0])
                    prob_alt_h1 = (pred_h1[position_index][alt_index]
                                   / sums(pred_h1, position_index))
                    prob_alt_h2 = (pred_h2[position_index][alt_index]
                                   / sums(pred_h2, position_index))
                    non_ref_prob = 0.0
                    for index in range(int(max_observed_insert[offset]) + 1):
                        if index == 0:
                            ref_index = get_index_from_base(ref_allele[0])
                        else:
                            ref_index = get_index_from_base("*")
                        position_index = int(offset + cumulative[offset]
                                             + index)
                        s1 = sums(pred_h1, position_index)
                        s2 = sums(pred_h2, position_index)
                        non_ref_h1 = (s1 - pred_h1[position_index][ref_index]) / s1
                        non_ref_h2 = (s2 - pred_h2[position_index][ref_index]) / s2
                        non_ref_prob = max(non_ref_prob, non_ref_h1,
                                           non_ref_h2)
                    candidate.alt_prob_h1 = max(0.0001, prob_alt_h1)
                    candidate.alt_prob_h2 = max(0.0001, prob_alt_h2)
                    candidate.non_ref_prob = non_ref_prob
                elif alt_type == INSERT_TYPE:
                    alt_prob_h1 = alt_prob_h2 = 1.0
                    for index in range(1,
                                       int(max_observed_insert[offset]) + 1):
                        if index < len(alt_allele):
                            alt_index = get_index_from_base(alt_allele[index])
                        else:
                            alt_index = get_index_from_base("*")
                        position_index = int(offset + cumulative[offset]
                                             + index)
                        s1 = sums(pred_h1, position_index)
                        s2 = sums(pred_h2, position_index)
                        p1 = (pred_h1[position_index][alt_index] + 0.1) / s1
                        p2 = (pred_h2[position_index][alt_index] + 0.1) / s2
                        alt_prob_h1 *= max(0.0001, p1)
                        alt_prob_h2 *= max(0.0001, p2)
                    candidate.alt_prob_h1 = max(0.0001, alt_prob_h1)
                    candidate.alt_prob_h2 = max(0.0001, alt_prob_h2)
                    non_ref_h1 = non_ref_h2 = 0.0
                    length = 0
                    upper = min(int(max_observed_insert[offset]),
                                len(alt_allele) - 1)
                    for index in range(upper + 1):
                        if index == 0:
                            ref_index = get_index_from_base(ref_allele[0])
                        else:
                            ref_index = get_index_from_base("*")
                        position_index = int(offset + cumulative[offset]
                                             + index)
                        s1 = sums(pred_h1, position_index)
                        s2 = sums(pred_h2, position_index)
                        non_ref_h1 += (s1 - pred_h1[position_index][ref_index]) / s1
                        non_ref_h2 += (s2 - pred_h2[position_index][ref_index]) / s2
                        length += 1
                    candidate.non_ref_prob = max(
                        non_ref_h1 / max(1, length),
                        non_ref_h2 / max(1, length))
                else:  # DELETE
                    alt_prob_h1 = alt_prob_h2 = 1.0
                    non_ref_h1 = non_ref_h2 = 0.0
                    non_ref_length = 0.0
                    for del_pos in range(pos, pos + max_del_length):
                        in_allele = pos < del_pos < pos_end
                        del_offset = del_pos - local_region_start
                        position_index = int(del_offset
                                             + cumulative[del_offset])
                        s1 = sums(pred_h1, position_index)
                        s2 = sums(pred_h2, position_index)
                        if in_allele:
                            ref_index = get_index_from_base(
                                ref_allele[del_pos - pos])
                            non_ref_h1 += (s1 - pred_h1[position_index][ref_index]) / s1
                            non_ref_h2 += (s2 - pred_h2[position_index][ref_index]) / s2
                            non_ref_length += 1.0
                            star = get_index_from_base("*")
                            p1 = (pred_h1[position_index][star] + 0.1) / s1
                            p2 = (pred_h2[position_index][star] + 0.1) / s2
                            best = max(0.0001, max(p1, p2))
                            alt_prob_h1 *= best
                            alt_prob_h2 *= best
                        elif del_pos >= pos_end:
                            star = get_index_from_base("*")
                            p1 = (s1 - pred_h1[position_index][star]) / s1
                            p2 = (s2 - pred_h2[position_index][star]) / s2
                            alt_prob_h1 *= max(0.0001, p1)
                            alt_prob_h2 *= max(0.0001, p2)
                    candidate.alt_prob_h1 = max(1e-7, alt_prob_h1)
                    candidate.alt_prob_h2 = max(1e-7, alt_prob_h2)
                    candidate.non_ref_prob = max(
                        non_ref_h1 / max(1.0, non_ref_length),
                        non_ref_h2 / max(1.0, non_ref_length))

                if self.filter_candidate(candidate, freq_based, freq):
                    record.candidates.append(candidate)

            if candidate_found:
                all_records.append(record)
        return all_records
