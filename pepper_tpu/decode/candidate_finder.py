"""Post-prediction candidate decoding.

Semantics-exact re-implementation of the reference's CandidateFinder.py
(small_chunk_stitch :356-529 and find_candidates :532-581): homopolymer
repeat annotation of +-10bp reference context, argmax genotyping, per-type
p-value gates with low-complexity overrides and VAF-based overrides, and
the positional dedup + sort that makes multi-worker decode deterministic.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

ACGT = ("A", "C", "G", "T")


@dataclass
class CandidatePrediction:
    """One classified candidate window (CandidateImagePrediction
    equivalent, region_summary.h:114-136)."""

    contig: str
    position: int
    depth: int
    candidates: list[str]
    candidate_frequency: list[int]
    prediction_base: np.ndarray      # (3,) float probabilities


def repeat_annotation(sequence: str, kmer_size: int) -> list[int]:
    """Per-base max k-mer repeat counts (CandidateFinder.py:279-297)."""
    max_observed = [1] * len(sequence)
    for i in range(len(sequence) - (kmer_size - 1)):
        kmer_count = 0
        end_index = i + (kmer_size - 1)
        for j in range(i, len(sequence), kmer_size):
            if sequence[i:i + kmer_size] == sequence[j:j + kmer_size]:
                kmer_count += 1
            else:
                break
            end_index = j + kmer_size
        for k in range(i, min(len(sequence), end_index)):
            max_observed[k] = max(max_observed[k], kmer_count)
    return max_observed


def _homopolymer_run_lengths(sequence: str) -> np.ndarray:
    """Per-position run length of the homopolymer containing that base —
    equal to repeat_annotation(sequence, 1) (run containing i dominates),
    vectorized."""
    if not sequence:
        return np.zeros(0, np.int64)
    codes = np.frombuffer(sequence.encode("latin-1"), np.uint8)
    boundaries = np.flatnonzero(np.diff(codes) != 0) + 1
    starts = np.concatenate([[0], boundaries])
    lengths = np.diff(np.concatenate([starts, [len(codes)]]))
    return np.repeat(lengths, lengths)


def _candidate_context(fasta, contig: str, position: int):
    """One fetch of the +-10bp context -> (ref_base, downstream, upstream)
    — same strings as the reference's three fetches
    (CandidateFinder.py:393-397)."""
    start = max(0, position - 10)
    window = fasta.get_reference_sequence(contig, start,
                                          position + 10).upper()
    split = position - start
    downstream = window[:split]
    upstream = window[split:]
    ref_base = upstream[:1]
    return ref_base, downstream, upstream


_CONTEXT_TILE = 1 << 20


def _contexts_bulk(fasta, candidates):
    """(ref_base, downstream, upstream) per candidate — identical strings to
    per-candidate `_candidate_context` calls, but fetched as 1Mb reference
    tiles: candidates are visited in (contig, position) order so each tile
    is fetched once, while results land at the original indices (decode
    output order is part of the dedup contract in `find_candidates`)."""
    contexts = [None] * len(candidates)
    order = sorted(range(len(candidates)),
                   key=lambda i: (candidates[i].contig,
                                  candidates[i].position))
    tile_contig, tile_start, tile_stop, tile_seq = None, 0, 0, ""
    contig_len = 0
    for i in order:
        candidate = candidates[i]
        lo = max(0, candidate.position - 10)
        hi = candidate.position + 10
        if candidate.contig != tile_contig:
            contig_len = fasta.get_chromosome_sequence_length(
                candidate.contig)
            tile_contig, tile_seq = candidate.contig, ""
            tile_start = tile_stop = 0
        hi = min(hi, contig_len)
        if lo < tile_start or hi > tile_stop:
            tile_start = lo
            tile_stop = min(lo + _CONTEXT_TILE, contig_len)
            tile_seq = fasta.get_reference_sequence(
                candidate.contig, tile_start, tile_stop).upper()
        window = tile_seq[lo - tile_start:hi - tile_start]
        split = candidate.position - lo
        contexts[i] = (window[split:split + 1], window[:split],
                       window[split:])
    return contexts


def candidate_in_homopolymer(fasta, contig: str, position: int) -> bool:
    """In-repeat <=> homopolymer run >= 5 within the +-(5,4) neighborhood
    (CandidateFinder.py:393-416)."""
    _, downstream, upstream = _candidate_context(fasta, contig, position)
    return _in_homopolymer(downstream, upstream)


def _in_homopolymer(downstream: str, upstream: str) -> bool:
    # equivalent to max(_homopolymer_run_lengths(seq)[down:up]) >= 5 but
    # scalar (numpy overhead dominates on 20-char windows): scan runs and
    # test overlap with the [down, up) neighborhood
    full_sequence = downstream + upstream
    n = len(full_sequence)
    if n == 0:
        return False
    position_index = len(downstream)
    upward = min(n, position_index + 4)
    downward = max(0, position_index - 5)
    run_start = 0
    prev = full_sequence[0]
    for i in range(1, n + 1):
        if i == n or full_sequence[i] != prev:
            if i - run_start >= 5 and run_start < upward and i > downward:
                return True
            if i < n:
                run_start = i
                prev = full_sequence[i]
    return False


_ACGT_SET = frozenset("ACGT")


def _valid_allele(allele: str) -> bool:
    return _ACGT_SET.issuperset(allele.upper())


def _annotate_bulk(fasta, candidates):
    """(in_repeat bool array, ref_code uint8 array) per candidate —
    identical decisions to per-candidate `candidate_in_homopolymer` +
    `_candidate_context` ref_base calls, but computed vectorized per
    fixed-grid 1Mb reference tile (tiles overlap 32bp so every +-10bp
    window is interior): run start/end arrays come from one boundary
    scan, and the reference's window truncation (runs measured inside the
    +-10bp fetch, CandidateFinder.py:393-416) is the min/max clamp
    against the window bounds — a run clipped at a tile edge clamps to
    the same w0/w1 bound either way, so grid tiling is decision-exact.
    ref_code is the uppercased reference base byte (0 where the position
    is out of range)."""
    n = len(candidates)
    in_repeat = np.zeros(n, bool)
    ref_codes = np.zeros(n, np.uint8)

    by_contig: dict = {}
    for i, candidate in enumerate(candidates):
        by_contig.setdefault(candidate.contig, []).append(i)

    offsets = np.arange(-5, 4)
    for contig, idx_list in by_contig.items():
        contig_len = fasta.get_chromosome_sequence_length(contig)
        indices = np.asarray(idx_list, np.int64)
        pos = np.asarray([candidates[i].position for i in idx_list],
                         np.int64)
        lo = np.maximum(0, pos - 10)
        tile_ids = lo // _CONTEXT_TILE
        for tile in np.unique(tile_ids):
            tile_start = int(tile) * _CONTEXT_TILE
            tile_stop = min(tile_start + _CONTEXT_TILE + 32, contig_len)
            if tile_start >= tile_stop:
                continue
            tile_seq = fasta.get_reference_sequence(
                contig, tile_start, tile_stop).upper()
            codes = np.frombuffer(tile_seq.encode("latin-1"), np.uint8)
            if len(codes):
                boundaries = np.flatnonzero(np.diff(codes) != 0) + 1
                starts = np.concatenate([[0], boundaries])
                lengths = np.diff(np.concatenate([starts, [len(codes)]]))
                run_start = np.repeat(starts, lengths) + tile_start
                run_end = np.repeat(starts + lengths, lengths) + tile_start
            else:
                run_start = run_end = np.zeros(1, np.int64)

            sel = tile_ids == tile
            p = pos[sel]
            w0 = np.maximum(0, p - 10)
            w1 = np.minimum(contig_len, p + 10)
            window = p[:, None] + offsets[None, :]
            valid = (window >= 0) & (window < w1[:, None])
            local = np.clip(window - tile_start, 0, len(run_start) - 1)
            truncated = (np.minimum(run_end[local], w1[:, None])
                         - np.maximum(run_start[local], w0[:, None]))
            in_repeat[indices[sel]] = ((truncated >= 5) & valid).any(axis=1)
            local_pos = p - tile_start
            in_tile = (local_pos >= 0) & (local_pos < len(codes))
            ref_codes[indices[sel][in_tile]] = codes[local_pos[in_tile]]
    return in_repeat, ref_codes


def _native_decode_module():
    """The _pepper_decode extension, or None (unbuildable / forced off
    with PEPPER_PY_DECODE=1)."""
    import os

    if os.environ.get("PEPPER_PY_DECODE") == "1":
        return None
    try:
        from ..io.native_vcfemit import get_decode_module

        return get_decode_module()
    except Exception:
        return None


def decode_predictions(options, predictions, fasta):
    """Turn classified candidates into Margin (SNP-only) and DeepVariant
    (re-genotyping) candidate lists (CandidateFinder.py:391-529).

    Two engines share the annotation pass: the native gate/list pass
    (_pepper_decode, default) and the pure-Python loop below
    (PEPPER_PY_DECODE=1); they must produce identical lists
    (tests/test_decode.py fuzz)."""
    native = _native_decode_module()
    if native is not None:
        in_repeat_all, ref_codes = _annotate_bulk(fasta, predictions)
        # non-ACGT reference bases mark the candidate skipped (code 0)
        acgt = np.isin(ref_codes, (65, 67, 71, 84))
        ref_codes = np.where(acgt, ref_codes, 0).astype(np.uint8)
        params = (float(options.snp_p_value), float(options.insert_p_value),
                  float(options.delete_p_value),
                  float(options.snp_p_value_in_lc),
                  float(options.insert_p_value_in_lc),
                  float(options.delete_p_value_in_lc),
                  float(options.report_snp_above_freq),
                  float(options.report_indel_above_freq))
        return native.decode_chunk(predictions, ref_codes,
                                   np.ascontiguousarray(in_repeat_all,
                                                        np.uint8), params)
    return _decode_predictions_py(options, predictions, fasta)


def _decode_predictions_py(options, predictions, fasta):
    """Pure-Python decode engine (the semantic golden spec)."""
    margin_list = []
    deepvariant_list = []
    in_repeat_all, ref_codes = _annotate_bulk(fasta, predictions)
    for index, candidate in enumerate(predictions):
        reference_base = chr(ref_codes[index]) if ref_codes[index] else ""
        in_repeat = bool(in_repeat_all[index])
        if reference_base not in ACGT:
            continue

        prediction_base = np.asarray(candidate.prediction_base, np.float64)
        p0, p1, p2 = prediction_base.tolist()
        # scalar argmax over the 3-class vector (np.argmax dominates at
        # this size); ties resolve to the lowest index like np.argmax
        if p0 >= p1 and p0 >= p2:
            predicted_genotype = 0
        elif p1 >= p2:
            predicted_genotype = 1
        else:
            predicted_genotype = 2
        genotype = ([0, 0], [0, 1], [1, 1])[predicted_genotype]
        prediction_value = (p0, p1, p2)[predicted_genotype]

        # validate each allele once; both lists below share the result
        valid_candidates = [
            (alt_allele[0], alt_allele[1:], frequency)
            for alt_allele, frequency in zip(candidate.candidates,
                                             candidate.candidate_frequency)
            if _valid_allele(alt_allele[1:])]

        # ---- Margin (phasing) list: SNPs only ----
        alt_alleles, supports = [], []
        for alt_type, allele, frequency in valid_candidates:
            if alt_type == "1" and predicted_genotype != 0:
                alt_alleles.append(allele)
                supports.append(frequency)
        if alt_alleles:
            margin_list.append((
                candidate.contig, candidate.position, candidate.position + 1,
                reference_base, alt_alleles, genotype, candidate.depth,
                supports, prediction_value, prediction_base))

        # ---- DeepVariant (re-genotyping) list ----
        alt_alleles, supports = [], []
        reference_allele = reference_base
        non_alt_predictions = []
        non_alt = p1 if p1 >= p2 else p2
        for alt_type, allele, frequency in valid_candidates:
            # depth<=0 (fully filtered column) -> VAF 0, matching the
            # native engine; neither engine may divide by zero here
            vaf = (float(frequency) / float(candidate.depth)
                   if candidate.depth > 0 else 0.0)
            non_alt_predictions.append(non_alt)
            if alt_type == "1":
                if not in_repeat and non_alt >= options.snp_p_value:
                    alt_alleles.append(allele)
                    supports.append(frequency)
                elif in_repeat and non_alt >= options.snp_p_value_in_lc:
                    alt_alleles.append(allele)
                    supports.append(frequency)
                elif 0 < options.report_snp_above_freq <= vaf:
                    alt_alleles.append(allele)
                    supports.append(frequency)
            elif alt_type == "2":
                if not in_repeat and non_alt >= options.insert_p_value:
                    alt_alleles.append(allele)
                    supports.append(frequency)
                elif in_repeat and non_alt >= options.insert_p_value_in_lc:
                    alt_alleles.append(allele)
                    supports.append(frequency)
                elif 0 < options.report_indel_above_freq <= vaf:
                    alt_alleles.append(allele)
                    supports.append(frequency)
            elif alt_type == "3":
                if not in_repeat and non_alt >= options.delete_p_value:
                    alt_alleles.append(reference_allele)
                    reference_allele = allele
                    supports.append(frequency)
                elif in_repeat and non_alt >= options.delete_p_value_in_lc:
                    alt_alleles.append(reference_allele)
                    reference_allele = allele
                    supports.append(frequency)
                elif 0 < options.report_indel_above_freq <= vaf:
                    # quirk preserved: the VAF-override path appends the
                    # deleted ref sequence as the alt (CandidateFinder.py:518-520)
                    alt_alleles.append(allele)
                    supports.append(frequency)
        if alt_alleles:
            deepvariant_list.append((
                candidate.contig, candidate.position,
                candidate.position + len(reference_allele), reference_allele,
                alt_alleles, genotype, candidate.depth, supports,
                prediction_value, prediction_base, non_alt_predictions,
                in_repeat))

    return margin_list, deepvariant_list


_decode_fasta_handles = {}


def _decode_worker(args):
    """Decode worker (one process): chunk of predictions -> (margin, dv)
    lists.  Opens (and caches) its own FASTA handle, keyed by PID: a handle
    inherited across fork() shares the parent's open file description, so
    two children reading through it race on the shared file offset."""
    import os

    options, fasta_path, chunk = args
    key = (os.getpid(), fasta_path)
    if key not in _decode_fasta_handles:
        from ..io.fasta import FastaReader
        _decode_fasta_handles.clear()
        _decode_fasta_handles[key] = FastaReader(fasta_path)
    return decode_predictions(options, chunk, _decode_fasta_handles[key])


DECODE_CHUNK = 16384


def decode_predictions_parallel(options, predictions, fasta_path,
                                threads: int, pool=None,
                                chunk_size: int = DECODE_CHUNK):
    """Process-parallel `decode_predictions` (the reference fans decode out
    over a ProcessPoolExecutor, CandidateFinder.py:537-539).  Bit-identical
    to the sequential call: decode is a pure per-candidate function, chunks
    are concatenated in submission order, and the stable sort inside
    `find_candidates` sees the exact same candidate order.

    Pass `pool` to reuse an existing ProcessPoolExecutor."""
    import concurrent.futures

    chunks = [predictions[i:i + chunk_size]
              for i in range(0, len(predictions), chunk_size)]
    if threads <= 1 or len(chunks) <= 1:
        from ..io.fasta import FastaReader
        return decode_predictions(options, predictions,
                                  FastaReader(fasta_path))
    tasks = [(options, fasta_path, chunk) for chunk in chunks]
    margin_list, deepvariant_list = [], []
    if pool is None:
        with concurrent.futures.ProcessPoolExecutor(
                max_workers=threads) as own_pool:
            results = list(own_pool.map(_decode_worker, tasks))
    else:
        results = list(pool.map(_decode_worker, tasks))
    for margin, deepvariant in results:
        margin_list.extend(margin)
        deepvariant_list.extend(deepvariant)
    return margin_list, deepvariant_list


def find_candidates(margin_candidates, deepvariant_candidates):
    """Deterministic merge: global sort + positional (ref, alt) dedup
    (CandidateFinder.py:549-581)."""
    margin_candidates = sorted(margin_candidates,
                               key=lambda x: (x[0], x[1]))
    deepvariant_candidates = sorted(deepvariant_candidates,
                                    key=lambda x: (x[0], x[1]))

    margin_dict = defaultdict(list)
    margin_alts = defaultdict(list)
    for candidate in margin_candidates:
        key = (candidate[0], candidate[1])
        ref_alt = (candidate[3], candidate[4][0])
        if ref_alt in margin_alts[key]:
            continue
        margin_alts[key].append(ref_alt)
        margin_dict[key].append(candidate)

    contigs = []
    dv_dict = defaultdict(list)
    dv_alts = defaultdict(list)
    for candidate in deepvariant_candidates:
        if candidate[0] not in contigs:
            contigs.append(candidate[0])
        key = (candidate[0], candidate[1])
        ref_alt = (candidate[3], candidate[4][0])
        if ref_alt in dv_alts[key]:
            continue
        dv_alts[key].append(ref_alt)
        dv_dict[key].append(candidate)

    return contigs, margin_dict, dv_dict
