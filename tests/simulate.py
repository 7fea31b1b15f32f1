"""Haplotype-aware read simulator for end-to-end tests: builds BamRecords
with correct CIGARs from a reference plus a variant list."""

from __future__ import annotations

import numpy as np

from pepper_tpu.io.bam_writer import BamRecord


def apply_variants(ref: str, variants):
    """variants: list of (pos, ref_allele, alt_allele) 0-based, VCF-style
    (indels anchored).  Returns segment list [(ref_pos, ref_len, alt_seq)]
    covering the genome in order."""
    segments = []
    cursor = 0
    for pos, ref_allele, alt_allele in sorted(variants):
        if cursor < pos:
            segments.append((cursor, pos - cursor, ref[cursor:pos]))
        segments.append((pos, len(ref_allele), alt_allele))
        cursor = pos + len(ref_allele)
    if cursor < len(ref):
        segments.append((cursor, len(ref) - cursor, ref[cursor:]))
    return segments


def read_from_haplotype(ref: str, segments, ref_start: int, ref_span: int,
                        seg_positions=None):
    """Extract (seq, cigar) for a read covering reference coordinates
    [ref_start, ref_start+ref_span).  seg_positions: optional precomputed
    [seg[0] for seg in segments] to make the overlap seek O(log n)."""
    import bisect

    ref_end = ref_start + ref_span
    seq_parts = []
    cigar_parts = []

    def add_cigar(op, length):
        if length <= 0:
            return
        if cigar_parts and cigar_parts[-1][0] == op:
            cigar_parts[-1][1] += length
        else:
            cigar_parts.append([op, length])

    if seg_positions is None:
        seg_positions = [s[0] for s in segments]
    # segments are position-sorted; skip straight to the first overlap
    first = max(0, bisect.bisect_right(seg_positions, ref_start) - 1)
    for seg_pos, seg_ref_len, seg_alt in segments[first:]:
        if seg_pos >= ref_end:
            break
        seg_end = seg_pos + seg_ref_len
        if seg_end <= ref_start or seg_pos >= ref_end:
            continue
        if seg_ref_len == len(seg_alt):
            # match segment (possibly SNP): clip to read bounds
            lo = max(seg_pos, ref_start)
            hi = min(seg_end, ref_end)
            seq_parts.append(seg_alt[lo - seg_pos:hi - seg_pos])
            add_cigar("M", hi - lo)
        elif seg_ref_len < len(seg_alt):
            # insertion (anchored: first base matches ref anchor)
            if seg_pos < ref_start or seg_end > ref_end:
                # read boundary cuts the event: emit anchor matches only
                lo = max(seg_pos, ref_start)
                hi = min(seg_end, ref_end)
                seq_parts.append(seg_alt[lo - seg_pos:hi - seg_pos])
                add_cigar("M", hi - lo)
            else:
                seq_parts.append(seg_alt[0])
                add_cigar("M", 1)
                seq_parts.append(seg_alt[1:])
                add_cigar("I", len(seg_alt) - 1)
                add_cigar("M", seg_ref_len - 1)  # 0 for standard insertion
        else:
            # deletion: anchor base + deleted span
            if seg_pos < ref_start or seg_end > ref_end:
                lo = max(seg_pos, ref_start)
                hi = min(seg_end, ref_end)
                if seg_pos >= ref_start:
                    seq_parts.append(seg_alt)
                    add_cigar("M", len(seg_alt))
                    add_cigar("D", hi - (seg_pos + len(seg_alt)))
                else:
                    add_cigar("D", hi - lo)
            else:
                seq_parts.append(seg_alt)
                add_cigar("M", len(seg_alt))
                add_cigar("D", seg_ref_len - len(seg_alt))
    seq = "".join(seq_parts)
    cigar = "".join(f"{length}{op}" for op, length in cigar_parts)
    return seq, cigar


def simulate_reads(ref: str, haplotypes, read_len=300, stride=50, mapq=60,
                   qual=30, name_prefix="sim", strides=None,
                   error_rate=0.0, error_seed=1234):
    """Tile reads across the genome alternating haplotypes/strands.
    strides: optional per-haplotype stride list (coverage weighting).
    error_rate: per-base substitution error probability (sequencing
    noise), with low quality (7) at the erroneous bases."""
    records = []
    count = 0
    error_rng = np.random.RandomState(error_seed)
    for hap_index, variants in enumerate(haplotypes):
        segments = apply_variants(ref, variants)
        seg_positions = [s[0] for s in segments]
        hap_stride = strides[hap_index] if strides else stride
        for start in range(0, len(ref) - read_len + 1, hap_stride):
            seq, cigar = read_from_haplotype(ref, segments, start, read_len,
                                             seg_positions)
            quals = [qual] * len(seq)
            if error_rate > 0:
                seq_list = list(seq)
                n_errors = error_rng.binomial(len(seq), error_rate)
                for idx in error_rng.randint(0, len(seq), size=n_errors):
                    seq_list[idx] = "ACGT"[error_rng.randint(4)]
                    quals[idx] = 7
                seq = "".join(seq_list)
            flag = 0x10 if count % 2 else 0
            records.append(BamRecord(
                name=f"{name_prefix}_{hap_index}_{count}", ref_id=0,
                pos=start, mapq=mapq, cigar=cigar, seq=seq,
                qual=quals, flag=flag,
                hp=(hap_index + 1) if hap_index < 2 else 0))
            count += 1
    records.sort(key=lambda r: r.pos)
    return records


def random_reference(length=2000, seed=11):
    rng = np.random.RandomState(seed)
    return "".join("ACGT"[i] for i in rng.randint(0, 4, size=length))


def write_truth_vcf(path: str, contig: str, contig_len: int, variants):
    """variants: list of (pos, ref, alt, gt_string like '0|1')."""
    lines = [
        "##fileformat=VCFv4.2",
        '##FILTER=<ID=PASS,Description="All filters passed">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        f"##contig=<ID={contig},length={contig_len}>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsample",
    ]
    for pos, ref_allele, alt_allele, gt in sorted(variants):
        lines.append(f"{contig}\t{pos + 1}\t.\t{ref_allele}\t{alt_allele}"
                     f"\t60\tPASS\t.\tGT\t{gt}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
