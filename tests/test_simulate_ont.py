"""The ONT-realistic read-error model (simulate.apply_ont_errors): CIGAR
consistency, homopolymer-concentrated indels, strand bias and
quality/error correlation — the error regime behind the reference's
published INDEL F1 of 0.77-0.88
(docs/pipeline_docker/ONT_variant_calling.md:149-154)."""

import numpy as np

from simulate import (
    _parse_cigar,
    reference_with_homopolymers,
    simulate_reads,
)


def _stats(ref, records):
    subs = ins = dels = total = 0
    for r in records:
        read_pos, genome_pos = 0, r.pos
        for op, length in _parse_cigar(r.cigar):
            if op == "M":
                subs += sum(1 for k in range(length)
                            if r.seq[read_pos + k] != ref[genome_pos + k])
                read_pos += length
                genome_pos += length
            elif op == "I":
                ins += length
                read_pos += length
            elif op == "D":
                dels += length
                genome_pos += length
        total += len(r.seq)
    return subs, ins, dels, total


def test_ont_reads_consistent_and_err_rates():
    ref, _ = reference_with_homopolymers(120_000, seed=3, run_every=900)
    records = simulate_reads(ref, [[], []], read_len=1500, stride=400,
                             error_model="ont")
    assert len(records) > 100
    for r in records:
        parts = _parse_cigar(r.cigar)
        read_len = sum(length for op, length in parts if op in "MI")
        assert read_len == len(r.seq)
        assert len(r.qual) == len(r.seq)
    subs, ins, dels, total = _stats(ref, records)
    # ONT-class totals: ~1-2% subs, ~0.5-1.5% ins, ~1-2.5% del
    assert 0.008 < subs / total < 0.025
    assert 0.003 < ins / total < 0.02
    assert 0.008 < dels / total < 0.03


def test_ont_indels_concentrate_in_homopolymers():
    ref, _ = reference_with_homopolymers(120_000, seed=5, run_every=700)
    records = simulate_reads(ref, [[], []], read_len=1500, stride=300,
                             error_model="ont")
    codes = np.frombuffer(ref.encode(), np.uint8)
    boundaries = np.flatnonzero(np.diff(codes) != 0) + 1
    starts = np.concatenate([[0], boundaries])
    lengths = np.diff(np.concatenate([starts, [len(codes)]]))
    run_mask = np.zeros(len(ref), bool)
    for s, ln in zip(starts, lengths):
        if ln >= 5:
            run_mask[s:s + ln] = True
    in_bases = out_bases = in_dels = out_dels = 0
    for r in records:
        genome_pos = r.pos
        for op, length in _parse_cigar(r.cigar):
            if op == "M":
                hp = int(run_mask[genome_pos:genome_pos + length].sum())
                in_bases += hp
                out_bases += length - hp
                genome_pos += length
            elif op == "D":
                hp = int(run_mask[genome_pos:genome_pos + length].sum())
                in_dels += hp
                out_dels += length - hp
                genome_pos += length
    rate_in = in_dels / max(1, in_bases)
    rate_out = out_dels / max(1, out_bases)
    assert rate_in > 3 * rate_out  # measured ~6x


def test_ont_strand_bias_and_qual_correlation():
    ref, _ = reference_with_homopolymers(120_000, seed=7, run_every=900)
    records = simulate_reads(ref, [[], []], read_len=1500, stride=300,
                             error_model="ont")
    fwd = [r for r in records if not (r.flag & 0x10)]
    rev = [r for r in records if r.flag & 0x10]
    sf, _, _, tf = _stats(ref, fwd)
    sr, _, _, tr = _stats(ref, rev)
    assert sr / tr > 1.2 * (sf / tf)  # configured 1.5x

    qual_err, qual_ok = [], []
    for r in records[:60]:
        read_pos, genome_pos = 0, r.pos
        for op, length in _parse_cigar(r.cigar):
            if op == "M":
                for k in range(length):
                    bucket = (qual_err
                              if r.seq[read_pos + k] != ref[genome_pos + k]
                              else qual_ok)
                    bucket.append(r.qual[read_pos + k])
                read_pos += length
                genome_pos += length
            elif op == "I":
                read_pos += length
            elif op == "D":
                genome_pos += length
    assert np.mean(qual_err) < np.mean(qual_ok) - 8


def test_uniform_model_unchanged():
    """The default error_model stays the uniform-substitution process
    (existing tests and harnesses depend on its exact RNG stream)."""
    ref = reference_with_homopolymers(50_000, seed=9)[0]
    a = simulate_reads(ref, [[]], read_len=500, stride=200,
                       error_rate=0.03, error_seed=42)
    b = simulate_reads(ref, [[]], read_len=500, stride=200,
                       error_rate=0.03, error_seed=42)
    assert [r.seq for r in a] == [r.seq for r in b]
    assert all("D" not in r.cigar and "I" not in r.cigar for r in a)


def test_str_indels_concentrate_in_tandem_repeats():
    """Under ONT_STR_PARAMS, indel errors concentrate in di/tri-nt tandem
    repeats (copy-count-scaled), the reference's hardest documented
    failure context (Oxford_nanopore_r9_whole_genome.md:40-43)."""
    from simulate import ONT_STR_PARAMS, reference_with_repeats

    ref, hp_runs, str_runs = reference_with_repeats(150_000, seed=5,
                                                    run_every=1200,
                                                    str_every=1200)
    assert len(str_runs) > 40
    records = simulate_reads(ref, [[], []], read_len=1500, stride=300,
                             error_model="ont", ont_params=ONT_STR_PARAMS)

    in_str = np.zeros(len(ref), bool)
    for s, unit_len, copies in str_runs:
        in_str[s:s + unit_len * copies] = True
    in_hp = np.zeros(len(ref), bool)
    for s, run_len, _ in hp_runs:
        in_hp[s:s + run_len] = True

    indels_str = indels_out = 0
    bases_str = bases_out = 0
    for r in records:
        genome_pos = r.pos
        for op, length in _parse_cigar(r.cigar):
            if op in ("M", "D"):
                for k in range(length):
                    p = genome_pos + k
                    if in_hp[p]:
                        continue  # exclude HP context from both sides
                    if in_str[p]:
                        bases_str += 1
                        indels_str += (op == "D")
                    else:
                        bases_out += 1
                        indels_out += (op == "D")
                genome_pos += length
    rate_str = indels_str / max(1, bases_str)
    rate_out = indels_out / max(1, bases_out)
    assert rate_str > 3.0 * rate_out, (rate_str, rate_out)


def test_coverage_dropout_regions():
    """Reads starting inside a dropout window survive with keep_prob."""
    ref, _ = reference_with_homopolymers(60_000, seed=9, run_every=2000)
    dropout = [(20_000, 24_000, 0.25)]
    records = simulate_reads(ref, [[], []], read_len=1000, stride=100,
                             dropout_regions=dropout)
    in_window = [r for r in records if 20_000 <= r.pos < 24_000]
    outside = [r for r in records if 30_000 <= r.pos < 34_000]
    # ~25% survive in the window vs full tiling outside
    assert len(in_window) < 0.5 * len(outside)
    assert len(in_window) > 0


def test_ont_str_genome_builder(tmp_path):
    """build_mixed_genome(error_model='ont_str') plants STRs with
    repeat-unit truth indels and produces a consistent BAM."""
    from simulate import build_mixed_genome

    res = build_mixed_genome(str(tmp_path), "g", 120_000, 150, 60, seed=3,
                             error_model="ont_str")
    # truth contains indels whose alt/ref delta is a tandem unit
    kinds = {"SNP": 0, "INS": 0, "DEL": 0}
    for p, ref_allele, alt_allele, gt in res["variants"]:
        if len(ref_allele) == len(alt_allele):
            kinds["SNP"] += 1
        elif len(alt_allele) > len(ref_allele):
            kinds["INS"] += 1
        else:
            kinds["DEL"] += 1
    assert all(v > 0 for v in kinds.values()), kinds
    import os
    assert os.path.exists(res["bam"]) and os.path.exists(res["fasta"])
