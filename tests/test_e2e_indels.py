"""Indel-heavy end-to-end stress: many insertions/deletions of varied
lengths (incl. homopolymer-adjacent), plus a variant sitting exactly on a
region_size interval boundary (shared endpoint between intervals must not
produce duplicate records)."""

import gzip

import numpy as np
import pytest

from pepper_tpu.io.bam_writer import write_bam, write_fasta
from pepper_tpu.options import PepperOptions
from pepper_tpu.presets import set_parameters
from pepper_tpu.pipeline.call_variant import call_variant

from simulate import random_reference, simulate_reads, write_truth_vcf

CONTIG = "chrI"


def test_indel_heavy_dry_run(tmp_path):
    ref = random_reference(6000, seed=77)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}

    variants = []
    # insertions of lengths 1..5
    for i, pos in enumerate(range(600, 1601, 250)):
        ins = "ACGTG"[:i % 5 + 1]
        variants.append((pos, ref[pos], ref[pos] + ins,
                         "1|1" if i % 2 else "1|0"))
    # deletions of lengths 1..5
    for i, pos in enumerate(range(2600, 3601, 250)):
        length = i % 5 + 1
        variants.append((pos, ref[pos:pos + length + 1], ref[pos],
                         "1|1" if i % 2 else "1|0"))
    # variant exactly at a region boundary (region_size=1000 -> pos 4000)
    variants.append((4000, ref[4000], alt[ref[4000]], "1|0"))
    variants.sort()

    hap1 = [(p, r, a) for p, r, a, g in variants]
    hap2 = [(p, r, a) for p, r, a, g in variants if g == "1|1"]
    records = simulate_reads(ref, [hap1, hap2], read_len=300, stride=20)
    bam = str(tmp_path / "i.bam")
    fasta = str(tmp_path / "i.fa")
    truth = str(tmp_path / "i.vcf")
    bed = str(tmp_path / "i.bed")
    write_bam(bam, [(CONTIG, len(ref))], records)
    write_fasta(fasta, {CONTIG: ref})
    write_truth_vcf(truth, CONTIG, len(ref), variants)
    with open(bed, "w") as f:
        f.write(f"{CONTIG}\t0\t{len(ref)}\n")

    options = set_parameters(PepperOptions(
        bam=bam, fasta=fasta, output_dir=str(tmp_path / "out"), threads=1,
        ont_r9_guppy5_sup=True, sub_command="call_variant", dry=True,
        train_mode=True, truth_vcf=truth, region_bed=bed,
        random_draw_probability=1.0, region=CONTIG, region_size=1000))
    call_variant(options)

    with gzip.open(str(tmp_path / "out" / "PEPPER_VARIANT_FULL.vcf.gz"),
                   "rt") as f:
        rows = [line.rstrip().split("\t") for line in f
                if not line.startswith("#")]
    called = {}
    for row in rows:
        pos = int(row[1]) - 1
        assert pos not in called, f"duplicate record at {pos}"
        sample = dict(zip(row[8].split(":"), row[9].split(":")))
        called[pos] = (row[3], row[4], sample["GT"])

    for pos, ref_allele, alt_allele, genotype in variants:
        assert pos in called, f"missing variant at {pos}"
        ref_called, alts_called, gt = called[pos]
        expected_gt = "1/1" if genotype == "1|1" else "0/1"
        assert gt == expected_gt, (pos, gt, expected_gt)
        if len(ref_allele) > len(alt_allele):      # deletion
            assert ref_called == ref_allele, (pos, ref_called, ref_allele)
            assert alt_allele in alts_called.split(",")
        else:
            assert alt_allele in alts_called.split(",")
    # no extra non-ref calls
    non_ref = {p for p, (_, _, gt) in called.items() if gt != "0/0"}
    assert non_ref == {p for p, _, _, _ in variants}


def test_ont_str_genome_dry_pipeline(tmp_path):
    """Pipeline-level integration under the round-4 'ont_str' model
    (STR-planted genome, copy-count-scaled errors, coverage dropouts):
    the dry label-passthrough call over a 300 kb scene must recover the
    truth variants at high recall with zero false positives — exercising
    window generation, gating and decode on STR/dropout-shaped pileups."""
    import os

    from simulate import build_mixed_genome, score_vcf_by_type
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import call_variant

    res = build_mixed_genome(str(tmp_path), "g", 300_000, 180, 200, seed=9,
                             error_model="ont_str")
    out = str(tmp_path / "out")
    options = set_parameters(PepperOptions(
        bam=res["bam"], fasta=res["fasta"], output_dir=out, threads=2,
        sample_name="S", ont_r9_guppy5_sup=True, sub_command="call_variant",
        dry=True, train_mode=True, truth_vcf=res["truth"],
        random_draw_probability=1.0, region="chrA",
        region_bed=res["bed"]))
    totals = call_variant(options)
    assert totals[0] > 0
    scored = score_vcf_by_type(
        os.path.join(out, "PEPPER_VARIANT_FULL.vcf.gz"), res["variants"])
    # dry mode: labels are truth passthrough, so recall should be near-1
    # even in STR/dropout contexts; precision exactly 1
    assert scored["ALL"]["recall"] >= 0.97, scored["ALL"]
    assert scored["ALL"]["fp"] == 0, scored["ALL"]
