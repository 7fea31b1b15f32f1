"""The strongest integration proof: train the window classifier on
simulated labeled data, then run the full variant-calling pipeline with the
TRAINED model and recover every simulated variant with correct genotypes
(the quickstart acceptance test's role, SURVEY.md §4.2, on synthetic
data since the environment has no network access)."""

import gzip
import os

import numpy as np
import pytest

from pepper_tpu.io.bam_writer import write_bam, write_fasta
from pepper_tpu.options import PepperOptions
from pepper_tpu.presets import set_parameters
from pepper_tpu.pipeline.call_variant import call_variant
from pepper_tpu.pipeline.stages import make_images

from simulate import random_reference, simulate_reads, write_truth_vcf

CONTIG = "chr20"


def build_genome(tmp, seed, n_snps=8, length=6000, n_noise=None):
    rng = np.random.RandomState(seed)
    ref = random_reference(length, seed=seed)

    def alt_base(pos):
        return {"A": "T", "T": "A", "C": "G", "G": "C"}[ref[pos]]

    candidate_positions = np.arange(300, length - 300, 40)
    n_noise = n_noise if n_noise is not None else n_snps
    chosen = rng.choice(candidate_positions, size=n_snps + n_noise,
                        replace=False)
    positions = sorted(int(p) for p in chosen[:n_snps])
    noise_positions = sorted(int(p) for p in chosen[n_snps:])
    variants = []
    for i, pos in enumerate(positions):
        genotype = "1|1" if i % 3 == 0 else "1|0"
        variants.append((int(pos), ref[pos], alt_base(pos), genotype))

    hap1 = [(p, r, a) for p, r, a, g in variants]
    hap2 = [(p, r, a) for p, r, a, g in variants if g == "1|1"]
    # a low-coverage "systematic error" read population: creates hom-ref
    # labeled candidate windows at ~12% VAF (class-0 training signal)
    noise_hap = [(p, ref[p], alt_base(p)) for p in noise_positions]
    records = simulate_reads(ref, [hap1, hap2, noise_hap], read_len=300,
                             strides=[25, 25, 80],
                             name_prefix=f"t{seed}")
    bam = str(tmp / f"sim_{seed}.bam")
    fasta = str(tmp / f"ref_{seed}.fa")
    truth = str(tmp / f"truth_{seed}.vcf")
    bed = str(tmp / f"bed_{seed}.bed")
    write_bam(bam, [(CONTIG, length)], records)
    write_fasta(fasta, {CONTIG: ref})
    write_truth_vcf(truth, CONTIG, length, variants)
    with open(bed, "w") as f:
        f.write(f"{CONTIG}\t0\t{length}\n")
    return dict(ref=ref, bam=bam, fasta=fasta, truth=truth, bed=bed,
                variants=variants)


@pytest.mark.slow
def test_train_then_call(tmp_path):
    from pepper_tpu.train.trainer import train_model

    train_genome = build_genome(tmp_path, seed=101, n_snps=150,
                                n_noise=250, length=40000)
    test_genome = build_genome(tmp_path, seed=202, n_snps=8, length=6000)

    # 1) labeled training images from the training genome
    train_options = set_parameters(PepperOptions(
        bam=train_genome["bam"], fasta=train_genome["fasta"],
        ont_r9_guppy5_sup=True, sub_command="make_train_images",
        train_mode=True, truth_vcf=train_genome["truth"],
        region_bed=train_genome["bed"], random_draw_probability=1.0,
        region=CONTIG, threads=1))
    image_dir = str(tmp_path / "train_images")
    make_images(train_options, image_dir)

    # 2) train until the classifier separates hom-ref/het/hom-alt.
    # A reduced-width transducer (same architecture family) keeps this
    # full-system test fast enough for the default suite.
    from pepper_tpu.models.transducer import TransducerConfig

    small = TransducerConfig(hidden=64, linear_size=128)
    out_dir = str(tmp_path / "train_run")
    model_path, accuracy = train_model(
        PepperOptions(batch_size=32), image_dir, out_dir, epochs=30,
        learning_rate=3e-4, step_size=10_000, batch_size=32,
        holdout_fraction=0.15, seed=0, config=small)
    assert accuracy >= 90.0, f"training failed to converge: {accuracy}"

    # 3) call variants on the UNSEEN genome with the trained model
    from pepper_tpu.models.checkpoint import load_params

    params, _ = load_params(os.path.join(out_dir, "pepper_model_best.npz"))
    call_options = set_parameters(PepperOptions(
        bam=test_genome["bam"], fasta=test_genome["fasta"],
        output_dir=str(tmp_path / "calls"), ont_r9_guppy5_sup=True,
        sub_command="call_variant", region=CONTIG, threads=1,
        batch_size=128))
    call_variant(call_options, params=params)

    with gzip.open(str(tmp_path / "calls" / "PEPPER_VARIANT_FULL.vcf.gz"),
                   "rt") as f:
        called = {}
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip().split("\t")
            sample = dict(zip(fields[8].split(":"), fields[9].split(":")))
            called[int(fields[1]) - 1] = (fields[3], fields[4],
                                          sample["GT"])

    truth_positions = {p for p, _, _, _ in test_genome["variants"]}
    recovered = 0
    genotype_correct = 0
    for pos, ref_allele, alt_allele, genotype in test_genome["variants"]:
        if pos not in called:
            continue
        ref_called, alt_called, gt_called = called[pos]
        if ref_called == ref_allele and alt_called == alt_allele:
            recovered += 1
            expected_gt = "1/1" if genotype == "1|1" else "0/1"
            if gt_called == expected_gt:
                genotype_correct += 1
    # recall on unseen data
    assert recovered == len(test_genome["variants"]), \
        f"recovered {recovered}/{len(test_genome['variants'])}"
    assert genotype_correct >= recovered - 1
    # no false positives at non-variant sites (non-refCall records)
    false_calls = [p for p, (_, _, gt) in called.items()
                   if gt != "0/0" and p not in truth_positions]
    assert false_calls == []

    # 4) int8 --quantized serving of the SAME trained weights must produce
    #    the identical call set (true int8 MXU path, models/quantize.py)
    q_options = set_parameters(PepperOptions(
        bam=test_genome["bam"], fasta=test_genome["fasta"],
        output_dir=str(tmp_path / "calls_q"), ont_r9_guppy5_sup=True,
        sub_command="call_variant", region=CONTIG, threads=1,
        batch_size=128, quantized=True))
    call_variant(q_options, params=params)
    with gzip.open(str(tmp_path / "calls_q" / "PEPPER_VARIANT_FULL.vcf.gz"),
                   "rt") as f:
        called_q = {}
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip().split("\t")
            sample = dict(zip(fields[8].split(":"), fields[9].split(":")))
            called_q[int(fields[1]) - 1] = (fields[3], fields[4],
                                            sample["GT"])
    assert called_q == called
