"""Trained-model INDEL acceptance (non-dry): train the window classifier on
a mixed SNP/INS/DEL genome (indel lengths 1-10, homopolymer-adjacent sites),
then call an unseen mixed genome through the real call_variant path and
score per variant type. This is the synthetic stand-in for the reference's
INDEL F1 tables (docs/pipeline_docker/ONT_variant_calling.md:149-154)."""

import os

import pytest

from pepper_tpu.options import PepperOptions
from pepper_tpu.presets import set_parameters
from pepper_tpu.pipeline.call_variant import call_variant
from pepper_tpu.pipeline.stages import make_images

from simulate import build_mixed_genome, score_vcf_by_type

CONTIG = "chrA"


@pytest.mark.slow
def test_trained_indel_calling(tmp_path):
    from pepper_tpu.models.checkpoint import load_params
    from pepper_tpu.models.transducer import TransducerConfig
    from pepper_tpu.train.trainer import train_model

    base = str(tmp_path)
    train_genome = build_mixed_genome(
        base, "train", 200_000, 420, 550, seed=41, read_len=600,
        strides=[45, 45, 110], error_rate=0.0, run_every=900)
    test_genome = build_mixed_genome(
        base, "test", 40_000, 80, 100, seed=42, read_len=600,
        strides=[45, 45, 110], error_rate=0.0, run_every=900)

    train_options = set_parameters(PepperOptions(
        bam=train_genome["bam"], fasta=train_genome["fasta"],
        ont_r9_guppy5_sup=True, sub_command="make_train_images",
        train_mode=True, truth_vcf=train_genome["truth"],
        region_bed=train_genome["bed"], random_draw_probability=1.0,
        region=CONTIG, threads=2))
    image_dir = str(tmp_path / "train_images")
    make_images(train_options, image_dir)

    out_dir = str(tmp_path / "train_run")
    small = TransducerConfig(hidden=64, linear_size=128)
    model_path, accuracy = train_model(
        PepperOptions(batch_size=32), image_dir, out_dir, epochs=30,
        learning_rate=3e-4, step_size=10_000, batch_size=32,
        holdout_fraction=0.15, seed=0, config=small)
    assert accuracy >= 90.0, f"training failed to converge: {accuracy}"

    params, _ = load_params(os.path.join(out_dir, "pepper_model_best.npz"))
    call_options = set_parameters(PepperOptions(
        bam=test_genome["bam"], fasta=test_genome["fasta"],
        output_dir=str(tmp_path / "calls"), ont_r9_guppy5_sup=True,
        sub_command="call_variant", region=CONTIG, threads=1,
        batch_size=128))
    call_variant(call_options, params=params)

    stats = score_vcf_by_type(
        str(tmp_path / "calls" / "PEPPER_VARIANT_FULL.vcf.gz"),
        test_genome["variants"])
    for kind in ("SNP", "INS", "DEL"):
        s = stats[kind]
        assert s["n"] >= 15, f"test genome generated too few {kind}s"
        assert s["recall"] >= 0.95, (kind, stats)
        assert s["precision"] >= 0.95, (kind, stats)
        assert s["gt_concordance"] >= 0.9, (kind, stats)
