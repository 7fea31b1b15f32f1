"""Trained-model HP-mode acceptance (non-dry): haplotagged simulated reads
(HP aux tags written by the simulator, parsed by io/_native/bam.cpp) ->
48-channel train images -> trained 48-ch transducer -> real call_variant
with --use_hp_info -> per-type scored table. Mirrors the non-HP trained
acceptance; the reference's HP flow is region_summary_hp.cpp +
ImageGenerationUI --use_hp_info."""

import os

import pytest

from pepper_tpu.options import PepperOptions
from pepper_tpu.presets import set_parameters
from pepper_tpu.pipeline.call_variant import call_variant
from pepper_tpu.pipeline.stages import make_images

from simulate import build_mixed_genome, score_vcf_by_type

CONTIG = "chrA"


@pytest.mark.slow
def test_trained_hp_calling(tmp_path):
    from pepper_tpu.models.checkpoint import load_params
    from pepper_tpu.models.transducer import TransducerConfig
    from pepper_tpu.train.trainer import train_model

    base = str(tmp_path)
    train_genome = build_mixed_genome(
        base, "train", 200_000, 420, 550, seed=51, read_len=600,
        strides=[45, 45, 110], error_rate=0.0, run_every=900)
    test_genome = build_mixed_genome(
        base, "test", 40_000, 80, 100, seed=52, read_len=600,
        strides=[45, 45, 110], error_rate=0.0, run_every=900)

    train_options = set_parameters(PepperOptions(
        bam=train_genome["bam"], fasta=train_genome["fasta"],
        ont_r9_guppy5_sup=True, sub_command="make_train_images",
        train_mode=True, truth_vcf=train_genome["truth"],
        region_bed=train_genome["bed"], random_draw_probability=1.0,
        region=CONTIG, threads=2, use_hp_info=True))
    image_dir = str(tmp_path / "train_images")
    make_images(train_options, image_dir)

    out_dir = str(tmp_path / "train_run")
    small_hp = TransducerConfig(image_features=48, window=21, hidden=64,
                                linear_size=128)
    model_path, accuracy = train_model(
        PepperOptions(batch_size=32, use_hp_info=True), image_dir, out_dir,
        epochs=30, learning_rate=3e-4, step_size=10_000, batch_size=32,
        holdout_fraction=0.15, seed=0, config=small_hp)
    assert accuracy >= 90.0, f"HP training failed to converge: {accuracy}"

    params, _ = load_params(os.path.join(out_dir, "pepper_model_best.npz"))
    call_options = set_parameters(PepperOptions(
        bam=test_genome["bam"], fasta=test_genome["fasta"],
        output_dir=str(tmp_path / "calls"), ont_r9_guppy5_sup=True,
        sub_command="call_variant", region=CONTIG, threads=1,
        batch_size=128, use_hp_info=True))
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
