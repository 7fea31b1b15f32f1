"""HP-mode (haplotagged) trained acceptance: train a 48-channel window
classifier on haplotagged simulated reads (HP aux tags emitted by the
simulator, parsed natively), then call an unseen mixed SNP/INS/DEL genome
through the real call_variant --use_hp_info path and score per variant
type. Mirrors examples/acceptance_run.py for the reference's HP flow
(region_summary_hp.cpp + ImageGenerationUI --use_hp_info).

  python examples/hp_acceptance_run.py [genome_mb] [threads] \
      [error_model] [coverage]

error_model: "uniform" (default), "ont", or "ont_str"; coverage scales
the simulated read strides (36x default) — the chr-scale HP harness
(VERDICT r4 task 7).
"""

import os
import sys
import tempfile

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from pepper_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from acceptance_run import print_score_table  # noqa: E402
from simulate import build_mixed_genome, score_vcf_by_type  # noqa: E402


def main():
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 8)
    error_model = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    coverage = float(sys.argv[4]) if len(sys.argv) > 4 else 36.0
    scale = 36.0 / coverage
    strides = (int(160 * scale), int(160 * scale), int(550 * scale))

    from pepper_tpu.models.checkpoint import load_params
    from pepper_tpu.models.transducer import TransducerConfig
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import call_variant
    from pepper_tpu.pipeline.stages import make_images
    from pepper_tpu.train.trainer import train_model
    from pepper_tpu.utils.profiling import StageTimer, log_line

    base = tempfile.mkdtemp(prefix="pepper_hp_acceptance_")
    with StageTimer("SIMULATE TRAIN GENOME (0.5 Mb, haplotagged)"):
        train_genome = build_mixed_genome(base, "train", 500_000, 1500,
                                          2500, 11, strides=strides,
                                          error_model=error_model)
    with StageTimer("SIMULATE TEST GENOME (haplotagged)"):
        test_genome = build_mixed_genome(base, "test",
                                         int(genome_mb * 1_000_000),
                                         int(genome_mb * 700),
                                         int(genome_mb * 1000), 22,
                                         strides=strides,
                                         error_model=error_model)

    train_options = set_parameters(PepperOptions(
        bam=train_genome["bam"], fasta=train_genome["fasta"],
        ont_r9_guppy5_sup=True, sub_command="make_train_images",
        train_mode=True, truth_vcf=train_genome["truth"],
        region_bed=train_genome["bed"], random_draw_probability=1.0,
        region="chrA", threads=threads, use_hp_info=True))
    image_dir = os.path.join(base, "train_images")
    with StageTimer("HP TRAIN IMAGE GENERATION (48-ch)"):
        make_images(train_options, image_dir)

    out_dir = os.path.join(base, "train_run")
    with StageTimer("TRAINING (48-ch transducer)"):
        model_path, accuracy = train_model(
            PepperOptions(batch_size=64, use_hp_info=True), image_dir,
            out_dir, epochs=12, learning_rate=3e-4, step_size=10_000,
            batch_size=64, holdout_fraction=0.1, seed=0,
            config=TransducerConfig(image_features=48, window=21,
                                    hidden=64, linear_size=128))
    log_line(f"TRAIN ACCURACY: {accuracy:.2f}")

    params, _ = load_params(os.path.join(out_dir, "pepper_model_best.npz"))
    call_options = set_parameters(PepperOptions(
        bam=test_genome["bam"], fasta=test_genome["fasta"],
        output_dir=os.path.join(base, "calls"), ont_r9_guppy5_sup=True,
        sub_command="call_variant", region="chrA", threads=threads,
        batch_size=16384, use_hp_info=True))
    with StageTimer("CALL_VARIANT --use_hp_info (full pipeline)"):
        call_variant(call_options, params=params)

    stats = score_vcf_by_type(
        os.path.join(base, "calls", "PEPPER_VARIANT_FULL.vcf.gz"),
        test_genome["variants"])
    print_score_table(stats, log_line)
    log_line(f"OUTPUT: {base}")


if __name__ == "__main__":
    main()
