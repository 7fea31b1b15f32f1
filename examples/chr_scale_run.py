"""Chromosome-scale soak: train once, then call a chr20-class simulated
genome (SNP+INS+DEL truth incl. homopolymer-adjacent indels) through the
real pipeline and score per variant type.

  python examples/chr_scale_run.py [genome_mb] [threads] [error_model] [coverage_x]

error_model "uniform" (default) or "ont" (homopolymer-scaled indels,
strand bias, correlated quals — tests/simulate.py apply_ont_errors).
coverage_x scales read strides (default ~36x; e.g. 20 for a low-coverage
point).
"""

import os
import sys
import tempfile

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from pepper_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from simulate import build_mixed_genome, score_vcf_by_type  # noqa: E402
from acceptance_run import print_score_table  # noqa: E402


def main():
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 8)
    error_model = sys.argv[3] if len(sys.argv) > 3 else "uniform"
    coverage = float(sys.argv[4]) if len(sys.argv) > 4 else 36.0
    # default strides (160, 160, 550) give ~36x total; scale inversely
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

    base = tempfile.mkdtemp(prefix="pepper_chr_")
    with StageTimer("SIMULATE TRAIN GENOME (SNP+INS+DEL)"):
        train_genome = build_mixed_genome(base, "train", 500_000, 1500,
                                          2500, 31, strides=strides,
                                          error_model=error_model)
    with StageTimer(f"SIMULATE {genome_mb} Mb TEST GENOME (SNP+INS+DEL)"):
        test_genome = build_mixed_genome(base, "test",
                                         int(genome_mb * 1_000_000),
                                         int(genome_mb * 700),
                                         int(genome_mb * 1000), 32,
                                         strides=strides,
                                         error_model=error_model)

    train_options = set_parameters(PepperOptions(
        bam=train_genome["bam"], fasta=train_genome["fasta"],
        ont_r9_guppy5_sup=True, sub_command="make_train_images",
        train_mode=True, truth_vcf=train_genome["truth"],
        region_bed=train_genome["bed"], random_draw_probability=1.0,
        region="chrA", threads=threads))
    image_dir = os.path.join(base, "train_images")
    with StageTimer("TRAIN IMAGE GENERATION"):
        make_images(train_options, image_dir)
    with StageTimer("TRAINING"):
        model_path, accuracy = train_model(
            PepperOptions(batch_size=64), image_dir,
            os.path.join(base, "run"), epochs=12, learning_rate=3e-4,
            step_size=10_000, batch_size=64, holdout_fraction=0.1, seed=0,
            config=TransducerConfig(hidden=64, linear_size=128))
    log_line(f"TRAIN ACCURACY: {accuracy:.2f}")

    params, _ = load_params(os.path.join(base, "run",
                                         "pepper_model_best.npz"))
    call_options = set_parameters(PepperOptions(
        bam=test_genome["bam"], fasta=test_genome["fasta"],
        output_dir=os.path.join(base, "calls"), ont_r9_guppy5_sup=True,
        sub_command="call_variant", region="chrA", threads=threads,
        batch_size=16384))
    with StageTimer("CALL_VARIANT (chr-scale)"):
        call_variant(call_options, params=params)

    # Score the FULL file (every call) AND the two product outputs the
    # reference pipeline actually consumes: the PEPPER-confident VCF and
    # the re-genotype VCF that downstream DeepVariant re-examines
    # (VcfWriter.py:163-217 routing) — low-QV calls land in the latter,
    # so product-level FP counts belong to the per-file split.
    for name in ("PEPPER_VARIANT_FULL", "PEPPER_VARIANT_OUTPUT_PEPPER",
                 "PEPPER_VARIANT_OUTPUT_VARIANT_CALLING"):
        path = os.path.join(base, "calls", name + ".vcf.gz")
        if not os.path.exists(path):
            continue
        log_line(f"=== {name} ===")
        stats = score_vcf_by_type(path, test_genome["variants"])
        print_score_table(stats, log_line)
    log_line(f"OUTPUT: {base}")


if __name__ == "__main__":
    main()
