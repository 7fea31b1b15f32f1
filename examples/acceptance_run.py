"""Chr-scale acceptance run on simulated data: train on one genome, call a
2 Mb unseen genome with the trained model, score recall/precision/genotype
concordance PER VARIANT TYPE (SNP/INS/DEL — the reference's published
contract is per-type F1 tables, docs/pipeline_docker/ONT_variant_calling.md)
and wall-clock per stage. Truth includes insertions and deletions of length
1-10 with homopolymer-adjacent sites, 3% uniform per-base sequencing errors
and a systematic-noise read population.

  python examples/acceptance_run.py [genome_mb] [threads] [error_model]

error_model "uniform" (default): 3% uniform per-base substitutions.
error_model "ont": the homopolymer-scaled, strand-biased sub+indel process
with correlated qualities (tests/simulate.py apply_ont_errors) — the regime
behind the reference's published INDEL F1 of 0.77-0.88
(docs/pipeline_docker/ONT_variant_calling.md:149-154).
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


def print_score_table(stats, log_line):
    log_line("TYPE    N      RECALL   PRECISION  GT-CONCORDANCE  (TP/FP/FN)")
    for kind in ("SNP", "INS", "DEL", "ALL"):
        s = stats[kind]
        log_line(f"{kind:<6} {s['n']:<6} {s['recall']:.4f}   "
                 f"{s['precision']:.4f}     {s['gt_concordance']:.4f}"
                 f"          ({s['tp']}/{s['fp']}/{s['fn']})")


def main():
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 8)
    error_model = sys.argv[3] if len(sys.argv) > 3 else "uniform"

    from pepper_tpu.models.checkpoint import load_params
    from pepper_tpu.models.transducer import TransducerConfig
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import call_variant
    from pepper_tpu.pipeline.stages import make_images
    from pepper_tpu.train.trainer import train_model
    from pepper_tpu.utils.profiling import StageTimer, log_line

    base = tempfile.mkdtemp(prefix="pepper_acceptance_")
    with StageTimer("SIMULATE TRAIN GENOME (0.5 Mb, SNP+INS+DEL)"):
        train_genome = build_mixed_genome(base, "train", 500_000, 1500,
                                          2500, 11,
                                          error_model=error_model)
    with StageTimer("SIMULATE TEST GENOME (SNP+INS+DEL)"):
        test_genome = build_mixed_genome(base, "test",
                                         int(genome_mb * 1_000_000),
                                         int(genome_mb * 700),
                                         int(genome_mb * 1000), 22,
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

    out_dir = os.path.join(base, "train_run")
    with StageTimer("TRAINING"):
        model_path, accuracy = train_model(
            PepperOptions(batch_size=64), image_dir, out_dir, epochs=12,
            learning_rate=3e-4, step_size=10_000, batch_size=64,
            holdout_fraction=0.1, seed=0,
            config=TransducerConfig(hidden=64, linear_size=128))
    log_line(f"TRAIN ACCURACY: {accuracy:.2f}")

    params, _ = load_params(os.path.join(out_dir, "pepper_model_best.npz"))
    call_options = set_parameters(PepperOptions(
        bam=test_genome["bam"], fasta=test_genome["fasta"],
        output_dir=os.path.join(base, "calls"), ont_r9_guppy5_sup=True,
        sub_command="call_variant", region="chrA", threads=threads,
        batch_size=2048))
    with StageTimer("CALL_VARIANT (full pipeline)"):
        call_variant(call_options, params=params)

    stats = score_vcf_by_type(
        os.path.join(base, "calls", "PEPPER_VARIANT_FULL.vcf.gz"),
        test_genome["variants"])
    print_score_table(stats, log_line)
    log_line(f"OUTPUT: {base}")


if __name__ == "__main__":
    main()
