"""pepper_tpu command-line interface.

Mirrors the reference's subcommand surface (pepper_variant.py:37-97 and
pepper_variant_train.py:306-356) so quickstart commands translate 1:1:
  call_variant, make_images, run_inference, find_candidates, merge_variants,
  make_train_images, train_model, test_model, polish.
"""

from __future__ import annotations

import argparse
import sys

from ..options import PepperOptions
from ..presets import set_parameters


def _add_common_io(parser, need_model=False):
    parser.add_argument("-b", "--bam", required=False, default="",
                        help="Alignment BAM file (indexed).")
    parser.add_argument("-f", "--fasta", required=False, default="",
                        help="Reference FASTA file (faidx indexed).")
    parser.add_argument("-o", "--output_dir", default="./output",
                        help="Output directory.")
    parser.add_argument("-t", "--threads", type=int, default=1)
    parser.add_argument("-s", "--sample_name", default="Sample")
    if need_model:
        parser.add_argument("-m", "--model_path", default="",
                            help="Model checkpoint (.npz native or torch .pkl)")


def _add_region_args(parser):
    parser.add_argument("-r", "--region", default=None,
                        help="Region like chr20 or chr20:1000-2000 or chr1-22")
    parser.add_argument("--region_size", type=int, default=100000)
    parser.add_argument("--region_bed", default=None)


def _add_image_args(parser):
    parser.add_argument("--min_mapq", type=int, default=None)
    parser.add_argument("--min_snp_baseq", type=int, default=None)
    parser.add_argument("--min_indel_baseq", type=int, default=None)
    parser.add_argument("--snp_frequency", type=float, default=None)
    parser.add_argument("--insert_frequency", type=float, default=None)
    parser.add_argument("--delete_frequency", type=float, default=None)
    parser.add_argument("--min_coverage_threshold", type=float, default=None)
    parser.add_argument("--candidate_support_threshold", type=float,
                        default=None)
    parser.add_argument("--snp_candidate_frequency_threshold", type=float,
                        default=None)
    parser.add_argument("--indel_candidate_frequency_threshold", type=float,
                        default=None)
    parser.add_argument("--skip_indels", action="store_true", default=False)
    parser.add_argument("--downsample_rate", type=float, default=1.0)
    parser.add_argument("--include_supplementary", action="store_true",
                        default=False)
    parser.add_argument("--use_hp_info", action="store_true", default=False)


def _add_inference_args(parser):
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--num_workers", type=int, default=0)
    parser.add_argument("--dry", action="store_true", default=False,
                        help="Label-passthrough backend (pipeline test).")
    parser.add_argument("--compute_dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--quantized", action="store_true", default=False,
                        help="Serve int8-quantized weights.")
    parser.add_argument("--no_quantized", dest="quantized",
                        action="store_false")
    parser.add_argument("--quantize_mode", default="static",
                        choices=["static", "static_rec", "dynamic"],
                        help="int8 serving mode: static (exact 1/127 "
                             "activation scales, fused int8 kernels), "
                             "static_rec (also int8 recurrent matmuls) or "
                             "dynamic (per-batch absmax quantization).")
    parser.add_argument("--device_pileup", action="store_true",
                        default=False,
                        help="Fused device-window flow: gather + inject + "
                             "classify candidate windows from the region "
                             "image on the accelerator (one dispatch per "
                             "region batch).")
    parser.add_argument("--device_region_batch", type=int, default=32)
    parser.add_argument("--num_devices", type=int, default=-1,
                        help="Shard inference batches over N local "
                             "accelerator chips (data parallel). -1 (default)"
                             " = all local devices; 1 = single chip.")


def _add_candidate_args(parser):
    parser.add_argument("--allowed_multiallelics", type=int, default=None)
    for name in ("snp_p_value", "insert_p_value", "delete_p_value",
                 "snp_p_value_in_lc", "insert_p_value_in_lc",
                 "delete_p_value_in_lc", "snp_q_cutoff", "indel_q_cutoff",
                 "snp_q_cutoff_in_lc", "indel_q_cutoff_in_lc",
                 "report_snp_above_freq", "report_indel_above_freq"):
        parser.add_argument(f"--{name}", type=float, default=None)
    parser.add_argument("--freq_based", action="store_true", default=False)
    parser.add_argument("--freq", type=float, default=0.10)


def _add_preset_args(parser):
    for name in ("ont_r9_guppy5_sup", "ont_r9_guppy4_hac", "ont_r10_q20",
                 "hifi", "clr"):
        parser.add_argument(f"--{name}", action="store_true", default=False)


def _add_train_args(parser):
    parser.add_argument("--truth_vcf", default=None)
    parser.add_argument("--random_draw_probability", type=float, default=0.33)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--step_size", type=int, default=100)
    parser.add_argument("--retrain_model", action="store_true", default=False)
    parser.add_argument("--retrain_model_path", default=None)
    parser.add_argument("--test_file", default=None)


def build_parser():
    parser = argparse.ArgumentParser(
        prog="pepper_tpu",
        description="TPU-native PEPPER: RNN-based variant calling and "
                    "assembly polishing for long reads.")
    sub = parser.add_subparsers(dest="sub_command")

    p = sub.add_parser("call_variant", help="Run the full variant-calling "
                       "pipeline (images -> inference -> VCF).")
    _add_common_io(p, need_model=True)
    _add_region_args(p)
    _add_image_args(p)
    _add_inference_args(p)
    _add_candidate_args(p)
    _add_preset_args(p)
    p.add_argument("--sharded", action="store_true", default=False,
                   help="Region-manifest sharded/resumable mode (auto when "
                        "running multi-host under jax.distributed).")

    p = sub.add_parser("make_images", help="Generate candidate images.")
    _add_common_io(p)
    _add_region_args(p)
    _add_image_args(p)
    _add_preset_args(p)

    p = sub.add_parser("run_inference", help="Classify stored images.")
    _add_common_io(p, need_model=True)
    p.add_argument("-i", "--image_dir", required=True)
    _add_inference_args(p)
    p.add_argument("--use_hp_info", action="store_true", default=False)

    p = sub.add_parser("find_candidates", help="Decode predictions to VCFs.")
    _add_common_io(p)
    p.add_argument("-i", "--input_dir", required=True)
    _add_candidate_args(p)
    _add_preset_args(p)
    p.add_argument("--use_hp_info", action="store_true", default=False)

    p = sub.add_parser("merge_variants", help="Merge PEPPER + DeepVariant "
                       "VCFs.")
    p.add_argument("-vp", "--vcf_pepper", required=True)
    p.add_argument("-vd", "--vcf_deepvariant", default=None)
    p.add_argument("-vds", "--vcf_deepvariant_snps", default=None)
    p.add_argument("-vdi", "--vcf_deepvariant_indels", default=None)
    p.add_argument("-o", "--output_dir", default="./output")

    p = sub.add_parser("make_train_images", help="Generate labeled images.")
    _add_common_io(p)
    _add_region_args(p)
    _add_image_args(p)
    _add_preset_args(p)
    _add_train_args(p)

    p = sub.add_parser("train_model", help="Train the window classifier.")
    _add_common_io(p, need_model=True)
    p.add_argument("-i", "--image_dir", required=True)
    _add_inference_args(p)
    _add_train_args(p)
    p.add_argument("--use_hp_info", action="store_true", default=False)
    p.add_argument("--model_type", default="lstm",
                   choices=("lstm", "no_cnn", "transformer"),
                   help="Window-classifier family (default: the reference's "
                        "live bi-LSTM transducer).")

    p = sub.add_parser("test_model", help="Evaluate a model on labeled "
                       "images.")
    _add_common_io(p, need_model=True)
    p.add_argument("-i", "--image_dir", required=True)
    _add_inference_args(p)
    p.add_argument("--use_hp_info", action="store_true", default=False)

    p = sub.add_parser("run_hyperband", help="Hyperband lr/l2 search over "
                       "the window classifier.")
    _add_common_io(p)
    p.add_argument("-i", "--image_dir", required=True)
    p.add_argument("--max_iter", type=int, default=27,
                   help="Max epochs per configuration.")
    p.add_argument("--eta", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--use_hp_info", action="store_true", default=False)

    p = sub.add_parser("backend_stat", help="Print JAX backend/device info "
                       "(the reference's torch_stat).")
    p = sub.add_parser("download_models", help="Download published PEPPER "
                       "model checkpoints (download_model.py:10-27).")
    p.add_argument("-o", "--output_dir", default="pepper_models")
    p.add_argument("--description_url", default=None,
                   help="Override the model-description CSV URL "
                        "(file:// URLs accepted for offline mirrors).")
    p = sub.add_parser("version")
    return parser


def options_from_args(args) -> PepperOptions:
    options = PepperOptions()
    for key, value in vars(args).items():
        if hasattr(options, key):
            setattr(options, key, value)
    options.sub_command = args.sub_command
    return options


def _validate_inputs(options, args):
    """Early input validation with clear errors (CallVariant.py:20-72)."""
    import os

    def fail(message):
        sys.stderr.write(f"ERROR: {message}\n")
        raise SystemExit(1)

    needs_alignment = args.sub_command in (
        "call_variant", "make_images", "make_train_images")
    if needs_alignment:
        if not options.bam or not os.path.isfile(options.bam):
            fail(f"CAN NOT LOCATE BAM FILE: {options.bam!r}")
        if not (os.path.isfile(options.bam + ".bai")
                or os.path.isfile(options.bam.rsplit(".", 1)[0] + ".bai")):
            fail(f"CAN NOT LOCATE BAM INDEX (.bai) FOR: {options.bam!r}")
        if not options.fasta or not os.path.isfile(options.fasta):
            fail(f"CAN NOT LOCATE FASTA FILE: {options.fasta!r}")
        if not os.path.isfile(options.fasta + ".fai"):
            fail(f"CAN NOT LOCATE FASTA INDEX (.fai) FOR: {options.fasta!r}")
    if args.sub_command == "call_variant" and not options.dry:
        if not options.model_path or not os.path.isfile(options.model_path):
            fail(f"CAN NOT LOCATE MODEL FILE: {options.model_path!r}")
    if options.threads <= 0:
        fail("THREAD NEEDS TO BE >0.")
    if getattr(options, "batch_size", 1) <= 0:
        fail("batch_size NEEDS TO BE >0.")
    if args.sub_command == "make_train_images":
        if not options.truth_vcf or not os.path.isfile(options.truth_vcf):
            fail(f"CAN NOT LOCATE TRUTH VCF: {options.truth_vcf!r}")


def main(argv=None):
    from ..utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.sub_command is None:
        parser.print_help()
        return 1
    if args.sub_command == "version":
        from .. import __version__

        print(f"pepper_tpu {__version__}")
        return 0
    if args.sub_command == "backend_stat":
        import jax

        print(f"jax backend: {jax.default_backend()}")
        print(f"devices: {jax.devices()}")
        print(f"process {jax.process_index()}/{jax.process_count()}")
        print(f"local device count: {jax.local_device_count()}")
        return 0
    if args.sub_command == "download_models":
        from ..utils.download_model import (DEFAULT_DESCRIPTION_URL,
                                            download_models)

        url = args.description_url or DEFAULT_DESCRIPTION_URL
        try:
            paths = download_models(args.output_dir, url)
        except OSError:
            return 1
        print(f"downloaded/verified {len(paths)} model(s) in "
              f"{args.output_dir} — pass a .pkl to -m/--model_path "
              "(converted on load) or train natively with "
              "`pepper_tpu train_model`.")
        return 0

    if args.sub_command == "merge_variants":
        from ..decode.merge_variants import merge_vcf_records

        merge_vcf_records(args)
        return 0

    options = options_from_args(args)
    _validate_inputs(options, args)
    options = set_parameters(options)

    if args.sub_command in ("call_variant",):
        import jax

        from ..pipeline.call_variant import (call_variant,
                                             call_variant_sharded)

        params = None
        if not options.dry:
            from ..models.checkpoint import load_params

            params, meta = load_params(options.model_path)
            options.model_type = meta.get("model_type", "lstm")
        if args.sharded or jax.process_count() > 1:
            call_variant_sharded(options, params=params)
        else:
            call_variant(options, params=params)
    elif args.sub_command in ("make_images", "make_train_images"):
        from ..pipeline.stages import make_images

        options.train_mode = args.sub_command == "make_train_images"
        make_images(options, options.output_dir)
    elif args.sub_command == "run_inference":
        from ..pipeline.stages import run_inference

        params = None
        if not options.dry:
            from ..models.checkpoint import load_params

            params, meta = load_params(options.model_path)
            options.model_type = meta.get("model_type", "lstm")
        run_inference(options, args.image_dir, options.output_dir,
                      params=params)
    elif args.sub_command == "find_candidates":
        from ..pipeline.stages import process_candidates

        process_candidates(options, args.input_dir, options.output_dir)
    elif args.sub_command == "train_model":
        from ..train.trainer import train_model

        train_model(options, args.image_dir, options.output_dir,
                    epochs=args.epochs, learning_rate=args.learning_rate,
                    weight_decay=args.weight_decay, step_size=args.step_size,
                    retrain_model_path=args.retrain_model_path,
                    test_file=args.test_file, model_type=args.model_type)
    elif args.sub_command == "test_model":
        from ..train.trainer import test_model

        test_model(options, args.image_dir)
    elif args.sub_command == "run_hyperband":
        import os

        from ..train.hyperband import Hyperband
        from ..train.trainer import train_model

        run_counter = {"n": 0}

        def try_params(n_iterations, config):
            run_counter["n"] += 1
            run_dir = os.path.join(options.output_dir,
                                   f"hb_{config['_id']}_{run_counter['n']}")
            resume = (os.path.join(options.output_dir,
                                   f"hb_{config['_id']}_best.npz")
                      if config.get("_resume") else None)
            model_path, accuracy = train_model(
                options, args.image_dir, run_dir,
                epochs=int(n_iterations),
                learning_rate=config["learning_rate"],
                weight_decay=config["weight_decay"],
                step_size=10_000, batch_size=options.batch_size,
                retrain_model_path=(resume if resume
                                    and os.path.exists(resume) else None))
            best_path = os.path.join(options.output_dir,
                                     f"hb_{config['_id']}_best.npz")
            import shutil

            shutil.copy(model_path, best_path)
            return {"loss": -accuracy, "accuracy": accuracy,
                    "checkpoint": best_path}

        hyperband = Hyperband(try_params, max_iter=args.max_iter,
                              eta=args.eta)
        best = hyperband.run()
        print(f"BEST: acc={best['accuracy']:.3f} "
              f"config={best['config']} ckpt={best['checkpoint']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
