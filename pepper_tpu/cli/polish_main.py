"""pepper_tpu polish CLI — the reference's `pepper` tool surface
(pepper/pepper.py:264-373): polish / make_images / call_consensus / stitch.
"""

from __future__ import annotations

import argparse
import sys

from ..options import PepperOptions


def _add_common(parser, need_model=False):
    parser.add_argument("-b", "--bam", default="",
                        help="Reads-to-draft alignment BAM.")
    parser.add_argument("-f", "--fasta", default="",
                        help="Draft assembly FASTA (faidx indexed).")
    parser.add_argument("-o", "--output_dir", default="./output")
    parser.add_argument("-t", "--threads", type=int, default=1)
    parser.add_argument("-r", "--region", default=None)
    parser.add_argument("--region_bed", default=None)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--downsample_rate", type=float, default=1.0)
    parser.add_argument("--dry", action="store_true", default=False)
    parser.add_argument("--no_realignment", dest="realignment",
                        action="store_false", default=True,
                        help="Skip SW local realignment before summarizing.")
    if need_model:
        parser.add_argument("-m", "--model_path", default="")
        parser.add_argument(
            "--num_devices", type=int, default=-1,
            help="Accelerators to shard consensus batches over "
                 "(-1 = all local devices; the reference's per-CUDA-device "
                 "polish fan-out, predict_distributed_gpu.py:39-70).")
        parser.add_argument(
            "--quantized", action="store_true", default=False,
            help="Serve the consensus GRU through the static-int8 path "
                 "(exact 1/127 activation scales on the tanh-bounded "
                 "hidden streams; the reference's quantized-serving "
                 "recommendation, CallVariantsArguments.py:204-208).")
        parser.add_argument(
            "--quantize_mode", default="static", choices=["static"],
            help="Quantization scheme used with --quantized.")


def build_parser():
    parser = argparse.ArgumentParser(
        prog="pepper_tpu_polish",
        description="TPU-native assembly polisher (PEPPER polish mode).")
    sub = parser.add_subparsers(dest="sub_command")

    p = sub.add_parser("polish", help="images -> consensus -> stitch")
    _add_common(p, need_model=True)

    p = sub.add_parser("make_images")
    _add_common(p)

    p = sub.add_parser("call_consensus")
    _add_common(p, need_model=True)
    p.add_argument("-i", "--image_dir", required=True)

    p = sub.add_parser("stitch")
    p.add_argument("-i", "--input_dir", required=True)
    p.add_argument("-o", "--output_dir", default="./output")

    p = sub.add_parser("make_train_images")
    _add_common(p)
    p.add_argument("--truth_bam", required=True,
                   help="Truth-to-draft alignment BAM (supervision).")

    p = sub.add_parser("train_model")
    _add_common(p, need_model=True)
    p.add_argument("-i", "--image_dir", required=True)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)

    p = sub.add_parser("test_model", help="Evaluate a polish checkpoint "
                       "on labeled images (reference test_models.py role).")
    _add_common(p, need_model=True)
    p.add_argument("-i", "--image_dir", required=True)

    p = sub.add_parser("run_hyperband", help="Hyperband lr/l2 search over "
                       "the polish trainer (reference run_hyperband.py).")
    _add_common(p)
    p.add_argument("-i", "--image_dir", required=True)
    p.add_argument("--max_iter", type=int, default=27)
    p.add_argument("--eta", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("download_models", help="Download published PEPPER "
                       "model checkpoints (download_model.py:10-27).")
    p.add_argument("-o", "--output_dir", default="pepper_models")
    p.add_argument("--description_url", default=None)
    return parser


def _load_polish_params(options):
    if getattr(options, "dry", False):
        return None
    from ..models.checkpoint import load_params

    if options.model_path.endswith((".pkl", ".pt", ".pth")):
        import torch

        from ..models.torch_convert import polish_params_from_state_dict

        checkpoint = torch.load(options.model_path, map_location="cpu",
                                weights_only=False)
        return polish_params_from_state_dict(
            checkpoint["model_state_dict"])
    params, _ = load_params(options.model_path)
    return params


def main(argv=None):
    from ..utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.sub_command is None:
        parser.print_help()
        return 1

    options = PepperOptions()
    for key, value in vars(args).items():
        if hasattr(options, key):
            setattr(options, key, value)
    options.sub_command = args.sub_command

    if args.sub_command == "download_models":
        from ..utils.download_model import (DEFAULT_DESCRIPTION_URL,
                                            download_models)

        url = args.description_url or DEFAULT_DESCRIPTION_URL
        try:
            paths = download_models(args.output_dir, url)
        except OSError:
            return 1
        print(f"downloaded/verified {len(paths)} model(s) in "
              f"{args.output_dir}")
        return 0
    if args.sub_command == "polish":
        from ..polish.pipeline import polish

        polish(options, _load_polish_params(options))
    elif args.sub_command == "make_images":
        from ..polish.pipeline import make_polish_images

        make_polish_images(options, options.output_dir)
    elif args.sub_command == "make_train_images":
        from ..polish.pipeline import make_polish_train_images

        make_polish_train_images(options, args.truth_bam,
                                 options.output_dir)
    elif args.sub_command == "call_consensus":
        from ..polish.pipeline import call_consensus

        call_consensus(options, args.image_dir, options.output_dir,
                       _load_polish_params(options))
    elif args.sub_command == "stitch":
        from ..polish.pipeline import perform_stitch

        perform_stitch(args.input_dir,
                       f"{args.output_dir.rstrip('/')}/consensus")
    elif args.sub_command == "test_model":
        from ..polish.train import test_polish_model

        test_polish_model(options, args.image_dir, options.model_path,
                          batch_size=options.batch_size)
    elif args.sub_command == "run_hyperband":
        from ..polish.train import run_polish_hyperband

        run_polish_hyperband(options, args.image_dir, options.output_dir,
                             max_iter=args.max_iter, eta=args.eta,
                             seed=args.seed,
                             batch_size=options.batch_size)
    elif args.sub_command == "train_model":
        from ..polish.train import train_polish_model

        train_polish_model(options, args.image_dir, options.output_dir,
                           epochs=args.epochs,
                           learning_rate=args.learning_rate,
                           weight_decay=args.weight_decay)
    return 0


if __name__ == "__main__":
    sys.exit(main())
