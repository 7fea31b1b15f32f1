"""Subprocess entry for the multi-host trainer tests: optional
jax.distributed init (local rendezvous), then the ordinary trainers —
both detect process_count > 1 and switch to the global mesh with per-host
batch slices (the reference's DDP loop equivalents:
pepper/modules/python/models/train_distributed.py:254-283 is the LIVE
polish DDP; the variant package's is commented out upstream)."""

import os
import sys


def main():
    coordinator, num_processes, process_id, image_dir, out_dir = sys.argv[1:6]
    mode = sys.argv[6] if len(sys.argv) > 6 else "variant"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if int(num_processes) > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=int(num_processes),
                                   process_id=int(process_id))
    sys.path.insert(0, os.path.dirname(__file__))

    from pepper_tpu.options import PepperOptions

    if mode == "polish":
        from pepper_tpu.polish.train import train_polish_model

        train_polish_model(
            PepperOptions(batch_size=4), image_dir, out_dir,
            epochs=1, learning_rate=1e-3, batch_size=4,
            holdout_fraction=0.25, seed=3)
        accuracy = "polish"
    else:
        from pepper_tpu.models.transducer import TransducerConfig
        from pepper_tpu.train.trainer import train_model

        model_path, accuracy = train_model(
            PepperOptions(batch_size=8), image_dir, out_dir,
            epochs=2, learning_rate=1e-3, step_size=1000, batch_size=8,
            holdout_fraction=0.25, seed=3,
            config=TransducerConfig(hidden=16, linear_size=32))
    print(f"WORKER {process_id} DONE ACC {accuracy}")


if __name__ == "__main__":
    main()
