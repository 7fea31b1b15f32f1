"""Subprocess entry for the two-process multi-host test: initializes
jax.distributed (local rendezvous) and runs call_variant_sharded."""

import os
import sys


def main():
    coordinator, num_processes, process_id, base = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(num_processes),
                               process_id=int(process_id))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))

    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import call_variant_sharded

    options = set_parameters(PepperOptions(
        bam=os.path.join(base, "sim.bam"),
        fasta=os.path.join(base, "ref.fa"),
        output_dir=os.path.join(base, "out"),
        threads=1, ont_r9_guppy5_sup=True, sub_command="call_variant",
        dry=True, train_mode=True,
        truth_vcf=os.path.join(base, "truth.vcf"),
        region_bed=os.path.join(base, "conf.bed"),
        random_draw_probability=1.0, region="chrD", region_size=1000))
    totals = call_variant_sharded(options)
    if int(process_id) == 0:
        assert totals is not None and totals[0] > 0, totals
    print(f"WORKER {process_id} DONE {totals}")


if __name__ == "__main__":
    main()
