"""End-to-end pipeline throughput on simulated data (not the driver bench —
see bench.py for the single JSON headline metric).

Simulates a diploid genome at ~40x, then times each stage of call_variant:
window generation (native pileup), TPU inference, candidate decode + VCF.

  python bench_pipeline.py [genome_mb] [threads]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

from pepper_tpu.utils.jax_setup import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    genome_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 4)

    import numpy as np

    from simulate import random_reference, simulate_reads
    from pepper_tpu.io.bam_writer import write_bam, write_fasta
    from pepper_tpu.io.bam import BamReader
    from pepper_tpu.io.fasta import FastaReader
    from pepper_tpu.models.transducer import init_transducer_params
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import generate_windows
    from pepper_tpu.pipeline.regions import build_intervals
    from pepper_tpu.infer.runner import InferenceRunner
    from pepper_tpu.decode.candidate_finder import (decode_predictions,
                                                    find_candidates)
    from pepper_tpu.decode.vcf_writer import VCFWriter
    from pepper_tpu.utils.profiling import StageTimer, log_line

    import jax

    length = int(genome_mb * 1_000_000)
    log_line(f"SIMULATING {genome_mb} Mb GENOME @ ~36x, {threads} THREADS")
    ref = random_reference(length, seed=3)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    rng = np.random.RandomState(3)
    positions = sorted(rng.choice(np.arange(500, length - 500, 700),
                                  size=length // 1400, replace=False))
    hap1 = [(int(p), ref[p], alt[ref[p]]) for p in positions]
    hap2 = [v for i, v in enumerate(hap1) if i % 3 == 0]
    records = simulate_reads(ref, [hap1, hap2], read_len=3000,
                             strides=[170, 170])
    tmp = tempfile.mkdtemp(prefix="pepper_bench_")
    bam = os.path.join(tmp, "r.bam")
    fasta = os.path.join(tmp, "ref.fa")
    with StageTimer("SIMULATION+BAM WRITE", unit="reads") as timer:
        write_bam(bam, [("chrB", length)], records)
        write_fasta(fasta, {"chrB": ref})
        timer.add(len(records))

    options = set_parameters(PepperOptions(
        bam=bam, fasta=fasta, ont_r9_guppy5_sup=True,
        sub_command="call_variant", region="chrB", threads=threads,
        batch_size=4096, output_dir=tmp))
    fasta_handler = FastaReader(fasta)
    intervals, total_bases = build_intervals([("chrB", None)], fasta_handler,
                                             options.region_size)
    aligned_bases = sum(len(r.seq) for r in records)
    log_line(f"READS: {len(records)}  ALIGNED BASES: {aligned_bases:,}  "
             f"TRUE VARIANTS: {len(hap1)}")

    with StageTimer("WINDOW GENERATION (native pileup)",
                    unit="aligned-bases") as timer:
        windows = generate_windows(options, intervals, None, threads)
        timer.add(aligned_bases)
    log_line(f"CANDIDATE WINDOWS: {len(windows)}")

    params = init_transducer_params(jax.random.PRNGKey(0))
    runner = InferenceRunner(params, batch_size=options.batch_size,
                             compute_dtype="bfloat16")
    runner.predict(windows[:options.batch_size])  # compile warmup
    with StageTimer("INFERENCE (TPU)", unit="windows") as timer:
        predictions = runner.predict(windows)
        timer.add(len(windows))

    with StageTimer("DECODE + VCF", unit="candidates") as timer:
        margin, dv = decode_predictions(options, predictions, fasta_handler)
        contigs, _, dv_dict = find_candidates(margin, dv)
        writer = VCFWriter(contigs, fasta_handler, "S", tmp, "FULL", "PEP",
                           "VC")
        totals = writer.write_vcf_records(dv_dict, options)
        writer.close()
        timer.add(totals[0])
    log_line(f"TOTAL RECORDS: {totals[0]}")
    log_line(f"OUTPUT: {tmp}")


if __name__ == "__main__":
    main()
