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

    import concurrent.futures

    from pepper_tpu.decode.candidate_finder import (
        decode_predictions_parallel)

    with concurrent.futures.ProcessPoolExecutor(max_workers=threads) as pool:
        with StageTimer("DECODE (pool)", unit="candidates") as timer:
            margin, dv = decode_predictions_parallel(
                options, predictions, fasta, threads, pool=pool)
            timer.add(len(predictions))
        contigs, _, dv_dict = find_candidates(margin, dv)
        with StageTimer("VCF WRITE (pool)", unit="records") as timer:
            writer = VCFWriter(contigs, fasta_handler, "S", tmp, "FULL",
                               "PEP", "VC")
            totals = writer.write_vcf_records_parallel(dv_dict, options,
                                                       pool, threads)
            writer.close()
            timer.add(totals[0])
    log_line(f"TOTAL RECORDS: {totals[0]}")
    log_line(f"OUTPUT: {tmp}")


def bench_vcf_only(n_sites: int, threads: int):
    """WGS-tail VCF emission bench: n_sites synthetic multiallelic-ish
    sites -> 5 bgzf VCFs + tabix, sequential vs pool-parallel."""
    import concurrent.futures
    import shutil

    import numpy as np

    from pepper_tpu.decode.vcf_writer import VCFWriter
    from pepper_tpu.io.bam_writer import write_fasta
    from pepper_tpu.io.fasta import FastaReader
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.utils.profiling import StageTimer, log_line

    options = set_parameters(PepperOptions(
        ont_r9_guppy5_sup=True, sub_command="call_variant"))
    tmp = tempfile.mkdtemp(prefix="pepper_vcfbench_")
    contig_len = 500_000_000
    write_fasta(os.path.join(tmp, "ref.fa"),
                {"chr1": "ACGT" * 256})  # header only needs names/lengths
    fasta_handler = FastaReader(os.path.join(tmp, "ref.fa"))
    # synthetic dv candidates shaped like decode output (12-tuple)
    rng = np.random.RandomState(7)
    log_line(f"SYNTHESIZING {n_sites:,} SITES")
    positions = np.sort(rng.choice(contig_len, size=n_sites, replace=False))
    probs = rng.dirichlet(np.ones(3) * 0.6, size=n_sites)
    depths = rng.randint(20, 60, size=n_sites)
    supports = rng.randint(5, 40, size=n_sites)
    kinds = rng.randint(0, 3, size=n_sites)
    dv_dict = {}
    for i in range(n_sites):
        pos = int(positions[i])
        ref_allele, alt = (("A", "T"), ("A", "ACC"), ("ACC", "A"))[kinds[i]]
        p = probs[i]
        candidate = ("chr1", pos, pos + len(ref_allele), ref_allele,
                     [alt], [0, 1], int(depths[i]), [int(supports[i])],
                     float(p.max()), p, [float(p[1:].max())], bool(i % 5 == 0))
        dv_dict[("chr1", pos)] = [candidate]

    results = {}
    for label, env, run_threads in (
            ("native, 1 thread", None, 1),
            (f"native, {threads} threads", None, threads),
            ("python engine, 1 core", "1", 1),
            (f"python engine, pool x{threads}", "1", threads)):
        out = os.path.join(tmp, label.replace(" ", "_").replace(",", ""))
        os.makedirs(out)
        if env:
            os.environ["PEPPER_PY_VCF"] = env
        pool = None
        if env and run_threads > 1:
            pool = concurrent.futures.ProcessPoolExecutor(
                max_workers=run_threads)
            pool.submit(os.getpid).result()  # spin up outside the timer
        try:
            writer = VCFWriter(["chr1"], fasta_handler, "S", out, "FULL",
                               "PEP", "VC")
            with StageTimer(f"VCF WRITE ({label})", unit="records") as timer:
                totals = writer.write_vcf_records_parallel(
                    dv_dict, options, pool, run_threads)
                writer.close()
                timer.add(totals[0])
            results[label] = totals
        finally:
            os.environ.pop("PEPPER_PY_VCF", None)
            if pool is not None:
                pool.shutdown()
    assert len(set(results.values())) == 1, results
    shutil.rmtree(tmp)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "vcf":
        bench_vcf_only(int(sys.argv[2]) if len(sys.argv) > 2 else 500_000,
                       int(sys.argv[3]) if len(sys.argv) > 3
                       else (os.cpu_count() or 4))
    else:
        main()
