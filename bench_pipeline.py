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


def bench_device(genome_mb: float, threads: int):
    """Pileup-flow shootout on the current accelerator: host windows ->
    runner vs the two fused single-dispatch flows (native-image and
    event-stream Pallas histogram).  Rates follow the relay methodology:
    every dispatch is a distinct execution (different region batch) and
    the probability fetch is the timing barrier."""
    import time

    import numpy as np

    import jax

    from simulate import random_reference, simulate_reads
    from pepper_tpu.io.bam_writer import write_bam, write_fasta
    from pepper_tpu.io.bam import BamReader
    from pepper_tpu.io.fasta import FastaReader
    from pepper_tpu.infer.device_runner import DeviceRegionRunner
    from pepper_tpu.infer.runner import InferenceRunner
    from pepper_tpu.models.transducer import init_transducer_params
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.pipeline.call_variant import generate_windows
    from pepper_tpu.pipeline.regions import build_intervals
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.utils.profiling import StageTimer, log_line

    length = int(genome_mb * 1_000_000)
    log_line(f"SIMULATING {genome_mb} Mb @ ~36x, {threads} THREADS, "
             f"BACKEND {jax.default_backend()}")
    ref = random_reference(length, seed=5)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    rng = np.random.RandomState(5)
    positions = sorted(rng.choice(np.arange(500, length - 500, 700),
                                  size=length // 1400, replace=False))
    hap1 = [(int(p), ref[p], alt[ref[p]]) for p in positions]
    hap2 = [v for i, v in enumerate(hap1) if i % 3 == 0]
    records = simulate_reads(ref, [hap1, hap2], read_len=3000,
                             strides=[170, 170])
    tmp = tempfile.mkdtemp(prefix="pepper_devbench_")
    bam = os.path.join(tmp, "r.bam")
    fasta = os.path.join(tmp, "ref.fa")
    write_bam(bam, [("chrB", length)], records)
    write_fasta(fasta, {"chrB": ref})

    def make_options(device):
        return set_parameters(PepperOptions(
            bam=bam, fasta=fasta, ont_r9_guppy5_sup=True,
            sub_command="call_variant", region="chrB", threads=threads,
            batch_size=4096, output_dir=tmp, device_pileup=device,
            region_size=10000))

    fasta_handler = FastaReader(fasta)
    intervals, _ = build_intervals([("chrB", None)], fasta_handler, 10000)
    params = init_transducer_params(jax.random.PRNGKey(0))

    # ---- A: host windows + padded-batch runner ----
    options = make_options(False)
    with StageTimer("A: HOST WINDOW GENERATION", unit="windows") as timer:
        windows = generate_windows(options, intervals, None, threads)
        timer.add(len(windows))
    runner = InferenceRunner(params, batch_size=4096,
                             compute_dtype="bfloat16")
    runner.predict(windows[:4096])  # compile
    with StageTimer("A: RUNNER INFERENCE", unit="windows") as timer:
        host_predictions = runner.predict(windows)
        timer.add(len(windows))

    # ---- B: native image -> fused device windows ----
    options = make_options(True)
    with StageTimer("B: REGION PACKAGE GENERATION", unit="windows") as t:
        packages = generate_windows(options, intervals, None, threads)
        n_windows = sum(len(p.windows) for p in packages)
        t.add(n_windows)
    device_runner = DeviceRegionRunner(params, compute_dtype="bfloat16",
                                       region_batch=32)
    device_runner.predict(packages[:32])  # compile
    with StageTimer("B: FUSED IMAGE DISPATCH (32 regions/dispatch)",
                    unit="windows") as timer:
        device_predictions = device_runner.predict(packages)
        timer.add(n_windows)
    host_by_key = {(p.contig, p.position, tuple(p.candidates)): p
                   for p in host_predictions}
    agree = sum(
        1 for p in device_predictions
        if np.argmax(host_by_key[(p.contig, p.position,
                                  tuple(p.candidates))].prediction_base)
        == np.argmax(p.prediction_base))
    log_line(f"B vs A argmax agreement: {agree}/{len(device_predictions)}")

    # ---- C: event stream -> Pallas histogram fused flow ----
    from pepper_tpu.ops.device_windows import (classify_regions_events,
                                               descriptors_from_candidates)
    from pepper_tpu.ops.pileup_ref import (RegionalSummary,
                                           encode_reference_values)

    bam_handler = BamReader(bam)
    n_sample = min(64, len(intervals))
    event_list, ref_channels, descriptor_list, region_sizes = [], [], [], []
    k_events = 0
    with StageTimer("C: PYTHON EVENT-STREAM GENERATION",
                    unit="aligned-bases") as timer:
        covered = 0
        for contig, start, end in intervals[:n_sample]:
            reads = bam_handler.get_reads(contig, start, end, False, 0, 0)
            ref_seq = fasta_handler.get_reference_sequence(
                contig, start, end + 1)
            summary = RegionalSummary(contig, start, end, ref_seq,
                                      matrix_backend="recorder")
            summary.generate_max_insert_summary(reads)
            holder = {}
            summary.matrix_backend = \
                lambda r, c, d, shape, holder=holder: (
                    holder.__setitem__("events", (r, c, d))
                    or np.zeros(shape, np.int64))
            summary.generate_summary(
                reads, min_snp_baseq=options.min_snp_baseq,
                min_indel_baseq=options.min_indel_baseq,
                snp_freq_threshold=options.snp_frequency,
                insert_freq_threshold=options.insert_frequency,
                delete_freq_threshold=options.delete_frequency,
                min_coverage_threshold=options.min_coverage_threshold,
                snp_candidate_freq_threshold=(
                    options.snp_candidate_frequency_threshold),
                indel_candidate_freq_threshold=(
                    options.indel_candidate_frequency_threshold),
                candidate_support_threshold=(
                    options.candidate_support_threshold),
                skip_indels=False, candidate_region_start=start,
                candidate_region_end=end)
            if "events" not in holder or not summary.descriptor_rows:
                continue
            event_list.append(holder["events"])
            k_events += len(holder["events"][0])
            n_ref = end - start + 1
            values = np.asarray(encode_reference_values(ref_seq))
            if summary.total_observed_insert_bases:
                values = np.repeat(values,
                                   1 + summary.max_observed_insert[:n_ref])
            ref_channels.append(values)
            descriptor_list.append(descriptors_from_candidates(
                summary.descriptor_rows, summary))
            region_sizes.append(summary.region_rows)
            covered += sum(len(reads.read_seq(i))
                           for i in range(reads.n_reads))
        timer.add(covered)
    n_windows_c = sum(len(d.base_index) for d in descriptor_list)
    log_line(f"C: {len(event_list)} regions, {k_events:,} events, "
             f"{n_windows_c} windows")
    batch = min(8, len(event_list))
    probs = classify_regions_events(  # compile
        params, event_list[:batch], ref_channels[:batch],
        descriptor_list[:batch], region_sizes[:batch])
    float(np.asarray(probs).sum())
    with StageTimer(f"C: FUSED EVENT DISPATCH ({batch} regions/dispatch)",
                    unit="windows") as timer:
        checksum = 0.0
        for i in range(0, len(event_list) - batch + 1, batch):
            probs = classify_regions_events(
                params, event_list[i:i + batch],
                ref_channels[i:i + batch], descriptor_list[i:i + batch],
                region_sizes[i:i + batch])
            checksum += float(np.asarray(probs).sum())  # host barrier
        timer.add(sum(len(d.base_index)
                      for d in descriptor_list[:len(event_list)
                                               // batch * batch]))
    log_line(f"EVENTS PER WINDOW: {k_events / max(1, n_windows_c):,.0f}; "
             "see PERFORMANCE.md for the default justification")


def bench_consensus(num_devices: int, batch: int = 512,
                    dtype: str = "float32"):
    """Polish consensus positions/s on the device(s), optionally
    mesh-sharded (the `--num_devices` serving path).  Relay methodology
    (PERFORMANCE.md): N distinct perturbed batches inside ONE jitted
    dispatch, scalar checksum fetch, marginal rate over two scan lengths —
    measures sustained device throughput, not relay transfer.
    dtype="static" serves the int8 tree (consensus_scan_static)."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pepper_tpu.models.polish_gru import init_polish_params
    from pepper_tpu.parallel.mesh import local_mesh, replicate, shard_batch
    from pepper_tpu.polish.consensus import (SEQ_LENGTH, consensus_scan,
                                             consensus_scan_static)
    from pepper_tpu.utils.profiling import log_line

    static = dtype.startswith("static")
    compute_dtype = (jnp.bfloat16 if dtype in ("bfloat16", "static_bf16")
                     else jnp.float32)
    mesh = local_mesh(num_devices)
    params = init_polish_params(jax.random.PRNGKey(0))
    scan_fn = consensus_scan
    if static:
        from pepper_tpu.models.quantize import polish_quantize_params_static

        params = jax.tree_util.tree_map(
            jnp.asarray, polish_quantize_params_static(params))
        scan_fn = consensus_scan_static
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 40, size=(batch, SEQ_LENGTH, 10)),
                    compute_dtype)
    if mesh is not None:
        params = replicate(mesh, params)
        x = shard_batch(mesh, x)

    @partial(jax.jit, static_argnames=("iters",))
    def run(params, x, iters):
        def body(acc, i):
            xi = x + i.astype(x.dtype)
            _, labels, phred = scan_fn(params, xi)
            return acc + jnp.sum(phred) + jnp.sum(
                labels.astype(jnp.float32)), ()

        total, _ = jax.lax.scan(body, jnp.float32(0.),
                                jnp.arange(iters, dtype=jnp.int32))
        return total

    def timed(iters):
        float(run(params, x, iters))  # compile warmup
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            float(run(params, x, iters))
            best = min(best, time.perf_counter() - start)
        return best

    n_short, n_long = 4, 16
    t_short, t_long = timed(n_short), timed(n_long)
    marginal = (t_long - t_short) / (n_long - n_short)
    rate = (batch * SEQ_LENGTH / marginal if marginal > 0
            else batch * n_long * SEQ_LENGTH / t_long)
    where = (f"mesh of {len(mesh.devices.ravel())} devices" if mesh
             else "single device")
    log_line(f"CONSENSUS ({where}, batch {batch}, {dtype}): "
             f"{rate / 1e6:.1f}M positions/s sustained")


def bench_polish_images(genome_kb: float = 500, error_model: str = "ont",
                        repeats: int = 2):
    """Polish make_images throughput (1 kb windows @ ~40x, realignment on)
    — the PERFORMANCE.md "Polish make_images" row.

      python bench_pipeline.py polish [kb] [error_model] [repeats]
    """
    import numpy as np

    from simulate import random_reference, simulate_reads
    from pepper_tpu.io.bam import BamReader
    from pepper_tpu.io.bam_writer import write_bam, write_fasta
    from pepper_tpu.io.fasta import FastaReader
    from pepper_tpu.polish.pipeline import (build_polish_intervals,
                                            summarize_interval)
    from pepper_tpu.utils.profiling import log_line

    length = int(genome_kb * 1000)
    tmp = tempfile.mkdtemp(prefix="pepper_polishbench_")
    ref = random_reference(length, seed=9)
    records = simulate_reads(ref, [[]], read_len=5000, stride=125,
                             error_model=error_model)
    bam = os.path.join(tmp, "r.bam")
    fasta = os.path.join(tmp, "d.fa")
    write_bam(bam, [("d", length)], records)
    write_fasta(fasta, {"d": ref})
    aligned = sum(len(r.seq) for r in records)
    log_line(f"POLISH IMAGES: {genome_kb} kb draft @ ~40x "
             f"({aligned:,} aligned bases, {error_model})")
    bam_handler = BamReader(bam)
    fasta_handler = FastaReader(fasta)
    intervals = build_polish_intervals([("d", None)], fasta_handler)
    best = float("inf")
    n_images = 0
    for _ in range(repeats):
        start = time.perf_counter()
        n_images = 0
        for contig, lo, hi in intervals:
            images, _, _, _ = summarize_interval(bam_handler, fasta_handler,
                                                 contig, lo, hi)
            n_images += len(images)
        best = min(best, time.perf_counter() - start)
    log_line(f"MAKE_IMAGES: {best:.2f} s "
             f"({aligned / best / 1e6:.2f}M aligned b/s/core), "
             f"{n_images} images")
    try:
        import ctypes

        from pepper_tpu.io.native import get_lib

        lib = get_lib()
        attempts = ctypes.c_longlong()
        hits = ctypes.c_longlong()
        lib.pepper_band_stats(ctypes.byref(attempts), ctypes.byref(hits))
        if attempts.value:
            log_line(f"BANDED REALIGN: {hits.value}/{attempts.value} "
                     "certified in-band")
    except (OSError, AttributeError):
        pass
    return best


def bench_windows(genome_mb: float, error_model: str = "ont",
                  repeats: int = 2):
    """Single-core window-generation bench under a realistic error model —
    the flagship's e2e bound (PERFORMANCE.md "round 4" row).  Builds a
    mixed-variant genome at ~36x with ONT-like errors, then times
    (a) the BAM fetch+decode alone and (b) full create_region_summary
    (fetch + native pileup walk + window emission), one thread.

      python bench_pipeline.py windows [mb] [error_model] [repeats]
    """
    import numpy as np

    from simulate import (build_mixed_genome, random_reference,
                          simulate_reads)
    from pepper_tpu.io.bam import BamReader
    from pepper_tpu.io.bam_writer import write_bam, write_fasta
    from pepper_tpu.io.fasta import FastaReader
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.pipeline.call_variant import generate_windows
    from pepper_tpu.pipeline.regions import build_intervals
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.utils.profiling import log_line

    length = int(genome_mb * 1_000_000)
    tmp = tempfile.mkdtemp(prefix="pepper_winbench_")
    log_line(f"SIMULATING {genome_mb} Mb GENOME @ ~36x, "
             f"error_model={error_model}")
    ref = random_reference(length, seed=3)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    rng = np.random.RandomState(3)
    positions = sorted(rng.choice(np.arange(500, length - 500, 700),
                                  size=length // 1400, replace=False))
    hap1 = [(int(p), ref[p], alt[ref[p]]) for p in positions]
    hap2 = [v for i, v in enumerate(hap1) if i % 3 == 0]
    records = simulate_reads(ref, [hap1, hap2], read_len=3000,
                             strides=[170, 170], error_model=error_model)
    bam = os.path.join(tmp, "r.bam")
    fasta = os.path.join(tmp, "ref.fa")
    write_bam(bam, [("chrB", length)], records)
    write_fasta(fasta, {"chrB": ref})
    aligned_bases = sum(len(r.seq) for r in records)
    log_line(f"READS: {len(records)}  ALIGNED BASES: {aligned_bases:,}")

    options = set_parameters(PepperOptions(
        bam=bam, fasta=fasta, ont_r9_guppy5_sup=True,
        sub_command="call_variant", region="chrB", threads=1,
        output_dir=tmp))
    fasta_handler = FastaReader(fasta)
    intervals, _ = build_intervals([("chrB", None)], fasta_handler,
                                   options.region_size)

    # (a) BAM fetch + decode alone
    best_fetch = float("inf")
    for _ in range(repeats):
        reader = BamReader(bam)
        start = time.perf_counter()
        total = 0
        for contig, lo, hi in intervals:
            batch = reader.get_reads(contig, max(0, lo - 100), hi + 100,
                                     False, options.min_mapq,
                                     options.min_snp_baseq)
            total += int(batch.seq_offsets[-1])
        best_fetch = min(best_fetch, time.perf_counter() - start)
    log_line(f"BAM FETCH: {best_fetch:.2f} s "
             f"({aligned_bases / best_fetch / 1e6:.1f}M aligned b/s)")

    # (b) full window generation, one thread
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        windows = generate_windows(options, intervals, None, 1)
        best = min(best, time.perf_counter() - start)
    log_line(f"WINDOW GENERATION (1 thread): {best:.2f} s "
             f"({aligned_bases / best / 1e6:.1f}M aligned b/s/core), "
             f"{len(windows)} windows")
    return best


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "consensus":
        bench_consensus(int(sys.argv[2]) if len(sys.argv) > 2 else 1,
                        int(sys.argv[3]) if len(sys.argv) > 3 else 512,
                        sys.argv[4] if len(sys.argv) > 4 else "float32")
    elif len(sys.argv) > 1 and sys.argv[1] == "vcf":
        bench_vcf_only(int(sys.argv[2]) if len(sys.argv) > 2 else 500_000,
                       int(sys.argv[3]) if len(sys.argv) > 3
                       else (os.cpu_count() or 4))
    elif len(sys.argv) > 1 and sys.argv[1] == "polish":
        bench_polish_images(
            float(sys.argv[2]) if len(sys.argv) > 2 else 500,
            sys.argv[3] if len(sys.argv) > 3 else "ont",
            int(sys.argv[4]) if len(sys.argv) > 4 else 2)
    elif len(sys.argv) > 1 and sys.argv[1] == "windows":
        bench_windows(float(sys.argv[2]) if len(sys.argv) > 2 else 3.0,
                      sys.argv[3] if len(sys.argv) > 3 else "ont",
                      int(sys.argv[4]) if len(sys.argv) > 4 else 2)
    elif len(sys.argv) > 1 and sys.argv[1] == "device":
        bench_device(float(sys.argv[2]) if len(sys.argv) > 2 else 5.0,
                     int(sys.argv[3]) if len(sys.argv) > 3
                     else (os.cpu_count() or 4))
    else:
        main()
