"""Multi-host sharding building blocks + resumable sharded call_variant
(single-process: jax.process_count()==1, manifest/resume logic exercised
for real)."""

import gzip
import os

import numpy as np
import pytest

from pepper_tpu.parallel.dist import (
    RegionManifest, all_gather_rows, shard_intervals)


def test_shard_intervals_partition():
    intervals = [("c", i * 100, (i + 1) * 100) for i in range(17)]
    shards = [shard_intervals(intervals, p, 4) for p in range(4)]
    # disjoint and complete
    merged = [i for shard in shards for i in shard]
    assert sorted(merged) == sorted(intervals)
    assert all(len(s) in (4, 5) for s in shards)
    # deterministic
    assert shards[1] == shard_intervals(intervals, 1, 4)


def test_region_manifest_resume(tmp_path):
    manifest = RegionManifest(str(tmp_path))
    intervals = [("chr1", 0, 100), ("chr1", 100, 200), ("chr2", 0, 50)]
    manifest.write(intervals)
    assert manifest.read() == intervals
    assert manifest.pending() == intervals
    manifest.mark_done(("chr1", 100, 200))
    assert manifest.pending() == [("chr1", 0, 100), ("chr2", 0, 50)]
    assert manifest.completed() == [("chr1", 100, 200)]

    # a fresh object over the same directory sees the same state
    manifest2 = RegionManifest(str(tmp_path))
    assert manifest2.pending() == [("chr1", 0, 100), ("chr2", 0, 50)]


def test_all_gather_single_host_identity():
    x = np.arange(12).reshape(4, 3)
    np.testing.assert_array_equal(all_gather_rows(x), x)


def test_sharded_call_variant_with_resume(tmp_path):
    from simulate import random_reference, simulate_reads, write_truth_vcf
    from pepper_tpu.io.bam_writer import write_bam, write_fasta
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import call_variant_sharded

    ref = random_reference(2500, seed=41)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}[ref[600]]
    records = simulate_reads(ref, [[(600, ref[600], alt)], []],
                             read_len=300, stride=20)
    bam = str(tmp_path / "s.bam")
    fasta = str(tmp_path / "r.fa")
    truth = str(tmp_path / "t.vcf")
    bed = str(tmp_path / "t.bed")
    write_bam(bam, [("chr5", len(ref))], records)
    write_fasta(fasta, {"chr5": ref})
    write_truth_vcf(truth, "chr5", len(ref), [(600, ref[600], alt, "1|0")])
    with open(bed, "w") as f:
        f.write(f"chr5\t0\t{len(ref)}\n")

    out = str(tmp_path / "out")
    options = set_parameters(PepperOptions(
        bam=bam, fasta=fasta, output_dir=out, threads=1,
        ont_r9_guppy5_sup=True, sub_command="call_variant", dry=True,
        train_mode=True, truth_vcf=truth, region_bed=bed,
        random_draw_probability=1.0, region="chr5", region_size=1000))

    totals = call_variant_sharded(options)
    assert totals is not None and totals[0] > 0

    manifest = RegionManifest(os.path.join(out, "manifest"))
    assert manifest.pending() == []
    first_run = manifest.completed()

    # resume: everything done, second run decodes the same records again
    totals2 = call_variant_sharded(options)
    assert totals2 == totals
    assert manifest.completed() == first_run

    with gzip.open(os.path.join(out, "PEPPER_VARIANT_FULL.vcf.gz"),
                   "rt") as f:
        positions = [int(line.split("\t")[1]) - 1 for line in f
                     if not line.startswith("#")]
    assert 600 in positions


def test_sharded_pipelined_runner_matches_plain(tmp_path):
    """Non-dry sharded path (real InferenceRunner, 1-deep interval
    dispatch pipeline, deferred mark_done) calls the same variants as the
    plain streamed call_variant on the same scene and model."""
    import gzip as _gzip

    import jax

    from simulate import random_reference, simulate_reads
    from pepper_tpu.io.bam_writer import write_bam, write_fasta
    from pepper_tpu.models.transducer import (TransducerConfig,
                                              init_transducer_params)
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.parallel.dist import RegionManifest
    from pepper_tpu.pipeline.call_variant import (call_variant,
                                                  call_variant_sharded)

    ref = random_reference(3000, seed=7)
    variants = []
    for pos in (400, 1300, 2200):
        alt = {"A": "T", "T": "A", "C": "G", "G": "C"}[ref[pos]]
        variants.append((pos, ref[pos], alt))
    records = simulate_reads(ref, [variants, []], read_len=300, stride=20)
    bam = str(tmp_path / "s.bam")
    fasta = str(tmp_path / "r.fa")
    write_bam(bam, [("chr6", len(ref))], records)
    write_fasta(fasta, {"chr6": ref})

    params = init_transducer_params(jax.random.PRNGKey(3),
                                    TransducerConfig())

    def read_calls(out_dir):
        path = os.path.join(out_dir, "PEPPER_VARIANT_FULL.vcf.gz")
        calls = []
        with _gzip.open(path, "rt") as f:
            for line in f:
                if line.startswith("#"):
                    continue
                fields = line.rstrip("\n").split("\t")
                gt = fields[9].split(":")[0]
                calls.append((fields[0], fields[1], fields[3], fields[4],
                              gt))
        return calls

    def opts(out):
        return set_parameters(PepperOptions(
            bam=bam, fasta=fasta, output_dir=str(out), threads=1,
            ont_r9_guppy5_sup=True, sub_command="call_variant",
            region="chr6", region_size=1000))

    call_variant(opts(tmp_path / "plain"), params=params)
    call_variant_sharded(opts(tmp_path / "sharded"), params=params)

    plain = read_calls(str(tmp_path / "plain"))
    sharded = read_calls(str(tmp_path / "sharded"))
    assert plain == sharded
    assert len(plain) > 0
    manifest = RegionManifest(
        os.path.join(str(tmp_path / "sharded"), "manifest"))
    assert manifest.pending() == []
