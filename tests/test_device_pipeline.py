"""End-to-end --device_pileup: the fused device-window flow through the
real call_variant path must produce the same VCFs as the host window
pipeline (same params, same float32 compute)."""

import gzip
import os

import numpy as np
import pytest

from simulate import random_reference, simulate_reads

from pepper_tpu.io.bam_writer import write_bam, write_fasta
from pepper_tpu.options import PepperOptions
from pepper_tpu.pipeline.call_variant import call_variant
from pepper_tpu.presets import set_parameters

CONTIG = "chrF"


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("device_sim")
    ref = random_reference(30_000, seed=41)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    rng = np.random.RandomState(41)
    positions = sorted(rng.choice(np.arange(500, 29_500, 400),
                                  size=40, replace=False))
    hap1 = [(int(p), ref[p], alt[ref[p]]) for p in positions]
    hap2 = [v for i, v in enumerate(hap1) if i % 2 == 0]
    records = simulate_reads(ref, [hap1, hap2], read_len=600,
                             strides=[40, 40])
    bam = str(tmp / "r.bam")
    fasta = str(tmp / "ref.fa")
    write_bam(bam, [(CONTIG, len(ref))], records)
    write_fasta(fasta, {CONTIG: ref})
    return dict(bam=bam, fasta=fasta, tmp=tmp, truth=positions)


def read_vcf(path):
    with gzip.open(path, "rt") as f:
        return [line for line in f if not line.startswith("#")]


def run(sim, out_name, device_pileup, threads=1):
    import jax

    from pepper_tpu.models.transducer import (TransducerConfig,
                                              init_transducer_params)

    params = init_transducer_params(jax.random.PRNGKey(7),
                                    TransducerConfig(hidden=32,
                                                     linear_size=64))
    out = str(sim["tmp"] / out_name)
    options = set_parameters(PepperOptions(
        bam=sim["bam"], fasta=sim["fasta"], output_dir=out,
        threads=threads, sample_name="S", ont_r9_guppy5_sup=True,
        sub_command="call_variant", device_pileup=device_pileup,
        device_region_batch=4, region=CONTIG, region_size=5000,
        batch_size=256))
    totals = call_variant(options, params)
    return totals, out


def test_device_pileup_matches_host_pipeline(sim):
    totals_host, out_host = run(sim, "host", device_pileup=False)
    totals_dev, out_dev = run(sim, "dev", device_pileup=True)
    assert totals_host[0] > 0
    assert totals_dev == totals_host
    for name in ("PEPPER_VARIANT_FULL", "PEPPER_VARIANT_OUTPUT_PEPPER",
                 "PEPPER_VARIANT_OUTPUT_VARIANT_CALLING"):
        host_records = read_vcf(os.path.join(out_host, name + ".vcf.gz"))
        device_records = read_vcf(os.path.join(out_dev, name + ".vcf.gz"))
        assert device_records == host_records, name


def test_device_pileup_threaded_matches(sim):
    """Pool-parallel interval workers ship RegionPackages; the stream must
    stay identical."""
    totals_host, out_host = run(sim, "host2", device_pileup=False,
                                threads=2)
    totals_dev, out_dev = run(sim, "dev2", device_pileup=True, threads=2)
    assert totals_dev == totals_host
    host_records = read_vcf(os.path.join(
        out_host, "PEPPER_VARIANT_FULL.vcf.gz"))
    device_records = read_vcf(os.path.join(
        out_dev, "PEPPER_VARIANT_FULL.vcf.gz"))
    assert device_records == host_records


def test_resolve_device_pileup_gating():
    """Unsupported combinations must clear the flag (never silently serve
    a different model); the supported combination keeps it."""
    from pepper_tpu.pipeline.call_variant import resolve_device_pileup

    def make(**kw):
        base = dict(device_pileup=True, dry=False, use_hp_info=False,
                    quantized=False, model_type="lstm")
        base.update(kw)
        return PepperOptions(**base)

    for blocker in (dict(dry=True), dict(use_hp_info=True),
                    dict(quantized=True), dict(model_type="transformer")):
        options = make(**blocker)
        resolve_device_pileup(options)
        assert options.device_pileup is False, blocker

    options = make()
    resolve_device_pileup(options)
    assert options.device_pileup is True
