"""Dry-run e2e across every platform preset (SetParameters.py:12-283
threshold tables): each preset's gates must let clean simulated truth
through; --clr must skip indel candidates entirely."""

import gzip

import pytest

from pepper_tpu.options import PepperOptions
from pepper_tpu.pipeline.call_variant import call_variant
from pepper_tpu.presets import set_parameters

from simulate import (
    random_reference, simulate_reads, write_truth_vcf)
from pepper_tpu.io.bam_writer import write_bam, write_fasta

CONTIG = "ctg"


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("presets")
    ref = random_reference(2500, seed=29)

    def alt_base(pos):
        return {"A": "T", "T": "A", "C": "G", "G": "C"}[ref[pos]]

    het_snp = (400, ref[400], alt_base(400))
    hom_snp = (900, ref[900], alt_base(900))
    het_ins = (1300, ref[1300], ref[1300] + ("GG" if ref[1300] != "G"
                                             else "TT"))
    het_del = (1700, ref[1700:1703], ref[1700])
    hap1 = [het_snp, hom_snp, het_ins, het_del]
    hap2 = [hom_snp]
    records = simulate_reads(ref, [hap1, hap2], read_len=300, stride=20)

    bam = str(tmp / "sim.bam")
    fasta = str(tmp / "ref.fa")
    truth = str(tmp / "truth.vcf")
    bed = str(tmp / "truth.bed")
    write_bam(bam, [(CONTIG, len(ref))], records)
    write_fasta(fasta, {CONTIG: ref})
    write_truth_vcf(truth, CONTIG, len(ref), [
        (het_snp[0], het_snp[1], het_snp[2], "1|0"),
        (hom_snp[0], hom_snp[1], hom_snp[2], "1|1"),
        (het_ins[0], het_ins[1], het_ins[2], "1|0"),
        (het_del[0], het_del[1], het_del[2], "1|0"),
    ])
    with open(bed, "w") as f:
        f.write(f"{CONTIG}\t0\t{len(ref)}\n")
    return dict(bam=bam, fasta=fasta, truth=truth, bed=bed, tmp=tmp,
                het_snp=het_snp, hom_snp=hom_snp, het_ins=het_ins,
                het_del=het_del)


def vcf_positions(path):
    out = {}
    with gzip.open(path, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.split("\t")
            out[int(fields[1]) - 1] = (fields[3], fields[4].split(","))
    return out


@pytest.mark.parametrize("preset", ["ont_r9_guppy5_sup", "ont_r9_guppy4_hac",
                                    "ont_r10_q20", "hifi", "clr"])
def test_preset_dry_run(sim, preset, tmp_path):
    out_dir = tmp_path / preset
    options = PepperOptions(
        bam=sim["bam"], fasta=sim["fasta"], output_dir=str(out_dir),
        threads=1, sample_name="SAMPLE", sub_command="call_variant",
        dry=True, train_mode=True, truth_vcf=sim["truth"],
        region_bed=sim["bed"], random_draw_probability=1.0, region=CONTIG)
    setattr(options, preset, True)
    options = set_parameters(options)
    assert options.min_mapq is not None    # preset table applied

    totals = call_variant(options)
    assert totals[0] > 0

    calls = vcf_positions(str(out_dir / "PEPPER_VARIANT_FULL.vcf.gz"))
    # SNPs recovered under every preset
    assert sim["het_snp"][0] in calls
    assert sim["hom_snp"][0] in calls
    if preset == "clr":
        # --clr sets skip_indels (SetParameters.py clr table)
        assert options.skip_indels
        assert sim["het_ins"][0] not in calls
        assert sim["het_del"][0] not in calls
    else:
        assert sim["het_ins"][0] in calls
        assert sim["het_del"][0] in calls
