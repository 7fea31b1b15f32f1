"""End-to-end pipeline tests on simulated data.

The dry (label-passthrough) backend is the reference's deterministic
integration fixture (--dry, RunInference.py:129-130): with ground-truth
labels as predictions, the emitted VCF must recover the simulated variants
exactly."""

import gzip

import pytest

from pepper_tpu.options import PepperOptions
from pepper_tpu.presets import set_parameters
from pepper_tpu.io.bam_writer import write_bam, write_fasta
from pepper_tpu.pipeline.call_variant import call_variant

from simulate import (random_reference, simulate_reads, write_truth_vcf)


CONTIG = "chr20"


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    ref = random_reference(3000, seed=11)

    def alt_base(pos):
        return {"A": "T", "T": "A", "C": "G", "G": "C"}[ref[pos]]

    het_snp = (500, ref[500], alt_base(500))
    hom_snp = (800, ref[800], alt_base(800))
    het_ins = (1100, ref[1100], ref[1100] + "GG"
               if ref[1100] != "G" else ref[1100] + "TT")
    het_del = (1400, ref[1400:1403], ref[1400])

    hap1 = [het_snp, hom_snp, het_ins, het_del]
    hap2 = [hom_snp]
    records = simulate_reads(ref, [hap1, hap2], read_len=300, stride=20)

    bam_path = str(tmp / "sim.bam")
    fasta_path = str(tmp / "ref.fa")
    truth_path = str(tmp / "truth.vcf")
    bed_path = str(tmp / "truth.bed")
    write_bam(bam_path, [(CONTIG, len(ref))], records)
    write_fasta(fasta_path, {CONTIG: ref})
    write_truth_vcf(truth_path, CONTIG, len(ref), [
        (het_snp[0], het_snp[1], het_snp[2], "1|0"),
        (hom_snp[0], hom_snp[1], hom_snp[2], "1|1"),
        (het_ins[0], het_ins[1], het_ins[2], "1|0"),
        (het_del[0], het_del[1], het_del[2], "1|0"),
    ])
    with open(bed_path, "w") as f:
        f.write(f"{CONTIG}\t0\t{len(ref)}\n")
    return dict(ref=ref, bam=bam_path, fasta=fasta_path, truth=truth_path,
                bed=bed_path, het_snp=het_snp, hom_snp=hom_snp,
                het_ins=het_ins, het_del=het_del, tmp=tmp)


def read_vcf_gz(path):
    records = []
    with gzip.open(path, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            sample = dict(zip(fields[8].split(":"), fields[9].split(":")))
            records.append(dict(contig=fields[0], pos=int(fields[1]) - 1,
                                ref=fields[3], alts=fields[4].split(","),
                                qual=fields[5], filter=fields[6],
                                gt=sample["GT"], sample=sample))
    return records


def make_options(sim, out_dir, dry=True, train=True):
    options = PepperOptions(
        bam=sim["bam"], fasta=sim["fasta"], output_dir=str(out_dir),
        threads=1, sample_name="SAMPLE", ont_r9_guppy5_sup=True,
        sub_command="call_variant", dry=dry, train_mode=train,
        truth_vcf=sim["truth"], region_bed=sim["bed"],
        random_draw_probability=1.0, region=CONTIG)
    return set_parameters(options)


def test_dry_run_recovers_truth(sim):
    out_dir = sim["tmp"] / "out_dry"
    options = make_options(sim, out_dir)
    totals = call_variant(options)
    assert totals[0] > 0

    full = read_vcf_gz(str(out_dir / "PEPPER_VARIANT_FULL.vcf.gz"))
    by_pos = {r["pos"]: r for r in full}

    het_snp, hom_snp = sim["het_snp"], sim["hom_snp"]
    het_ins, het_del = sim["het_ins"], sim["het_del"]

    r = by_pos[het_snp[0]]
    assert r["ref"] == het_snp[1] and r["alts"] == [het_snp[2]]
    assert r["gt"] == "0/1" and r["filter"] == "PASS"

    r = by_pos[hom_snp[0]]
    assert r["alts"] == [hom_snp[2]]
    assert r["gt"] == "1/1"

    r = by_pos[het_ins[0]]
    assert het_ins[2] in r["alts"]      # anchored insertion allele
    assert r["gt"] == "0/1"

    r = by_pos[het_del[0]]
    assert r["ref"] == het_del[1]       # deleted ref sequence
    assert het_del[2] in r["alts"]
    assert r["gt"] == "0/1"

    # confident calls routed to the PEPPER vcf, none re-genotyped
    pepper = read_vcf_gz(str(out_dir / "PEPPER_VARIANT_OUTPUT_PEPPER.vcf.gz"))
    assert {r["pos"] for r in pepper} >= {het_snp[0], hom_snp[0]}


def test_dry_run_no_false_positives(sim):
    out_dir = sim["tmp"] / "out_dry2"
    options = make_options(sim, out_dir)
    call_variant(options)
    full = read_vcf_gz(str(out_dir / "PEPPER_VARIANT_FULL.vcf.gz"))
    true_positions = {sim["het_snp"][0], sim["hom_snp"][0],
                      sim["het_ins"][0], sim["het_del"][0]}
    non_ref = [r for r in full if r["gt"] != "0/0"]
    assert {r["pos"] for r in non_ref} == true_positions


def test_inference_mode_with_random_model(sim):
    """Inference path end-to-end with an untrained model: pipeline must run
    and emit well-formed VCFs (candidates found, arbitrary genotypes)."""
    import jax

    from pepper_tpu.models.transducer import init_transducer_params

    out_dir = sim["tmp"] / "out_model"
    options = make_options(sim, out_dir, dry=False, train=False)
    params = init_transducer_params(jax.random.PRNGKey(0))
    totals = call_variant(options, params=params)
    assert totals[0] > 0
    full = read_vcf_gz(str(out_dir / "PEPPER_VARIANT_FULL.vcf.gz"))
    # candidate sites must at least include the true variant positions
    positions = {r["pos"] for r in full}
    assert sim["het_snp"][0] in positions
    assert sim["hom_snp"][0] in positions


def test_tabix_index_created(sim):
    out_dir = sim["tmp"] / "out_dry"
    for name in ("PEPPER_VARIANT_FULL", "PEPPER_VARIANT_OUTPUT_PEPPER",
                 "PEPPER_VARIANT_OUTPUT_VARIANT_CALLING",
                 "PEPPER_VARIANT_OUTPUT_VARIANT_CALLING_SNPs",
                 "PEPPER_VARIANT_OUTPUT_VARIANT_CALLING_INDEL"):
        assert (out_dir / f"{name}.vcf.gz").exists()
        assert (out_dir / f"{name}.vcf.gz.tbi").exists()


def test_parallel_pipeline_matches_sequential(sim, monkeypatch):
    """threads>1 (process-pool window gen + overlapped parallel decode)
    must emit byte-identical VCF records to the sequential path over the
    same intervals."""
    import pepper_tpu.decode.candidate_finder as cf

    out_seq = sim["tmp"] / "out_par_seq"
    options = make_options(sim, out_seq)
    options.region_size = 500          # 6 intervals over the 3kb contig
    call_variant(options)

    monkeypatch.setattr(cf, "DECODE_CHUNK", 8)  # force many decode chunks
    out_par = sim["tmp"] / "out_par"
    options = make_options(sim, out_par)
    options.region_size = 500
    options.threads = 4
    call_variant(options)

    for name in ("PEPPER_VARIANT_FULL", "PEPPER_VARIANT_OUTPUT_PEPPER",
                 "PEPPER_VARIANT_OUTPUT_VARIANT_CALLING"):
        seq_records = read_vcf_gz(str(out_seq / f"{name}.vcf.gz"))
        par_records = read_vcf_gz(str(out_par / f"{name}.vcf.gz"))
        assert par_records == seq_records
