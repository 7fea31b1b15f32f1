"""HP-mode (haplotagged, 48-channel) pileup encoder tests."""

import gzip

import numpy as np
import pytest

from pepper_tpu.io.bam import BamReader
from pepper_tpu.io.bam_writer import BamRecord, write_bam, write_fasta
from pepper_tpu.ops.pileup_hp import RegionalSummaryHP, get_feature_index_hp

from simulate import random_reference, simulate_reads, write_truth_vcf

REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"

THRESHOLDS = dict(
    min_snp_baseq=1, min_indel_baseq=1, snp_freq_threshold=0.10,
    insert_freq_threshold=0.15, delete_freq_threshold=0.15,
    min_coverage_threshold=3, snp_candidate_freq_threshold=0.10,
    indel_candidate_freq_threshold=0.10, candidate_support_threshold=2,
    skip_indels=False, candidate_region_start=0, candidate_region_end=39,
)


def test_hp_feature_index_blocks():
    # hp1: fwd start 7, rev start 18; hp2: fwd start 29, rev start 40
    assert get_feature_index_hp("A", "A", False, 1) == 8
    assert get_feature_index_hp("A", "A", True, 1) == 19
    assert get_feature_index_hp("A", "A", False, 2) == 30
    assert get_feature_index_hp("A", "A", True, 2) == 41
    assert get_feature_index_hp("A", "*", False, 2) == 36
    assert get_feature_index_hp("N", "A", False, 1) == -1


def build_batch(tmp_path, reads):
    reads = sorted(reads, key=lambda r: r.pos)
    path = str(tmp_path / "t.bam")
    write_bam(path, [("chr1", 40)], reads)
    return BamReader(path).get_reads("chr1", 0, 39)


def hp_read(name, seq, hp, flag=0):
    return BamRecord(name, 0, 0, 60, "40M", seq, [30] * 40, flag=flag, hp=hp)


def test_hp_snp_window(tmp_path):
    snp_seq = REF[:20] + "T" + REF[21:]
    reads = [hp_read(f"m{i}", REF, hp=2) for i in range(5)]          # HP2 ref
    reads += [hp_read(f"s{i}", snp_seq, hp=1) for i in range(4)]     # HP1 alt
    reads += [hp_read("u0", snp_seq, hp=0)]                          # untagged
    batch = build_batch(tmp_path, reads)
    rs = RegionalSummaryHP("chr1", 0, 39, REF)
    rs.generate_max_insert_summary(batch)
    wins = rs.generate_summary(batch, **THRESHOLDS)
    assert len(wins) == 1
    w = wins[0]
    assert w.image.shape == (21, 48)
    assert w.candidates == ["1T"]
    mid = w.image[10]
    assert mid[0] == 1           # ref A
    assert mid[1] == 4           # alt value T
    # support: HP1 fwd = 4 tagged + 1 untagged = 5; HP2 fwd = 1 (untagged)
    assert mid[5] == 5 and mid[27] == 1
    assert mid[16] == 0 and mid[38] == 0
    # coverage rows: HP1 block gets hp1+hp0 = 5 reads, HP2 gets hp2+hp0 = 6
    assert mid[4] == -5 and mid[26] == -6
    # mismatching bases are NOT drawn into observation rows in HP mode
    assert mid[11] == 0 and mid[22] == 0
    # matching A observations: HP2 reads only (5) + nothing at pos 20 on hp1
    assert mid[30] == -5
    assert mid[8] == 0


def test_hp_positive_indel_rows(tmp_path):
    ins_seq = REF[:21] + "GG" + REF[21:]
    reads = [hp_read(f"m{i}", REF, hp=2) for i in range(5)]
    reads += [BamRecord(f"i{i}", 0, 0, 60, "21M2I19M", ins_seq, [30] * 42,
                        hp=1) for i in range(3)]
    batch = build_batch(tmp_path, reads)
    rs = RegionalSummaryHP("chr1", 0, 39, REF)
    rs.generate_max_insert_summary(batch)
    wins = rs.generate_summary(batch, **THRESHOLDS)
    assert len(wins) == 1
    w = wins[0]
    assert w.candidates == ["2AGG"]
    mid = w.image[10]
    assert mid[2] == 3                    # candidate length - 1
    assert mid[6] == 3 and mid[28] == 0   # HP1/HP2 fwd support
    assert mid[12] == 3                   # positive I count in HP1 block
    assert mid[34] == 0


def test_hp_e2e_dry(tmp_path):
    """Full call_variant in HP mode with haplotagged simulated reads."""
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import call_variant

    ref = random_reference(2500, seed=31)

    def alt_base(pos):
        return {"A": "T", "T": "A", "C": "G", "G": "C"}[ref[pos]]

    het_snp = (700, ref[700], alt_base(700))
    hap1 = [het_snp]
    hap2 = []
    records = simulate_reads(ref, [hap1, hap2], read_len=300, stride=20)
    # simulate_reads sets hp=hap_index+1 already
    bam = str(tmp_path / "sim.bam")
    fasta = str(tmp_path / "ref.fa")
    truth = str(tmp_path / "truth.vcf")
    bed = str(tmp_path / "t.bed")
    write_bam(bam, [("chr20", len(ref))], records)
    write_fasta(fasta, {"chr20": ref})
    write_truth_vcf(truth, "chr20", len(ref),
                    [(het_snp[0], het_snp[1], het_snp[2], "1|0")])
    with open(bed, "w") as f:
        f.write(f"chr20\t0\t{len(ref)}\n")

    options = set_parameters(PepperOptions(
        bam=bam, fasta=fasta, output_dir=str(tmp_path / "out"), threads=1,
        ont_r9_guppy5_sup=True, sub_command="call_variant", dry=True,
        train_mode=True, truth_vcf=truth, region_bed=bed,
        random_draw_probability=1.0, region="chr20", use_hp_info=True))
    totals = call_variant(options)
    assert totals[0] > 0

    with gzip.open(str(tmp_path / "out" / "PEPPER_VARIANT_FULL.vcf.gz"),
                   "rt") as f:
        records = [line.split("\t") for line in f
                   if not line.startswith("#")]
    by_pos = {int(r[1]) - 1: r for r in records}
    assert het_snp[0] in by_pos
    assert by_pos[het_snp[0]][4] == het_snp[2]


def test_hp_e2e_model_mode(tmp_path):
    """HP call_variant with an untrained 48-feature model: pipeline runs
    end-to-end (shapes, batching, decode)."""
    import jax

    from pepper_tpu.models.transducer import (TransducerConfig,
                                              init_transducer_params)
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import call_variant

    ref = random_reference(2200, seed=33)

    def alt_base(pos):
        return {"A": "T", "T": "A", "C": "G", "G": "C"}[ref[pos]]

    het_snp = (700, ref[700], alt_base(700))
    records = simulate_reads(ref, [[het_snp], []], read_len=300, stride=20)
    bam = str(tmp_path / "m.bam")
    fasta = str(tmp_path / "m.fa")
    write_bam(bam, [("chrH", len(ref))], records)
    write_fasta(fasta, {"chrH": ref})

    config = TransducerConfig(image_features=48, window=21, hidden=32,
                              linear_size=64)
    params = init_transducer_params(jax.random.PRNGKey(0), config)
    options = set_parameters(PepperOptions(
        bam=bam, fasta=fasta, output_dir=str(tmp_path / "out"),
        threads=1, ont_r9_guppy5_sup=True, sub_command="call_variant",
        use_hp_info=True, region="chrH", batch_size=16))
    totals = call_variant(options, params=params)
    assert totals[0] > 0
