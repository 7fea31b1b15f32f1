"""Legacy HP candidate finder (per-haplotype probability maps -> regression
gate): SNP/insert/delete prob math on synthetic prediction maps."""

import numpy as np

from pepper_tpu.decode.hp_legacy import (
    CandidateFinderHP, HpAllele, HpCandidate, ONTLinearRegression,
    SNP_TYPE, INSERT_TYPE, DELETE_TYPE)
from pepper_tpu.io.bam import BamReader
from pepper_tpu.io.bam_writer import BamRecord, write_bam

REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"


def make_batch(tmp_path, reads):
    reads = sorted(reads, key=lambda r: r.pos)
    path = str(tmp_path / "hp.bam")
    write_bam(path, [("chr1", 40)], reads)
    return BamReader(path).get_reads("chr1", 0, 39)


def one_hot_predictions(positions, indices, bases_h1, bases_h2, scale=100):
    """Per-position 5-class integer votes (the x10000-style accumulation)."""
    n = len(positions)
    pred1 = np.zeros((n, 5), np.int64)
    pred2 = np.zeros((n, 5), np.int64)
    table = {"*": 0, "A": 1, "C": 2, "G": 3, "T": 4}
    for i in range(n):
        pred1[i, table[bases_h1[i]]] = scale
        pred2[i, table[bases_h2[i]]] = scale
    return pred1, pred2


def test_hp_legacy_het_snp(tmp_path):
    # 6 ref reads + 4 alt reads: SNP at pos 20 A->T
    snp_seq = REF[:20] + "T" + REF[21:]
    reads = [BamRecord(f"m{i}", 0, 0, 60, "40M", REF, [30] * 40)
             for i in range(6)]
    reads += [BamRecord(f"s{i}", 0, 0, 60, "40M", snp_seq, [30] * 40)
              for i in range(4)]
    batch = make_batch(tmp_path, reads)

    positions = list(range(0, 40))
    indices = [0] * 40
    # haplotype 1 predicts the alt at pos 20, haplotype 2 the ref
    bases_h1 = [REF[i] for i in range(40)]
    bases_h1[20] = "T"
    bases_h2 = [REF[i] for i in range(40)]
    pred1, pred2 = one_hot_predictions(positions, indices, bases_h1,
                                       bases_h2)

    finder = CandidateFinderHP(REF, "chr1", 0, 39, 0, 40)
    records = finder.find_candidates(batch, positions, indices, pred1,
                                     pred2)
    assert len(records) == 1
    record = records[0]
    assert record.pos_start == 20
    assert len(record.candidates) == 1
    candidate = record.candidates[0]
    assert candidate.allele.alt == "T"
    assert candidate.allele.alt_type == SNP_TYPE
    assert candidate.read_support == 4 and candidate.depth == 10
    # h1 predicted the alt with certainty, h2 did not
    assert candidate.alt_prob_h1 > 0.99
    assert candidate.alt_prob_h2 <= 0.0001 + 1e-9
    assert candidate.non_ref_prob > 0.99


def test_hp_legacy_regression_gate_rejects_unsupported(tmp_path):
    # alt reads exist but NEITHER haplotype predicts the alt -> filtered out
    snp_seq = REF[:20] + "T" + REF[21:]
    reads = [BamRecord(f"m{i}", 0, 0, 60, "40M", REF, [30] * 40)
             for i in range(6)]
    reads += [BamRecord(f"s{i}", 0, 0, 60, "40M", snp_seq, [30] * 40)
              for i in range(4)]
    batch = make_batch(tmp_path, reads)
    positions = list(range(0, 40))
    indices = [0] * 40
    bases = [REF[i] for i in range(40)]
    pred1, pred2 = one_hot_predictions(positions, indices, bases, bases)

    finder = CandidateFinderHP(REF, "chr1", 0, 39, 0, 40)
    records = finder.find_candidates(batch, positions, indices, pred1,
                                     pred2)
    # the site is seen (candidate_found) but the regression rejects it
    assert len(records) == 1
    assert records[0].candidates == []


def test_filter_candidate_thresholds():
    snp = HpCandidate(10, 11, HpAllele("A", "T", SNP_TYPE), depth=30,
                      read_support=12, alt_prob_h1=0.9, alt_prob_h2=0.01,
                      non_ref_prob=0.9)
    assert CandidateFinderHP.filter_candidate(snp, False, 0)
    # below the 10% frequency floor
    low = HpCandidate(10, 11, HpAllele("A", "T", SNP_TYPE), depth=100,
                      read_support=5, alt_prob_h1=0.9, alt_prob_h2=0.9,
                      non_ref_prob=0.9)
    assert not CandidateFinderHP.filter_candidate(low, False, 0)
    # freq-based mode bypasses the regression
    assert CandidateFinderHP.filter_candidate(low, True, 0.01)
    # weak allele weight fails the linear model
    weak = HpCandidate(10, 11, HpAllele("A", "T", SNP_TYPE), depth=30,
                       read_support=12, alt_prob_h1=0.004,
                       alt_prob_h2=0.004, non_ref_prob=0.0)
    assert not CandidateFinderHP.filter_candidate(weak, False, 0)


def test_hp_candidates_to_variants_assembly():
    from pepper_tpu.decode.hp_legacy import hp_candidates_to_variants

    # two alleles at one site: SNP (h1) and deletion (h2)
    snp = (100, 101, "A", "T", SNP_TYPE, 30, 12, 0, 12, 0, 0.95, 0.001, 0.9)
    deletion = (100, 103, "ACG", "A", DELETE_TYPE, 30, 10, 0, 0, 10,
                0.001, 0.88, 0.8)
    (contig, start, end, ref, alts, genotype, dps, gts, ads,
     non_ref) = hp_candidates_to_variants([snp, deletion], "chr1")
    assert (contig, start, end) == ("chr1", 100, 103)
    assert ref == "ACG"
    # SNP alt suffix-extended against the deletion's ref tail
    assert alts[0] == "TCG" and alts[1] == "A"
    assert genotype == [1, 2]
    assert ads == [12, 10]

    # single het allele
    (_, _, _, _, alts2, genotype2, *_ ) = hp_candidates_to_variants(
        [snp], "chr1")
    assert genotype2 == [0, 1] and alts2 == ["T"]

    # same allele on both haplotypes -> hom-alt
    hom = (100, 101, "A", "T", SNP_TYPE, 30, 25, 0, 12, 13, 0.95, 0.92, 0.9)
    *_, genotype3, _, _, _, _ = hp_candidates_to_variants([hom], "chr1")
    # unpack: contig,start,end,ref,alts,genotype,dps,gts,ads,non_ref
    result = hp_candidates_to_variants([hom], "chr1")
    assert result[5] == [1, 1]
