"""Golden unit tests for the pileup encoder against hand-derived values
(the reference's debug_print_matrix methodology, region_summary.cpp:919-974)."""

import numpy as np
import pytest

from pepper_tpu.io.bam import BamReader
from pepper_tpu.io.bam_writer import BamRecord, write_bam
from pepper_tpu.ops.pileup_ref import (
    RegionalSummary, TruthRecord, get_feature_index,
    get_label_index, get_reference_feature_value,
)

REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # 40bp, A at pos%4==0

THRESHOLDS = dict(
    min_snp_baseq=1, min_indel_baseq=1, snp_freq_threshold=0.10,
    insert_freq_threshold=0.15, delete_freq_threshold=0.15,
    min_coverage_threshold=3, snp_candidate_freq_threshold=0.10,
    indel_candidate_freq_threshold=0.10, candidate_support_threshold=2,
    skip_indels=False, candidate_region_start=0, candidate_region_end=39,
)


def build_batch(tmp_path, reads):
    reads = sorted(reads, key=lambda r: r.pos)
    path = str(tmp_path / "t.bam")
    write_bam(path, [("chr1", 40)], reads)
    return BamReader(path).get_reads("chr1", 0, 39)


def summarize(batch, **overrides):
    rs = RegionalSummary("chr1", 0, 39, REF)
    rs.generate_max_insert_summary(batch)
    kwargs = dict(THRESHOLDS)
    kwargs.update(overrides)
    return rs, rs.generate_summary(batch, **kwargs)


def match_read(name, flag=0, seq=None, qual=30):
    return BamRecord(name, 0, 0, 60, "40M", seq or REF, [qual] * 40,
                     flag=flag)


def test_feature_index_table():
    # fwd block 8..14, rev block 19..25; -1 for non-ACGT ref
    assert get_feature_index("A", "A", False) == 8
    assert get_feature_index("A", "T", False) == 11
    assert get_feature_index("A", "I", False) == 12
    assert get_feature_index("A", "D", False) == 13
    assert get_feature_index("A", "*", False) == 14
    assert get_feature_index("A", "A", True) == 19
    assert get_feature_index("A", "*", True) == 25
    assert get_feature_index("N", "A", False) == -1
    assert get_reference_feature_value("A") == 1
    assert get_reference_feature_value("N") == 5


def test_label_index_symmetric():
    assert get_label_index("R", "R") == 0
    assert get_label_index("A", "R") == 1  # symmetric lookup
    assert get_label_index("R", "A") == 1
    assert get_label_index("#", "#") == 27


def test_snp_candidate_window(tmp_path):
    reads = [match_read(f"m{i}") for i in range(6)]
    snp_seq = REF[:20] + "T" + REF[21:]
    reads += [match_read(f"s{i}", flag=(0x10 if i % 2 else 0), seq=snp_seq)
              for i in range(4)]
    batch = build_batch(tmp_path, reads)
    rs, wins = summarize(batch)

    assert len(wins) == 1
    w = wins[0]
    assert (w.position, w.depth) == (20, 10)
    assert w.candidates == ["1T"]
    assert w.candidate_frequency == [4]
    assert w.image.shape == (33, 26)
    mid = w.image[16]
    assert mid[0] == 1                       # ref A
    assert mid[1] == 4                       # alt T value
    assert mid[5] == 2 and mid[16] == 2      # fwd/rev support
    assert mid[4] == -8 and mid[15] == -2    # fwd/rev coverage rows
    assert mid[8] == -6                      # fwd A observations (matches)
    assert mid[11] == 2 and mid[22] == 2     # supporting T rows sign-flipped
    # neighbor column (pos 19) untouched by injection
    prev = w.image[15]
    assert prev[0] == get_reference_feature_value(REF[19])
    assert prev[1] == 0


def test_insert_candidate(tmp_path):
    reads = [match_read(f"m{i}") for i in range(5)]
    # 3 reads with GG inserted after pos 20 (anchor A at 20)
    ins_seq = REF[:21] + "GG" + REF[21:]
    reads += [BamRecord(f"i{i}", 0, 0, 60, "21M2I19M", ins_seq, [30] * 42)
              for i in range(3)]
    batch = build_batch(tmp_path, reads)
    rs, wins = summarize(batch)

    assert len(wins) == 1
    w = wins[0]
    assert w.position == 20
    assert w.candidates == ["2AGG"]          # anchor + inserted bases
    assert w.candidate_frequency == [3]
    mid = w.image[16]
    assert mid[2] == 3                       # len(candidate)-1 = len("AGG")
    assert mid[6] == 3 and mid[17] == 0      # fwd/rev support
    assert mid[12] == 3                      # fwd I row sign-flipped to +3
    # anchor quirk: the 3 insert reads' anchor base (last of 21M with next
    # op I) is NOT counted in image row 4, but IS in coverage
    assert w.depth == 8
    assert mid[4] == -5                      # only the 5 plain match reads


def test_delete_candidate(tmp_path):
    reads = [match_read(f"m{i}") for i in range(5)]
    # 3 reads deleting ref[21:23] (anchor at 20): 21M2D19M
    del_seq = REF[:21] + REF[23:]
    reads += [BamRecord(f"d{i}", 0, 0, 60, "21M2D19M", del_seq, [30] * 38)
              for i in range(3)]
    batch = build_batch(tmp_path, reads)
    rs, wins = summarize(batch)

    assert len(wins) == 1
    w = wins[0]
    assert w.position == 20
    assert w.candidates == ["3" + REF[20:23]]  # anchor + deleted ref bases
    mid = w.image[16]
    del_len = 3                               # len("ACG")... candidate len-1
    assert mid[3] == del_len
    assert mid[7] == 3 and mid[18] == 0
    assert mid[13] == 3                       # fwd D row sign-flipped
    # deleted span rows get the '*' observation and the del-length columns
    row_next = w.image[17]
    assert row_next[3] == del_len and row_next[7] == 3
    assert row_next[14] == 3                  # fwd '*' row sign-flipped
    # beyond the deleted span: no injection
    assert w.image[19][3] == 0


def test_low_support_and_frequency_gates(tmp_path):
    reads = [match_read(f"m{i}") for i in range(20)]
    snp_seq = REF[:20] + "T" + REF[21:]
    reads.append(match_read("s0", seq=snp_seq))
    batch = build_batch(tmp_path, reads)
    # single supporting read: below support threshold 2 and below 10% freq
    rs, wins = summarize(batch)
    assert wins == []


def test_baseq_gate(tmp_path):
    reads = [match_read(f"m{i}") for i in range(6)]
    snp_seq = REF[:20] + "T" + REF[21:]
    # SNP reads with base quality 0 < min_snp_baseq=1: not counted at all
    reads += [match_read(f"s{i}", seq=snp_seq, qual=0) for i in range(4)]
    batch = build_batch(tmp_path, reads)
    rs, wins = summarize(batch)
    assert wins == []


def test_skip_indels(tmp_path):
    reads = [match_read(f"m{i}") for i in range(5)]
    ins_seq = REF[:21] + "GG" + REF[21:]
    reads += [BamRecord(f"i{i}", 0, 0, 60, "21M2I19M", ins_seq, [30] * 42)
              for i in range(3)]
    batch = build_batch(tmp_path, reads)
    rs, wins = summarize(batch, skip_indels=True)
    assert wins == []


def test_candidate_region_bounds(tmp_path):
    reads = [match_read(f"m{i}") for i in range(6)]
    snp_seq = REF[:20] + "T" + REF[21:]
    reads += [match_read(f"s{i}", seq=snp_seq) for i in range(4)]
    batch = build_batch(tmp_path, reads)
    # candidate at pos 20 excluded when outside [0, 10]
    rs, wins = summarize(batch, candidate_region_end=10)
    assert wins == []


def test_multiallelic_sorted_order(tmp_path):
    reads = [match_read(f"m{i}") for i in range(4)]
    reads += [match_read(f"t{i}", seq=REF[:20] + "T" + REF[21:])
              for i in range(3)]
    reads += [match_read(f"c{i}", seq=REF[:20] + "C" + REF[21:])
              for i in range(3)]
    batch = build_batch(tmp_path, reads)
    rs, wins = summarize(batch)
    # two windows at same position, alleles in lexicographic order: 1C < 1T
    assert [w.candidates[0] for w in wins] == ["1C", "1T"]


def test_train_labels_snp(tmp_path):
    reads = [match_read(f"m{i}") for i in range(6)]
    snp_seq = REF[:20] + "T" + REF[21:]
    reads += [match_read(f"s{i}", seq=snp_seq) for i in range(4)]
    batch = build_batch(tmp_path, reads)

    rs = RegionalSummary("chr1", 0, 39, REF)
    rs.generate_max_insert_summary(batch)
    truth = [TruthRecord("chr1", 20, 21, "A", "T")]
    rs.generate_labels(truth, [])      # het on hap1 only
    wins = rs.generate_summary(batch, train_mode=True, **THRESHOLDS)
    assert len(wins) == 1
    assert wins[0].type_label == 1     # found in hp1 only -> het
    # base label: hap1 'T', hap2 'R' -> "RT" = index 3
    assert wins[0].base_label == 3

    rs2 = RegionalSummary("chr1", 0, 39, REF)
    rs2.generate_max_insert_summary(batch)
    rs2.generate_labels(truth, truth)  # hom-alt
    wins2 = rs2.generate_summary(batch, train_mode=True, **THRESHOLDS)
    assert wins2[0].type_label == 2
    # "TT" = index 18
    assert wins2[0].base_label == 18


def test_expanded_coordinates_invariant(tmp_path):
    # Appendix B invariant 1: with insert expansion on, index==0 exactly at
    # real reference positions.
    ins_seq = REF[:21] + "GG" + REF[21:]
    reads = [BamRecord("i0", 0, 0, 60, "21M2I19M", ins_seq, [30] * 42)]
    batch = build_batch(tmp_path, reads)
    rs = RegionalSummary("chr1", 0, 39, REF, generate_indels=True)
    rs.generate_max_insert_summary(batch)
    assert rs.total_observed_insert_bases == 2
    real = rs.index == 0
    assert np.array_equal(np.unique(rs.positions[real]), np.arange(40))
    assert (rs.positions[~real] == 20).all()
    assert rs.index[~real].tolist() == [1, 2]
