"""Legacy variant-package SummaryGenerator equivalent
(polish/legacy_variant_summary.py vs pepper_variant/modules/cpp/
summary_generator.cpp): dual-haplotype pair labels, reference channel,
no-mapq-filter quirk, and both chunkers."""

import numpy as np

from pepper_tpu.io.bam import BamReader
from pepper_tpu.io.bam_writer import BamRecord, write_bam
from pepper_tpu.polish.legacy_variant_summary import (
    LegacyVariantSummary,
    chunk_image,
    chunk_image_train,
    get_pair_label,
    get_reference_feature_index,
)

REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # 40 bp


def make_batch(tmp_path, reads, name="legacy.bam", end=39):
    reads = sorted(reads, key=lambda r: r.pos)
    path = str(tmp_path / name)
    write_bam(path, [("chr1", 40)], reads)
    return BamReader(path).get_reads("chr1", 0, end)


def base_reads():
    reads = [BamRecord(f"m{i}", 0, 0, 60, "40M", REF, [30] * 40)
             for i in range(8)]
    # insert "CC" after position 10
    ins_seq = REF[:11] + "CC" + REF[11:]
    reads.append(BamRecord("ins", 0, 0, 60, "11M2I29M", ins_seq, [30] * 42))
    # delete positions 20-21
    del_seq = REF[:20] + REF[22:]
    reads.append(BamRecord("del", 0, 0, 60, "20M2D18M", del_seq, [30] * 38))
    return reads


def test_pair_label_table():
    # unordered pairs (summary_generator.cpp:64-135)
    assert get_pair_label("A", "A") == 1
    assert get_pair_label("A", "C") == get_pair_label("C", "A") == 2
    assert get_pair_label("T", "A") == 3
    assert get_pair_label("G", "C") == 8
    assert get_pair_label("*", "T") == 12
    assert get_pair_label("*", "*") == 0
    assert get_pair_label("N", "A") == 0        # unknown -> 0
    assert get_pair_label("\0", "G") == 0


def test_inference_summary_expansion_and_ref_channel(tmp_path):
    batch = make_batch(tmp_path, base_reads())
    summary = LegacyVariantSummary(REF, "chr1", 0, 39)
    summary.generate_summary(batch)

    # 40 positions + 2 insert columns at anchor 10
    assert len(summary.genomic_pos) == 42
    assert summary.genomic_pos[10] == (10, 0)
    assert summary.genomic_pos[11] == (10, 1)
    assert summary.genomic_pos[12] == (10, 2)
    assert len(summary.image) == 42
    assert len(summary.ref_image) == 42

    # reference channel: A/C/G/T -> 1..4, insert columns -> 0 (:443-452)
    assert summary.ref_image[0] == get_reference_feature_index("A") == 1
    assert summary.ref_image[11] == 0 and summary.ref_image[12] == 0
    assert summary.ref_image[13] == get_reference_feature_index(REF[11])

    # insert pixel: 1 'C' forward-strand read / coverage 10 * 254 = 25
    # (forward C = feature 5)
    assert summary.image[11][5] == 25
    # deletion '*' booked at positions 20/21 (forward '*' = feature 9);
    # pos 20 sits at expanded index 22 after the two insert columns
    assert summary.image[22][9] > 0


def test_no_mapq_filter_quirk(tmp_path):
    """The variant-pkg copy summarizes mapq-0 reads (generate_summary,
    :455-462); the polish generator skips them."""
    from pepper_tpu.polish.summary import PolishSummary

    reads = [BamRecord("q0", 0, 0, 0, "40M", REF, [30] * 40),
             BamRecord("q60", 0, 0, 60, "40M", REF, [30] * 40)]
    batch = make_batch(tmp_path, reads)

    legacy = LegacyVariantSummary(REF, "chr1", 0, 39)
    legacy.generate_summary(batch)
    polish = PolishSummary(REF, "chr1", 0, 39)
    polish.generate_summary(batch)

    assert legacy.coverage[0] == 2.0
    assert polish.coverage[0] == 1.0


def test_train_summary_pair_labels(tmp_path):
    batch = make_batch(tmp_path, base_reads())

    # truth hp1: SNP C->G at pos 5 and a 1-base insert "C" after pos 10
    hp1_seq = REF[:5] + "G" + REF[6:11] + "C" + REF[11:]
    hp1 = BamRecord("hp1", 0, 0, 60, "11M1I29M", hp1_seq, [30] * 41)
    # truth hp2: deletion of positions 20-21
    hp2 = BamRecord("hp2", 0, 0, 60, "20M2D18M", REF[:20] + REF[22:],
                    [30] * 38)
    truth_batch = make_batch(tmp_path, [hp1, hp2], name="truth.bam")
    i_hp1 = truth_batch.names.index("hp1")
    i_hp2 = truth_batch.names.index("hp2")

    summary = LegacyVariantSummary(REF, "chr1", 0, 39)
    summary.generate_train_summary(batch, truth_batch, i_hp1, i_hp2)

    assert len(summary.labels) == 42
    # pos 5: hp1 'G', hp2 ref 'C' -> CG class 8
    assert summary.labels[5] == get_pair_label("G", "C") == 8
    # hom-ref pos 0: AA -> 1
    assert summary.labels[0] == 1
    # insert column (10, 0): hp1 'C', hp2 no insert -> C* = 9
    assert summary.labels[11] == get_pair_label("C", "*") == 9
    # insert padding column (10, 1): hp1 padded '*', hp2 absent -> ** = 0
    assert summary.labels[12] == 0
    # hp2 deletion at pos 20/21: hp1 has ref base -> (ref, *) classes
    assert summary.labels[22] == get_pair_label(REF[20], "*") == 5  # A*
    # valid labels everywhere -> only the final sentinel marker
    assert summary.bad_label_positions == [42]
    assert len(summary.ref_image) == 42


def test_chunkers(tmp_path):
    batch = make_batch(tmp_path, base_reads())
    hp1 = BamRecord("hp1", 0, 0, 60, "40M", REF, [30] * 40)
    hp2 = BamRecord("hp2", 0, 0, 60, "40M", REF, [30] * 40)
    truth_batch = make_batch(tmp_path, [hp1, hp2], name="truth.bam")
    summary = LegacyVariantSummary(REF, "chr1", 0, 39)
    summary.generate_train_summary(batch, truth_batch,
                                   truth_batch.names.index("hp1"),
                                   truth_batch.names.index("hp2"))

    # inference chunker: 42 expanded cols, chunk 16 overlap 4
    images, labels, positions, refs, ids = chunk_image(
        summary, chunk_size=16, chunk_overlap=4)
    assert ids == list(range(len(ids)))
    assert all(img.shape == (16, 10) for img in images)
    assert all(ref.shape == (16,) for ref in refs)
    # labels are ALWAYS zero in the inference chunker (:477 quirk)
    assert all(not lab.any() for lab in labels)
    # stride: next chunk starts at end - overlap
    assert positions[1][0][0] == positions[0][16 - 4][0]
    # tail padding uses (-1, -1) positions
    assert tuple(positions[-1][-1]) == (-1, -1)

    # train chunker: real labels, within bad-label segments
    t_images, t_labels, t_positions, t_refs, t_ids = chunk_image_train(
        summary, chunk_size=16, chunk_overlap=4)
    assert len(t_images) > 0
    assert all(img.shape == (16, 10) for img in t_images)
    assert all(lab.shape == (16,) for lab in t_labels)
    # every chunked label matches the summary's label at that expanded
    # position (hom-ref truth: homozygous base pairs, except the two
    # insert columns where neither truth read has an insert -> ** = 0)
    index_of = {pos: i for i, pos in enumerate(summary.genomic_pos)}
    for lab, pos in zip(t_labels, t_positions):
        for j in range(len(lab)):
            key = tuple(pos[j])
            if key != (-1, -1):
                assert lab[j] == summary.labels[index_of[key]]
