"""Region/interval planning tests (get_chromosome_list semantics from
ImageGenerationUI.py:99-188: chr ranges, chr:start-end, comma lists, BED,
decoy exclusion, region_size slicing)."""

import numpy as np
import pytest

from pepper_tpu.io.bam_writer import write_bam, write_fasta
from pepper_tpu.io.bam import BamReader
from pepper_tpu.io.fasta import FastaReader
from pepper_tpu.pipeline.regions import (
    build_intervals, excluded_human_contigs, get_chromosome_list,
    natural_key)

from simulate import random_reference, simulate_reads


@pytest.fixture(scope="module")
def handlers(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("regions")
    sequences = {name: random_reference(1500, seed=i)
                 for i, name in enumerate(
                     ["chr1", "chr2", "chr3", "chr10", "GL000207.1"])}
    fasta = str(tmp / "ref.fa")
    write_fasta(fasta, sequences)
    # BAM with reads on every contig
    records = []
    refs = [(name, 1500) for name in sequences]
    for ref_id, (name, _) in enumerate(refs):
        reads = simulate_reads(sequences[name], [[]], read_len=300,
                               stride=700, name_prefix=name)
        for read in reads:
            read.ref_id = ref_id
        records.extend(reads)
    records.sort(key=lambda r: (r.ref_id, r.pos))
    bam = str(tmp / "all.bam")
    write_bam(bam, refs, records)
    return FastaReader(fasta), BamReader(bam)


def test_natural_sort_order():
    names = ["chr10", "chr2", "chr1"]
    assert sorted(names, key=natural_key) == ["chr1", "chr2", "chr10"]


def test_all_contigs_excludes_decoys(handlers):
    fasta, bam = handlers
    chr_list, bed = get_chromosome_list(None, fasta, bam)
    names = [c for c, _ in chr_list]
    assert names == ["chr1", "chr2", "chr3", "chr10"]  # natural order
    assert "GL000207.1" in excluded_human_contigs()
    assert bed is None


def test_single_region_with_coordinates(handlers):
    fasta, bam = handlers
    chr_list, _ = get_chromosome_list("chr2:100-900", fasta, bam)
    assert chr_list == [("chr2", [100, 900])]


def test_chromosome_range_expansion(handlers):
    fasta, bam = handlers
    chr_list, _ = get_chromosome_list("chr1-3", fasta, bam)
    assert chr_list == [("chr1", None), ("chr2", None), ("chr3", None)]


def test_comma_list(handlers):
    fasta, bam = handlers
    chr_list, _ = get_chromosome_list("chr1, chr10", fasta, bam)
    assert chr_list == [("chr1", None), ("chr10", None)]


def test_bed_regions(handlers, tmp_path):
    fasta, bam = handlers
    bed_path = str(tmp_path / "r.bed")
    with open(bed_path, "w") as f:
        f.write("chr1\t100\t200\nchr1\t300\t400\nchr2\t0\t1500\n")
    chr_list, bed = get_chromosome_list("chr1", fasta, bam,
                                        region_bed=bed_path)
    assert bed["chr1"] == [[100, 200], [300, 400]]
    assert bed["chr2"] == [[0, 1500]]


def test_invalid_region_raises(handlers):
    fasta, bam = handlers
    with pytest.raises(ValueError):
        get_chromosome_list("chr1:900-100", fasta, bam)


def test_build_intervals_slicing(handlers):
    fasta, bam = handlers
    intervals, total = build_intervals([("chr1", None)], fasta, 400)
    # contig length 1500 -> end 1499; slices of 400
    assert intervals == [("chr1", 0, 400), ("chr1", 400, 800),
                         ("chr1", 800, 1200), ("chr1", 1200, 1499)]
    assert total == sum(e - s for _, s, e in intervals)

    intervals2, _ = build_intervals([("chr1", [100, 350])], fasta, 400)
    assert intervals2 == [("chr1", 100, 350)]

    # train mode drops short intervals (< MIN_SEQUENCE_LENGTH)
    intervals3, _ = build_intervals([("chr1", [100, 350])], fasta, 400,
                                    train_mode=True)
    assert intervals3 == []
