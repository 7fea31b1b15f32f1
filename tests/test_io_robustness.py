"""I/O robustness: malformed files fail cleanly, ultra-long reads spanning
many intervals clip correctly at every boundary."""

import numpy as np
import pytest

from pepper_tpu.io.bam import BamReader
from pepper_tpu.io.bam_writer import BamRecord, write_bam, write_fasta
from pepper_tpu.io.fasta import FastaReader

from simulate import random_reference


def test_missing_bam_raises(tmp_path):
    with pytest.raises(IOError):
        BamReader(str(tmp_path / "nope.bam"))


def test_bad_magic_raises(tmp_path):
    path = tmp_path / "junk.bam"
    path.write_bytes(b"not a bam file at all")
    with pytest.raises(IOError):
        BamReader(str(path))


def test_truncated_bgzf_raises(tmp_path):
    ref = random_reference(500, seed=1)
    good = tmp_path / "good.bam"
    write_bam(str(good), [("c", 500)],
              [BamRecord("r", 0, 10, 60, "100M", ref[10:110], [30] * 100)])
    data = good.read_bytes()
    bad = tmp_path / "trunc.bam"
    bad.write_bytes(data[:len(data) // 3])
    (tmp_path / "trunc.bam.bai").write_bytes((good.parent / "good.bam.bai")
                                             .read_bytes())
    # must not crash the process; either raises or returns no/partial reads
    try:
        reader = BamReader(str(bad))
        batch = reader.get_reads("c", 0, 499)
        assert batch.n_reads <= 1
    except IOError:
        pass


def test_missing_fasta_index_raises(tmp_path):
    path = tmp_path / "ref.fa"
    path.write_text(">c\nACGT\n")
    with pytest.raises(IOError):
        FastaReader(str(path))


def test_fasta_out_of_range_fetches(tmp_path):
    ref = random_reference(100, seed=2)
    path = str(tmp_path / "r.fa")
    write_fasta(path, {"c": ref})
    fasta = FastaReader(path)
    assert fasta.get_reference_sequence("c", 90, 200) == ref[90:]
    assert fasta.get_reference_sequence("c", -5, 10) == ref[:10]
    assert fasta.get_reference_sequence("c", 200, 300) == ""
    assert fasta.get_reference_sequence("nope", 0, 10) == ""


def test_ultra_long_read_spanning_many_intervals(tmp_path):
    """A single 80kb read over a 100kb contig, queried in 10kb windows:
    per-window clipping must tile the read exactly."""
    ref = random_reference(100_000, seed=3)
    read_start, read_len = 5_000, 80_000
    record = BamRecord("ultra", 0, read_start, 60, f"{read_len}M",
                       ref[read_start:read_start + read_len],
                       [30] * read_len)
    bam_path = str(tmp_path / "long.bam")
    write_bam(bam_path, [("c", 100_000)], [record])
    reader = BamReader(bam_path)

    for window_start in range(0, 100_000, 10_000):
        window_end = window_start + 10_000
        batch = reader.get_reads("c", window_start, window_end)
        overlaps = (read_start < window_end
                    and read_start + read_len > window_start)
        if not overlaps:
            assert batch.n_reads == 0
            continue
        assert batch.n_reads == 1
        expected_start = max(read_start, window_start)
        # clipping keeps bases at positions <= window_end (inclusive)
        expected_end = min(read_start + read_len, window_end + 1)
        assert batch.pos[0] == expected_start
        assert batch.pos_end[0] == expected_end
        assert batch.read_seq(0) == ref[expected_start:expected_end]


def test_bam_with_n_bases(tmp_path):
    ref = random_reference(200, seed=4)
    seq = ref[50:70] + "NNNNN" + ref[75:100]
    record = BamRecord("n", 0, 50, 60, "50M", seq, [30] * 50)
    bam_path = str(tmp_path / "n.bam")
    write_bam(bam_path, [("c", 200)], [record])
    batch = BamReader(bam_path).get_reads("c", 0, 199)
    assert "NNNNN" in batch.read_seq(0)

    # N mismatches don't generate feature writes (ref N col == -1 path) but
    # the pileup must not crash
    from pepper_tpu.ops.pileup_ref import RegionalSummary

    rs = RegionalSummary("c", 0, 199, ref)
    rs.generate_max_insert_summary(batch)
    windows = rs.generate_summary(
        batch, min_snp_baseq=1, min_indel_baseq=1, snp_freq_threshold=0.1,
        insert_freq_threshold=0.15, delete_freq_threshold=0.15,
        min_coverage_threshold=1, snp_candidate_freq_threshold=0.1,
        indel_candidate_freq_threshold=0.1, candidate_support_threshold=1,
        skip_indels=False, candidate_region_start=0,
        candidate_region_end=199)
    # N-containing candidates are recorded ('1N') but filtered by decode
    assert all(w.image.shape == (33, 26) for w in windows)


def test_bai_high_coordinate_bins(tmp_path):
    """Reads at multi-Mb coordinates exercise the deeper reg2bin levels
    and a long 16kb linear index."""
    contig_len = 60_000_000
    rng = np.random.RandomState(6)
    local = random_reference(3000, seed=6)
    positions = [1_000_000, 16_777_216 - 100, 16_777_216 + 50,
                 33_554_432, 59_990_000]
    records = []
    for i, pos in enumerate(positions):
        seq = local[i * 500:(i * 500) + 400]
        records.append(BamRecord(f"hi{i}", 0, pos, 60, "400M", seq,
                                 [30] * 400))
    bam_path = str(tmp_path / "hi.bam")
    write_bam(bam_path, [("big", contig_len)], records)
    reader = BamReader(bam_path)

    for i, pos in enumerate(positions):
        batch = reader.get_reads("big", pos - 1000, pos + 1500)
        assert f"hi{i}" in batch.names, (i, pos)
        idx = batch.names.index(f"hi{i}")
        assert batch.pos[idx] == pos
    # window straddling a 2^24 bin boundary catches both nearby reads
    batch = reader.get_reads("big", 16_777_216 - 200, 16_777_216 + 200)
    assert sorted(batch.names) == ["hi1", "hi2"]
    # empty far-away window
    assert reader.get_reads("big", 50_000_000, 50_010_000).n_reads == 0
