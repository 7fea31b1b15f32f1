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


def _batch_fields(batch):
    return (batch.pos.tolist(), batch.pos_end.tolist(),
            batch.mapq.tolist(), batch.flag.tolist(), batch.hp.tolist(),
            batch.seq.tobytes(), batch.qual.tobytes(),
            batch.cigar_ops.tolist(), batch.cigar_lens.tolist(),
            batch.names)


def test_cg_tag_placeholder_equals_inline(tmp_path):
    """A record stored in long-CIGAR form (inline <l_seq>S<span>N placeholder
    + CG:B,I aux) must decode to the exact ReadBatch of its inline twin —
    htslib does this restore transparently for the reference
    (bam_handler.cpp:115-150); our reader must match."""
    ref = random_reference(2000, seed=11)
    cigar = "300M5I200M3D400M2I100M"
    seq = (ref[100:400] + "ACGTA" + ref[400:600] + ref[603:1003] + "GG"
           + ref[1003:1103])
    quals = list(np.random.RandomState(7).randint(10, 40, len(seq)))
    kwargs = dict(name="lr", ref_id=0, pos=100, mapq=60, cigar=cigar,
                  seq=seq, qual=quals, hp=2)

    inline_bam = str(tmp_path / "inline.bam")
    cg_bam = str(tmp_path / "cg.bam")
    write_bam(inline_bam, [("c", 2000)], [BamRecord(**kwargs)])
    write_bam(cg_bam, [("c", 2000)], [BamRecord(force_cg=True, **kwargs)])

    for start, stop in [(0, 1999), (150, 700), (380, 420), (900, 1200)]:
        a = BamReader(inline_bam).get_reads("c", start, stop)
        b = BamReader(cg_bam).get_reads("c", start, stop)
        assert _batch_fields(a) == _batch_fields(b), (start, stop)
    # HP aux tag placed before the CG array must still parse
    assert BamReader(cg_bam).get_reads("c", 0, 1999).hp[0] == 2


def test_cg_tag_over_65535_ops(tmp_path):
    """>65,535 CIGAR ops cannot be stored inline (16-bit n_cigar); the writer
    auto-switches to CG form and the reader must restore the real walk."""
    n_pairs = 40_000                      # 80,000 ops total
    contig_len = n_pairs + 2000
    ref = random_reference(contig_len, seed=12)
    pos = 500
    cigar = "1M1I" * n_pairs
    seq = "".join(ref[pos + i] + "A" for i in range(n_pairs))
    rec = BamRecord("huge", 0, pos, 60, cigar, seq, [30] * len(seq))
    bam_path = str(tmp_path / "huge.bam")
    write_bam(bam_path, [("c", contig_len)], [rec])

    batch = BamReader(bam_path).get_reads("c", 0, contig_len - 1)
    assert batch.n_reads == 1
    assert batch.pos[0] == pos
    assert batch.pos_end[0] == pos + n_pairs
    assert batch.read_seq(0) == seq
    ops = batch.read_cigar(0)
    assert len(ops) == 2 * n_pairs
    assert all(length == 1 for _, length in ops)

    # window clipping through the CG-restored CIGAR
    batch = BamReader(bam_path).get_reads("c", pos + 100, pos + 200)
    assert batch.n_reads == 1
    assert batch.pos[0] == pos + 100
    # 1M1I per reference base; inclusive stop keeps 101 M bases but the
    # insert after the final M lands at stop+1 and is clipped
    assert batch.read_seq(0) == "".join(
        ref[pos + 100 + i] + "A" for i in range(100)) + ref[pos + 200]


def test_cg_tag_ultralong_pileup_e2e(tmp_path):
    """Ultralong-read e2e: candidate windows from a CG-form BAM are
    bit-identical to the inline-form BAM through the full pileup path."""
    from pepper_tpu.ops.pileup_ref import RegionalSummary

    ref = random_reference(4000, seed=13)
    rng = np.random.RandomState(21)
    records = []
    for i in range(12):
        start = int(rng.randint(0, 1000))
        length = int(rng.randint(2000, 2900))
        seq = list(ref[start:start + length])
        seq[500] = "T" if seq[500] != "T" else "C"   # a shared SNP column
        records.append(dict(
            name=f"r{i}", ref_id=0, pos=start, mapq=60, cigar=f"{length}M",
            seq="".join(seq), qual=list(rng.randint(15, 40, length))))
    records.sort(key=lambda r: r["pos"])

    paths = {}
    for mode, force in [("inline", False), ("cg", True)]:
        p = str(tmp_path / f"{mode}.bam")
        write_bam(p, [("c", 4000)],
                  [BamRecord(force_cg=force, **r) for r in records])
        paths[mode] = p

    windows = {}
    for mode, p in paths.items():
        batch = BamReader(p).get_reads("c", 0, 3999)
        rs = RegionalSummary("c", 0, 3999, ref)
        rs.generate_max_insert_summary(batch)
        windows[mode] = rs.generate_summary(
            batch, min_snp_baseq=1, min_indel_baseq=1,
            snp_freq_threshold=0.1, insert_freq_threshold=0.15,
            delete_freq_threshold=0.15, min_coverage_threshold=1,
            snp_candidate_freq_threshold=0.1,
            indel_candidate_freq_threshold=0.1,
            candidate_support_threshold=1, skip_indels=False,
            candidate_region_start=0, candidate_region_end=3999)
    assert len(windows["inline"]) == len(windows["cg"]) > 0
    for a, b in zip(windows["inline"], windows["cg"]):
        assert a.position == b.position
        assert np.array_equal(a.image, b.image)
