"""Fuzz equivalence: native C++ pileup pass vs the Python golden walkers,
across random reads with indels, mixed qualities, strands and HP tags."""

import numpy as np
import pytest

from pepper_tpu.io.bam import BamReader
from pepper_tpu.io.bam_writer import BamRecord, write_bam
from pepper_tpu.ops.pileup_hp import RegionalSummaryHP
from pepper_tpu.ops.pileup_ref import RegionalSummary

THRESHOLDS = dict(
    min_snp_baseq=10, min_indel_baseq=10, snp_freq_threshold=0.10,
    insert_freq_threshold=0.15, delete_freq_threshold=0.15,
    min_coverage_threshold=2, snp_candidate_freq_threshold=0.10,
    indel_candidate_freq_threshold=0.10, candidate_support_threshold=1,
    skip_indels=False,
)


def fuzz_reads(ref, rng, n_reads=60):
    reads = []
    for i in range(n_reads):
        start = int(rng.randint(0, len(ref) - 60))
        cursor = start
        seq_parts = []
        quals = []
        cigar = ""
        target = min(len(ref), cursor + int(rng.randint(30, 120)))
        while cursor < target:
            kind = rng.rand()
            if kind < 0.70:  # match stretch (with occasional mismatches)
                length = min(int(rng.randint(5, 30)), target - cursor)
                chunk = list(ref[cursor:cursor + length])
                for j in range(length):
                    if rng.rand() < 0.08:
                        chunk[j] = "ACGT"[rng.randint(4)]
                seq_parts.append("".join(chunk))
                quals += [int(rng.randint(0, 40))] * length
                cigar += f"{length}M"
                cursor += length
            elif kind < 0.85 and seq_parts:  # insertion
                length = int(rng.randint(1, 6))
                seq_parts.append("".join("ACGT"[rng.randint(4)]
                                         for _ in range(length)))
                quals += [int(rng.randint(0, 40))] * length
                cigar += f"{length}I"
            else:  # deletion
                if not seq_parts:
                    continue
                length = min(int(rng.randint(1, 6)), target - cursor)
                if length <= 0:
                    continue
                cigar += f"{length}D"
                cursor += length
        seq = "".join(seq_parts)
        if not seq or not cigar.endswith("M"):
            # ensure the cigar ends with a match so pos_end is sane
            seq += ref[cursor:cursor + 5]
            quals += [30] * 5
            cigar += "5M"
        flag = 0x10 if rng.rand() < 0.5 else 0
        hp = int(rng.randint(0, 3))
        reads.append(BamRecord(f"r{i}", 0, start, 60, cigar, seq, quals,
                               flag=flag, hp=hp))
    reads.sort(key=lambda r: r.pos)
    return reads


def compare_windows(a, b):
    assert len(a) == len(b)
    for wa, wb in zip(a, b):
        assert (wa.contig, wa.position, wa.depth) == \
            (wb.contig, wb.position, wb.depth)
        assert wa.candidates == wb.candidates
        assert wa.candidate_frequency == wb.candidate_frequency
        np.testing.assert_array_equal(wa.image, wb.image)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("hp_mode", [False, True])
def test_native_matches_python(tmp_path, seed, hp_mode):
    rng = np.random.RandomState(seed)
    ref = "".join("ACGT"[i] for i in rng.randint(0, 4, size=500))
    reads = fuzz_reads(ref, rng)
    path = str(tmp_path / f"fuzz_{seed}_{hp_mode}.bam")
    write_bam(path, [("chr1", len(ref))], reads)
    batch = BamReader(path).get_reads("chr1", 0, len(ref) - 1)
    assert batch.n_reads > 0

    cls = RegionalSummaryHP if hp_mode else RegionalSummary
    kwargs = dict(THRESHOLDS)
    kwargs.update(candidate_region_start=0,
                  candidate_region_end=len(ref) - 1)

    python_rs = cls("chr1", 0, len(ref) - 1, ref)
    python_rs.generate_max_insert_summary(batch)
    python_windows = python_rs.generate_summary(batch, **kwargs)

    native_rs = cls("chr1", 0, len(ref) - 1, ref, use_native=True)
    native_rs.generate_max_insert_summary(batch)
    native_windows = native_rs.generate_summary(batch, **kwargs)

    assert len(python_windows) > 0
    compare_windows(native_windows, python_windows)


@pytest.mark.parametrize("seed", [5, 6])
@pytest.mark.parametrize("hp_mode", [False, True])
def test_native_window_emitter_matches_python_loop(tmp_path, seed, hp_mode,
                                                   monkeypatch):
    """Isolate the native window emitter: same native pileup walk, window
    assembly via pepper_emit_windows vs the Python loop
    (PEPPER_PY_WINDOWS=1) — windows (and, non-HP, descriptor rows)
    identical.  hp_mode exercises the round-5 48-channel emitter."""
    rng = np.random.RandomState(seed)
    ref = "".join("ACGT"[i] for i in rng.randint(0, 4, size=700))
    reads = fuzz_reads(ref, rng, n_reads=80)
    path = str(tmp_path / f"emit_{seed}_{hp_mode}.bam")
    write_bam(path, [("chr1", len(ref))], reads)
    batch = BamReader(path).get_reads("chr1", 0, len(ref) - 1)

    cls = RegionalSummaryHP if hp_mode else RegionalSummary
    kwargs = dict(THRESHOLDS)
    kwargs.update(candidate_region_start=0,
                  candidate_region_end=len(ref) - 1)

    native_rs = cls("chr1", 0, len(ref) - 1, ref, use_native=True)
    native_rs.generate_max_insert_summary(batch)
    native_windows = native_rs.generate_summary(batch, **kwargs)

    monkeypatch.setenv("PEPPER_PY_WINDOWS", "1")
    python_rs = cls("chr1", 0, len(ref) - 1, ref, use_native=True)
    python_rs.generate_max_insert_summary(batch)
    python_windows = python_rs.generate_summary(batch, **kwargs)

    assert len(native_windows) > 0
    compare_windows(native_windows, python_windows)
    if not hp_mode:
        assert native_rs.descriptor_rows == python_rs.descriptor_rows


@pytest.mark.parametrize("seed", [7, 8])
def test_native_window_emitter_train_mode_labels(tmp_path, seed,
                                                 monkeypatch):
    """Round-5: the native emitter also serves train mode — per-window
    base/type labels attach after the C call and must equal the Python
    loop's (the reference labels inside the emission walk,
    region_summary.cpp:828-916)."""
    from pepper_tpu.ops.pileup_ref import TruthRecord

    rng = np.random.RandomState(seed)
    ref = "".join("ACGT"[i] for i in rng.randint(0, 4, size=700))
    reads = fuzz_reads(ref, rng, n_reads=80)
    path = str(tmp_path / f"emit_train_{seed}.bam")
    write_bam(path, [("chr1", len(ref))], reads)
    batch = BamReader(path).get_reads("chr1", 0, len(ref) - 1)

    # truth records at positions that will often coincide with candidates:
    # SNPs + a couple of indels, split across haplotypes
    truth_h1, truth_h2 = [], []
    for pos in range(20, len(ref) - 20, 37):
        alt_base = "ACGT"[(("ACGT".index(ref[pos])) + 1) % 4]
        rec = TruthRecord("chr1", pos, pos + 1, ref[pos], alt_base)
        truth_h1.append(rec)
        if pos % 2 == 0:
            truth_h2.append(rec)
    truth_h1.append(TruthRecord("chr1", 101, 102, ref[101],
                                ref[101] + "AT"))
    truth_h2.append(TruthRecord("chr1", 203, 206, ref[203:206], ref[203]))

    kwargs = dict(THRESHOLDS)
    kwargs.update(candidate_region_start=0,
                  candidate_region_end=len(ref) - 1, train_mode=True)

    def run():
        rs = RegionalSummary("chr1", 0, len(ref) - 1, ref, use_native=True)
        rs.generate_max_insert_summary(batch)
        rs.generate_labels(truth_h1, truth_h2)
        return rs, rs.generate_summary(batch, **kwargs)

    native_rs, native_windows = run()
    monkeypatch.setenv("PEPPER_PY_WINDOWS", "1")
    python_rs, python_windows = run()

    assert len(native_windows) > 0
    compare_windows(native_windows, python_windows)
    labels_n = [(w.base_label, w.type_label) for w in native_windows]
    labels_p = [(w.base_label, w.type_label) for w in python_windows]
    assert labels_n == labels_p
    assert any(t for _, t in labels_n)  # some truth-matched windows
    assert native_rs.descriptor_rows == python_rs.descriptor_rows
