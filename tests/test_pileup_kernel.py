"""Equivalence of the scatter-accumulate backends (numpy golden vs XLA
scatter vs Pallas one-hot-matmul kernel), and of full candidate windows
produced through the event-stream path."""

import numpy as np
import pytest

from pepper_tpu.io.bam import BamReader
from pepper_tpu.io.bam_writer import BamRecord, write_bam
from pepper_tpu.ops.pileup_kernel import (
    accumulate_jax, accumulate_numpy, accumulate_pallas)
from pepper_tpu.ops.pileup_ref import RegionalSummary

from test_pileup import REF, THRESHOLDS, match_read


def random_events(n_events, n_rows, n_cols, seed=0):
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, n_rows, size=n_events).astype(np.int32)
    cols = rng.randint(0, n_cols, size=n_events).astype(np.int32)
    deltas = rng.choice([-1, 1], size=n_events).astype(np.int32)
    return rows, cols, deltas


@pytest.mark.parametrize("n_events,n_rows", [
    (10, 40), (5000, 300), (50000, 4096), (3, 1)])
def test_backends_agree(n_events, n_rows):
    rows, cols, deltas = random_events(n_events, n_rows, 26,
                                       seed=n_events)
    shape = (n_rows + 1, 26)
    golden = accumulate_numpy(rows, cols, deltas, shape)
    via_jax = accumulate_jax(rows, cols, deltas, shape)
    via_pallas = accumulate_pallas(rows, cols, deltas, shape)
    np.testing.assert_array_equal(via_jax, golden)
    np.testing.assert_array_equal(via_pallas, golden)


def test_empty_events():
    shape = (10, 26)
    for fn in (accumulate_numpy, accumulate_jax, accumulate_pallas):
        out = fn(np.zeros(0, np.int32), np.zeros(0, np.int32),
                 np.zeros(0, np.int32), shape)
        assert out.shape == shape and out.sum() == 0


def _windows_with_backend(tmp_path, backend):
    reads = [match_read(f"m{i}") for i in range(6)]
    snp_seq = REF[:20] + "T" + REF[21:]
    reads += [match_read(f"s{i}", flag=(0x10 if i % 2 else 0), seq=snp_seq)
              for i in range(4)]
    ins_seq = REF[:21] + "GG" + REF[21:]
    reads += [BamRecord(f"i{i}", 0, 0, 60, "21M2I19M", ins_seq, [30] * 42)
              for i in range(3)]
    reads = sorted(reads, key=lambda r: r.pos)
    path = str(tmp_path / "t.bam")
    write_bam(path, [("chr1", 40)], reads)
    batch = BamReader(path).get_reads("chr1", 0, 39)
    rs = RegionalSummary("chr1", 0, 39, REF, matrix_backend=backend)
    rs.generate_max_insert_summary(batch)
    return rs.generate_summary(batch, **THRESHOLDS)


def test_event_stream_windows_match_inplace(tmp_path):
    golden = _windows_with_backend(tmp_path, None)
    for backend in (accumulate_numpy, accumulate_jax, accumulate_pallas):
        windows = _windows_with_backend(tmp_path, backend)
        assert len(windows) == len(golden) > 0
        for w, g in zip(windows, golden):
            assert (w.contig, w.position, w.candidates) == \
                (g.contig, g.position, g.candidates)
            np.testing.assert_array_equal(w.image, g.image)
