"""The batched TabixIndexBuilder must emit byte-identical .tbi files to the
incremental reference algorithm (per-record reg2bin + dict chunk merge)."""

import struct

import numpy as np
import pytest

from pepper_tpu.io.bam_writer import reg2bin
from pepper_tpu.io.tabix import TabixIndexBuilder, _reg2bin_vec


class _IncrementalBuilder:
    """The original per-record implementation, kept as the spec."""

    def __init__(self):
        self._names, self._bins, self._linear = [], [], []

    def _ref_id(self, name):
        try:
            return self._names.index(name)
        except ValueError:
            self._names.append(name)
            self._bins.append({})
            self._linear.append({})
            return len(self._names) - 1

    def add(self, contig, beg, end, voff_start, voff_end):
        ref = self._ref_id(contig)
        b = reg2bin(beg, end)
        chunks = self._bins[ref].setdefault(b, [])
        if chunks and chunks[-1][1] == voff_start:
            chunks[-1] = (chunks[-1][0], voff_end)
        else:
            chunks.append((voff_start, voff_end))
        linear = self._linear[ref]
        for window in range(beg >> 14, ((max(beg + 1, end) - 1) >> 14) + 1):
            if window not in linear or voff_start < linear[window]:
                linear[window] = voff_start

    def write(self, path):
        from pepper_tpu.io.bgzf_writer import BgzfWriter
        names_blob = b"".join(n.encode() + b"\0" for n in self._names)
        with open(path, "wb") as raw:
            writer = BgzfWriter(raw)
            writer.write(b"TBI\1")
            writer.write(struct.pack("<iiiiiiii", len(self._names), 2, 1, 2,
                                     0, ord("#"), 0, len(names_blob)))
            writer.write(names_blob)
            for ref in range(len(self._names)):
                bins = self._bins[ref]
                writer.write(struct.pack("<i", len(bins)))
                for bin_id in sorted(bins):
                    chunks = bins[bin_id]
                    writer.write(struct.pack("<Ii", bin_id, len(chunks)))
                    for beg_voff, end_voff in chunks:
                        writer.write(struct.pack("<QQ", beg_voff, end_voff))
                linear = self._linear[ref]
                n_intv = (max(linear) + 1) if linear else 0
                writer.write(struct.pack("<i", n_intv))
                fill = 0
                for window in range(n_intv):
                    if window in linear:
                        fill = linear[window]
                    writer.write(struct.pack("<Q", fill))
            writer.close()


def _simulate_records(seed, n, span_big_every=0):
    """Sorted records with realistic voffs: contiguous runs (merge case)
    with occasional gaps, increasing positions over two contigs."""
    rng = np.random.RandomState(seed)
    records = []
    for contig in ("chr1", "chr2"):
        pos, voff = 0, rng.randint(100)
        for i in range(n):
            pos += int(rng.randint(1, 40000))
            end = pos + 1
            if span_big_every and i % span_big_every == 0:
                end = pos + int(rng.randint(1, 200000))  # multi-window span
            length = int(rng.randint(20, 200))
            records.append((contig, pos, end, voff, voff + length))
            voff += length
            if rng.rand() < 0.3:
                voff += int(rng.randint(1, 1 << 17))  # break contiguity
    return records


def test_reg2bin_vec_matches_scalar():
    rng = np.random.RandomState(0)
    begs = rng.randint(0, 1 << 29, 5000).astype(np.int64)
    ends = begs + rng.randint(1, 1 << 22, 5000).astype(np.int64)
    expected = np.array([reg2bin(int(b), int(e))
                         for b, e in zip(begs, ends)])
    assert np.array_equal(_reg2bin_vec(begs, ends), expected)


@pytest.mark.parametrize("seed,n,spans", [(1, 500, 0), (2, 2000, 17),
                                          (3, 1, 0), (4, 50, 3)])
def test_tbi_bytes_match_incremental(tmp_path, seed, n, spans):
    records = _simulate_records(seed, n, spans)
    new_builder, old_builder = TabixIndexBuilder(), _IncrementalBuilder()
    for record in records:
        new_builder.add(*record)
        old_builder.add(*record)
    new_path, old_path = str(tmp_path / "new.tbi"), str(tmp_path / "old.tbi")
    new_builder.write(new_path)
    old_builder.write(old_path)
    with open(new_path, "rb") as f:
        new_bytes = f.read()
    with open(old_path, "rb") as f:
        old_bytes = f.read()
    assert new_bytes == old_bytes
