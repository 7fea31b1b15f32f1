"""Native Smith-Waterman aligner, read realignment and StitchV2 tests."""

import numpy as np
import pytest

from pepper_tpu.io.align import align
from pepper_tpu.io.bam import BamReader, OP_DEL, OP_EQUAL, OP_INS
from pepper_tpu.io.bam_writer import BamRecord, write_bam
from pepper_tpu.polish.realign import realign_reads
from pepper_tpu.polish.stitch_v2 import alignment_stitch

from simulate import random_reference


def test_align_perfect_match():
    target = "ACGTACGTACGTACGT"
    result = align(target, target)
    assert result.best_score == 4 * len(target)
    assert result.cigar_string == f"{len(target)}="
    assert result.reference_begin == 0
    assert result.query_begin == 0
    assert result.reference_end == len(target) - 1


def test_align_substring_with_softclips():
    target = random_reference(200, seed=1)
    query = "TTTT" + target[50:90] + "GGGG"
    result = align(target, query)
    assert result.reference_begin == 50
    assert result.query_begin == 4
    assert "40=" in result.cigar_string
    assert result.cigar_string.startswith("4S")
    assert result.cigar_string.endswith("4S") or \
        result.cigar_string.endswith("4S".replace("4", "4"))


def test_align_snp_and_indel():
    target = random_reference(120, seed=2)
    # query with SNP at offset 20 and 2bp deletion at offset 40
    q = list(target[10:100])
    q[20] = {"A": "C", "C": "A", "G": "T", "T": "G"}[q[20]]
    query = "".join(q[:40] + q[42:])
    result = align(target, query)
    assert result.reference_begin == 10
    assert "1X" in result.cigar_string
    assert "2D" in result.cigar_string


def test_align_insertion():
    target = random_reference(120, seed=3)
    query = target[10:50] + "TTTTT" + target[50:100] \
        if target[50] != "T" else target[10:50] + "AAAAA" + target[50:100]
    result = align(target, query)
    assert "5I" in result.cigar_string


def test_realign_recovers_position(tmp_path):
    ref = random_reference(500, seed=4)
    # a read whose BAM alignment is deliberately sloppy: right sequence,
    # wrong cigar (all M with wrong length mapping)
    true_seq = ref[100:150] + ref[153:200]  # real 3bp deletion at 150
    record = BamRecord("r0", 0, 100, 60, f"{len(true_seq)}M", true_seq,
                       [30] * len(true_seq))
    path = str(tmp_path / "m.bam")
    write_bam(path, [("c", 500)], [record])
    batch = BamReader(path).get_reads("c", 0, 499)
    realigned = realign_reads(batch, ref, 0, 499)
    assert realigned.pos[0] == 100
    cigar = realigned.read_cigar(0)
    ops = [op for op, _ in cigar]
    assert OP_DEL in ops
    del_len = sum(length for op, length in cigar if op == OP_DEL)
    assert del_len == 3
    assert realigned.pos_end[0] == 200


def test_stitch_v2_overlap():
    ref = random_reference(300, seed=5)
    left = ref[0:180]
    right = ref[150:300]
    contig, start, end, seq = alignment_stitch([
        ("c", 0, 180, left), ("c", 150, 300, right)])
    assert contig == "c"
    assert seq == ref


def test_stitch_v2_gap_concatenates():
    ref = random_reference(300, seed=6)
    contig, start, end, seq = alignment_stitch([
        ("c", 0, 100, ref[0:100]), ("c", 150, 300, ref[150:300])])
    assert seq == ref[0:100] + ref[150:300]


def test_striped_engine_matches_scalar_fuzz():
    """The SSE2 striped engine must be bit-identical to the scalar golden
    DP (score, begin/end coordinates, full CIGAR) over random and
    edit-derived sequence pairs across scoring schemes."""
    import ctypes

    import numpy as np

    from pepper_tpu.io.align import _configure
    from pepper_tpu.io.native import get_lib

    lib = get_lib()
    _configure(lib)
    for name in ("pepper_align_scalar", "pepper_align_narrow"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_void_p
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]

    def run(fn, target, query, scoring):
        handle = fn(target.encode(), query.encode(), *scoring)
        try:
            return (lib.pepper_align_score(handle),
                    lib.pepper_align_ref_begin(handle),
                    lib.pepper_align_ref_end(handle),
                    lib.pepper_align_query_begin(handle),
                    lib.pepper_align_query_end(handle),
                    lib.pepper_align_cigar(handle).decode())
        finally:
            lib.pepper_align_free(handle)

    rng = np.random.RandomState(12)
    bases = np.array(list("ACGT"))
    for trial in range(800):
        n = int(rng.randint(1, 150))
        m = int(rng.randint(1, 150))
        target = "".join(bases[rng.randint(0, 4, n)])
        if rng.rand() < 0.5:
            start = rng.randint(0, n)
            query = list(target[start:start + m])
            for _ in range(rng.randint(0, 8)):
                if not query:
                    break
                k = rng.randint(0, len(query))
                op = rng.randint(3)
                if op == 0:
                    query[k] = bases[rng.randint(4)]
                elif op == 1:
                    query.insert(k, bases[rng.randint(4)])
                else:
                    query.pop(k)
            query = "".join(query) or "A"
        else:
            query = "".join(bases[rng.randint(0, 4, m)])
        scoring = [(4, 6, 8, 2), (2, 4, 4, 2), (10, 3, 8, 6),
                   (1, 1, 2, 1)][trial % 4]
        striped = run(lib.pepper_align, target, query, scoring)
        scalar = run(lib.pepper_align_scalar, target, query, scoring)
        assert striped == scalar, (trial, scoring, target, query)
        # 8-lane width through the same template (auto-dispatch runs the
        # 16-lane build on AVX2 hosts, so fuzz the narrow engine directly)
        narrow = run(lib.pepper_align_narrow, target, query, scoring)
        assert narrow == scalar, (trial, scoring, target, query)


def test_striped_engine_long_reads():
    """Polish-scale parity: 1 kb reads with 5% edits against a 1,040 bp
    window — the realignment hot shape."""
    import ctypes

    import numpy as np

    from pepper_tpu.io.align import _configure
    from pepper_tpu.io.native import get_lib

    lib = get_lib()
    _configure(lib)
    lib.pepper_align_scalar.restype = ctypes.c_void_p
    lib.pepper_align_scalar.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]

    def run(fn, target, query):
        handle = fn(target.encode(), query.encode(), 4, 6, 8, 2)
        try:
            return (lib.pepper_align_score(handle),
                    lib.pepper_align_ref_begin(handle),
                    lib.pepper_align_cigar(handle).decode())
        finally:
            lib.pepper_align_free(handle)

    rng = np.random.RandomState(3)
    bases = np.array(list("ACGT"))
    for _ in range(10):
        target = "".join(bases[rng.randint(0, 4, 1040)])
        query = list(target[rng.randint(0, 40):][:1000])
        for _ in range(50):
            k = rng.randint(0, len(query))
            op = rng.randint(3)
            if op == 0:
                query[k] = bases[rng.randint(4)]
            elif op == 1:
                query.insert(k, bases[rng.randint(4)])
            else:
                query.pop(k)
        query = "".join(query)
        assert run(lib.pepper_align, target, query) == \
            run(lib.pepper_align_scalar, target, query)


def test_out_of_range_scoring_uses_scalar_engine():
    """Parameter sets that overflow the striped engine's int16 math must
    fall back to the scalar engine (two previously-reproduced divergences:
    gap_extend=0 with a 40kb target, and mismatch_penalty=40000)."""
    import ctypes

    from pepper_tpu.io.align import _configure
    from pepper_tpu.io.native import get_lib

    lib = get_lib()
    _configure(lib)
    lib.pepper_align_scalar.restype = ctypes.c_void_p
    lib.pepper_align_scalar.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]

    def run(fn, target, query, scoring):
        handle = fn(target.encode(), query.encode(), *scoring)
        try:
            return (lib.pepper_align_score(handle),
                    lib.pepper_align_ref_begin(handle),
                    lib.pepper_align_cigar(handle).decode())
        finally:
            lib.pepper_align_free(handle)

    target = "ACGT" * 10000  # 40kb
    query = target[-40:][:30]
    for scoring in ((4, 6, 8, 0), (4, 40000, 8, 2), (40000, 6, 8, 2)):
        assert run(lib.pepper_align, target, query, scoring) == \
            run(lib.pepper_align_scalar, target, query, scoring), scoring


def test_perfect_match_fast_path_bit_identical():
    """A unique full-length exact occurrence takes the memmem shortcut in
    the smith_waterman dispatch; the result must be identical to the
    scalar golden engine.  Repeated occurrences (tie-break territory) and
    near-matches must fall back to the DP engines."""
    import ctypes

    from pepper_tpu.io.align import _configure
    from pepper_tpu.io.native import get_lib

    lib = get_lib()
    _configure(lib)
    lib.pepper_align_scalar.restype = ctypes.c_void_p
    lib.pepper_align_scalar.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]

    def run(fn, target, query, scoring=(4, 6, 8, 2)):
        handle = fn(target.encode(), query.encode(), *scoring)
        try:
            return (lib.pepper_align_score(handle),
                    lib.pepper_align_ref_begin(handle),
                    lib.pepper_align_ref_end(handle),
                    lib.pepper_align_query_begin(handle),
                    lib.pepper_align_query_end(handle),
                    lib.pepper_align_cigar(handle).decode())
        finally:
            lib.pepper_align_free(handle)

    rng = np.random.RandomState(77)

    def rand_seq(n):
        return "".join("ACGT"[i] for i in rng.randint(0, 4, n)) or "A"

    for trial in range(150):
        target = rand_seq(rng.randint(50, 400))
        qlen = int(rng.randint(5, min(60, len(target))))
        off = int(rng.randint(0, len(target) - qlen + 1))
        query = target[off:off + qlen]
        scoring = [(4, 6, 8, 2), (2, 4, 4, 2), (1, 1, 2, 1)][trial % 3]
        assert run(lib.pepper_align, target, query, scoring) == \
            run(lib.pepper_align_scalar, target, query, scoring), \
            (trial, target, query)

    # doubled occurrence: engine tie-break must be preserved (fallback)
    core = rand_seq(30)
    target = core + rand_seq(11) + core
    assert run(lib.pepper_align, target, core) == \
        run(lib.pepper_align_scalar, target, core)

    # 1-mismatch read: must NOT trigger (engines may clip/trim ends)
    target = rand_seq(200)
    query = list(target[50:150])
    query[30] = {"A": "C", "C": "G", "G": "T", "T": "A"}[query[30]]
    query = "".join(query)
    assert run(lib.pepper_align, target, query) == \
        run(lib.pepper_align_scalar, target, query)
