"""Local read realignment to the draft (the reference's ReadAligner stage,
pepper/modules/src/local_reassembly/aligner.cpp, invoked at
AlignmentSummarizer.py:159-177): each read is re-aligned to the reference
window with affine-gap local alignment and its position/CIGAR rewritten.
Scoring: match=4, mismatch=6, gap_open=8, gap_ext=2 (aligner.h:22-28);
window halo ALIGNMENT_SAFE_BASES=20 (pepper Options.py:21-22)."""

from __future__ import annotations

import re

import numpy as np

from ..io.align import Aligner
from ..io.bam import (
    OP_DEL, OP_DIFF, OP_EQUAL, OP_INS, OP_MATCH, OP_SOFT_CLIP, ReadBatch,
)

ALIGNMENT_SAFE_BASES = 20

_CIGAR_OP_CODE = {"M": OP_MATCH, "=": OP_EQUAL, "X": OP_DIFF, "I": OP_INS,
                  "D": OP_DEL, "S": OP_SOFT_CLIP}


def _parse_cigar_string(cigar: str):
    return [(int(length), op)
            for length, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar)]


_batch_align_fn = None


def _get_batch_align():
    """ctypes handle for the one-call batched realign
    (capi.cpp pepper_align_batch), or None when unavailable."""
    global _batch_align_fn
    if _batch_align_fn is None:
        try:
            import ctypes

            from ..io.native import get_lib

            lib = get_lib()
            fn = lib.pepper_align_batch
            c = ctypes
            fn.restype = c.c_longlong
            fn.argtypes = [
                c.c_char_p, c.c_longlong, c.POINTER(c.c_longlong),
                c.POINTER(c.c_ubyte), c.c_longlong, c.c_int, c.c_int,
                c.c_int, c.c_int, c.POINTER(c.c_longlong),
                c.POINTER(c.c_longlong), c.POINTER(c.c_ubyte),
                c.POINTER(c.c_int), c.POINTER(c.c_longlong), c.c_longlong,
                c.POINTER(c.c_longlong)]
            _batch_align_fn = fn
        except (OSError, AttributeError):
            _batch_align_fn = False
    return _batch_align_fn or None


def realign_reads(batch: ReadBatch, reference_sequence: str,
                  ref_start: int, ref_end: int,
                  match_score: int = 4, mismatch_penalty: int = 6,
                  gap_open_penalty: int = 8,
                  gap_extend_penalty: int = 2) -> ReadBatch:
    """Returns a new ReadBatch with realigned positions/CIGARs.  Reads whose
    alignment fails (score 0) are kept unchanged.

    Default engine: ONE native call realigns the whole batch
    (pepper_align_batch) — no per-read ctypes/string round-trips.  The
    per-read Python loop is kept under PEPPER_PY_REALIGN=1 and the two
    must produce identical ReadBatches (tests/test_polish.py fuzz)."""
    import os

    fn = _get_batch_align()
    if (os.environ.get("PEPPER_PY_REALIGN") == "1" or fn is None
            or batch.n_reads == 0):
        return _realign_reads_py(batch, reference_sequence, ref_start,
                                 ref_end, match_score, mismatch_penalty,
                                 gap_open_penalty, gap_extend_penalty)

    import ctypes

    c = ctypes
    n = batch.n_reads
    seq = np.ascontiguousarray(batch.seq, np.uint8)
    seq_offsets = np.ascontiguousarray(batch.seq_offsets, np.int64)
    ops_cap = 2 * len(seq) + 4 * n + 16
    out_pos = np.empty(n, np.int64)
    out_span = np.empty(n, np.int64)
    out_ops = np.empty(ops_cap, np.uint8)
    out_lens = np.empty(ops_cap, np.int32)
    out_offsets = np.empty(n + 1, np.int64)

    def ptr(array, ctype):
        return array.ctypes.data_as(c.POINTER(ctype))

    target = reference_sequence.encode()
    # expected per-read diagonal: the read's original mapped offset in the
    # window — enables the certified banded DP inside the native batch
    # (smith_waterman_hint; identical output, fuzz-asserted)
    exp_offsets = np.ascontiguousarray(
        np.clip(np.asarray(batch.pos, np.int64) - ref_start, 0,
                len(target)), np.int64)
    n_ops = fn(target, len(target), ptr(seq_offsets, c.c_longlong),
               ptr(seq, c.c_ubyte), n, match_score, mismatch_penalty,
               gap_open_penalty, gap_extend_penalty,
               ptr(out_pos, c.c_longlong), ptr(out_span, c.c_longlong),
               ptr(out_ops, c.c_ubyte), ptr(out_lens, c.c_int),
               ptr(out_offsets, c.c_longlong), ops_cap,
               ptr(exp_offsets, c.c_longlong))
    if n_ops < 0:
        return _realign_reads_py(batch, reference_sequence, ref_start,
                                 ref_end, match_score, mismatch_penalty,
                                 gap_open_penalty, gap_extend_penalty)

    failed = out_pos < 0
    if not failed.any():
        pos = ref_start + out_pos
        return ReadBatch(
            pos=pos, pos_end=pos + out_span,
            mapq=batch.mapq.copy(), flag=batch.flag.copy(),
            hp=batch.hp.copy(),
            seq_offsets=seq_offsets.copy(), seq=seq.copy(),
            qual=np.asarray(batch.qual, np.uint8).copy(),
            cigar_offsets=out_offsets.copy(),
            cigar_ops=out_ops[:n_ops].copy(),
            cigar_lens=out_lens[:n_ops].copy(),
            names=list(batch.names))

    # merge: aligned reads take the native CIGARs, failed reads keep their
    # original alignment (same semantics as the Python loop)
    pos = np.where(failed, batch.pos, ref_start + out_pos)
    pos_end = np.where(failed, batch.pos_end, pos + out_span)
    ops_parts, lens_parts = [], []
    cigar_offsets = [0]
    for r in range(n):
        if failed[r]:
            cs, ce = batch.cigar_offsets[r], batch.cigar_offsets[r + 1]
            ops_parts.append(np.asarray(batch.cigar_ops[cs:ce], np.uint8))
            lens_parts.append(np.asarray(batch.cigar_lens[cs:ce], np.int32))
        else:
            cs, ce = out_offsets[r], out_offsets[r + 1]
            ops_parts.append(out_ops[cs:ce])
            lens_parts.append(out_lens[cs:ce])
        cigar_offsets.append(cigar_offsets[-1] + len(ops_parts[-1]))
    empty_u8 = np.zeros(0, np.uint8)
    empty_i32 = np.zeros(0, np.int32)
    return ReadBatch(
        pos=pos, pos_end=pos_end,
        mapq=batch.mapq.copy(), flag=batch.flag.copy(), hp=batch.hp.copy(),
        seq_offsets=seq_offsets.copy(), seq=seq.copy(),
        qual=np.asarray(batch.qual, np.uint8).copy(),
        cigar_offsets=np.asarray(cigar_offsets, np.int64),
        cigar_ops=(np.concatenate(ops_parts) if ops_parts else empty_u8),
        cigar_lens=(np.concatenate(lens_parts) if lens_parts
                    else empty_i32),
        names=list(batch.names))


def _realign_reads_py(batch: ReadBatch, reference_sequence: str,
                      ref_start: int, ref_end: int,
                      match_score: int = 4, mismatch_penalty: int = 6,
                      gap_open_penalty: int = 8,
                      gap_extend_penalty: int = 2) -> ReadBatch:
    """Per-read Python engine (golden; PEPPER_PY_REALIGN=1)."""
    aligner = Aligner(match_score, mismatch_penalty, gap_open_penalty,
                      gap_extend_penalty)
    aligner.set_reference_sequence(reference_sequence)

    new_pos = []
    new_pos_end = []
    seq_offsets = [0]
    cigar_offsets = [0]
    seqs, quals, ops, lens = [], [], [], []

    for r in range(batch.n_reads):
        seq = batch.read_seq(r)
        qual = batch.read_quals(r)
        alignment = aligner.align(seq)
        if alignment.best_score <= 0:
            pos = int(batch.pos[r])
            pos_end = int(batch.pos_end[r])
            read_ops = [op for op, _ in batch.read_cigar(r)]
            read_lens = [length for _, length in batch.read_cigar(r)]
        else:
            pos = ref_start + int(alignment.reference_begin)
            read_ops, read_lens = [], []
            ref_span = 0
            for length, op in _parse_cigar_string(alignment.cigar_string):
                read_ops.append(_CIGAR_OP_CODE[op])
                read_lens.append(length)
                if op in ("M", "=", "X", "D"):
                    ref_span += length
            pos_end = pos + ref_span
        new_pos.append(pos)
        new_pos_end.append(pos_end)
        seqs.append(np.frombuffer(seq.encode(), np.uint8))
        quals.append(np.asarray(qual, np.uint8))
        seq_offsets.append(seq_offsets[-1] + len(seq))
        ops.append(np.asarray(read_ops, np.uint8))
        lens.append(np.asarray(read_lens, np.int32))
        cigar_offsets.append(cigar_offsets[-1] + len(read_ops))

    empty_u8 = np.zeros(0, np.uint8)
    empty_i32 = np.zeros(0, np.int32)
    return ReadBatch(
        pos=np.asarray(new_pos, np.int64),
        pos_end=np.asarray(new_pos_end, np.int64),
        mapq=batch.mapq.copy(), flag=batch.flag.copy(), hp=batch.hp.copy(),
        seq_offsets=np.asarray(seq_offsets, np.int64),
        seq=np.concatenate(seqs) if seqs else empty_u8,
        qual=np.concatenate(quals) if quals else empty_u8,
        cigar_offsets=np.asarray(cigar_offsets, np.int64),
        cigar_ops=np.concatenate(ops) if ops else empty_u8,
        cigar_lens=np.concatenate(lens) if lens else empty_i32,
        names=list(batch.names),
    )
