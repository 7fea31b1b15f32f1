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


def realign_reads(batch: ReadBatch, reference_sequence: str,
                  ref_start: int, ref_end: int,
                  match_score: int = 4, mismatch_penalty: int = 6,
                  gap_open_penalty: int = 8,
                  gap_extend_penalty: int = 2) -> ReadBatch:
    """Returns a new ReadBatch with realigned positions/CIGARs.  Reads whose
    alignment fails (score 0) are kept unchanged."""
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
