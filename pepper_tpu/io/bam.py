"""Python-facing BAM reader returning packed columnar read batches.

Mirrors BAM_handler.get_reads semantics (bam_handler.cpp:115-451): filters,
region clipping with CIGAR rewrite, HP aux tag — but the output is flat
numpy arrays (no per-read Python objects), ready to be expanded into pileup
event streams for the TPU encoder.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from .native import get_lib

# BAM cigar op codes
OP_MATCH, OP_INS, OP_DEL, OP_REF_SKIP, OP_SOFT_CLIP = 0, 1, 2, 3, 4
OP_HARD_CLIP, OP_PAD, OP_EQUAL, OP_DIFF = 5, 6, 7, 8

FLAG_REVERSE = 0x10


@dataclass
class ReadBatch:
    """Columnar clipped reads for one region."""

    pos: np.ndarray            # (n,) int64 clipped start
    pos_end: np.ndarray        # (n,) int64 clipped end
    mapq: np.ndarray           # (n,) int32
    flag: np.ndarray           # (n,) int32 raw BAM flag
    hp: np.ndarray             # (n,) int32 HP tag (0 = untagged)
    seq_offsets: np.ndarray    # (n+1,) int64 offsets into seq/qual
    seq: np.ndarray            # (total,) uint8 ASCII bases
    qual: np.ndarray           # (total,) uint8
    cigar_offsets: np.ndarray  # (n+1,) int64
    cigar_ops: np.ndarray      # (total_ops,) uint8
    cigar_lens: np.ndarray     # (total_ops,) int32
    names: list[str]

    @property
    def n_reads(self) -> int:
        return len(self.pos)

    @property
    def is_reverse(self) -> np.ndarray:
        return (self.flag & FLAG_REVERSE) != 0

    def read_seq(self, i: int) -> str:
        s, e = self.seq_offsets[i], self.seq_offsets[i + 1]
        return self.seq[s:e].tobytes().decode()

    def read_quals(self, i: int) -> np.ndarray:
        s, e = self.seq_offsets[i], self.seq_offsets[i + 1]
        return self.qual[s:e]

    def read_cigar(self, i: int) -> list[tuple[int, int]]:
        s, e = self.cigar_offsets[i], self.cigar_offsets[i + 1]
        return list(zip(self.cigar_ops[s:e].tolist(),
                        self.cigar_lens[s:e].tolist()))

    def subset(self, indices) -> "ReadBatch":
        """Row subset preserving order (used by reservoir downsampling)."""
        indices = np.asarray(indices, dtype=np.int64)
        seq_parts, qual_parts, op_parts, len_parts = [], [], [], []
        seq_offsets = [0]
        cigar_offsets = [0]
        for i in indices:
            s, e = self.seq_offsets[i], self.seq_offsets[i + 1]
            seq_parts.append(self.seq[s:e])
            qual_parts.append(self.qual[s:e])
            seq_offsets.append(seq_offsets[-1] + (e - s))
            cs, ce = self.cigar_offsets[i], self.cigar_offsets[i + 1]
            op_parts.append(self.cigar_ops[cs:ce])
            len_parts.append(self.cigar_lens[cs:ce])
            cigar_offsets.append(cigar_offsets[-1] + (ce - cs))
        empty_u8 = np.zeros(0, np.uint8)
        empty_i32 = np.zeros(0, np.int32)
        return ReadBatch(
            pos=self.pos[indices], pos_end=self.pos_end[indices],
            mapq=self.mapq[indices], flag=self.flag[indices],
            hp=self.hp[indices],
            seq_offsets=np.asarray(seq_offsets, np.int64),
            seq=np.concatenate(seq_parts) if seq_parts else empty_u8,
            qual=np.concatenate(qual_parts) if qual_parts else empty_u8,
            cigar_offsets=np.asarray(cigar_offsets, np.int64),
            cigar_ops=np.concatenate(op_parts) if op_parts else empty_u8,
            cigar_lens=np.concatenate(len_parts) if len_parts else empty_i32,
            names=[self.names[i] for i in indices],
        )


def _copy_array(ptr, count, dtype):
    if count == 0:
        return np.zeros(0, dtype)
    return np.ctypeslib.as_array(ptr, shape=(count,)).astype(dtype, copy=True)


class BamReader:
    def __init__(self, path: str):
        self._lib = get_lib()
        self._handle = self._lib.pepper_bam_open(path.encode())
        if not self._handle:
            raise IOError(f"failed to open BAM (or missing index): {path}")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.pepper_bam_close(self._handle)
            self._handle = None

    def get_chromosome_names(self) -> list[str]:
        n = self._lib.pepper_bam_n_targets(self._handle)
        return [self._lib.pepper_bam_target_name(self._handle, i).decode()
                for i in range(n)]

    def get_chromosome_lengths(self) -> dict[str, int]:
        n = self._lib.pepper_bam_n_targets(self._handle)
        return {
            self._lib.pepper_bam_target_name(self._handle, i).decode():
                self._lib.pepper_bam_target_len(self._handle, i)
            for i in range(n)
        }

    def get_reads(self, chrom: str, start: int, stop: int,
                  include_supplementary: bool = False, min_mapq: int = 0,
                  min_baseq: int = 0) -> ReadBatch:
        """Fetch clipped reads overlapping [start, stop].

        ``min_baseq`` is accepted for signature parity with the reference's
        ``BAM_handler.get_reads`` but — like the reference, whose "bad base"
        vector is never consumed (bam_handler.cpp:216-222) — it does not
        filter anything.
        """
        lib = self._lib
        rb = lib.pepper_bam_get_reads(
            self._handle, chrom.encode(), start, stop,
            1 if include_supplementary else 0, min_mapq, min_baseq)
        try:
            n = lib.pepper_rb_n_reads(rb)
            seq_size = lib.pepper_rb_seq_size(rb)
            cigar_size = lib.pepper_rb_cigar_size(rb)
            names_size = lib.pepper_rb_names_size(rb)
            seq_ptr = ctypes.cast(lib.pepper_rb_seq(rb),
                                  ctypes.POINTER(ctypes.c_uint8))
            names_ptr = ctypes.cast(lib.pepper_rb_names(rb),
                                    ctypes.POINTER(ctypes.c_uint8))
            name_offsets = _copy_array(lib.pepper_rb_name_offsets(rb), n + 1,
                                       np.int64)
            names_blob = _copy_array(names_ptr, names_size, np.uint8).tobytes()
            names = [
                names_blob[name_offsets[i]:name_offsets[i + 1]].decode()
                for i in range(n)
            ]
            return ReadBatch(
                pos=_copy_array(lib.pepper_rb_pos(rb), n, np.int64),
                pos_end=_copy_array(lib.pepper_rb_pos_end(rb), n, np.int64),
                mapq=_copy_array(lib.pepper_rb_mapq(rb), n, np.int32),
                flag=_copy_array(lib.pepper_rb_flag(rb), n, np.int32),
                hp=_copy_array(lib.pepper_rb_hp(rb), n, np.int32),
                seq_offsets=_copy_array(lib.pepper_rb_seq_offsets(rb), n + 1,
                                        np.int64),
                seq=_copy_array(seq_ptr, seq_size, np.uint8),
                qual=_copy_array(lib.pepper_rb_qual(rb), seq_size, np.uint8),
                cigar_offsets=_copy_array(lib.pepper_rb_cigar_offsets(rb),
                                          n + 1, np.int64),
                cigar_ops=_copy_array(lib.pepper_rb_cigar_ops(rb), cigar_size,
                                      np.uint8),
                cigar_lens=_copy_array(lib.pepper_rb_cigar_lens(rb),
                                       cigar_size, np.int32),
                names=names,
            )
        finally:
            lib.pepper_readbatch_free(rb)
