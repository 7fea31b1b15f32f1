"""Python binding for the native affine-gap local aligner — the API mirrors
the reference's StripedSmithWaterman wrapper (PEPPER.Aligner/Filter/
Alignment used at StitchV2.py:103-117) so stitching and realignment code
reads the same."""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

from .native import get_lib

_configured = False


def _configure(lib):
    global _configured
    if _configured:
        return
    c = ctypes
    lib.pepper_align.restype = c.c_void_p
    lib.pepper_align.argtypes = [c.c_char_p, c.c_char_p, c.c_int, c.c_int,
                                 c.c_int, c.c_int]
    lib.pepper_align_free.argtypes = [c.c_void_p]
    for name, restype in [("score", c.c_int), ("ref_begin", c.c_longlong),
                          ("ref_end", c.c_longlong),
                          ("query_begin", c.c_longlong),
                          ("query_end", c.c_longlong),
                          ("cigar", c.c_char_p)]:
        fn = getattr(lib, f"pepper_align_{name}")
        fn.restype = restype
        fn.argtypes = [c.c_void_p]
    _configured = True


@dataclass
class Alignment:
    best_score: int = 0
    reference_begin: int = -1
    reference_end: int = -1
    query_begin: int = -1
    query_end: int = -1
    cigar_string: str = ""


class Aligner:
    """match/mismatch/gap_open/gap_extend as positive magnitudes
    (SSW convention; scoring table aligner.h:22-28)."""

    def __init__(self, match_score: int = 4, mismatch_penalty: int = 6,
                 gap_open_penalty: int = 8, gap_extend_penalty: int = 2):
        self._lib = get_lib()
        _configure(self._lib)
        self.match_score = match_score
        self.mismatch_penalty = mismatch_penalty
        self.gap_open_penalty = gap_open_penalty
        self.gap_extend_penalty = gap_extend_penalty
        self._reference = ""

    def set_reference_sequence(self, sequence: str, length=None) -> None:
        self._reference = sequence

    # reference-compatible aliases
    SetReferenceSequence = set_reference_sequence

    def align(self, query: str) -> Alignment:
        handle = self._lib.pepper_align(
            self._reference.encode(), query.encode(), self.match_score,
            self.mismatch_penalty, self.gap_open_penalty,
            self.gap_extend_penalty)
        try:
            return Alignment(
                best_score=self._lib.pepper_align_score(handle),
                reference_begin=self._lib.pepper_align_ref_begin(handle),
                reference_end=self._lib.pepper_align_ref_end(handle),
                query_begin=self._lib.pepper_align_query_begin(handle),
                query_end=self._lib.pepper_align_query_end(handle),
                cigar_string=self._lib.pepper_align_cigar(handle).decode(),
            )
        finally:
            self._lib.pepper_align_free(handle)


def align(target: str, query: str, match_score: int = 4,
          mismatch_penalty: int = 6, gap_open_penalty: int = 8,
          gap_extend_penalty: int = 2) -> Alignment:
    aligner = Aligner(match_score, mismatch_penalty, gap_open_penalty,
                      gap_extend_penalty)
    aligner.set_reference_sequence(target)
    return aligner.align(query)
