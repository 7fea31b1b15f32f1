"""faidx-backed FASTA reader (fasta_handler.cpp:19-55 semantics)."""

from __future__ import annotations

import ctypes

from .native import get_lib


class FastaReader:
    def __init__(self, path: str):
        self._lib = get_lib()
        self._handle = self._lib.pepper_fasta_open(path.encode())
        if not self._handle:
            raise IOError(f"failed to open FASTA (needs .fai index): {path}")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.pepper_fasta_close(self._handle)
            self._handle = None

    def get_chromosome_names(self) -> list[str]:
        n = self._lib.pepper_fasta_n_sequences(self._handle)
        return [self._lib.pepper_fasta_sequence_name(self._handle, i).decode()
                for i in range(n)]

    def get_chromosome_sequence_length(self, name: str) -> int:
        return self._lib.pepper_fasta_sequence_length(self._handle,
                                                      name.encode())

    def get_reference_sequence(self, name: str, start: int, stop: int) -> str:
        """[start, stop) 0-based, uppercased — matches
        FASTA_handler.get_reference_sequence."""
        if stop <= start:
            return ""
        buf = ctypes.create_string_buffer(int(stop - start))
        written = self._lib.pepper_fasta_get_sequence(
            self._handle, name.encode(), start, stop, buf)
        return buf.raw[:written].decode()
