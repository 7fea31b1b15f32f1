"""Python wrapper for the native (C++) pileup accumulation pass.

Runs the whole per-read scatter-accumulate walk (HOT LOOP 2,
region_summary.cpp:337-566) in one native call over the packed ReadBatch
arrays, returning the image matrix, count vectors and sorted allele
tallies — fuzz-verified identical to the Python golden walkers.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from ..io.bam import ReadBatch
from ..io.native import get_lib


@dataclass
class NativePileup:
    image: np.ndarray          # (n_rows, features) int32
    coverage: np.ndarray       # (n_ref,) int64
    snp_count: np.ndarray
    insert_count: np.ndarray
    delete_count: np.ndarray
    # allele entries sorted by (region index, candidate string) — so each
    # position's slice is already in candidate-string order
    allele_pos: np.ndarray     # (n_alleles,) int64 region indices, sorted
    allele_str_blob: bytes
    allele_str_offsets: np.ndarray
    allele_total: np.ndarray
    allele_fwd: np.ndarray
    allele_rev: np.ndarray
    allele_fwd_hp1: np.ndarray
    allele_rev_hp1: np.ndarray
    allele_fwd_hp2: np.ndarray
    allele_rev_hp2: np.ndarray

    def allele_string(self, i: int) -> str:
        return self.allele_str_blob[
            self.allele_str_offsets[i]:self.allele_str_offsets[i + 1]
        ].decode()

    def allele_range(self, region_index: int) -> range:
        """Indices of the alleles recorded at one region position.  Decoding
        candidate strings lazily per gate-passing position (instead of all
        of them eagerly) is the hot-path win on error-rich reads."""
        lo = int(np.searchsorted(self.allele_pos, region_index, "left"))
        hi = int(np.searchsorted(self.allele_pos, region_index, "right"))
        return range(lo, hi)

    @property
    def allele_strings(self) -> list[str]:
        return [self.allele_string(i)
                for i in range(len(self.allele_pos))]


def _ptr(array, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def run_native_pileup(batch: ReadBatch, ref_seq: str, ref_start: int,
                      ref_end: int, min_snp_baseq: float,
                      min_indel_baseq: float, hp_mode: bool) -> NativePileup:
    lib = get_lib()
    c = ctypes
    pos = np.ascontiguousarray(batch.pos, np.int64)
    flag = np.ascontiguousarray(batch.flag, np.int32)
    mapq = np.ascontiguousarray(batch.mapq, np.int32)
    hp = np.ascontiguousarray(batch.hp, np.int32)
    seq_offsets = np.ascontiguousarray(batch.seq_offsets, np.int64)
    seq = np.ascontiguousarray(batch.seq, np.uint8)
    qual = np.ascontiguousarray(batch.qual, np.uint8)
    cigar_offsets = np.ascontiguousarray(batch.cigar_offsets, np.int64)
    cigar_ops = np.ascontiguousarray(batch.cigar_ops, np.uint8)
    cigar_lens = np.ascontiguousarray(batch.cigar_lens, np.int32)

    handle = lib.pepper_pileup_run(
        batch.n_reads, _ptr(pos, c.c_int64), _ptr(flag, c.c_int32),
        _ptr(mapq, c.c_int32), _ptr(hp, c.c_int32),
        _ptr(seq_offsets, c.c_int64),
        seq.ctypes.data_as(c.POINTER(c.c_char)), _ptr(qual, c.c_uint8),
        _ptr(cigar_offsets, c.c_int64), _ptr(cigar_ops, c.c_uint8),
        _ptr(cigar_lens, c.c_int32), ref_seq.encode(), ref_start, ref_end,
        min_snp_baseq, min_indel_baseq, 1 if hp_mode else 0)
    try:
        n_rows = lib.pepper_pileup_n_rows(handle)
        features = lib.pepper_pileup_features(handle)
        n_ref = ref_end - ref_start + 1
        n_alleles = lib.pepper_pileup_n_alleles(handle)
        strs_size = lib.pepper_pileup_strs_size(handle)

        def arr(name, count, dtype, ctype):
            if count == 0:
                return np.zeros(0, dtype)
            pointer = getattr(lib, f"pepper_pileup_{name}")(handle)
            return np.ctypeslib.as_array(
                pointer, shape=(count,)).astype(dtype, copy=True)

        # int32 (the native accumulator's own width): every downstream
        # consumer (ref-channel add, clamp, int8 cast) is value-bounded,
        # and the int64 upcast copy was pure memory traffic
        image = arr("image", n_rows * features, np.int32, c.c_int32) \
            .reshape(n_rows, features)
        offsets = arr("allele_str_offsets", n_alleles + 1, np.int64,
                      c.c_int64)
        strs_ptr = ctypes.cast(lib.pepper_pileup_allele_strs(handle),
                               c.POINTER(c.c_uint8))
        blob = (np.ctypeslib.as_array(strs_ptr, shape=(strs_size,))
                .tobytes() if strs_size else b"")
        return NativePileup(
            image=image,
            coverage=arr("coverage", n_ref, np.int64, c.c_int32),
            snp_count=arr("snp_count", n_ref, np.int64, c.c_int32),
            insert_count=arr("insert_count", n_ref, np.int64, c.c_int32),
            delete_count=arr("delete_count", n_ref, np.int64, c.c_int32),
            allele_pos=arr("allele_pos", n_alleles, np.int64, c.c_int64),
            allele_str_blob=blob,
            allele_str_offsets=offsets,
            allele_total=arr("allele_total", n_alleles, np.int32, c.c_int32),
            allele_fwd=arr("allele_fwd", n_alleles, np.int32, c.c_int32),
            allele_rev=arr("allele_rev", n_alleles, np.int32, c.c_int32),
            allele_fwd_hp1=arr("allele_fwd_hp1", n_alleles, np.int32,
                               c.c_int32),
            allele_rev_hp1=arr("allele_rev_hp1", n_alleles, np.int32,
                               c.c_int32),
            allele_fwd_hp2=arr("allele_fwd_hp2", n_alleles, np.int32,
                               c.c_int32),
            allele_rev_hp2=arr("allele_rev_hp2", n_alleles, np.int32,
                               c.c_int32),
        )
    finally:
        lib.pepper_pileup_free(handle)


_emit_windows_fn = None


def emit_windows_native(image_int8, region_size, window_size, feature_size,
                        base_indices, depths, ref_codes, pass_masks,
                        allele_lo, allele_hi, native: NativePileup,
                        support_threshold, snp_freq_threshold,
                        indel_freq_threshold, skip_indels, hp_mode=False):
    """Native candidate-window emission (capi.cpp pepper_emit_windows —
    golden spec: the Python per-candidate loops in ops/pileup_ref.py and,
    with hp_mode=True, ops/pileup_hp.py: 48-channel per-haplotype mid-row
    columns, no observation negation, no deletion star rows).
    Returns (images (n, W+1, F) int8, position_k int32, allele_index int64,
    freq int32) or None when the native library is unavailable."""
    global _emit_windows_fn
    c = ctypes
    if _emit_windows_fn is None:
        try:
            lib = get_lib()
            fn = lib.pepper_emit_windows
            fn.restype = c.c_longlong
            fn.argtypes = [
                c.POINTER(c.c_int8), c.c_int, c.c_longlong, c.c_int,
                c.c_longlong, c.POINTER(c.c_longlong), c.POINTER(c.c_int),
                c.POINTER(c.c_ubyte), c.POINTER(c.c_ubyte),
                c.POINTER(c.c_longlong), c.POINTER(c.c_longlong),
                c.c_char_p, c.POINTER(c.c_longlong), c.POINTER(c.c_int),
                c.POINTER(c.c_int), c.POINTER(c.c_int), c.c_double,
                c.c_double, c.c_double, c.c_int, c.POINTER(c.c_int8),
                c.POINTER(c.c_int), c.POINTER(c.c_longlong),
                c.POINTER(c.c_int), c.c_longlong, c.c_int,
                c.POINTER(c.c_int), c.POINTER(c.c_int)]
            _emit_windows_fn = fn
        except (OSError, AttributeError):
            _emit_windows_fn = False
    if _emit_windows_fn is False:
        return None

    n_positions = len(base_indices)
    cap = int((allele_hi - allele_lo).sum()) + 1
    out_images = np.empty((cap, window_size + 1, feature_size), np.int8)
    out_pos_k = np.empty(cap, np.int32)
    out_allele = np.empty(cap, np.int64)
    out_freq = np.empty(cap, np.int32)

    image_int8 = np.ascontiguousarray(image_int8, np.int8)
    base_indices = np.ascontiguousarray(base_indices, np.int64)
    depths = np.ascontiguousarray(depths, np.int32)
    ref_codes = np.ascontiguousarray(ref_codes, np.uint8)
    pass_masks = np.ascontiguousarray(pass_masks, np.uint8)
    allele_lo = np.ascontiguousarray(allele_lo, np.int64)
    allele_hi = np.ascontiguousarray(allele_hi, np.int64)
    offsets = np.ascontiguousarray(native.allele_str_offsets, np.int64)
    totals = np.ascontiguousarray(native.allele_total, np.int32)
    if hp_mode:
        # HP: the fwd/rev slots carry hp1; hp2 goes through the extra args
        fwd = np.ascontiguousarray(native.allele_fwd_hp1, np.int32)
        rev = np.ascontiguousarray(native.allele_rev_hp1, np.int32)
        fwd_hp2 = np.ascontiguousarray(native.allele_fwd_hp2, np.int32)
        rev_hp2 = np.ascontiguousarray(native.allele_rev_hp2, np.int32)
    else:
        fwd = np.ascontiguousarray(native.allele_fwd, np.int32)
        rev = np.ascontiguousarray(native.allele_rev, np.int32)
        fwd_hp2 = fwd
        rev_hp2 = rev

    n = _emit_windows_fn(
        _ptr(image_int8, c.c_int8), feature_size, region_size, window_size,
        n_positions, _ptr(base_indices, c.c_longlong),
        _ptr(depths, c.c_int), _ptr(ref_codes, c.c_ubyte),
        _ptr(pass_masks, c.c_ubyte), _ptr(allele_lo, c.c_longlong),
        _ptr(allele_hi, c.c_longlong), native.allele_str_blob,
        _ptr(offsets, c.c_longlong), _ptr(totals, c.c_int),
        _ptr(fwd, c.c_int), _ptr(rev, c.c_int), float(support_threshold),
        float(snp_freq_threshold), float(indel_freq_threshold),
        1 if skip_indels else 0, _ptr(out_images, c.c_int8),
        _ptr(out_pos_k, c.c_int), _ptr(out_allele, c.c_longlong),
        _ptr(out_freq, c.c_int), cap, 1 if hp_mode else 0,
        _ptr(fwd_hp2, c.c_int), _ptr(rev_hp2, c.c_int))
    if n < 0:
        return None
    n = int(n)
    return out_images[:n], out_pos_k[:n], out_allele[:n], out_freq[:n]
