"""ctypes binding to libpepperio.so (built from io/_native on demand)."""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpepperio.so")
_BUILDINFO_PATH = os.path.join(_NATIVE_DIR, ".buildinfo")

_lib = None


def _host_isa_signature() -> str:
    """ISA fingerprint of this host: the build uses -march=native, so a .so
    compiled on an AVX2 host and reused from a shared checkout (NFS, baked
    container image) would SIGILL on a host without those extensions.  The
    signature gates a rebuild whenever the relevant ISA set changes."""
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    present = set(line.split(":", 1)[1].split())
                    flags = ",".join(sorted(
                        x for x in ("ssse3", "sse4_2", "avx", "avx2",
                                    "avx512f", "bmi2", "fma")
                        if x in present))
                    break
    except OSError:
        pass
    return f"{platform.machine()}:{flags}"


def _build():
    import sys

    subprocess.run(["make", "-s", f"PYTHON={sys.executable}"],
                   cwd=_NATIVE_DIR, check=True)
    with open(_BUILDINFO_PATH, "w") as f:
        f.write(_host_isa_signature())


def _needs_rebuild() -> bool:
    sources = [os.path.join(_NATIVE_DIR, f) for f in os.listdir(_NATIVE_DIR)
               if f.endswith((".cpp", ".h", ".c"))]
    if not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
            for s in sources):
        return True
    try:
        with open(_BUILDINFO_PATH) as f:
            stamp = f.read().strip()
    except OSError:
        return True
    return stamp != _host_isa_signature()


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if _needs_rebuild():
        _build()
    lib = ctypes.CDLL(_LIB_PATH)

    c = ctypes
    lib.pepper_bam_open.restype = c.c_void_p
    lib.pepper_bam_open.argtypes = [c.c_char_p]
    lib.pepper_bam_close.argtypes = [c.c_void_p]
    lib.pepper_bam_n_targets.restype = c.c_int
    lib.pepper_bam_n_targets.argtypes = [c.c_void_p]
    lib.pepper_bam_target_name.restype = c.c_char_p
    lib.pepper_bam_target_name.argtypes = [c.c_void_p, c.c_int]
    lib.pepper_bam_target_len.restype = c.c_longlong
    lib.pepper_bam_target_len.argtypes = [c.c_void_p, c.c_int]
    lib.pepper_bam_get_reads.restype = c.c_void_p
    lib.pepper_bam_get_reads.argtypes = [
        c.c_void_p, c.c_char_p, c.c_longlong, c.c_longlong, c.c_int, c.c_int,
        c.c_int]
    lib.pepper_readbatch_free.argtypes = [c.c_void_p]
    lib.pepper_rb_n_reads.restype = c.c_longlong
    lib.pepper_rb_n_reads.argtypes = [c.c_void_p]
    for name, restype in [
        ("pos", c.POINTER(c.c_int64)), ("pos_end", c.POINTER(c.c_int64)),
        ("mapq", c.POINTER(c.c_int32)), ("flag", c.POINTER(c.c_int32)),
        ("hp", c.POINTER(c.c_int32)),
        ("seq_offsets", c.POINTER(c.c_int64)), ("seq", c.POINTER(c.c_char)),
        ("qual", c.POINTER(c.c_uint8)),
        ("cigar_offsets", c.POINTER(c.c_int64)),
        ("cigar_ops", c.POINTER(c.c_uint8)),
        ("cigar_lens", c.POINTER(c.c_int32)),
        ("name_offsets", c.POINTER(c.c_int64)),
        ("names", c.POINTER(c.c_char)),
    ]:
        fn = getattr(lib, f"pepper_rb_{name}")
        fn.restype = restype
        fn.argtypes = [c.c_void_p]
    for name in ("seq_size", "cigar_size", "names_size"):
        fn = getattr(lib, f"pepper_rb_{name}")
        fn.restype = c.c_longlong
        fn.argtypes = [c.c_void_p]

    lib.pepper_pileup_run.restype = c.c_void_p
    lib.pepper_pileup_run.argtypes = [
        c.c_longlong, c.POINTER(c.c_int64), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32), c.POINTER(c.c_int32), c.POINTER(c.c_int64),
        c.POINTER(c.c_char), c.POINTER(c.c_uint8), c.POINTER(c.c_int64),
        c.POINTER(c.c_uint8), c.POINTER(c.c_int32), c.c_char_p,
        c.c_longlong, c.c_longlong, c.c_double, c.c_double, c.c_int]
    lib.pepper_pileup_free.argtypes = [c.c_void_p]
    for name, restype in [
        ("n_rows", c.c_longlong), ("features", c.c_int),
        ("n_alleles", c.c_longlong), ("strs_size", c.c_longlong),
        ("image", c.POINTER(c.c_int32)),
        ("coverage", c.POINTER(c.c_int32)),
        ("snp_count", c.POINTER(c.c_int32)),
        ("insert_count", c.POINTER(c.c_int32)),
        ("delete_count", c.POINTER(c.c_int32)),
        ("allele_pos", c.POINTER(c.c_int64)),
        ("allele_total", c.POINTER(c.c_int32)),
        ("allele_fwd", c.POINTER(c.c_int32)),
        ("allele_rev", c.POINTER(c.c_int32)),
        ("allele_fwd_hp1", c.POINTER(c.c_int32)),
        ("allele_rev_hp1", c.POINTER(c.c_int32)),
        ("allele_fwd_hp2", c.POINTER(c.c_int32)),
        ("allele_rev_hp2", c.POINTER(c.c_int32)),
        ("allele_str_offsets", c.POINTER(c.c_int64)),
        ("allele_strs", c.POINTER(c.c_char)),
    ]:
        fn = getattr(lib, f"pepper_pileup_{name}")
        fn.restype = restype
        fn.argtypes = [c.c_void_p]

    lib.pepper_fasta_open.restype = c.c_void_p
    lib.pepper_fasta_open.argtypes = [c.c_char_p]
    lib.pepper_fasta_close.argtypes = [c.c_void_p]
    lib.pepper_fasta_n_sequences.restype = c.c_int
    lib.pepper_fasta_n_sequences.argtypes = [c.c_void_p]
    lib.pepper_fasta_sequence_name.restype = c.c_char_p
    lib.pepper_fasta_sequence_name.argtypes = [c.c_void_p, c.c_int]
    lib.pepper_fasta_sequence_length.restype = c.c_longlong
    lib.pepper_fasta_sequence_length.argtypes = [c.c_void_p, c.c_char_p]
    lib.pepper_fasta_get_sequence.restype = c.c_longlong
    lib.pepper_fasta_get_sequence.argtypes = [
        c.c_void_p, c.c_char_p, c.c_longlong, c.c_longlong, c.c_char_p]

    _lib = lib
    return lib
