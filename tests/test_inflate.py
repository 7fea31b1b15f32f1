"""Fuzz the specialized raw-DEFLATE decoder (io/_native/inflate.cpp)
against zlib: byte-identical output on every stream zlib can produce, and
graceful errors (never crashes) on malformed input.  The decoder fills the
htslib+libdeflate role of the reference (CMakeLists.txt:34-35) inside
BgzfReader; PEPPER_ZLIB_INFLATE=1 forces the zlib path for A/B runs."""

import ctypes
import os
import random
import subprocess
import sys
import zlib

import pytest

from pepper_tpu.io import native


@pytest.fixture(scope="module")
def inflate_raw():
    lib = native.get_lib()
    lib.pepper_inflate_raw.restype = ctypes.c_int
    lib.pepper_inflate_raw.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_void_p,
        ctypes.c_longlong]

    def call(comp: bytes, out_len: int):
        out = ctypes.create_string_buffer(out_len + 8)
        rc = lib.pepper_inflate_raw(comp, len(comp), out, out_len)
        return rc, out.raw[:out_len]

    return call


def deflate(data: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


def assert_roundtrip(inflate_raw, data: bytes, level: int):
    comp = deflate(data, level)
    rc, out = inflate_raw(comp, len(data))
    assert rc == 0, (rc, len(data), level)
    assert out == data


def test_patterns_all_levels(inflate_raw):
    rng = random.Random(0)
    for level in (0, 1, 2, 6, 9):
        for n in (1, 2, 7, 8, 63, 255, 1024, 34000, 65535, 65536):
            assert_roundtrip(
                inflate_raw, bytes(rng.getrandbits(8) for _ in range(n)),
                level)
            assert_roundtrip(inflate_raw, b"A" * n, level)  # dist-1 runs
            assert_roundtrip(
                inflate_raw,
                bytes(rng.choice(b"ACGT!5=\x00\x01\x02") for _ in range(n)),
                level)
            for period in (2, 3, 5, 7, 13):  # small-distance matches
                assert_roundtrip(
                    inflate_raw,
                    (bytes(range(period)) * (n // period + 1))[:n], level)


def test_empty_stream(inflate_raw):
    rc, out = inflate_raw(deflate(b"", 6), 0)
    assert rc == 0 and out == b""


def test_flush_boundaries(inflate_raw):
    """Multi-block streams with Z_FULL_FLUSH (stored empty blocks between
    compressed blocks) — the exact structure that exposed the fast-refill
    bonus-byte desync."""
    rng = random.Random(7)
    for _ in range(100):
        co = zlib.compressobj(rng.randint(0, 9), zlib.DEFLATED, -15)
        parts, data = [], b""
        for _ in range(rng.randint(1, 5)):
            chunk = bytes(rng.choice(b"ACGTNacgt\x00\x01!5=")
                          for _ in range(rng.randint(0, 30000)))
            data += chunk
            parts.append(co.compress(chunk))
            if rng.random() < 0.5:
                parts.append(co.flush(zlib.Z_FULL_FLUSH))
        parts.append(co.flush())
        comp = b"".join(parts)
        rc, out = inflate_raw(comp, len(data))
        assert rc == 0 and out == data


def test_malformed_inputs_error(inflate_raw):
    rng = random.Random(11)
    bad_cases = [b"", b"\x00", b"\xff" * 4, b"\x07\x00",
                 bytes(rng.getrandbits(8) for _ in range(200))]
    # bit-flipped valid streams: must error or produce (rejected) output,
    # never crash
    comp = deflate(bytes(rng.getrandbits(8) for _ in range(500)), 6)
    for _ in range(200):
        broken = bytearray(comp)
        broken[rng.randrange(len(broken))] ^= 1 << rng.randrange(8)
        bad_cases.append(bytes(broken))
    for bad in bad_cases:
        inflate_raw(bad, 500)  # any rc; just must not crash


def test_wrong_isize_rejected(inflate_raw):
    data = b"ACGT" * 1000
    comp = deflate(data, 6)
    rc, _ = inflate_raw(comp, len(data) - 1)   # stream produces 1 extra
    assert rc != 0
    rc, _ = inflate_raw(comp, len(data) + 1)   # stream ends 1 short
    assert rc != 0


def test_bam_file_equivalence_with_zlib_engine(tmp_path):
    """File-level A/B: reading a BAM through the default pepper_inflate
    engine and through PEPPER_ZLIB_INFLATE=1 must give identical read
    batches (the env var latches at first use, so the zlib run is a
    subprocess)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from simulate import random_reference, simulate_reads

    from pepper_tpu.io.bam import BamReader
    from pepper_tpu.io.bam_writer import write_bam

    ref = random_reference(60_000, seed=5)
    records = simulate_reads(ref, [[], []], read_len=800, stride=60)
    bam = str(tmp_path / "ab.bam")
    write_bam(bam, [("chrZ", len(ref))], records)

    reader = BamReader(bam)
    batch = reader.get_reads("chrZ", 0, 60_000)
    digest = (int(batch.n_reads), int(batch.seq_offsets[-1]),
              int(batch.seq.sum()), int(batch.qual.sum()),
              int(batch.pos.sum()))

    code = (
        "import sys;"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(__file__))!r});"
        "from pepper_tpu.io.bam import BamReader;"
        f"b = BamReader({bam!r}).get_reads('chrZ', 0, 60000);"
        "print((int(b.n_reads), int(b.seq_offsets[-1]), int(b.seq.sum()),"
        " int(b.qual.sum()), int(b.pos.sum())))")
    env = dict(os.environ, PEPPER_ZLIB_INFLATE="1", JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True)
    assert out.stdout.strip() == repr(digest)
