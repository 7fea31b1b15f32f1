"""merge_variants at scale: the streamed two-pointer merge must match the
order-independent positional-dict fallback on fuzzed multi-contig inputs
(shuffled, overlapping, duplicated positions), honor last-wins override
semantics across the snps+indels file pair, and stay memory-flat on a
large record pair (the reference buffers the whole DeepVariant set,
MergeVariants.py:62-75)."""

import gzip
import os

import numpy as np
import pytest

from pepper_tpu.decode.merge_variants import merge_vcf_records


def _write_vcf(path, contigs, records, sample="S"):
    """records: (contig, pos0, ref, alt, qual, filter, gt) tuples."""
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        for name, length in contigs:
            f.write(f"##contig=<ID={name},length={length}>\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + sample + "\n")
        for contig, pos, ref, alt, qual, filt, gt in records:
            f.write(f"{contig}\t{pos + 1}\t.\t{ref}\t{alt}\t{qual}\t{filt}"
                    f"\t.\tGT:GQ:DP:AD:VAF\t{gt}:30:40:20,20:0.5\n")


def _merge(tmp_path, tag, pepper, dv, contigs, dv_pair=None):
    pepper_path = str(tmp_path / f"pepper_{tag}.vcf")
    _write_vcf(pepper_path, contigs, pepper)

    class MergeOptions:
        vcf_pepper = pepper_path
        vcf_deepvariant = None
        vcf_deepvariant_snps = None
        vcf_deepvariant_indels = None
        output_dir = str(tmp_path / f"merged_{tag}")

    if dv_pair is not None:
        snps_path = str(tmp_path / f"dv_snps_{tag}.vcf")
        indels_path = str(tmp_path / f"dv_indels_{tag}.vcf")
        _write_vcf(snps_path, contigs, dv_pair[0])
        _write_vcf(indels_path, contigs, dv_pair[1])
        MergeOptions.vcf_deepvariant_snps = snps_path
        MergeOptions.vcf_deepvariant_indels = indels_path
    else:
        dv_path = str(tmp_path / f"dv_{tag}.vcf")
        _write_vcf(dv_path, contigs, dv)
        MergeOptions.vcf_deepvariant = dv_path

    out = merge_vcf_records(MergeOptions())
    with gzip.open(out, "rt") as f:
        return [line for line in f if not line.startswith("#")]


def _random_records(rng, contigs, n, alt_tag):
    records = []
    for _ in range(n):
        contig, length = contigs[rng.randint(len(contigs))]
        pos = int(rng.randint(0, length - 5))
        ref = "ACGT"[rng.randint(4)]
        alt = alt_tag["ACGT"[rng.randint(4)] == ref]
        qual = int(rng.randint(1, 99))
        filt = "PASS" if rng.rand() < 0.8 else "refCall"
        gt = ("0/1", "1/1", "0/0")[rng.randint(3)]
        records.append((contig, pos, ref, alt, qual, filt, gt))
    return records


def test_streamed_merge_matches_dict_fallback_fuzz(tmp_path):
    rng = np.random.RandomState(17)
    contigs = [("chr2", 5000), ("chr1", 5000), ("chr10", 5000)]
    key_order = {name: i for i, (name, _) in enumerate(contigs)}

    pepper = _random_records(rng, contigs, 400, {True: "T", False: "G"})
    # DV overlaps ~half of pepper positions plus extra DV-only records
    dv = [(c, p, r, "C", q + 1, f, g)
          for (c, p, r, _a, q, f, g) in pepper[::2]]
    dv += _random_records(rng, contigs, 100, {True: "A", False: "C"})
    # unique DV positions (cross-mode comparison needs a deterministic
    # winner; explicit last-wins override is tested separately below)
    seen = set()
    dv = [r for r in dv
          if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]

    def sort(records):
        return sorted(records, key=lambda r: (key_order[r[0]], r[1]))

    sorted_lines = _merge(tmp_path, "sorted", sort(pepper), sort(dv),
                          contigs)
    assert len(sorted_lines) == len(pepper)
    assert any(line.rstrip().endswith(":DV") for line in sorted_lines)
    assert any(line.rstrip().endswith(":P") for line in sorted_lines)

    # shuffled DV -> dict fallback; pepper order unchanged, so the output
    # must be byte-identical
    dv_shuffled = list(dv)
    rng.shuffle(dv_shuffled)
    fallback_lines = _merge(tmp_path, "dvshuf", sort(pepper), dv_shuffled,
                            contigs)
    assert fallback_lines == sorted_lines

    # shuffled pepper -> dict fallback; output follows pepper file order,
    # so compare as multisets of lines
    pepper_shuffled = list(pepper)
    rng.shuffle(pepper_shuffled)
    both_lines = _merge(tmp_path, "bothshuf", pepper_shuffled, dv_shuffled,
                        contigs)
    assert sorted(both_lines) == sorted(sorted_lines)


def test_snps_indels_pair_last_wins(tmp_path):
    """Two-file DV input at one position: the indels file is processed
    second in the reference's dict build, so it must win — in the streamed
    path too (heapq.merge stability)."""
    contigs = [("chr1", 1000)]
    pepper = [("chr1", 100, "A", "T", 10, "PASS", "0/1"),
              ("chr1", 100, "A", "G", 11, "PASS", "0/1"),  # duplicate pos
              ("chr1", 200, "C", "G", 12, "PASS", "1/1")]
    snps = [("chr1", 100, "A", "C", 50, "PASS", "1/1")]
    indels = [("chr1", 100, "A", "ACC", 60, "PASS", "0/1")]
    lines = _merge(tmp_path, "pair", pepper, None, contigs,
                   dv_pair=(snps, indels))
    assert len(lines) == 3
    # both duplicate-position pepper records see the indel override
    assert lines[0].split("\t")[4] == "ACC" and lines[0].split("\t")[5] == "60"
    assert lines[1].split("\t")[4] == "ACC"
    assert lines[2].rstrip().endswith(":P")


def test_unknown_contig_ordering(tmp_path):
    """Contigs absent from the PEPPER header order lexically after known
    ones; sorted inputs using that order stream correctly."""
    contigs = [("chr1", 1000)]
    pepper = [("chr1", 10, "A", "T", 10, "PASS", "0/1"),
              ("ctgA", 5, "C", "G", 10, "PASS", "0/1"),
              ("ctgB", 7, "G", "A", 10, "PASS", "0/1")]
    dv = [("ctgA", 5, "C", "GG", 77, "PASS", "1/1")]
    lines = _merge(tmp_path, "unknown", pepper, dv, contigs)
    assert len(lines) == 3
    assert lines[1].split("\t")[4] == "GG"


@pytest.mark.slow
def test_merge_memory_flat_at_scale(tmp_path):
    """1M-record pair: the streamed merge must not buffer the inputs
    (tracemalloc peak well under what 1M buffered VcfRecords would take —
    measured >700 MB for the dict build at this size)."""
    import tracemalloc

    n = 1_000_000
    contigs = [("chr1", 300_000_000)]
    pepper_path = str(tmp_path / "pepper_big.vcf")
    dv_path = str(tmp_path / "dv_big.vcf")
    with open(pepper_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                "##contig=<ID=chr1,length=300000000>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        for i in range(n):
            f.write(f"chr1\t{3 * i + 1}\t.\tA\tT\t20\tPASS\t.\t"
                    "GT:GQ:DP:AD:VAF\t0/1:30:40:20,20:0.5\n")
    with open(dv_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                "##contig=<ID=chr1,length=300000000>\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        for i in range(0, n, 2):
            f.write(f"chr1\t{3 * i + 1}\t.\tA\tC\t50\tPASS\t.\t"
                    "GT:GQ:DP:AD:VAF\t1/1:50:40:20,20:0.5\n")

    class MergeOptions:
        vcf_pepper = pepper_path
        vcf_deepvariant = dv_path
        vcf_deepvariant_snps = None
        vcf_deepvariant_indels = None
        output_dir = str(tmp_path / "merged_big")

    tracemalloc.start()
    out = merge_vcf_records(MergeOptions())
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 64 * 1024 * 1024, f"merge buffered: peak={peak / 1e6:.0f}MB"

    n_out = n_dv = 0
    with gzip.open(out, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            n_out += 1
            if line.rstrip().endswith(":DV"):
                n_dv += 1
    assert n_out == n
    assert n_dv == n // 2
