"""Merge PEPPER-confident calls with DeepVariant re-genotyped calls.

Semantics from MergeVariants.py:8-79 + MergedVcfWriter.py:19-51: DeepVariant
records positionally override PEPPER records; output carries a FORMAT C
field (P=PEPPER, DV=DeepVariant) and DeepVariant AD drops the ref entry.
"""

from __future__ import annotations

import os
from collections import defaultdict

from ..io.bgzf_writer import BgzfWriter
from ..io.tabix import TabixIndexBuilder
from ..io.vcf_reader import read_vcf
from .vcf_writer import _format_float
from ..pipeline.regions import log_info


def _read_contig_header(path: str):
    import gzip

    contigs = []
    sample = None
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        for line in f:
            if line.startswith("##contig="):
                inner = line.strip()[len("##contig=<"):-1]
                fields = dict(kv.split("=", 1) for kv in inner.split(","))
                contigs.append((fields["ID"], int(fields.get("length", 0))))
            elif line.startswith("#CHROM"):
                sample = line.strip().split("\t")[9]
                break
    return contigs, sample


_MERGED_HEADER_LINES = [
    "##fileformat=VCFv4.2",
    '##FILTER=<ID=PASS,Description="All filters passed">',
    '##FILTER=<ID=refCall,Description="Call is homozygous">',
    '##FILTER=<ID=lowGQ,Description="Low genotype quality">',
    '##FILTER=<ID=lowQUAL,Description="Low variant call quality">',
    '##FILTER=<ID=conflictPos,Description="Overlapping record">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">',
    '##FORMAT=<ID=AD,Number=A,Type=Integer,Description="Allele depth">',
    '##FORMAT=<ID=VAF,Number=A,Type=Float,'
    'Description="Variant allele fractions.">',
    '##FORMAT=<ID=AP,Number=1,Type=Float,Description='
    '"Maximum variant allele probability for each allele.">',
    '##FORMAT=<ID=GQ,Number=1,Type=Float,Description="Genotype Quality">',
    '##FORMAT=<ID=C,Number=1,Type=String,'
    'Description="Genotyper P=PEPPER DV=DeepVariant">',
]


def merge_vcf_records(options):
    pepper_records = list(read_vcf(options.vcf_pepper))
    positional_dv = defaultdict()
    total_dv = 0
    if getattr(options, "vcf_deepvariant", None):
        for record in read_vcf(options.vcf_deepvariant):
            positional_dv[(record.contig, record.start)] = record
            total_dv += 1
        dv_path = options.vcf_deepvariant
    else:
        for path in (options.vcf_deepvariant_snps,
                     options.vcf_deepvariant_indels):
            for record in read_vcf(path):
                positional_dv[(record.contig, record.start)] = record
                total_dv += 1
        dv_path = options.vcf_deepvariant_snps
    log_info(f"TOTAL VARIANTS IN DeepVariant: {total_dv}")

    contigs, pepper_sample = _read_contig_header(options.vcf_pepper)
    _, dv_sample = _read_contig_header(dv_path)
    if pepper_sample != dv_sample:
        raise ValueError("SAMPLE NAMES IN TWO VCFs DO NOT MATCH.")

    header_lines = list(_MERGED_HEADER_LINES)
    for contig, length in contigs:
        header_lines.append(f"##contig=<ID={contig},length={length}>")
    header_lines.append(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + pepper_sample)
    header = "\n".join(header_lines) + "\n"

    output_path = os.path.join(options.output_dir,
                               "PEPPER_MARGIN_DEEPVARIANT_OUTPUT.vcf.gz")
    os.makedirs(options.output_dir, exist_ok=True)
    tabix = TabixIndexBuilder()
    total_pepper_calls = total_dv_calls = total_pass = 0
    with open(output_path, "wb") as raw:
        writer = BgzfWriter(raw)
        writer.write(header.encode())
        for record in pepper_records:
            key = (record.contig, record.start)
            is_dv = False
            if key in positional_dv:
                final = positional_dv[key]
                is_dv = True
                total_dv_calls += 1
            else:
                final = record
                total_pepper_calls += 1
            record_filter = ("PASS" if "PASS" in final.filters
                             else "refCall")
            if record_filter == "PASS":
                total_pass += 1
            sample_fields = final.sample_fields
            ad_values = sample_fields.get("AD", ".").split(",")
            if is_dv and len(ad_values) > 1:
                ad_values = ad_values[1:]
            sample = ":".join([
                sample_fields.get("GT", "./."),
                sample_fields.get("GQ", "."),
                str(sample_fields.get("DP", ".")),
                ",".join(ad_values),
                sample_fields.get("VAF", "."),
                "DV" if is_dv else "P",
            ])
            alts = ",".join(final.alts) if final.alts else "."
            line = "\t".join([
                final.contig, str(final.start + 1), ".", final.ref, alts,
                str(final.qual), record_filter, ".", "GT:GQ:DP:AD:VAF:C",
                sample]) + "\n"
            voff_start = writer.tell_virtual()
            writer.write(line.encode())
            tabix.add(final.contig, final.start, final.stop,
                      voff_start, writer.tell_virtual())
        writer.close()
    tabix.write(output_path + ".tbi")
    log_info(f"TOTAL VARIANTS FROM PEPPER: {total_pepper_calls}")
    log_info(f"TOTAL VARIANTS FROM DEEPVARIANT: {total_dv_calls}")
    log_info(f"TOTAL PASS VARIANTS: {total_pass}")
    return output_path
