"""VCF emission: 5 output files routed by QV cutoffs, bgzipped + tabixed.

Semantics-exact re-implementation of the reference's VcfWriter.py:
multiallelic site assembly (:48-138), QUAL = -10*log10(1-p) clamped >= 1
(:156-157), QV-cutoff routing into PEPPER-confident vs re-genotype VCFs and
SNP/INDEL split (:140-218), and the same header FILTER/FORMAT lines
(:220-289).  Output files:
  <prefix>_FULL.vcf.gz
  <prefix>_OUTPUT_PEPPER.vcf.gz
  <prefix>_OUTPUT_VARIANT_CALLING.vcf.gz (+ _SNPs / _INDEL)
"""

from __future__ import annotations

import math
import os

import numpy as np

from ..io.bgzf_writer import BgzfWriter
from ..io.tabix import TabixIndexBuilder


def _format_float(value) -> str:
    """pysam-style %g float rendering."""
    if isinstance(value, float) and value == int(value) and abs(value) < 1e15:
        return str(int(value))
    return f"{value:g}"


class _VcfFile:
    def __init__(self, path: str, header: str):
        self.path = path
        self._raw = open(path, "wb")
        self._writer = BgzfWriter(self._raw)
        self._tabix = TabixIndexBuilder()
        self._writer.write(header.encode())
        self.count = 0

    def write_record(self, contig: str, start: int, end: int,
                     line: bytes) -> None:
        writer = self._writer
        voff_start = writer.tell_virtual()
        writer.write(line)
        self._tabix.add(contig, start, end, voff_start,
                        writer.tell_virtual())
        self.count += 1

    def close(self) -> None:
        self._writer.close()
        self._raw.close()
        self._tabix.write(self.path + ".tbi")


class VCFWriter:
    def __init__(self, contigs, fasta_handler, sample_name: str,
                 output_dir: str, filename_full: str, filename_pepper: str,
                 filename_variant_calling: str):
        self.fasta = fasta_handler
        header = self._build_header(sample_name)
        join = os.path.join
        self.file_full = _VcfFile(
            join(output_dir, filename_full + ".vcf.gz"), header)
        self.file_pepper = _VcfFile(
            join(output_dir, filename_pepper + ".vcf.gz"), header)
        self.file_variant_calling = _VcfFile(
            join(output_dir, filename_variant_calling + ".vcf.gz"), header)
        self.file_variant_calling_snp = _VcfFile(
            join(output_dir, filename_variant_calling + "_SNPs.vcf.gz"),
            header)
        self.file_variant_calling_indel = _VcfFile(
            join(output_dir, filename_variant_calling + "_INDEL.vcf.gz"),
            header)
        self._files = [self.file_full, self.file_pepper,
                       self.file_variant_calling,
                       self.file_variant_calling_snp,
                       self.file_variant_calling_indel]

    def close(self) -> None:
        for f in self._files:
            f.close()

    def _build_header(self, sample_name: str) -> str:
        lines = [
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
            '##FORMAT=<ID=AP,Number=A,Type=Float,Description='
            '"Maximum variant allele probability for each allele.">',
            '##FORMAT=<ID=GQ,Number=1,Type=Float,'
            'Description="Genotype Quality">',
            '##FORMAT=<ID=REP,Number=1,Type=String,Description="If set to 1 '
            'then variant site is considered to be ina LowCompexity repeat '
            'region">',
        ]
        for contig in self.fasta.get_chromosome_names():
            length = self.fasta.get_chromosome_sequence_length(contig)
            lines.append(f"##contig=<ID={contig},length={length}>")
        lines.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                     + sample_name)
        return "\n".join(lines) + "\n"

    # ---- site assembly (VcfWriter.py:48-138) ----

    @staticmethod
    def candidate_list_to_variant(candidates, options):
        candidates = sorted(candidates, key=lambda x: (x[5], x[8]),
                            reverse=True)
        if len(candidates) > options.allowed_multiallelics:
            candidates = candidates[:options.allowed_multiallelics]

        max_ref_length = 0
        max_ref_allele = ""
        for candidate in candidates:
            ref_allele = candidate[3]
            if len(ref_allele) > max_ref_length:
                max_ref_length = len(ref_allele)
                max_ref_allele = ref_allele

        gt_qual = -1.0
        genotype_hp1, genotype_hp2 = [], []
        all_initialized = False
        site_contig, site_ref_allele = "", ""
        site_ref_start = site_ref_end = site_depth = 0
        site_alts, site_supports = [], []
        site_in_repeat = False
        site_non_alt_predictions = []

        for i, candidate in enumerate(candidates):
            (contig, ref_start, ref_end, ref_allele, alt_allele, genotype,
             depth, support, genotype_probability, predictions,
             non_alt_predictions, in_repeat) = candidate
            # suffix normalization to the longest ref allele
            # (VcfWriter.py:48-76); only alt[0] feeds the site record
            suffix_needed = max_ref_length - len(ref_allele)
            if suffix_needed > 0:
                suffix_seq = max_ref_allele[-suffix_needed:]
                ref_allele = ref_allele + suffix_seq
                first_alt = alt_allele[0] + suffix_seq
            else:
                first_alt = alt_allele[0]
            site_in_repeat = in_repeat or site_in_repeat
            p0, p1, p2 = (float(predictions[0]), float(predictions[1]),
                          float(predictions[2]))
            # scalar argmax; ties resolve to the lowest index like np.argmax
            if p0 >= p1 and p0 >= p2:
                predicted_genotype = 0
            elif p1 >= p2:
                predicted_genotype = 1
            else:
                predicted_genotype = 2
            if predicted_genotype != 0:
                p = (p0, p1, p2)[predicted_genotype]
                gt_qual = p if gt_qual < 0 else min(gt_qual, p)
            elif gt_qual < 0:
                gt_qual = p1 if p1 >= p2 else p2

            if not all_initialized:
                site_contig = contig
                site_ref_start = ref_start
                site_ref_end = ref_start + len(ref_allele)
                site_ref_allele = ref_allele
                site_depth = depth
                all_initialized = True

            site_depth = min(site_depth, depth)
            site_alts.append(first_alt)
            site_supports.append(support[0])
            site_non_alt_predictions.extend(non_alt_predictions)

            if predicted_genotype == 1:
                genotype_hp1.append(i + 1)
            elif predicted_genotype == 2:
                genotype_hp1.append(i + 1)
                genotype_hp2.append(i + 1)

        if 0 < len(genotype_hp1) + len(genotype_hp2) <= 2:
            gt = genotype_hp1 + genotype_hp2
            if len(gt) == 1:
                gt = [0, gt[0]]
        else:
            gt = [0, 0]

        return (site_contig, site_ref_start, site_ref_end,
                site_ref_allele, site_alts, gt, site_depth,
                site_supports, gt_qual, site_non_alt_predictions,
                site_in_repeat)

    # ---- record emission (VcfWriter.py:140-218) ----

    def write_vcf_records(self, variants_dict, options):
        totals = dict(full=0, pepper=0, variant_calling=0, snp=0, indel=0)
        last_position = -1
        for key in sorted(variants_dict):
            all_candidates = variants_dict[key]
            (contig, ref_start, ref_end, ref_seq, alleles, genotype, depth,
             supports, genotype_probability, non_alt_predictions,
             site_in_repeat) = self.candidate_list_to_variant(all_candidates,
                                                              options)
            if len(alleles) <= 0:
                continue
            if ref_start == last_position:
                continue
            max_alt_len = max(len(ref_seq), max(len(x) for x in alleles))
            last_position = ref_start
            qual = max(1, int(-10 * math.log10(
                max(1e-9, 1.0 - genotype_probability))))

            failed_variant = False
            is_snp = max_alt_len == 1
            if is_snp:
                if not site_in_repeat and qual <= options.snp_q_cutoff:
                    failed_variant = True
                elif site_in_repeat and qual <= options.snp_q_cutoff_in_lc:
                    failed_variant = True
            else:
                if not site_in_repeat and qual <= options.indel_q_cutoff:
                    failed_variant = True
                elif site_in_repeat and qual <= options.indel_q_cutoff_in_lc:
                    failed_variant = True

            selected_for_variant_calling = (genotype == [0, 0]
                                            or failed_variant)
            vafs = [round(ad / max(1, depth), 3) for ad in supports]
            rep = "1" if site_in_repeat else "0"
            filter_field = "refCall" if genotype == [0, 0] else "PASS"
            gq = qual

            gt_str = "/".join(str(g) for g in genotype)
            sample = ":".join([
                gt_str,
                str(gq),  # gq == qual, an int — %g of it is just str()
                str(depth),
                ",".join(str(int(s)) for s in supports),
                ",".join(_format_float(float(v)) for v in vafs),
                ",".join(_format_float(float(p))
                         for p in non_alt_predictions),
                rep,
            ])
            line = ("\t".join([
                contig, str(ref_start + 1), ".", ref_seq,
                ",".join(alleles), str(qual), filter_field, ".",
                "GT:GQ:DP:AD:VAF:AP:REP", sample,
            ]) + "\n").encode()

            self.file_full.write_record(contig, ref_start, ref_end, line)
            totals["full"] += 1
            if selected_for_variant_calling:
                if is_snp:
                    self.file_variant_calling_snp.write_record(
                        contig, ref_start, ref_end, line)
                    totals["snp"] += 1
                else:
                    self.file_variant_calling_indel.write_record(
                        contig, ref_start, ref_end, line)
                    totals["indel"] += 1
                self.file_variant_calling.write_record(contig, ref_start,
                                                       ref_end, line)
                totals["variant_calling"] += 1
            else:
                self.file_pepper.write_record(contig, ref_start, ref_end,
                                              line)
                totals["pepper"] += 1
        return (totals["full"], totals["pepper"], totals["variant_calling"],
                totals["snp"], totals["indel"])
