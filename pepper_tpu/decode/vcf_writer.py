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

from ..io.bgzf_writer import (BgzfWriter, MAX_BLOCK_UNCOMPRESSED,
                              compress_block_stream)
from ..io.tabix import TabixIndexBuilder


def _format_float(value) -> str:
    """pysam-style %g float rendering."""
    if isinstance(value, float) and value == int(value) and abs(value) < 1e15:
        return str(int(value))
    return f"{value:g}"


# deflate level for bgzipped VCF output: level 1 is ~3.5x faster than the
# bgzip default (6) on VCF record text for ~20% larger files — the right
# trade for an intermediate file the WGS tail is bound on (the reference
# inherits htslib's default via pysam, VcfWriter.py:22).
VCF_BGZF_LEVEL = 1

_UNSET = object()
_native_emit = _UNSET


def _get_native_emit():
    """emit_chunk from the _pepper_vcfemit extension, or None (build
    failure, or PEPPER_PY_VCF=1 forcing the pure-Python engine)."""
    global _native_emit
    if os.environ.get("PEPPER_PY_VCF"):
        return None
    if _native_emit is _UNSET:
        try:
            from ..io.native_vcfemit import get_module
            _native_emit = get_module().emit_chunk
        except Exception:
            _native_emit = None
    return _native_emit


class _VcfFile:
    def __init__(self, path: str, header: str):
        self.path = path
        self._raw = open(path, "wb")
        self._writer = BgzfWriter(self._raw, level=VCF_BGZF_LEVEL)
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

    def append_stream(self, blob: bytes, runs) -> None:
        """Append pre-compressed whole BGZF blocks produced by a pool
        worker; worker-local virtual offsets (per contig run) are rebased
        onto this file's running compressed offset."""
        if not blob:
            return
        base = self._writer.append_block_stream(blob)
        for contig, begs, ends, vstarts, vends in runs:
            self._tabix.add_many(contig, begs, ends, vstarts + base,
                                 vends + base)
            self.count += len(begs)

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
        return self.write_vcf_records_parallel(variants_dict, options,
                                               None, 1)

    def write_vcf_records_parallel(self, variants_dict, options, pool,
                                   threads: int, chunk: int = 16384):
        """Record emission, sequential or pool-parallel.

        This process assembles sites + encodes record lines (the fast
        single-candidate path covers the dominant case) and runs the exact
        sequential positional dedup (`ref_start == last_position` may fire
        across contig boundaries — VcfWriter.py:149 never resets
        last_position).  Compression of the per-file BGZF block streams —
        the other half of the per-record cost — runs inline (pool=None) or
        on the worker pool, overlapped with encoding; appended blocks
        rebase tabix virtual offsets by the running compressed offset.

        Decompressed contents, routing totals and tabix query results are
        independent of pool/chunking (each chunk flushes its final partial
        block, so only block boundaries differ).  The reference's VcfWriter
        is strictly single-process (VcfWriter.py:140-218)."""
        emit = _get_native_emit()
        if emit is not None:
            return self._write_vcf_records_native(variants_dict, options,
                                                  emit, chunk, threads)
        parallel = pool is not None and threads > 1
        counts = [0, 0, 0]
        futures = []
        buffer = []

        def flush():
            nonlocal buffer
            if not buffer:
                return
            if parallel:
                futures.append(pool.submit(_emit_compress_worker, buffer))
                # keep a bounded compression pipeline: drain completed
                # chunks in submission order so appends stay ordered
                while (len(futures) > 2 * threads and futures[0].done()):
                    self._append_streams(futures.pop(0).result())
            else:
                self._append_streams(_emit_compress_worker(buffer))
            buffer = []

        last_position = -1
        for key in sorted(variants_dict):
            candidates = variants_dict[key]
            if len(candidates) == 1:
                record = _encode_single_candidate(candidates[0], options)
            else:
                record = encode_vcf_record(candidates, options)
            if record is None or record[1] == last_position:
                continue
            last_position = record[1]
            counts[record[4]] += 1
            buffer.append(record)
            if len(buffer) >= chunk:
                flush()
        flush()
        for future in futures:
            self._append_streams(future.result())
        return (sum(counts), counts[ROUTE_PEPPER],
                counts[ROUTE_VC_SNP] + counts[ROUTE_VC_INDEL],
                counts[ROUTE_VC_SNP], counts[ROUTE_VC_INDEL])

    def _append_streams(self, per_file) -> None:
        for vcf_file, stream in zip(self._files, per_file):
            vcf_file.append_stream(*stream)

    def _write_vcf_records_native(self, variants_dict, options, emit,
                                  chunk: int, threads: int = 1):
        """Emission through the _pepper_vcfemit extension: C does the fast
        single-candidate encode, positional dedup, per-file BGZF block
        compression and virtual offsets; Python only sorts keys, assembles
        the rare multi-candidate sites, and appends the finished streams.

        With threads > 1 chunks run on a thread pool (the extension drops
        the GIL for compression; no pickling).  Chunks are independent
        because each one's incoming dedup state is known upfront: every
        emitted record's position equals its key position, and a dup-drop
        leaves last_position unchanged — so the state entering chunk k is
        just the last non-None item position before it."""
        cutoffs = (float(options.snp_q_cutoff),
                   float(options.snp_q_cutoff_in_lc),
                   float(options.indel_q_cutoff),
                   float(options.indel_q_cutoff_in_lc))
        keys = sorted(variants_dict)
        items = [
            group[0] if len(group) == 1
            else encode_vcf_record(group, options)
            for group in map(variants_dict.__getitem__, keys)
        ]
        chunks = []
        last_position = -1
        for i in range(0, len(items), chunk):
            part = items[i:i + chunk]
            chunks.append((part, last_position))
            for item in reversed(part):
                if item is not None:
                    last_position = item[1]
                    break

        counts = [0, 0, 0]

        def run(args):
            part, incoming = args
            return emit(part, cutoffs, incoming, VCF_BGZF_LEVEL)

        def consume(result):
            streams, chunk_counts, _last = result
            for i in range(3):
                counts[i] += chunk_counts[i]
            for vcf_file, (blob, runs) in zip(self._files, streams):
                vcf_file.append_stream(blob, [
                    (contig, np.frombuffer(begs, np.int64),
                     np.frombuffer(ends, np.int64),
                     np.frombuffer(vstarts, np.int64),
                     np.frombuffer(vends, np.int64))
                    for contig, begs, ends, vstarts, vends in runs])

        if threads > 1 and len(chunks) > 1:
            import collections
            import concurrent.futures

            with concurrent.futures.ThreadPoolExecutor(
                    max_workers=min(threads, 4)) as thread_pool:
                inflight = collections.deque()
                for part in chunks:
                    inflight.append(thread_pool.submit(run, part))
                    if len(inflight) >= 8:
                        consume(inflight.popleft().result())
                while inflight:
                    consume(inflight.popleft().result())
        else:
            for part in chunks:
                consume(run(part))
        return (sum(counts), counts[ROUTE_PEPPER],
                counts[ROUTE_VC_SNP] + counts[ROUTE_VC_INDEL],
                counts[ROUTE_VC_SNP], counts[ROUTE_VC_INDEL])


# Routing of one record within the 5-file layout: every record goes to
# FULL; confident calls go to the PEPPER vcf, the rest to the
# re-genotyping vcf + its SNP/INDEL split (VcfWriter.py:140-218).
ROUTE_PEPPER, ROUTE_VC_SNP, ROUTE_VC_INDEL = 0, 1, 2

# per-file route membership, in VCFWriter._files order
_FILE_ROUTES = (
    (ROUTE_PEPPER, ROUTE_VC_SNP, ROUTE_VC_INDEL),   # full
    (ROUTE_PEPPER,),                                 # pepper
    (ROUTE_VC_SNP, ROUTE_VC_INDEL),                  # variant_calling
    (ROUTE_VC_SNP,),                                 # variant_calling_SNPs
    (ROUTE_VC_INDEL,),                               # variant_calling_INDEL
)


def encode_vcf_record(all_candidates, options):
    """Assemble one site and encode its VCF record line.

    Returns (contig, ref_start, ref_end, line_bytes, route) or None when
    the site has no alleles.  The caller owns the positional dedup
    (`ref_start == last_position`), which needs the emission stream."""
    (contig, ref_start, ref_end, ref_seq, alleles, genotype, depth,
     supports, genotype_probability, non_alt_predictions,
     site_in_repeat) = VCFWriter.candidate_list_to_variant(all_candidates,
                                                           options)
    if len(alleles) <= 0:
        return None
    max_alt_len = max(len(ref_seq), max(len(x) for x in alleles))
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

    if genotype == [0, 0] or failed_variant:
        route = ROUTE_VC_SNP if is_snp else ROUTE_VC_INDEL
    else:
        route = ROUTE_PEPPER
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
        ",".join(_format_float(float(p)) for p in non_alt_predictions),
        rep,
    ])
    line = ("\t".join([
        contig, str(ref_start + 1), ".", ref_seq,
        ",".join(alleles), str(qual), filter_field, ".",
        "GT:GQ:DP:AD:VAF:AP:REP", sample,
    ]) + "\n").encode()
    return contig, ref_start, ref_end, line, route


def _encode_single_candidate(candidate, options):
    """`encode_vcf_record` specialized to the dominant single-candidate
    site (one decoded window at the position): suffix normalization and
    the multi-candidate genotype merge reduce to no-ops, so the whole
    record collapses to one scan + one f-string.  Same float expressions
    as the general path, so outputs are byte-identical (asserted by the
    seq-vs-parallel equality test)."""
    (contig, ref_start, _ref_end, ref_allele, alt_alleles, _genotype, depth,
     supports, _gp, predictions, non_alt_predictions,
     in_repeat) = candidate
    p0 = float(predictions[0])
    p1 = float(predictions[1])
    p2 = float(predictions[2])
    if p0 >= p1 and p0 >= p2:
        predicted_genotype = 0
        gt_qual = p1 if p1 >= p2 else p2
    elif p1 >= p2:
        predicted_genotype = 1
        gt_qual = p1
    else:
        predicted_genotype = 2
        gt_qual = p2

    alt_allele = alt_alleles[0]
    qual = max(1, int(-10 * math.log10(max(1e-9, 1.0 - gt_qual))))
    is_snp = len(ref_allele) == 1 and len(alt_allele) == 1
    if is_snp:
        cutoff = (options.snp_q_cutoff_in_lc if in_repeat
                  else options.snp_q_cutoff)
    else:
        cutoff = (options.indel_q_cutoff_in_lc if in_repeat
                  else options.indel_q_cutoff)
    if predicted_genotype == 0 or qual <= cutoff:
        route = ROUTE_VC_SNP if is_snp else ROUTE_VC_INDEL
    else:
        route = ROUTE_PEPPER

    support = int(supports[0])
    vaf = round(support / max(1, depth), 3)
    if len(non_alt_predictions) == 1:
        ap = f"{float(non_alt_predictions[0]):g}"
    else:
        ap = ",".join(f"{float(p):g}" for p in non_alt_predictions)
    gt_str, filter_field = (("0/0", "refCall"), ("0/1", "PASS"),
                            ("1/1", "PASS"))[predicted_genotype]
    rep = "1" if in_repeat else "0"
    line = (f"{contig}\t{ref_start + 1}\t.\t{ref_allele}\t{alt_allele}\t"
            f"{qual}\t{filter_field}\t.\tGT:GQ:DP:AD:VAF:AP:REP\t"
            f"{gt_str}:{qual}:{depth}:{support}:{vaf:g}:{ap}:{rep}\n"
            ).encode()
    return contig, ref_start, ref_start + len(ref_allele), line, route


def _emit_compress_worker(records):
    """Phase-2 worker: deduped records -> per-file (blob, contig_runs) BGZF
    block streams with chunk-local virtual offsets.

    Lines are joined into one blob per file and compressed as independent
    65280-byte blocks; record virtual offsets then come straight from the
    cumulative block sizes (no per-record writer state)."""
    block = MAX_BLOCK_UNCOMPRESSED
    streams = []
    for routes in _FILE_ROUTES:
        selected = [r for r in records if r[4] in routes]
        lines = [r[3] for r in selected]
        blob = b"".join(lines)
        cblob, cum = compress_block_stream(blob, VCF_BGZF_LEVEL)
        cum = np.asarray(cum, np.int64)
        sizes = np.fromiter((len(line) for line in lines),
                            np.int64, count=len(lines))
        uends = np.cumsum(sizes)
        ustarts = uends - sizes
        vstarts = (cum[ustarts // block] << 16) | (ustarts % block)
        vends = (cum[uends // block] << 16) | (uends % block)
        begs = np.fromiter((r[1] for r in selected), np.int64,
                           count=len(selected))
        ends = np.fromiter((r[2] for r in selected), np.int64,
                           count=len(selected))
        # contiguous per-contig runs (records arrive key-sorted)
        runs = []
        i = 0
        while i < len(selected):
            j = i
            contig = selected[i][0]
            while j < len(selected) and selected[j][0] == contig:
                j += 1
            runs.append((contig, begs[i:j], ends[i:j], vstarts[i:j],
                         vends[i:j]))
            i = j
        streams.append((cblob, runs))
    return streams
