"""Region/interval planning (ImageGenerationUI.py:99-188, 289-315 semantics):
contig selection (BAM ∩ FASTA − excluded decoys), `chr1-22` range expansion,
`chr:start-end` parsing, BED loading, and region_size interval slicing."""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict
from datetime import datetime

_EXCLUDED_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                              "data", "excluded_human_contigs.txt")
_excluded_cache = None


def excluded_human_contigs() -> set[str]:
    global _excluded_cache
    if _excluded_cache is None:
        with open(_EXCLUDED_PATH) as f:
            _excluded_cache = {line.strip() for line in f
                               if line.strip() and not line.startswith("#")}
    return _excluded_cache


def natural_key(string_):
    return [int(s) if s.isdigit() else s
            for s in re.split(r"(\d+)", string_)]


def get_chromosome_list(chromosome_names, fasta_handler, bam_handler,
                        region_bed=None):
    """Returns ([(contig, region_or_None)], bed_dict_or_None)."""
    chromosome_name_list = []
    region_bed_list = None

    if not chromosome_names:
        bam_contigs = bam_handler.get_chromosome_names()
        fasta_contigs = fasta_handler.get_chromosome_names()
        common = (set(fasta_contigs) & set(bam_contigs)) \
            - excluded_human_contigs()
        if not common:
            raise ValueError(
                "NO COMMON CONTIGS FOUND BETWEEN THE BAM FILE AND THE FASTA "
                "FILE.")
        for contig in sorted(common, key=natural_key):
            chromosome_name_list.append((contig, None))
    else:
        for name in (n.strip() for n in chromosome_names.strip().split(",")):
            region = None
            if ":" in name:
                name, region_str = name.split(":", 1)
                bounds = [int(p) for p in region_str.strip().split("-")]
                if len(bounds) != 2 or bounds[0] > bounds[1]:
                    raise ValueError(f"--region INVALID value: {region_str}")
                region = bounds
            range_split = name.split("-")
            if len(range_split) > 1:
                chr_prefix = ""
                for ch in name:
                    if ch.isdigit():
                        break
                    chr_prefix += ch
                int_ranges = sorted(
                    int("".join(i for i in item if i.isdigit()))
                    for item in range_split)
                for chr_seq in range(int_ranges[0], int_ranges[-1] + 1):
                    chromosome_name_list.append(
                        (chr_prefix + str(chr_seq), region))
            else:
                chromosome_name_list.append((name, region))

    if region_bed:
        region_bed_list = defaultdict(list)
        with open(region_bed) as fp:
            for line in fp:
                parts = line.rstrip().split("\t")
                if len(parts) < 3:
                    continue
                chr_name = parts[0]
                region_bed_list[chr_name].append(
                    sorted([int(parts[1]), int(parts[2])]))

    return chromosome_name_list, region_bed_list


def build_intervals(chr_list, fasta_handler, region_size: int,
                    train_mode: bool = False, min_sequence_length: int = 1000):
    """Slice contigs into region_size intervals
    (ImageGenerationUI.py:289-315)."""
    all_intervals = []
    total_bases = 0
    for chr_name, region in chr_list:
        if not region:
            interval_start = 0
            interval_end = (
                fasta_handler.get_chromosome_sequence_length(chr_name) - 1)
        else:
            interval_start = max(0, region[0])
            interval_end = min(
                region[1],
                fasta_handler.get_chromosome_sequence_length(chr_name) - 1)
        if (train_mode
                and interval_end - interval_start < min_sequence_length):
            continue
        for pos in range(interval_start, interval_end, region_size):
            pos_start = max(interval_start, pos)
            pos_end = min(interval_end, pos + region_size)
            if train_mode and pos_end - pos_start < min_sequence_length:
                continue
            all_intervals.append((chr_name, pos_start, pos_end))
            total_bases += pos_end - pos_start
    return all_intervals, total_bases


def log_info(message: str) -> None:
    timestamp = datetime.now().strftime("%m-%d-%Y %H:%M:%S")
    sys.stderr.write(f"[{timestamp}] INFO: {message}\n")
    sys.stderr.flush()
