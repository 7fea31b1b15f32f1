"""Deterministic consensus stitching (reference pepper/modules/python/
Stitch.py:36-128): positional dict keyed (pos, insert_index), chunks applied
in sorted order, the first 2*MIN_IMAGE_OVERLAP positions of any chunk that
overlaps a previous one dropped, labels decoded 0:'' 1:'A' 2:'C' 3:'G'
4:'T' and concatenated in (pos, index) order."""

from __future__ import annotations

from ..options import PolishImageOptions

LABEL_DECODER = PolishImageOptions.LABEL_DECODER
MIN_IMAGE_OVERLAP = 100


def stitch_chunk_predictions(chunk_records):
    """chunk_records: iterable of (region_start, positions (L,2) array,
    labels (L,) array) for one contig, where positions rows are
    (genomic_pos, insert_index).

    Returns (first_pos, last_pos, sequence) or (-1, -1, '')."""
    base_prediction = {}
    all_positions = set()
    buffer_positions = MIN_IMAGE_OVERLAP * 2

    for region_start, positions, labels in chunk_records:
        for (pos, index), label in zip(positions, labels):
            if region_start > 0 and pos <= region_start + buffer_positions:
                continue
            if index < 0 or pos < 0:
                continue
            base_prediction[(pos, index)] = int(label)
            all_positions.add((pos, index))

    if not all_positions:
        return -1, -1, ""

    pos_list = sorted(all_positions)
    sequence = "".join(LABEL_DECODER[base_prediction[key]]
                       for key in pos_list)
    return pos_list[0][0], pos_list[-1][0], sequence


def stitch_contig(chunk_groups):
    """chunk_groups: list of (contig_start, contig_end, chunk_records)
    sorted by (contig_start, contig_end); each group stitched independently
    then concatenated (create_consensus_sequence, Stitch.py:97-128)."""
    pieces = []
    for contig_start, contig_end, records in sorted(
            chunk_groups, key=lambda g: (g[0], g[1])):
        first_pos, last_pos, sequence = stitch_chunk_predictions(records)
        if first_pos != -1:
            pieces.append((first_pos, last_pos, sequence))
    pieces.sort(key=lambda p: (p[0], p[1]))
    return "".join(sequence for _, _, sequence in pieces)
