"""Assembly-polishing pipeline: make_images -> call_consensus -> stitch
(reference pepper/modules/python/polish.py:91-117), plus an in-process
`polish` driver that streams chunks straight through the jitted consensus
scan and writes the polished FASTA."""

from __future__ import annotations

import os
import time

import numpy as np

from ..io.bam import BamReader
from ..io.fasta import FastaReader
from ..options import PolishImageOptions
from ..pipeline.regions import log_info, natural_key
from .consensus import consensus_predict
from .datastore import PolishImageStore, PolishPredictionStore
from .stitch import stitch_contig
from .summary import PolishSummary, chunk_images, chunk_images_train

MIN_IMAGE_OVERLAP = 100  # pepper ImageSizeOptions.MIN_IMAGE_OVERLAP
MAX_READS = PolishImageOptions.MAX_READS_IN_REGION  # 1500


def get_polish_chromosome_list(region, fasta_handler, bam_handler,
                               region_bed=None):
    """Contig selection for polish mode (pepper ImageGenerationUI
    get_chromosome_list: no decoy exclusion — drafts are arbitrary)."""
    if not region and not region_bed:
        common = (set(fasta_handler.get_chromosome_names())
                  & set(bam_handler.get_chromosome_names()))
        if not common:
            raise ValueError("NO COMMON CONTIGS FOUND BETWEEN THE BAM FILE "
                             "AND THE FASTA FILE.")
        return [(contig, None) for contig in sorted(common, key=natural_key)]
    if region_bed:
        chromosome_name_list = []
        with open(region_bed) as fp:
            for line in fp:
                parts = line.rstrip().split("\t")
                if len(parts) >= 3:
                    chromosome_name_list.append(
                        (parts[0], sorted([int(parts[1]), int(parts[2])])))
        return chromosome_name_list
    chromosome_name_list = []
    for name in (n.strip() for n in region.strip().split(",")):
        reg = None
        if ":" in name:
            name, region_str = name.split(":", 1)
            bounds = [int(p) for p in region_str.strip().split("-")]
            reg = bounds
        chromosome_name_list.append((name, reg))
    return chromosome_name_list


def build_polish_intervals(chr_list, fasta_handler, max_size: int = 1000):
    """1kb intervals with 100bp overlap halos
    (pepper ImageGenerationUI.py:269-272)."""
    all_intervals = []
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
        for pos in range(interval_start, interval_end, max_size):
            pos_start = max(interval_start, pos - MIN_IMAGE_OVERLAP)
            pos_end = min(interval_end, pos + max_size + MIN_IMAGE_OVERLAP)
            all_intervals.append((chr_name, pos_start, pos_end))
    return all_intervals


def reservoir_downsample_indices(n_reads: int, total_allowed: int,
                                 seed: int = 2719747673):
    import numpy as np

    if n_reads <= total_allowed:
        return None
    random = np.random.RandomState(seed)
    sample = []
    for i in range(n_reads):
        if len(sample) < total_allowed:
            sample.append(i)
        else:
            j = random.randint(0, i + 1)
            if j < total_allowed:
                sample[j] = i
    return sample


def summarize_interval(bam_handler, fasta_handler, contig, start, end,
                       downsample_rate: float = 1.0,
                       realignment: bool = True):
    """One interval -> (images, labels, positions, chunk_ids)
    (pepper AlignmentSummarizer.create_summary inference path :295-358;
    the local-realignment stage mirrors reads_to_reference_realignment
    :159-177)."""
    reads = bam_handler.get_reads(contig, max(0, start), end, False, 0, 0)
    if reads.n_reads == 0:
        return [], [], [], []
    sample = reservoir_downsample_indices(reads.n_reads, MAX_READS)
    if sample is not None:
        reads = reads.subset(sample)
    if realignment and reads.n_reads > 0:
        from .realign import ALIGNMENT_SAFE_BASES, realign_reads

        align_end = end + ALIGNMENT_SAFE_BASES
        align_ref = fasta_handler.get_reference_sequence(contig, start,
                                                         align_end)
        reads = realign_reads(reads, align_ref, start, align_end)
    ref_seq = fasta_handler.get_reference_sequence(contig, start, end + 1)
    expected = end - start + 1
    if len(ref_seq) < expected:
        ref_seq += "N" * (expected - len(ref_seq))
    summary = PolishSummary(ref_seq, contig, start, end)
    summary.generate_summary(reads)
    return chunk_images(summary, PolishImageOptions.SEQ_LENGTH,
                        PolishImageOptions.SEQ_OVERLAP)


def make_polish_images(options, output_dir: str):
    os.makedirs(output_dir, exist_ok=True)
    bam_handler = BamReader(options.bam)
    fasta_handler = FastaReader(options.fasta)
    chr_list = get_polish_chromosome_list(options.region, fasta_handler,
                                          bam_handler, options.region_bed)
    intervals = build_polish_intervals(chr_list, fasta_handler)
    log_info(f"TOTAL CONTIGS: {len(chr_list)} TOTAL INTERVALS: "
             f"{len(intervals)}")
    timestr = time.strftime("%m%d%Y_%H%M%S")
    file_name = os.path.join(output_dir,
                             f"pepper_images_thread_0_{timestr}.hdf")
    with PolishImageStore(file_name, "w") as store:
        for contig, start, end in intervals:
            images, labels, positions, chunk_ids = summarize_interval(
                bam_handler, fasta_handler, contig, start, end,
                options.downsample_rate,
                realignment=getattr(options, "realignment", True))
            region = (contig, start, end)
            for i, image in enumerate(images):
                position = positions[i][:, 0]
                index = positions[i][:, 1]
                name = f"{contig}_{start}_{end}_{chunk_ids[i]}"
                store.write_summary(region, image, labels[i], position,
                                    index, chunk_ids[i], name)
    log_info("FINISHED IMAGE GENERATION")
    return file_name


def call_consensus(options, image_dir: str, output_dir: str, params):
    """Images HDF5 -> sliding-window GRU predictions HDF5."""
    os.makedirs(output_dir, exist_ok=True)
    output_file = os.path.join(output_dir, "pepper_prediction_0.hdf")
    image_files = sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir)
        if f.endswith((".hdf", ".hdf5", ".h5")))
    with PolishPredictionStore(output_file, "w") as store:
        for image_file in image_files:
            with PolishImageStore(image_file, "r") as images:
                records = [images.read_summary(name)
                           for name in images.summary_names()]
            if not records:
                continue
            image_stack = np.stack([r["image"] for r in records])
            if getattr(options, "dry", False):
                from .consensus import dry_consensus_labels

                labels, phred = dry_consensus_labels(image_stack)
            else:
                labels, phred = consensus_predict(
                    params, image_stack, batch_size=options.batch_size)
            for i, record in enumerate(records):
                store.write_prediction(
                    record["contig"], record["region_start"],
                    record["region_end"], record["chunk_id"],
                    record["position"], record["index"], labels[i],
                    np.clip(phred[i], 0, 255))
    log_info("FINISHED PREDICTION")
    return output_file


def perform_stitch(prediction_dir: str, output_path: str):
    """Predictions HDF5 -> polished consensus FASTA
    (perform_stitch.py:44-84)."""
    prediction_files = sorted(
        os.path.join(prediction_dir, f) for f in os.listdir(prediction_dir)
        if f.endswith(".hdf"))
    all_contigs = set()
    for prediction_file in prediction_files:
        with PolishPredictionStore(prediction_file, "r") as store:
            all_contigs.update(store.contigs())

    fasta_path = output_path + "_pepper_polished.fa"
    os.makedirs(os.path.dirname(os.path.abspath(fasta_path)), exist_ok=True)
    with open(fasta_path, "w") as fasta_out:
        for contig in sorted(all_contigs, key=natural_key):
            log_info(f"PROCESSING CONTIG: {contig}")
            groups = []
            for prediction_file in prediction_files:
                with PolishPredictionStore(prediction_file, "r") as store:
                    if contig not in store.contigs():
                        continue
                    for _, c_start, c_end, records in store.chunk_groups(
                            contig):
                        groups.append((c_start, c_end, records))
            sequence = stitch_contig(groups)
            log_info(f"FINISHED PROCESSING {contig}, POLISHED SEQUENCE "
                     f"LENGTH: {len(sequence)}.")
            if sequence:
                fasta_out.write(f">{contig}\n{sequence}\n")
    return fasta_path


def polish(options, params):
    """Full polish pipeline (polish.py:91-117)."""
    timestr = time.strftime("%m%d%Y_%H%M%S")
    output_dir = options.output_dir
    os.makedirs(output_dir, exist_ok=True)
    image_dir = os.path.join(output_dir, f"images_{timestr}")
    prediction_dir = os.path.join(output_dir, f"predictions_{timestr}")
    log_info(f"RUN-ID: {timestr}")
    log_info("STEP 1: GENERATING IMAGES")
    make_polish_images(options, image_dir)
    log_info("STEP 2: RUNNING INFERENCE")
    call_consensus(options, image_dir, prediction_dir, params)
    log_info("STEP 3: RUNNING STITCH")
    return perform_stitch(prediction_dir,
                          os.path.join(output_dir, "consensus"))
