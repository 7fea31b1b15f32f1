"""Polish-training full loop: truth-read-supervised train images ->
TBPTT-trained GRU -> polish an unseen draft -> near-perfect identity."""

import os

import numpy as np
import pytest

from pepper_tpu.io.bam_writer import BamRecord, write_bam, write_fasta
from pepper_tpu.options import PepperOptions
from pepper_tpu.polish.pipeline import (
    make_polish_train_images, polish, remove_conflicting_regions)

from simulate import apply_variants, random_reference, read_from_haplotype, \
    simulate_reads


def test_remove_conflicting_regions():
    # two compatible regions with small overlap: trimmed
    regions = [[0, 2000, "a", True], [1800, 4000, "b", True]]
    kept = remove_conflicting_regions(regions, 0, 4000)
    assert [k[2] for k in kept] == ["a", "b"]
    assert kept[0][1] == 1800 and kept[1][0] == 2000

    # heavy overlap between similar-length regions: both dropped
    regions = [[0, 2000, "a", True], [100, 2100, "b", True]]
    assert remove_conflicting_regions(regions, 0, 4000) == []

    # heavy overlap, one much longer: short one dropped
    regions = [[0, 6000, "long", True], [100, 1500, "short", True]]
    kept = remove_conflicting_regions(regions, 0, 6000)
    assert [k[2] for k in kept] == ["long"]

    # short fragments dropped by min_length
    regions = [[0, 500, "tiny", True]]
    assert remove_conflicting_regions(regions, 0, 4000) == []


def build_polish_dataset(tmp, name, length, seed):
    """Draft with scattered errors; reads from the true sequence; truth
    read = true sequence aligned to the draft."""
    rng = np.random.RandomState(seed)
    draft = random_reference(length, seed=seed)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    variants = []
    for pos in range(300, length - 300, 300):
        kind = rng.randint(3)
        offset = int(rng.randint(0, 100))
        p = pos + offset
        if kind == 0:
            variants.append((p, draft[p], alt[draft[p]]))
        elif kind == 1:
            insert = "".join("ACGT"[i] for i in rng.randint(0, 4, size=2))
            variants.append((p, draft[p], draft[p] + insert))
        else:
            variants.append((p, draft[p:p + 2], draft[p]))
    true_segments = apply_variants(draft, variants)
    true_seq = "".join(alt_seq for _, _, alt_seq in true_segments)

    reads = simulate_reads(draft, [variants, variants], read_len=400,
                           stride=45, name_prefix=name)
    # single full-length truth read
    truth_seq, truth_cigar = read_from_haplotype(draft, true_segments, 0,
                                                 length)
    truth_record = BamRecord(f"truth_{name}", 0, 0, 60, truth_cigar,
                             truth_seq, [60] * len(truth_seq))

    bam = str(tmp / f"{name}_reads.bam")
    truth_bam = str(tmp / f"{name}_truth.bam")
    fasta = str(tmp / f"{name}_draft.fa")
    write_bam(bam, [("ctg", length)], reads)
    write_bam(truth_bam, [("ctg", length)], [truth_record])
    write_fasta(fasta, {"ctg": draft})
    return dict(bam=bam, truth_bam=truth_bam, fasta=fasta, draft=draft,
                truth=true_seq)


def identity(a: str, b: str) -> float:
    # autojunk=False: difflib's junk heuristic treats every DNA base as
    # "popular" and reports near-zero ratios on long sequences
    import difflib

    return difflib.SequenceMatcher(None, a, b, autojunk=False).ratio()


def test_polish_train_and_apply(tmp_path):
    train = build_polish_dataset(tmp_path, "train", 14000, seed=5)
    test = build_polish_dataset(tmp_path, "test", 6000, seed=9)

    # 1) supervised train images
    options = PepperOptions(bam=train["bam"], fasta=train["fasta"],
                            threads=1)
    image_dir = str(tmp_path / "train_imgs")
    make_polish_train_images(options, train["truth_bam"], image_dir)
    files = os.listdir(image_dir)
    assert files, "no polish train images generated"

    # sanity: labels contain real bases, not just gaps
    from pepper_tpu.polish.datastore import PolishImageStore

    with PolishImageStore(os.path.join(image_dir, files[0]), "r") as store:
        names = store.summary_names()
        assert names
        record = store.read_summary(names[0])
        assert record["label"].max() >= 1

    # 2) TBPTT training
    from pepper_tpu.polish.train import train_polish_model

    model_path = train_polish_model(
        PepperOptions(), image_dir, str(tmp_path / "polish_run"),
        epochs=6, learning_rate=1e-3, batch_size=8, holdout_fraction=0.15)

    # 3) polish the unseen draft with the trained model
    from pepper_tpu.models.checkpoint import load_params

    params, _ = load_params(model_path)
    polish_options = PepperOptions(
        bam=test["bam"], fasta=test["fasta"],
        output_dir=str(tmp_path / "polish_out"), threads=1, batch_size=8)
    fasta_path = polish(polish_options, params=params)
    with open(fasta_path) as f:
        lines = f.read().strip().split("\n")
    polished = "".join(lines[1:])

    draft_identity = identity(test["draft"], test["truth"])
    polished_identity = identity(polished, test["truth"])
    # polishing must substantially close the gap to the truth
    assert polished_identity > draft_identity
    assert polished_identity >= 0.995, (draft_identity, polished_identity)
