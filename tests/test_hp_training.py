"""HP-mode training loop: 48-channel labeled images through the trainer."""

import os

import numpy as np

from pepper_tpu.options import PepperOptions
from pepper_tpu.presets import set_parameters
from pepper_tpu.pipeline.stages import make_images

from simulate import random_reference, simulate_reads, write_truth_vcf
from pepper_tpu.io.bam_writer import write_bam, write_fasta


def test_hp_train_images_and_training(tmp_path):
    ref = random_reference(6000, seed=44)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    rng = np.random.RandomState(44)
    positions = sorted(rng.choice(np.arange(300, 5700, 40), size=40,
                                  replace=False))
    variants = [(int(p), ref[p], alt[ref[p]],
                 "1|1" if i % 3 == 0 else "1|0")
                for i, p in enumerate(positions)]
    hap1 = [(p, r, a) for p, r, a, _ in variants]
    hap2 = [(p, r, a) for p, r, a, g in variants if g == "1|1"]
    noise = [(int(p), ref[p], alt[ref[p]])
             for p in sorted(rng.choice(np.arange(320, 5680, 40), size=40,
                                        replace=False))
             if p not in {v[0] for v in variants}]
    records = simulate_reads(ref, [hap1, hap2, noise], read_len=300,
                             strides=[25, 25, 80])
    bam = str(tmp_path / "hp.bam")
    fasta = str(tmp_path / "hp.fa")
    truth = str(tmp_path / "hp.vcf")
    bed = str(tmp_path / "hp.bed")
    write_bam(bam, [("chrT", len(ref))], records)
    write_fasta(fasta, {"chrT": ref})
    write_truth_vcf(truth, "chrT", len(ref), variants)
    with open(bed, "w") as f:
        f.write(f"chrT\t0\t{len(ref)}\n")

    options = set_parameters(PepperOptions(
        bam=bam, fasta=fasta, ont_r9_guppy5_sup=True,
        sub_command="make_train_images", train_mode=True, truth_vcf=truth,
        region_bed=bed, random_draw_probability=1.0, region="chrT",
        threads=1, use_hp_info=True))
    image_dir = str(tmp_path / "hp_images")
    make_images(options, image_dir)

    from pepper_tpu.train.data import load_image_dir

    images, type_labels, _ = load_image_dir(image_dir)
    assert images.shape[1:] == (21, 48)
    assert set(np.unique(type_labels)) >= {0, 1}

    from pepper_tpu.models.transducer import TransducerConfig
    from pepper_tpu.train.trainer import train_model

    small_hp = TransducerConfig(image_features=48, window=21, hidden=32,
                                linear_size=64)
    model_path, accuracy = train_model(
        PepperOptions(batch_size=16, use_hp_info=True), image_dir,
        str(tmp_path / "hp_run"), epochs=25, learning_rate=3e-4,
        step_size=10_000, batch_size=16, holdout_fraction=0.2, seed=0,
        config=small_hp)
    assert os.path.exists(model_path)
    assert accuracy >= 80.0, accuracy
