"""Self-contained quickstart on simulated data (no network, no real BAMs).

Builds a small diploid genome with known SNPs, simulates haplotype reads,
writes BAM/FASTA/truth-VCF fixtures, then runs the full pipeline twice:
  1. --dry (label passthrough) — verifies the pipeline recovers the truth;
  2. train a model on a second simulated genome and call with it.

Run:  python examples/simulated_quickstart.py /tmp/pepper_demo
"""

import os
import sys
import tempfile

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from simulate import random_reference, simulate_reads, write_truth_vcf  # noqa: E402

from pepper_tpu.io.bam_writer import write_bam, write_fasta  # noqa: E402
from pepper_tpu.options import PepperOptions  # noqa: E402
from pepper_tpu.presets import set_parameters  # noqa: E402
from pepper_tpu.pipeline.call_variant import call_variant  # noqa: E402

CONTIG = "chr_demo"


def build_dataset(directory, length=8000, seed=7):
    import numpy as np

    ref = random_reference(length, seed=seed)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    rng = np.random.RandomState(seed)
    positions = sorted(rng.choice(np.arange(400, length - 400, 50), size=10,
                                  replace=False))
    variants = [(int(p), ref[p], alt[ref[p]],
                 "1|1" if i % 3 == 0 else "1|0")
                for i, p in enumerate(positions)]
    hap1 = [(p, r, a) for p, r, a, _ in variants]
    hap2 = [(p, r, a) for p, r, a, g in variants if g == "1|1"]
    records = simulate_reads(ref, [hap1, hap2], read_len=300, stride=25)

    os.makedirs(directory, exist_ok=True)
    bam = os.path.join(directory, "reads.bam")
    fasta = os.path.join(directory, "ref.fa")
    truth = os.path.join(directory, "truth.vcf")
    bed = os.path.join(directory, "confident.bed")
    write_bam(bam, [(CONTIG, length)], records)
    write_fasta(fasta, {CONTIG: ref})
    write_truth_vcf(truth, CONTIG, length, variants)
    with open(bed, "w") as f:
        f.write(f"{CONTIG}\t0\t{length}\n")
    return dict(bam=bam, fasta=fasta, truth=truth, bed=bed,
                variants=variants)


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="pepper_demo_")
    data = build_dataset(os.path.join(base, "data"))
    out_dir = os.path.join(base, "calls_dry")

    options = set_parameters(PepperOptions(
        bam=data["bam"], fasta=data["fasta"], output_dir=out_dir,
        threads=1, ont_r9_guppy5_sup=True, sub_command="call_variant",
        dry=True, train_mode=True, truth_vcf=data["truth"],
        region_bed=data["bed"], random_draw_probability=1.0,
        region=CONTIG))
    totals = call_variant(options)
    print(f"\nDry run complete: {totals[0]} records "
          f"({totals[1]} PEPPER-confident). Output: {out_dir}")
    print(f"Truth variants: {[(p, r, a, g) for p, r, a, g in data['variants']]}")
    print(f"\nInspect: zcat {out_dir}/PEPPER_VARIANT_FULL.vcf.gz | grep -v '^##'")


if __name__ == "__main__":
    main()
