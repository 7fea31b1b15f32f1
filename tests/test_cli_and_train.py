"""CLI stage-wise pipeline (HDF5 transport) and training-loop tests."""

import gzip
import os

import numpy as np
import pytest

from pepper_tpu.cli.main import main as cli_main
from pepper_tpu.models.checkpoint import load_params, save_params

from simulate import random_reference, simulate_reads, write_truth_vcf
from pepper_tpu.io.bam_writer import write_bam, write_fasta

CONTIG = "chr20"


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    ref = random_reference(3000, seed=13)

    def alt_base(pos):
        return {"A": "T", "T": "A", "C": "G", "G": "C"}[ref[pos]]

    het_snp = (600, ref[600], alt_base(600))
    hom_snp = (900, ref[900], alt_base(900))
    hap1 = [het_snp, hom_snp]
    hap2 = [hom_snp]
    records = simulate_reads(ref, [hap1, hap2], read_len=300, stride=20)
    bam = str(tmp / "sim.bam")
    fasta = str(tmp / "ref.fa")
    truth = str(tmp / "truth.vcf")
    bed = str(tmp / "truth.bed")
    write_bam(bam, [(CONTIG, len(ref))], records)
    write_fasta(fasta, {CONTIG: ref})
    write_truth_vcf(truth, CONTIG, len(ref), [
        (het_snp[0], het_snp[1], het_snp[2], "1|0"),
        (hom_snp[0], hom_snp[1], hom_snp[2], "1|1"),
    ])
    with open(bed, "w") as f:
        f.write(f"{CONTIG}\t0\t{len(ref)}\n")
    return dict(tmp=tmp, bam=bam, fasta=fasta, truth=truth, bed=bed,
                het_snp=het_snp, hom_snp=hom_snp)


def test_cli_stage_wise_pipeline(sim):
    tmp = sim["tmp"]
    image_dir = str(tmp / "images")
    pred_dir = str(tmp / "preds")
    vcf_dir = str(tmp / "vcfs")

    # stage 1: labeled images via CLI (train images => labels for --dry)
    rc = cli_main([
        "make_train_images", "-b", sim["bam"], "-f", sim["fasta"],
        "-o", image_dir, "-r", CONTIG, "--ont_r9_guppy5_sup",
        "--truth_vcf", sim["truth"], "--region_bed", sim["bed"],
        "--random_draw_probability", "1.0"])
    assert rc == 0
    files = os.listdir(image_dir)
    assert any(f.endswith(".hdf5") for f in files)

    # stage 2: dry inference via CLI
    rc = cli_main([
        "run_inference", "-i", image_dir, "-o", pred_dir, "--dry",
        "-b", sim["bam"], "-f", sim["fasta"]])
    assert rc == 0
    assert any(f.endswith(".hdf") for f in os.listdir(pred_dir))

    # stage 3: candidates -> VCF via CLI
    rc = cli_main([
        "find_candidates", "-i", pred_dir, "-o", vcf_dir,
        "-f", sim["fasta"], "-b", sim["bam"], "--ont_r9_guppy5_sup"])
    assert rc == 0

    with gzip.open(os.path.join(vcf_dir, "PEPPER_VARIANT_FULL.vcf.gz"),
                   "rt") as f:
        records = [line.split("\t") for line in f if not line.startswith("#")]
    positions = {int(r[1]) - 1 for r in records}
    assert sim["het_snp"][0] in positions
    assert sim["hom_snp"][0] in positions


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from pepper_tpu.models.transducer import init_transducer_params

    params = init_transducer_params(jax.random.PRNGKey(3))
    path = str(tmp_path / "model.npz")
    save_params(path, jax.tree_util.tree_map(np.asarray, params),
                {"epochs": 5})
    loaded, meta = load_params(path)
    assert meta["epochs"] == 5
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(loaded)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_training_loop_reduces_loss(sim, tmp_path):
    """Train on the simulated labeled images for a few steps; loss must
    drop and a checkpoint must be usable for inference."""
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.train.trainer import train_model

    image_dir = str(sim["tmp"] / "images")  # produced by the CLI test
    if not os.path.isdir(image_dir) or not os.listdir(image_dir):
        pytest.skip("image dir missing (run CLI test first)")
    out_dir = str(tmp_path / "train_out")
    options = PepperOptions(batch_size=16)
    model_path, accuracy = train_model(
        options, image_dir, out_dir, epochs=30, learning_rate=2e-4,
        step_size=10000, batch_size=16, holdout_fraction=0.3, seed=0)
    assert os.path.exists(model_path)

    # loss must decrease over training
    with open(os.path.join(out_dir, "train_loss.csv")) as f:
        losses = [float(line.split(",")[2]) for line in f]
    assert losses[-1] < losses[0]

    # the checkpoint drives inference
    params, meta = load_params(model_path)
    from pepper_tpu.infer.runner import InferenceRunner

    runner = InferenceRunner(params, batch_size=8)
    probs = runner.predict_images(np.zeros((3, 33, 26), np.float32))
    assert probs.shape == (3, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_graft_entry_dryrun():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)

    import jax

    fn, args = module.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 3)

    module.dryrun_multichip(8)


def test_cli_hyperband(sim, tmp_path):
    """run_hyperband CLI: tiny bracket over the simulated images."""
    image_dir = str(sim["tmp"] / "images")
    if not os.path.isdir(image_dir) or not os.listdir(image_dir):
        pytest.skip("image dir missing (run CLI test first)")
    out = str(tmp_path / "hb")
    rc = cli_main([
        "run_hyperband", "-i", image_dir, "-o", out,
        "--max_iter", "2", "--eta", "2", "--batch_size", "16",
        "-b", sim["bam"], "-f", sim["fasta"]])
    assert rc == 0
    assert any(f.endswith("_best.npz") for f in os.listdir(out))


def test_cli_sharded_call_variant(sim, tmp_path):
    out = str(tmp_path / "sharded_out")
    # plain --dry (no labels): all candidates decode as refCall records,
    # which still exercises the manifest + sharded decode merge
    rc = cli_main([
        "call_variant", "-b", sim["bam"], "-f", sim["fasta"], "-o", out,
        "-r", CONTIG, "--ont_r9_guppy5_sup", "--dry", "--sharded"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "PEPPER_VARIANT_FULL.vcf.gz"))
    assert os.path.exists(os.path.join(out, "manifest",
                                       "region_manifest.json"))
