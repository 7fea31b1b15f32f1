"""Reference invariants worth unit-testing (SURVEY.md Appendix B) plus
reference-checkpoint conversion and multi-process window generation."""

import numpy as np
import pytest

from pepper_tpu.pipeline.summarizer import reservoir_downsample


class FakeBatch:
    """Minimal stand-in recording subset order."""

    def __init__(self, n):
        self.n_reads = n

    def subset(self, indices):
        return list(indices)


def test_reservoir_sampling_seeded_determinism():
    # Appendix B #2: seed 2719747673 over coordinate-order reads
    batch = FakeBatch(100)
    sample_a = reservoir_downsample(batch, 10)
    sample_b = reservoir_downsample(FakeBatch(100), 10)
    assert sample_a == sample_b
    assert len(sample_a) == 10
    # replicates numpy's RandomState reservoir walk exactly
    random = np.random.RandomState(2719747673)
    expected = list(range(10))
    for i in range(10, 100):
        j = random.randint(0, i + 1)
        if j < 10:
            expected[j] = i
    assert sample_a == expected


def test_reservoir_no_downsample_identity():
    batch = FakeBatch(5)
    assert reservoir_downsample(batch, 10) is batch


def test_genotype_composition_table():
    # Appendix B #3: [0,0]/[0,1]/[1,1]/[1,2] from h1/h2 winner indices
    # (exercised via candidate_list_to_variant's genotype_hp logic)
    from pepper_tpu.decode.vcf_writer import VCFWriter

    def site(predictions_list):
        candidates = []
        for i, probs in enumerate(predictions_list):
            candidates.append((
                "chr1", 100, 101, "A", [chr(ord("C") + i)], [0, 1], 30,
                [10], 0.9, np.asarray(probs), [0.9], False))

        class Opt:
            allowed_multiallelics = 4

        return VCFWriter.candidate_list_to_variant(candidates, Opt())[5]

    assert site([[0.9, 0.05, 0.05]]) == [0, 0]          # hom-ref
    assert site([[0.05, 0.9, 0.05]]) == [0, 1]          # het
    assert site([[0.05, 0.05, 0.9]]) == [1, 1]          # hom-alt
    assert site([[0.05, 0.9, 0.05], [0.05, 0.9, 0.05]]) == [1, 2]  # het-alt
    # 2 hom-alts -> >2 haplotype slots -> [0, 0]
    assert site([[0.05, 0.05, 0.9], [0.05, 0.05, 0.9]]) == [0, 0]


def test_vote_overlap_equivalence():
    """Appendix B #5: the windowed hidden-carry scan equals running windows
    explicitly; interior positions collect exactly 2 votes, edges 1."""
    import jax
    import jax.numpy as jnp

    from pepper_tpu.models.polish_gru import init_polish_params
    from pepper_tpu.polish.consensus import consensus_scan

    params = init_polish_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    images = rng.randint(0, 255, size=(1, 1000, 10)).astype(np.float32)
    votes, labels, phred = consensus_scan(params, jnp.asarray(images))
    votes = np.asarray(votes)
    # votes per position sum to the number of covering windows (softmax
    # rows sum to 1): 2 in the interior, 1 in the 50-base edges
    per_pos = votes.sum(axis=2)[0]
    np.testing.assert_allclose(per_pos[:50], 1.0, atol=1e-3)
    np.testing.assert_allclose(per_pos[50:950], 2.0, atol=1e-3)
    np.testing.assert_allclose(per_pos[950:], 1.0, atol=1e-3)


def test_reference_torch_checkpoint_roundtrip(tmp_path):
    """The reference's torch .pkl checkpoint format loads through
    load_reference_checkpoint and matches the torch forward."""
    torch = pytest.importorskip("torch")

    import os

    from test_model_parity import (
        REF_VARIANT_MODEL, _variant_stubs, load_reference_module,
    )
    from pepper_tpu.models.checkpoint import load_params
    from pepper_tpu.models.transducer import transducer_apply

    if not os.path.exists(REF_VARIANT_MODEL):
        pytest.skip("reference checkout not present")
    module = load_reference_module(REF_VARIANT_MODEL,
                                   "reference_variant_model_ckpt",
                                   _variant_stubs())
    torch.manual_seed(7)
    model = module.TransducerGRU(image_features=26, gru_layers=1,
                                 hidden_size=256, num_classes=28,
                                 num_classes_type=3).eval()
    path = str(tmp_path / "ref_model.pkl")
    torch.save({
        "model_state_dict": model.state_dict(),
        "model_optimizer": {},
        "hidden_size": 256, "gru_layers": 1, "epochs": 3,
    }, path)

    params, meta = load_params(path)
    assert meta["hidden_size"] == 256 and meta["epochs"] == 3
    x = np.random.RandomState(0).randint(
        -125, 126, size=(4, 33, 26)).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(x)).numpy()
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    actual = np.asarray(transducer_apply(params, x))
    np.testing.assert_allclose(actual, expected, atol=2e-5, rtol=1e-4)


def test_multiprocess_window_generation(tmp_path):
    """generate_windows with threads > 1 (ProcessPoolExecutor) returns the
    same windows as single-threaded."""
    from simulate import random_reference, simulate_reads
    from pepper_tpu.io.bam_writer import write_bam, write_fasta
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import generate_windows

    ref = random_reference(4000, seed=55)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    variants = [(p, ref[p], alt[ref[p]]) for p in (700, 1700, 2700)]
    records = simulate_reads(ref, [variants, []], read_len=300, stride=20)
    bam = str(tmp_path / "m.bam")
    fasta = str(tmp_path / "m.fa")
    write_bam(bam, [("chrM", len(ref))], records)
    write_fasta(fasta, {"chrM": ref})

    options = set_parameters(PepperOptions(
        bam=bam, fasta=fasta, ont_r9_guppy5_sup=True,
        sub_command="call_variant", region="chrM", region_size=1000))
    intervals = [("chrM", s, min(len(ref) - 1, s + 1000))
                 for s in range(0, len(ref) - 1, 1000)]

    serial = generate_windows(options, intervals, None, threads=1)
    parallel = generate_windows(options, intervals, None, threads=2)
    key = lambda w: (w.contig, w.position, tuple(w.candidates))  # noqa: E731
    assert sorted(map(key, serial)) == sorted(map(key, parallel))
    assert {w.position for w in serial} == {700, 1700, 2700}


def test_streaming_call_variant_matches_serial(tmp_path):
    """call_variant with threads=2 (streamed process-pool generation
    overlapped with inference) produces the same VCF as threads=1."""
    import gzip

    from simulate import random_reference, simulate_reads, write_truth_vcf
    from pepper_tpu.io.bam_writer import write_bam, write_fasta
    from pepper_tpu.options import PepperOptions
    from pepper_tpu.presets import set_parameters
    from pepper_tpu.pipeline.call_variant import call_variant

    ref = random_reference(4000, seed=66)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    variants = [(p, ref[p], alt[ref[p]], "1|0") for p in (700, 1700, 2700)]
    records = simulate_reads(ref, [[(p, r, a) for p, r, a, _ in variants],
                                   []], read_len=300, stride=20)
    bam = str(tmp_path / "s.bam")
    fasta = str(tmp_path / "s.fa")
    truth = str(tmp_path / "s.vcf")
    bed = str(tmp_path / "s.bed")
    write_bam(bam, [("chrS", len(ref))], records)
    write_fasta(fasta, {"chrS": ref})
    write_truth_vcf(truth, "chrS", len(ref), variants)
    with open(bed, "w") as f:
        f.write(f"chrS\t0\t{len(ref)}\n")

    outputs = {}
    for threads in (1, 2):
        out = str(tmp_path / f"out_{threads}")
        options = set_parameters(PepperOptions(
            bam=bam, fasta=fasta, output_dir=out, threads=threads,
            ont_r9_guppy5_sup=True, sub_command="call_variant", dry=True,
            train_mode=True, truth_vcf=truth, region_bed=bed,
            random_draw_probability=1.0, region="chrS", region_size=1000,
            batch_size=4))
        call_variant(options)
        with gzip.open(f"{out}/PEPPER_VARIANT_FULL.vcf.gz", "rt") as f:
            outputs[threads] = [line for line in f
                                if not line.startswith("#")]
    assert outputs[1] == outputs[2]
    assert len(outputs[1]) == 3
