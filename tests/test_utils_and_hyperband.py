"""Tests for hyperband search, stage metrics, debug renderers and VCF
comparison helpers."""

import numpy as np

from pepper_tpu.train.hyperband import Hyperband, sample_config
from pepper_tpu.utils.profiling import StageTimer
from pepper_tpu.utils.vcf_compare import compare_vcfs, vcf_statistics
from pepper_tpu.utils.pileup_text import render_matrix


def test_hyperband_finds_best_config():
    # synthetic objective: accuracy peaks at lr=1e-3, improves with budget
    calls = []

    def try_params(n_iterations, config):
        calls.append((n_iterations, config["learning_rate"]))
        lr_quality = -abs(np.log10(config["learning_rate"]) + 3)
        accuracy = 80 + lr_quality + 0.1 * n_iterations
        return {"loss": -accuracy, "accuracy": accuracy, "checkpoint": ""}

    hyperband = Hyperband(try_params, max_iter=9, eta=3, seed=1)
    best = hyperband.run()
    assert best is not None
    assert len(hyperband.results) == len(calls) > 5
    # the winner should be among the better lrs sampled
    sampled = sorted(set(lr for _, lr in calls),
                     key=lambda lr: abs(np.log10(lr) + 3))
    assert abs(np.log10(best["config"]["learning_rate"]) + 3) <= \
        abs(np.log10(sampled[len(sampled) // 2]) + 3)


def test_sample_config_ranges():
    rng = np.random.RandomState(0)
    for _ in range(50):
        config = sample_config(rng)
        assert 1e-5 <= config["learning_rate"] <= 1e-2
        assert 1e-7 <= config["weight_decay"] <= 1e-3


def test_stage_timer(capsys):
    with StageTimer("TEST_STAGE", unit="windows") as timer:
        timer.add(100)
    captured = capsys.readouterr()
    assert "TEST_STAGE ELAPSED TIME" in captured.err
    assert "windows/s" in captured.err


def test_render_matrix():
    image = np.zeros((4, 26), np.int32)
    image[0, 0] = 1
    image[1, 8] = -5
    text = render_matrix(image, "ACGT")
    assert "REFB:" in text and "AFRW:" in text
    assert "REF:" in text
    assert " -5" in text


def _write_vcf(path, records):
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts"]
    for contig, pos, ref, alt, gt, vaf in records:
        lines.append(f"{contig}\t{pos + 1}\t.\t{ref}\t{alt}\t60\tPASS\t.\t"
                     f"GT:VAF\t{gt}:{vaf}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_compare_vcfs_and_stats(tmp_path):
    a = str(tmp_path / "a.vcf")
    b = str(tmp_path / "b.vcf")
    _write_vcf(a, [
        ("chr1", 100, "A", "T", "0/1", "0.5"),
        ("chr1", 200, "C", "G", "1/1", "0.9"),
        ("chr1", 300, "CAA", "C", "0/1", "0.4"),
    ])
    _write_vcf(b, [
        ("chr1", 100, "A", "T", "0/1", "0.5"),      # match
        ("chr1", 200, "C", "A", "1/1", "0.9"),      # allele mismatch
        ("chr1", 400, "G", "GTT", "0/1", "0.3"),    # only in b
    ])
    result = compare_vcfs(a, b)
    summary = result.summary()
    assert summary["matches"] == 1
    assert summary["allele_mismatches"] == 1
    assert summary["only_in_a"] == 1
    assert summary["only_in_b"] == 1

    stats = vcf_statistics(a)
    assert stats["counts"]["records"] == 3
    assert stats["counts"]["snp"] == 2
    assert stats["counts"]["deletion"] == 1
    assert stats["counts"]["het"] == 2
    assert stats["counts"]["hom_alt"] == 1
    assert len(stats["vafs"]) == 3

    from pepper_tpu.utils.vcf_compare import vaf_histogram

    text = vaf_histogram(stats["vafs"], bins=10)
    lines = text.split("\n")
    assert len(lines) == 11 and lines[-1].startswith("total=3")
    # 0.4 and 0.5 land in the 0.40-0.50 bin (0.5 in 0.50-0.60), 0.9 in its own
    assert any(line.startswith(" 0.40") and " 1 " in line.replace(
        "1", " 1 ", 1) or "0.40" in line for line in lines)
    assert vaf_histogram([]) == "(no VAF values)"


def test_polish_test_model_and_eval(tmp_path):
    import jax

    from pepper_tpu.models.checkpoint import save_params
    from pepper_tpu.models.polish_gru import init_polish_params
    from pepper_tpu.polish.datastore import PolishImageStore
    from pepper_tpu.polish.train import (evaluate_polish_model,
                                         test_polish_model)
    from pepper_tpu.options import PepperOptions, PolishImageOptions

    rng = np.random.RandomState(0)
    n, L = 6, PolishImageOptions.SEQ_LENGTH
    images = rng.randint(0, 254, size=(n, L, 10)).astype(np.float32)
    labels = rng.randint(0, 5, size=(n, L)).astype(np.int32)

    params = init_polish_params(jax.random.PRNGKey(0))
    result = evaluate_polish_model(params, images, labels, batch_size=4)
    assert result["confusion"].sum() == n * L
    assert 0.0 <= result["accuracy"] <= 100.0
    assert np.isfinite(result["loss"])

    # CLI-facing path: checkpoint + image dir on disk
    model_path = str(tmp_path / "m.npz")
    save_params(model_path, params, {"hidden_size": 128, "gru_layers": 1})
    image_dir = tmp_path / "imgs"
    image_dir.mkdir()
    with PolishImageStore(str(image_dir / "x.hdf5"), "w") as store:
        for i in range(n):
            store.write_summary(
                ("ctg", 0, L), images[i].astype(np.uint8),
                labels[i].astype(np.uint8), np.arange(L),
                np.zeros(L, np.int64), i, f"ctg_{i}")
    from_disk = test_polish_model(PepperOptions(), str(image_dir),
                                  model_path, batch_size=4)
    assert from_disk["confusion"].sum() == result["confusion"].sum()


def test_render_candidate_window_and_reads(tmp_path):
    from pepper_tpu.io.bam import BamReader
    from pepper_tpu.io.bam_writer import BamRecord, write_bam
    from pepper_tpu.ops.pileup_ref import RegionalSummary
    from pepper_tpu.utils.pileup_text import (render_candidate_window,
                                              render_reads)

    ref = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    snp_seq = ref[:20] + "T" + ref[21:]
    reads = [BamRecord(f"m{i}", 0, 0, 60, "40M", ref, [30] * 40)
             for i in range(4)]
    reads += [BamRecord("s0", 0, 0, 60, "40M", snp_seq, [30] * 40),
              BamRecord("s1", 0, 0, 60, "40M", snp_seq, [30] * 40,
                        flag=0x10)]
    path = str(tmp_path / "r.bam")
    write_bam(path, [("c", 40)], sorted(reads, key=lambda r: r.pos))
    batch = BamReader(path).get_reads("c", 0, 39)

    text = render_reads(batch, ref, 0, 39)
    lines = text.split("\n")
    assert lines[0].startswith("REF: ")
    assert len(lines) == 1 + batch.n_reads
    # mismatch shown as the alt base, matches as dots
    snp_rows = [line for line in lines[1:] if "T" in line[5:]]
    assert len(snp_rows) == 2
    assert all(line[5:].count(".") > 30 for line in lines[1:])

    summary = RegionalSummary("c", 0, 39, ref)
    summary.generate_max_insert_summary(batch)
    windows = summary.generate_summary(
        batch, min_snp_baseq=1, min_indel_baseq=1, snp_freq_threshold=0.1,
        insert_freq_threshold=0.15, delete_freq_threshold=0.15,
        min_coverage_threshold=1, snp_candidate_freq_threshold=0.1,
        indel_candidate_freq_threshold=0.1, candidate_support_threshold=1,
        skip_indels=False, candidate_region_start=0,
        candidate_region_end=39)
    dump = render_candidate_window(windows[0])
    assert "CANDIDATE PILEUP" in dump and "Position: 20" in dump
    assert "REFB:" in dump
