"""Polish-mode tests: model parity with torch (incl. hidden carry),
consensus-scan semantics, and end-to-end draft polishing with the dry
(dominant-base) backend."""

import os

import numpy as np
import pytest

from pepper_tpu.io.bam_writer import write_bam, write_fasta
from pepper_tpu.models.polish_gru import (
    init_polish_params, polish_forward)
from pepper_tpu.options import PepperOptions
from pepper_tpu.polish.consensus import (
    consensus_predict, consensus_scan, dry_consensus_labels)
from pepper_tpu.polish.pipeline import polish
from pepper_tpu.polish.summary import PolishSummary, get_feature_index

from simulate import apply_variants, random_reference, simulate_reads

CONTIG = "ctg1"


def test_polish_feature_index():
    # summary_generator.cpp:16-32: reverse A..T -> 0..3 else 8;
    # forward A..T -> 4..7 else 9
    assert get_feature_index("A", True) == 0
    assert get_feature_index("T", True) == 3
    assert get_feature_index("*", True) == 8
    assert get_feature_index("A", False) == 4
    assert get_feature_index("N", False) == 9


def test_polish_model_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class TorchPolish(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.GRU(10, 128, num_layers=1, bidirectional=True,
                                  batch_first=True)
            self.decoder = nn.GRU(256, 128, num_layers=1, bidirectional=True,
                                  batch_first=True)
            self.linear = nn.Linear(256, 5)

        def forward(self, x, hidden):
            hidden = hidden.transpose(0, 1).contiguous()
            x, hidden_out = self.encoder(x, hidden)
            x, hidden_final = self.decoder(x, hidden_out)
            x = self.linear(x)
            return x, hidden_final.transpose(0, 1).contiguous()

    torch.manual_seed(5)
    tmodel = TorchPolish().eval()
    sd = {k.replace("linear.", "linear."): v
          for k, v in tmodel.state_dict().items()}
    from pepper_tpu.models.torch_convert import polish_params_from_state_dict

    params = polish_params_from_state_dict(sd)
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.RandomState(0)
    x1 = rng.rand(3, 100, 10).astype(np.float32)
    x2 = rng.rand(3, 100, 10).astype(np.float32)
    h0 = np.zeros((3, 2, 128), np.float32)

    with torch.no_grad():
        t_out1, t_h1 = tmodel(torch.from_numpy(x1), torch.from_numpy(h0))
        t_out2, t_h2 = tmodel(torch.from_numpy(x2), t_h1)

    j_out1, j_h1 = polish_forward(params, jnp.asarray(x1), jnp.asarray(h0))
    j_out2, j_h2 = polish_forward(params, jnp.asarray(x2), j_h1)

    np.testing.assert_allclose(np.asarray(j_out1), t_out1.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_h1), t_h1.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_out2), t_out2.numpy(), atol=2e-5)


def test_consensus_scan_matches_reference_loop():
    """The jitted scan must equal the reference's explicit window loop
    (predict_distributed_cpu.py:50-97) run step by step."""
    import jax
    import jax.numpy as jnp

    params = init_polish_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(2)
    images = rng.randint(0, 255, size=(2, 1000, 10)).astype(np.float32)

    votes, labels, phred = consensus_scan(params, jnp.asarray(images))
    votes = np.asarray(votes)

    # manual loop
    hidden = np.zeros((2, 2, 128), np.float32)
    expected_votes = np.zeros((2, 1000, 5), np.float32)
    for i in range(0, 1000, 50):
        if i + 100 > 1000:
            break
        chunk = images[:, i:i + 100]
        logits, hidden = polish_forward(params, jnp.asarray(chunk),
                                        jnp.asarray(hidden))
        probs = np.asarray(jax.nn.softmax(logits, axis=2))
        expected_votes[:, i:i + 100] += probs
        hidden = np.asarray(hidden)

    np.testing.assert_allclose(votes, expected_votes, atol=1e-4)
    assert labels.shape == (2, 1000)
    # phred: interior counts 2, edge counts 1
    values = expected_votes.max(axis=2)
    counts = np.ones((2, 900), np.float32)
    counts = np.pad(counts, ((0, 0), (50, 50))) + 1.0
    frac = values / counts
    expected_phred = -10 * np.log10(np.maximum(1e-30, 1 - frac))
    expected_phred[frac >= 1] = 100
    np.testing.assert_allclose(np.asarray(phred), expected_phred, atol=1e-3)


@pytest.fixture(scope="module")
def polish_sim(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("polish")
    draft = random_reference(2400, seed=21)

    def alt_base(pos):
        return {"A": "T", "T": "A", "C": "G", "G": "C"}[draft[pos]]

    variants = [
        (300, draft[300], alt_base(300)),               # SNP error in draft
        (700, draft[700], draft[700] + "GG"),           # draft missing GG
        (1100, draft[1100:1103], draft[1100]),          # draft has 2 extra
    ]
    true_seq = apply_variants(draft, variants)
    true_sequence = "".join(alt for _, _, alt in true_seq)

    records = simulate_reads(draft, [variants, variants], read_len=300,
                             stride=20, name_prefix="p")
    bam = str(tmp / "reads.bam")
    fasta = str(tmp / "draft.fa")
    write_bam(bam, [(CONTIG, len(draft))], records)
    write_fasta(fasta, {CONTIG: draft})
    return dict(tmp=tmp, bam=bam, fasta=fasta, draft=draft,
                truth=true_sequence)


def test_polish_e2e_dry_recovers_truth(polish_sim):
    options = PepperOptions(
        bam=polish_sim["bam"], fasta=polish_sim["fasta"],
        output_dir=str(polish_sim["tmp"] / "out"), threads=1, dry=True,
        batch_size=8)
    fasta_path = polish(options, params=None)
    assert os.path.exists(fasta_path)
    with open(fasta_path) as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == f">{CONTIG}"
    polished = "".join(lines[1:])
    assert polished == polish_sim["truth"]


def test_polish_e2e_model_runs(polish_sim):
    """Untrained GRU: pipeline must produce a well-formed FASTA."""
    import jax

    params = init_polish_params(jax.random.PRNGKey(0))
    options = PepperOptions(
        bam=polish_sim["bam"], fasta=polish_sim["fasta"],
        output_dir=str(polish_sim["tmp"] / "out_model"), threads=1,
        dry=False, batch_size=8)
    fasta_path = polish(options, params=params)
    with open(fasta_path) as f:
        content = f.read()
    assert content.startswith(f">{CONTIG}")


def test_polish_tbptt_training(polish_sim, tmp_path):
    """TBPTT training on dry-labeled chunks: loss decreases across epochs."""
    import jax
    import optax

    from pepper_tpu.polish.train import (
        make_polish_eval_step, make_tbptt_step)

    # synth training data: random images with dry labels
    from pepper_tpu.polish.pipeline import make_polish_images
    from pepper_tpu.polish.datastore import PolishImageStore

    options = PepperOptions(
        bam=polish_sim["bam"], fasta=polish_sim["fasta"], threads=1)
    image_dir = str(tmp_path / "imgs")
    make_polish_images(options, image_dir)
    files = [os.path.join(image_dir, f) for f in os.listdir(image_dir)]
    images = []
    with PolishImageStore(files[0], "r") as store:
        for name in store.summary_names():
            images.append(store.read_summary(name)["image"])
    images = np.stack(images).astype(np.float32)
    labels, _ = dry_consensus_labels(images)

    params = init_polish_params(jax.random.PRNGKey(0))
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)
    step = make_tbptt_step(optimizer)
    mask = np.ones(len(images), np.float32)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, images,
                                       labels.astype(np.int32), mask)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    eval_step = make_polish_eval_step()
    loss, confusion = eval_step(params, images, labels.astype(np.int32),
                                mask)
    assert np.asarray(confusion).sum() == images.shape[0] * 1000


def test_native_summary_walk_matches_python_fuzz():
    """The C polish summary walk (pileup.cpp polish_summary_walk) must
    reproduce the Python golden loop exactly: dense base/coverage arrays,
    insert summaries, longest-insert counts and the rendered image —
    over random CIGARs (all op types), strands, mapq-0 reads, lowercase/N
    bases and reads straddling the region bounds."""
    from pepper_tpu.io.bam import ReadBatch
    from pepper_tpu.polish.summary import _native_summary_walk

    rng = np.random.RandomState(17)
    ops_pool = [0, 1, 2, 3, 4, 5, 6, 7, 8]  # M I D N S H P = X

    def random_batch(n_reads, region_len):
        pos, pos_end, mapqs, flags = [], [], [], []
        seq_offsets, cigar_offsets = [0], [0]
        seqs, all_ops, all_lens = [], [], []
        alphabet = np.frombuffer(b"ACGTNacgtn", np.uint8)
        for _ in range(n_reads):
            start = int(rng.randint(-30, region_len + 30))
            n_ops = int(rng.randint(1, 12))
            read_ops, read_lens = [], []
            seq_len = 0
            ref_span = 0
            for _ in range(n_ops):
                op = ops_pool[rng.randint(len(ops_pool))]
                length = int(rng.randint(1, 12))
                read_ops.append(op)
                read_lens.append(length)
                if op in (0, 7, 8):
                    seq_len += length
                    ref_span += length
                elif op in (1, 4):
                    seq_len += length
                elif op in (2, 3, 6):
                    ref_span += length
            seq = alphabet[rng.randint(0, len(alphabet), seq_len)]
            pos.append(start)
            pos_end.append(start + ref_span)
            mapqs.append(int(rng.randint(0, 3)) * 20)  # some mapq 0
            flags.append(0x10 if rng.rand() < 0.5 else 0)
            seqs.append(seq)
            seq_offsets.append(seq_offsets[-1] + seq_len)
            all_ops.extend(read_ops)
            all_lens.extend(read_lens)
            cigar_offsets.append(cigar_offsets[-1] + len(read_ops))
        return ReadBatch(
            pos=np.asarray(pos, np.int64),
            pos_end=np.asarray(pos_end, np.int64),
            mapq=np.asarray(mapqs, np.int32),
            flag=np.asarray(flags, np.int32),
            hp=np.zeros(n_reads, np.int32),
            seq_offsets=np.asarray(seq_offsets, np.int64),
            seq=(np.concatenate(seqs) if seqs
                 else np.zeros(0, np.uint8)),
            qual=np.zeros(int(seq_offsets[-1]), np.uint8),
            cigar_offsets=np.asarray(cigar_offsets, np.int64),
            cigar_ops=np.asarray(all_ops, np.uint8),
            cigar_lens=np.asarray(all_lens, np.int32),
            names=[f"r{k}" for k in range(n_reads)])

    for trial in range(60):
        region_len = int(rng.randint(5, 120))
        batch = random_batch(int(rng.randint(0, 25)), region_len)
        ref = "".join("ACGT"[b] for b in rng.randint(0, 4, region_len + 1))

        native = PolishSummary(ref, "c", 100, 100 + region_len)
        assert _native_summary_walk(native, batch), "native walk missing"

        python = PolishSummary(ref, "c", 100, 100 + region_len)
        python._ensure_dense()
        for r in range(batch.n_reads):
            if batch.mapq[r] > 0:
                python._iterate_over_read(batch, r, python.ref_end)

        np.testing.assert_array_equal(native._base_dense,
                                      python._base_dense, err_msg=str(trial))
        np.testing.assert_array_equal(native._cov_dense,
                                      python._cov_dense, err_msg=str(trial))
        assert dict(native.insert_summaries) == dict(
            python.insert_summaries), trial
        assert ({k: v for k, v in native.longest_insert_count.items() if v}
                == {k: v for k, v in python.longest_insert_count.items()
                    if v}), trial
        native._generate_image()
        python._generate_image()
        np.testing.assert_array_equal(np.asarray(native.image),
                                      np.asarray(python.image),
                                      err_msg=str(trial))


def test_consensus_predict_mesh_matches_single_device():
    """Batch-sharded consensus over the 8-device mesh must match the
    single-device run exactly (per-sequence hidden carry -> batch DP is
    exact; the reference fans this over CUDA devices,
    predict_distributed_gpu.py:39-70)."""
    import jax

    from pepper_tpu.parallel.mesh import get_mesh

    params = init_polish_params(jax.random.PRNGKey(5))
    rng = np.random.RandomState(5)
    images = rng.randint(0, 40, size=(19, 1000, 10)).astype(np.float32)

    labels_1, phred_1 = consensus_predict(params, images, batch_size=8)
    mesh = get_mesh()
    assert len(mesh.devices.ravel()) == 8
    labels_8, phred_8 = consensus_predict(params, images, batch_size=8,
                                          mesh=mesh)
    np.testing.assert_array_equal(labels_8, labels_1)
    np.testing.assert_allclose(phred_8, phred_1, atol=1e-4)


def test_polish_cli_num_devices_fasta_equality(polish_sim, tmp_path):
    """CLI e2e: `pepper_tpu_polish polish --num_devices -1` (8 virtual
    devices under the test mesh) writes a byte-identical consensus FASTA
    to --num_devices 1."""
    import jax

    from pepper_tpu.cli.polish_main import main as polish_cli
    from pepper_tpu.models.checkpoint import save_params

    params = init_polish_params(jax.random.PRNGKey(6))
    model = str(tmp_path / "polish_model.npz")
    save_params(model, jax.tree_util.tree_map(np.asarray, params), {})

    outputs = {}
    for n in ("1", "-1"):
        out = str(tmp_path / f"out_{n}")
        rc = polish_cli([
            "polish", "-b", polish_sim["bam"], "-f", polish_sim["fasta"],
            "-o", out, "-m", model, "--batch_size", "8",
            "--num_devices", n])
        assert rc == 0
        with open(os.path.join(out, "consensus_pepper_polished.fa"),
                  "rb") as f:
            outputs[n] = f.read()
        assert outputs[n].startswith(f">{CONTIG}".encode())
    assert outputs["1"] == outputs["-1"]


def test_polish_sharded_resume(polish_sim, tmp_path):
    from pepper_tpu.parallel.dist import RegionManifest
    from pepper_tpu.polish.pipeline import polish_sharded

    out = str(tmp_path / "sharded")
    options = PepperOptions(
        bam=polish_sim["bam"], fasta=polish_sim["fasta"], output_dir=out,
        threads=1, dry=True, batch_size=8)
    fasta_path = polish_sharded(options, params=None)
    with open(fasta_path) as f:
        lines = f.read().strip().split("\n")
    assert "".join(lines[1:]) == polish_sim["truth"]

    manifest = RegionManifest(str(tmp_path / "sharded" / "manifest"))
    assert manifest.pending() == []

    # resume: all intervals done, stitch reruns identically
    fasta_path2 = polish_sharded(options, params=None)
    with open(fasta_path2) as f:
        lines2 = f.read().strip().split("\n")
    assert lines2 == lines


def test_batched_realign_matches_python_engine():
    """pepper_align_batch (default) and the per-read Python loop must
    produce identical ReadBatches — incl. unalignable reads that keep
    their original alignment."""
    import os

    from pepper_tpu.io.bam import ReadBatch
    from pepper_tpu.polish.realign import _realign_reads_py, realign_reads

    rng = np.random.RandomState(23)
    ref = "".join("ACGT"[i] for i in rng.randint(0, 4, 1200))

    def make_batch(n_reads):
        pos, pos_end, seqs = [], [], []
        seq_offsets, cigar_offsets = [0], [0]
        all_ops, all_lens = [], []
        for r in range(n_reads):
            if r % 7 == 3:
                # unalignable: bases absent from any window of the target
                seq = "N" * int(rng.randint(20, 60))
                start = int(rng.randint(0, 1000))
            else:
                start = int(rng.randint(0, 900))
                length = int(rng.randint(50, 280))
                s = list(ref[start:start + length])
                for _ in range(rng.randint(0, 12)):
                    k = rng.randint(0, len(s))
                    op = rng.randint(3)
                    if op == 0:
                        s[k] = "ACGT"[rng.randint(4)]
                    elif op == 1:
                        s.insert(k, "ACGT"[rng.randint(4)])
                    elif len(s) > 1:
                        s.pop(k)
                seq = "".join(s)
            pos.append(start)
            pos_end.append(start + len(seq))
            seqs.append(np.frombuffer(seq.encode(), np.uint8))
            seq_offsets.append(seq_offsets[-1] + len(seq))
            all_ops.append(0)
            all_lens.append(len(seq))
            cigar_offsets.append(cigar_offsets[-1] + 1)
        return ReadBatch(
            pos=np.asarray(pos, np.int64),
            pos_end=np.asarray(pos_end, np.int64),
            mapq=np.full(n_reads, 60, np.int32),
            flag=np.zeros(n_reads, np.int32),
            hp=np.zeros(n_reads, np.int32),
            seq_offsets=np.asarray(seq_offsets, np.int64),
            seq=(np.concatenate(seqs) if seqs else np.zeros(0, np.uint8)),
            qual=np.full(int(seq_offsets[-1]), 30, np.uint8),
            cigar_offsets=np.asarray(cigar_offsets, np.int64),
            cigar_ops=np.asarray(all_ops, np.uint8),
            cigar_lens=np.asarray(all_lens, np.int32),
            names=[f"q{k}" for k in range(n_reads)])

    for trial in range(8):
        batch = make_batch(int(rng.randint(1, 40)))
        native = realign_reads(batch, ref, 100, 100 + len(ref))
        assert os.environ.get("PEPPER_PY_REALIGN") != "1"
        python = _realign_reads_py(batch, ref, 100, 100 + len(ref))
        for attr in ("pos", "pos_end", "mapq", "flag", "hp", "seq_offsets",
                     "seq", "qual", "cigar_offsets", "cigar_ops",
                     "cigar_lens"):
            np.testing.assert_array_equal(
                getattr(native, attr), getattr(python, attr),
                err_msg=f"{trial}:{attr}")
        assert native.names == python.names


def test_banded_realign_matches_full_engines_on_spanning_reads():
    """Window-spanning reads (the certified banded DP's target regime):
    banded default == PEPPER_NO_BAND full engine == Python golden, incl.
    repeat-heavy targets where a mid-band decoy exists."""
    import os

    from pepper_tpu.io.bam import ReadBatch
    from pepper_tpu.polish.realign import _realign_reads_py, realign_reads

    rng = np.random.RandomState(71)

    def random_target(kind):
        if kind == 0:  # plain random
            return "".join("ACGT"[i] for i in rng.randint(0, 4, 1040))
        if kind == 1:  # tandem-repeat rich (decoy diagonals)
            parts = []
            while sum(len(p) for p in parts) < 1040:
                unit = "".join("ACGT"[i] for i in rng.randint(0, 4, 3))
                parts.append(unit * int(rng.randint(4, 30)))
            return "".join(parts)[:1040]
        # long duplicated block: the same 400-mer twice
        block = "".join("ACGT"[i] for i in rng.randint(0, 4, 400))
        tail = "".join("ACGT"[i] for i in rng.randint(0, 4, 240))
        return block + block + tail

    def make_spanning_batch(target, n_reads):
        pos, pos_end, seqs = [], [], []
        seq_offsets, cigar_offsets, all_ops, all_lens = [0], [0], [], []
        for _ in range(n_reads):
            start = int(rng.randint(0, 30))
            length = len(target) - start - int(rng.randint(0, 30))
            s = list(target[start:start + length])
            for _ in range(rng.randint(10, 60)):  # ~1-6% ONT-like errors
                k = rng.randint(0, len(s))
                op = rng.randint(3)
                if op == 0:
                    s[k] = "ACGT"[rng.randint(4)]
                elif op == 1:
                    s.insert(k, "ACGT"[rng.randint(4)])
                elif len(s) > 600:
                    del s[k]
            read = "".join(s)
            pos.append(start)
            pos_end.append(start + len(read))
            seqs.append(np.frombuffer(read.encode(), np.uint8))
            seq_offsets.append(seq_offsets[-1] + len(read))
            cigar_offsets.append(cigar_offsets[-1] + 1)
            all_ops.append(0)
            all_lens.append(len(read))
        return ReadBatch(
            pos=np.asarray(pos, np.int64),
            pos_end=np.asarray(pos_end, np.int64),
            mapq=np.full(n_reads, 60, np.int32),
            flag=np.zeros(n_reads, np.int32),
            hp=np.zeros(n_reads, np.int32),
            seq_offsets=np.asarray(seq_offsets, np.int64),
            seq=np.concatenate(seqs),
            qual=np.full(int(seq_offsets[-1]), 30, np.uint8),
            cigar_offsets=np.asarray(cigar_offsets, np.int64),
            cigar_ops=np.asarray(all_ops, np.uint8),
            cigar_lens=np.asarray(all_lens, np.int32),
            names=[f"s{k}" for k in range(n_reads)])

    import ctypes

    from pepper_tpu.io.native import get_lib

    def band_hits():
        attempts = ctypes.c_longlong()
        hits = ctypes.c_longlong()
        get_lib().pepper_band_stats(ctypes.byref(attempts),
                                    ctypes.byref(hits))
        return hits.value

    assert os.environ.get("PEPPER_PY_REALIGN") != "1"
    assert os.environ.get("PEPPER_NO_BAND") is None
    hits_before = band_hits()
    for trial in range(9):
        target = random_target(trial % 3)
        batch = make_spanning_batch(target, int(rng.randint(3, 10)))
        banded = realign_reads(batch, target, 0, len(target) - 1)
        os.environ["PEPPER_NO_BAND"] = "1"
        try:
            full = realign_reads(batch, target, 0, len(target) - 1)
        finally:
            del os.environ["PEPPER_NO_BAND"]
        python = _realign_reads_py(batch, target, 0, len(target) - 1)
        for attr in ("pos", "pos_end", "seq_offsets", "seq",
                     "cigar_offsets", "cigar_ops", "cigar_lens"):
            np.testing.assert_array_equal(
                getattr(banded, attr), getattr(full, attr),
                err_msg=f"banded-vs-full {trial}:{attr}")
            np.testing.assert_array_equal(
                getattr(banded, attr), getattr(python, attr),
                err_msg=f"banded-vs-python {trial}:{attr}")
    # the banded path must actually have certified some of these reads —
    # otherwise this test silently degrades to full-vs-full
    assert band_hits() > hits_before
