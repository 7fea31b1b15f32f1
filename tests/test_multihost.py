"""Real two-process multi-host run of the sharded pipeline: local
jax.distributed rendezvous, interval claims split across ranks, rank-0
decode merge."""

import gzip
import os
import socket
import subprocess
import sys

import pytest

from pepper_tpu.io.bam_writer import write_bam, write_fasta

from simulate import random_reference, simulate_reads, write_truth_vcf


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_multihost_training_matches_single_process(tmp_path):
    """Real 2-process multi-host DP training (jax.distributed rendezvous,
    1 CPU device per process -> 2-device global mesh, per-host batch
    slices via make_array_from_process_local_data, XLA psum gradient
    all-reduce) must reproduce the single-process 2-device run on the
    same data: identical final params and accuracy.  SURVEY §2.4's
    TPU-native equivalent of the reference's live DDP loop
    (pepper/modules/python/models/train_distributed.py:254-283)."""
    import h5py
    import numpy as np

    # synthetic labeled image store (ImageStore layout subset that
    # train/data.py load_image_dir reads)
    image_dir = str(tmp_path / "images")
    os.makedirs(image_dir)
    rng = np.random.RandomState(7)
    images = rng.randint(-20, 21, size=(96, 33, 26)).astype(np.int8)
    labels = rng.randint(0, 3, size=96).astype(np.uint8)
    with h5py.File(os.path.join(image_dir, "train.hdf5"), "w") as f:
        f["summaries/s0/images"] = images
        f["summaries/s0/type_label"] = labels

    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_train_worker.py")
    pythonpath = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep))

    def run(n_procs, devices_per_proc, out_name, mode="variant"):
        out_dir = str(tmp_path / out_name)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count="
                             f"{devices_per_proc}",
                   PYTHONPATH=pythonpath)
        coordinator = f"127.0.0.1:{_free_port()}"
        # each rank gets its OWN output dir so rank-0-only writes are
        # observable: non-zero ranks must leave their dir empty
        procs = [
            subprocess.Popen(
                [sys.executable, worker, coordinator, str(n_procs),
                 str(rank), image_dir,
                 out_dir if rank == 0 else f"{out_dir}_rank{rank}", mode],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for rank in range(n_procs)
        ]
        for proc in procs:
            out, _ = proc.communicate(timeout=240)
            assert proc.returncode == 0, out.decode()[-3000:]
        return out_dir

    single_dir = run(1, 2, "single")   # one process, 2 devices
    dist_dir = run(2, 1, "dist")       # two processes, 1 device each

    single = np.load(os.path.join(single_dir, "pepper_model_final.npz"),
                     allow_pickle=True)
    dist = np.load(os.path.join(dist_dir, "pepper_model_final.npz"),
                   allow_pickle=True)
    # rank 1 must not have written checkpoints/logs (rank-0-only writes);
    # its private dir may exist (makedirs) but must contain no files
    rank1_dir = dist_dir + "_rank1"
    rank1_files = os.listdir(rank1_dir) if os.path.isdir(rank1_dir) else []
    assert rank1_files == [], rank1_files
    keys = sorted(k for k in single.files if k != "__meta__")
    assert keys == sorted(k for k in dist.files if k != "__meta__")
    for key in keys:
        np.testing.assert_allclose(dist[key], single[key], atol=2e-4,
                                   err_msg=key)


def test_two_process_multihost_polish_training_matches_single_process(
        tmp_path):
    """Same 2-process equality for the polish TBPTT trainer — the
    reference's only LIVE DDP loop
    (pepper/modules/python/models/train_distributed.py:254-283)."""
    import h5py
    import numpy as np

    image_dir = str(tmp_path / "polish_images")
    os.makedirs(image_dir)
    rng = np.random.RandomState(11)
    with h5py.File(os.path.join(image_dir, "train.hdf5"), "w") as f:
        for k in range(8):
            grp = f"summaries/s{k}"
            f[f"{grp}/image"] = rng.randint(
                0, 40, size=(1000, 10)).astype(np.uint8)
            f[f"{grp}/label"] = rng.randint(0, 5, size=1000).astype(np.uint8)
            f[f"{grp}/position"] = np.arange(1000, dtype=np.int64)
            f[f"{grp}/index"] = np.zeros(1000, np.int64)
            f[f"{grp}/contig"] = "c"
            f[f"{grp}/region_start"] = 0
            f[f"{grp}/region_end"] = 1000
            f[f"{grp}/chunk_id"] = k

    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_train_worker.py")
    pythonpath = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker))]
        + os.environ.get("PYTHONPATH", "").split(os.pathsep))

    def run(n_procs, devices_per_proc, out_name):
        out_dir = str(tmp_path / out_name)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count="
                             f"{devices_per_proc}",
                   PYTHONPATH=pythonpath)
        coordinator = f"127.0.0.1:{_free_port()}"
        procs = [
            subprocess.Popen(
                [sys.executable, worker, coordinator, str(n_procs),
                 str(rank), image_dir, out_dir, "polish"],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for rank in range(n_procs)
        ]
        for proc in procs:
            out, _ = proc.communicate(timeout=240)
            assert proc.returncode == 0, out.decode()[-3000:]
        return out_dir

    import numpy as np
    single_dir = run(1, 2, "polish_single")
    dist_dir = run(2, 1, "polish_dist")
    single = np.load(os.path.join(single_dir, "polish_model_final.npz"),
                     allow_pickle=True)
    dist = np.load(os.path.join(dist_dir, "polish_model_final.npz"),
                   allow_pickle=True)
    keys = sorted(k for k in single.files if k != "__meta__")
    assert keys == sorted(k for k in dist.files if k != "__meta__")
    for key in keys:
        np.testing.assert_allclose(dist[key], single[key], atol=2e-4,
                                   err_msg=key)


def test_two_process_sharded_call_variant(tmp_path):
    ref = random_reference(5000, seed=88)
    alt = {"A": "T", "T": "A", "C": "G", "G": "C"}
    variants = [(p, ref[p], alt[ref[p]], "1|0")
                for p in (700, 1700, 2700, 3700)]  # last interval (4000,4999)
                # is <1000bp and train mode drops it (reference semantics)
    records = simulate_reads(ref, [[(p, r, a) for p, r, a, _ in variants],
                                   []], read_len=300, stride=20)
    base = str(tmp_path)
    write_bam(os.path.join(base, "sim.bam"), [("chrD", len(ref))], records)
    write_fasta(os.path.join(base, "ref.fa"), {"chrD": ref})
    write_truth_vcf(os.path.join(base, "truth.vcf"), "chrD", len(ref),
                    variants)
    with open(os.path.join(base, "conf.bed"), "w") as f:
        f.write(f"chrD\t0\t{len(ref)}\n")

    coordinator = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(os.path.dirname(worker))]
                   + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(rank), base],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for rank in (0, 1)
    ]
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=240)
        outputs.append(out.decode())
    for proc, out in zip(procs, outputs):
        assert proc.returncode == 0, out[-3000:]

    # both prediction shards exist; the merged VCF has every variant
    prediction_dir = os.path.join(base, "out", "predictions")
    assert sorted(os.listdir(prediction_dir)) == [
        "pepper_prediction_0.hdf", "pepper_prediction_1.hdf"]
    with gzip.open(os.path.join(base, "out", "PEPPER_VARIANT_FULL.vcf.gz"),
                   "rt") as f:
        positions = [int(line.split("\t")[1]) - 1 for line in f
                     if not line.startswith("#")]
    assert set(positions) >= {p for p, _, _, _ in variants}
