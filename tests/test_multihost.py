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
