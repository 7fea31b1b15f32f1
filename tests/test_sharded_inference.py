"""Multi-chip inference: batch sharded over an 8-device mesh must produce
the same probabilities as single-device — through the bare runner (bf16 and
int8-quantized weights) and through the production call_variant CLI path
(the TPU role of the reference's --callers_per_gpu file fan-out,
RunInference.py:24-84)."""

import gzip
import os

import jax
import numpy as np

from pepper_tpu.infer.runner import InferenceRunner
from pepper_tpu.models.transducer import init_transducer_params
from pepper_tpu.parallel.mesh import get_mesh, local_mesh, \
    resolve_num_devices


def test_sharded_inference_matches_single_device():
    params = init_transducer_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    images = rng.randint(-125, 126, size=(37, 33, 26)).astype(np.float32)

    single = InferenceRunner(params, batch_size=16)
    mesh = get_mesh()
    assert len(mesh.devices.ravel()) == 8
    sharded = InferenceRunner(params, batch_size=16, mesh=mesh)
    # batch size rounded up to a device multiple
    assert sharded.batch_size % 8 == 0

    expected = single.predict_images(images)
    actual = sharded.predict_images(images)
    np.testing.assert_allclose(actual, expected, atol=1e-5)


def test_quantized_sharded_matches_single_device():
    """int8 weights replicate over the mesh like float params; quantized +
    mesh compose (was an explicit ValueError)."""
    params = init_transducer_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    images = rng.randint(-125, 126, size=(21, 33, 26)).astype(np.float32)

    single = InferenceRunner(params, batch_size=8, quantized=True)
    sharded = InferenceRunner(params, batch_size=8, quantized=True,
                              mesh=get_mesh())
    expected = single.predict_images(images)
    actual = sharded.predict_images(images)
    # the quantized recurrence computes in bf16; partitioning reorders
    # its accumulation slightly (observed max |diff| ~2.5e-4)
    np.testing.assert_allclose(actual, expected, atol=1e-3)
    np.testing.assert_allclose(actual.sum(axis=1), 1.0, atol=1e-4)


def test_resolve_num_devices_and_local_mesh():
    local = jax.local_device_count()
    assert resolve_num_devices(-1) == local
    assert resolve_num_devices(0) == local
    assert resolve_num_devices(None) == local
    assert resolve_num_devices(1) == 1
    assert resolve_num_devices(3) == min(3, local)
    assert resolve_num_devices(10**6) == local
    assert local_mesh(1) is None
    mesh = local_mesh(-1)
    assert mesh is not None and len(mesh.devices.ravel()) == local


def _simulated_inputs(tmp_path):
    from pepper_tpu.io.bam_writer import write_bam, write_fasta
    from simulate import random_reference, simulate_reads

    ref = random_reference(3000, seed=29)

    def alt_base(pos):
        return {"A": "T", "T": "A", "C": "G", "G": "C"}[ref[pos]]

    hap1 = [(700, ref[700], alt_base(700)), (1500, ref[1500],
                                             alt_base(1500))]
    hap2 = [(1500, ref[1500], alt_base(1500))]
    records = simulate_reads(ref, [hap1, hap2], read_len=300, stride=20)
    bam = str(tmp_path / "sim.bam")
    fasta = str(tmp_path / "ref.fa")
    write_bam(bam, [("chr20", len(ref))], records)
    write_fasta(fasta, {"chr20": ref})
    return bam, fasta


def test_cli_call_variant_num_devices_equality(tmp_path):
    """CLI-driven e2e: --num_devices 8 (the CLI's -1 default resolves to
    all 8 virtual devices under the test mesh) must write byte-identical
    VCFs to --num_devices 1."""
    from pepper_tpu.cli.main import main as cli_main
    from pepper_tpu.models.checkpoint import save_params
    from pepper_tpu.models.transducer import TransducerConfig

    bam, fasta = _simulated_inputs(tmp_path)
    config = TransducerConfig(hidden=32, linear_size=64)
    params = init_transducer_params(jax.random.PRNGKey(2), config)
    model = str(tmp_path / "model.npz")
    save_params(model, jax.tree_util.tree_map(np.asarray, params),
                {"model_type": "lstm",
                 "config": {"hidden": 32, "linear_size": 64}})

    outputs = {}
    for n in ("1", "-1"):
        out = str(tmp_path / f"out_{n}")
        rc = cli_main([
            "call_variant", "-b", bam, "-f", fasta, "-o", out,
            "-r", "chr20", "--ont_r9_guppy5_sup", "-m", model,
            "--num_devices", n, "--batch_size", "16",
            "--compute_dtype", "float32"])
        assert rc == 0
        with gzip.open(os.path.join(out, "PEPPER_VARIANT_FULL.vcf.gz"),
                       "rb") as f:
            outputs[n] = f.read()
        records = [line for line in outputs[n].splitlines()
                   if line and not line.startswith(b"#")]
        assert len(records) >= 2
    assert outputs["1"] == outputs["-1"]
