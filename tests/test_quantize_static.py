"""Static-scale int8 serving (models/quantize.py static mode): exact-1/127
activation scales for the tanh-bounded LSTM hidden streams, int8 fused
kernels on TPU with an exactly-equivalent lax.scan fallback elsewhere.
Fills the reference's ONNX dynamic-QUInt8 role
(predict_distributed_cpu.py:188-193) without per-batch quantization cost."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pepper_tpu.infer.runner import InferenceRunner
from pepper_tpu.models.quantize import (
    _scan_bilstm_q_to_q,
    _scan_bilstm_to_q,
    quantize_params_static,
    transducer_infer_quantized,
    quantize_params,
    transducer_infer_static,
)
from pepper_tpu.models.transducer import (
    TransducerConfig,
    init_transducer_params,
    transducer_apply,
)
from pepper_tpu.ops.lstm_kernel import bilstm_fused_static


@pytest.fixture(scope="module")
def model():
    config = TransducerConfig()
    params = init_transducer_params(jax.random.PRNGKey(0), config)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-125, 126,
                                size=(16, config.window,
                                      config.image_features)), jnp.float32)
    return config, params, x


def test_static_inference_close_to_float(model):
    _, params, x = model
    expected = np.asarray(transducer_apply(params, x))
    q = quantize_params_static(params)
    probs = np.asarray(transducer_infer_static(q, x, jnp.float32))
    np.testing.assert_allclose(probs, expected, atol=5e-3)
    assert (probs.argmax(1) == expected.argmax(1)).all()
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_static_close_to_dynamic(model):
    """Both int8 modes approximate the same float model to similar error."""
    _, params, x = model
    expected = np.asarray(transducer_apply(params, x))
    dyn_q, dyn_s = quantize_params(params)
    dyn = np.asarray(transducer_infer_quantized(dyn_q, dyn_s, x,
                                                jnp.float32))
    q = quantize_params_static(params)
    static = np.asarray(transducer_infer_static(q, x, jnp.float32))
    assert np.abs(static - expected).max() < 2 * max(
        np.abs(dyn - expected).max(), 1e-3)


def test_hidden_codes_bounded(model):
    """|h| < 1 structurally => round(h*127) never leaves [-127, 127], so
    the kernel's unclipped int8 cast is safe."""
    _, params, x = model
    q = quantize_params_static(params)
    xt = jnp.transpose(x, (1, 0, 2))
    f1, b1 = _scan_bilstm_to_q(xt, q["encoder"], jnp.float32)
    f2, b2 = _scan_bilstm_q_to_q((f1, b1), q["decoder"], jnp.float32)
    for h in (f1, b1, f2, b2):
        arr = np.asarray(h, np.int32)
        assert arr.min() >= -127 and arr.max() <= 127


def test_int8_kernel_matches_fallback_bitwise(model):
    """The Pallas static kernels (interpret mode) and the scan fallback
    must agree on every int8 hidden code — same quantization decisions on
    every element, encoder and decoder."""
    _, params, x = model
    q = jax.tree_util.tree_map(jnp.asarray, quantize_params_static(params))
    xt = jnp.transpose(x, (1, 0, 2))

    f1k, b1k = bilstm_fused_static((xt,), q["encoder"], out_int8=True,
                                   out_dtype=jnp.float32, interpret=True)
    f1s, b1s = _scan_bilstm_to_q(xt, q["encoder"], jnp.float32)
    np.testing.assert_array_equal(np.asarray(f1k), np.asarray(f1s))
    np.testing.assert_array_equal(np.asarray(b1k), np.asarray(b1s))

    dec = q["decoder"]
    f2k, b2k = bilstm_fused_static((f1k, b1k), dec,
                                   acc_scale=(dec["as_f"], dec["as_b"]),
                                   out_int8=True, interpret=True)
    f2s, b2s = _scan_bilstm_q_to_q((f1s, b1s), dec, jnp.float32)
    np.testing.assert_array_equal(np.asarray(f2k), np.asarray(f2s))
    np.testing.assert_array_equal(np.asarray(b2k), np.asarray(b2s))


def test_static_rec_int8(model):
    """Opt-in int8 recurrent matmuls (quantize_mode=static_rec): accuracy
    stays close and the kernels/fallback agree bitwise on the int8 codes.
    (Measured slower than plain static on v5e — per-step h re-coding VPU
    cost exceeds the int8 MXU saving at H=256 — hence opt-in.)"""
    _, params, x = model
    expected = np.asarray(transducer_apply(params, x))
    q = jax.tree_util.tree_map(
        jnp.asarray, quantize_params_static(params, rec_int8=True))
    probs = np.asarray(transducer_infer_static(q, x, jnp.float32))
    np.testing.assert_allclose(probs, expected, atol=1e-2)
    assert (probs.argmax(1) == expected.argmax(1)).all()

    # Kernel vs fallback: the quantized recurrent feedback amplifies
    # f32 summation-order differences near rounding boundaries into ±1
    # code flips on a tiny fraction of elements (unlike the non-rec mode,
    # which is bit-exact), so assert near-exact agreement with |diff| <= 1.
    def assert_codes_close(a, b):
        a, b = np.asarray(a, np.int32), np.asarray(b, np.int32)
        diff = np.abs(a - b)
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.995

    xt = jnp.transpose(x, (1, 0, 2))
    enc = q["encoder"]
    f1k, b1k = bilstm_fused_static(
        (xt,), enc, rec_scale=(enc["as_hh_f"], enc["as_hh_b"]),
        out_int8=True, interpret=True)
    f1s, b1s = _scan_bilstm_to_q(xt, enc, jnp.float32)
    assert_codes_close(f1k, f1s)
    assert_codes_close(b1k, b1s)
    dec = q["decoder"]
    f2k, b2k = bilstm_fused_static(
        (f1k, b1k), dec, acc_scale=(dec["as_f"], dec["as_b"]),
        rec_scale=(dec["as_hh_f"], dec["as_hh_b"]), out_int8=True,
        interpret=True)
    f2s, b2s = _scan_bilstm_q_to_q((f1s, b1s), dec, jnp.float32)
    assert_codes_close(f2k, f2s)
    assert_codes_close(b2k, b2s)


def test_runner_static_rec_mode(model):
    _, params, x = model
    images = np.asarray(x, np.float32)
    plain = InferenceRunner(params, batch_size=8).predict_images(images)
    rec = InferenceRunner(params, batch_size=8, quantized=True,
                          quantize_mode="static_rec").predict_images(images)
    np.testing.assert_allclose(rec, plain, atol=1e-2)


def test_runner_static_mode(model):
    """InferenceRunner default quantized mode is static; probabilities stay
    close to the unquantized runner's."""
    _, params, x = model
    images = np.asarray(x, np.float32)
    plain = InferenceRunner(params, batch_size=8).predict_images(images)
    static = InferenceRunner(params, batch_size=8,
                             quantized=True).predict_images(images)
    assert InferenceRunner(params, quantized=True).quantize_mode == "static"
    np.testing.assert_allclose(static, plain, atol=5e-3)


def test_runner_rejects_unknown_mode(model):
    _, params, _ = model
    with pytest.raises(ValueError, match="quantize_mode"):
        InferenceRunner(params, quantized=True, quantize_mode="int4")


def test_static_sharded_matches_single_device(model):
    """Static int8 trees replicate over the mesh like float params."""
    from pepper_tpu.parallel.mesh import get_mesh

    _, params, x = model
    if jax.local_device_count() < 2:
        pytest.skip("needs the virtual multi-device mesh")
    images = np.asarray(x, np.float32)
    single = InferenceRunner(params, batch_size=8,
                             quantized=True).predict_images(images)
    sharded = InferenceRunner(params, batch_size=8, quantized=True,
                              mesh=get_mesh(4)).predict_images(images)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_hp_model_static(model):
    """Static quantization is shape-generic (HP: 48 features, window 21)."""
    config = TransducerConfig(image_features=48, window=21)
    params = init_transducer_params(jax.random.PRNGKey(3), config)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randint(0, 150, size=(4, 21, 48)), jnp.float32)
    expected = np.asarray(transducer_apply(params, x))
    q = quantize_params_static(params)
    probs = np.asarray(transducer_infer_static(q, x, jnp.float32))
    np.testing.assert_allclose(probs, expected, atol=5e-3)


# ---------------- polish GRU static serving (round 5) ----------------


@pytest.fixture(scope="module")
def polish_model():
    from pepper_tpu.models.polish_gru import init_polish_params

    params = init_polish_params(jax.random.PRNGKey(3))
    rng = np.random.RandomState(5)
    images = rng.randint(0, 40, size=(4, 1000, 10)).astype(np.uint8)
    return params, images


def test_polish_static_kernel_matches_scan_bitwise(polish_model):
    """The static GRU Pallas kernels (interpret mode) and the scan
    fallback agree on every int8 hidden code and the float hidden carry."""
    from pepper_tpu.models.quantize import (
        _scan_bigru_q_to_q,
        _scan_bigru_to_q,
        polish_quantize_params_static,
    )
    from pepper_tpu.ops.gru_kernel import bigru_fused_static

    params, images = polish_model
    q = jax.tree_util.tree_map(jnp.asarray,
                               polish_quantize_params_static(params))
    rng = np.random.RandomState(9)
    xt = jnp.asarray(rng.randint(0, 40, size=(100, 4, 10)), jnp.float32)
    h0 = jnp.asarray(rng.uniform(-0.9, 0.9, size=(4, 2, 128)), jnp.float32)

    f1k, b1k, hid1k = bigru_fused_static((xt,), q["encoder"], h0,
                                         interpret=True)
    f1s, b1s, hid1s = _scan_bigru_to_q(xt, q["encoder"], h0, jnp.float32)
    np.testing.assert_array_equal(np.asarray(f1k), np.asarray(f1s))
    np.testing.assert_array_equal(np.asarray(b1k), np.asarray(b1s))
    np.testing.assert_allclose(np.asarray(hid1k), np.asarray(hid1s),
                               atol=1e-6)

    dec = q["decoder"]
    f2k, b2k, hidk = bigru_fused_static((f1k, b1k), dec, hid1k,
                                        acc_scale=(dec["as_f"],
                                                   dec["as_b"]),
                                        interpret=True)
    f2s, b2s, hids = _scan_bigru_q_to_q((f1s, b1s), dec, hid1s,
                                        jnp.float32)
    np.testing.assert_array_equal(np.asarray(f2k), np.asarray(f2s))
    np.testing.assert_array_equal(np.asarray(b2k), np.asarray(b2s))
    np.testing.assert_allclose(np.asarray(hidk), np.asarray(hids),
                               atol=1e-6)


def test_polish_static_close_to_float(polish_model):
    """Static-int8 consensus tracks the float model: near-identical vote
    tensors and identical labels on random images."""
    from pepper_tpu.polish.consensus import (
        consensus_predict,
        consensus_scan,
        consensus_scan_static,
    )
    from pepper_tpu.models.quantize import polish_quantize_params_static

    params, images = polish_model
    x = jnp.asarray(images, jnp.float32)
    votes_f, labels_f, phred_f = consensus_scan(params, x)
    q = jax.tree_util.tree_map(jnp.asarray,
                               polish_quantize_params_static(params))
    votes_q, labels_q, phred_q = consensus_scan_static(q, x)
    np.testing.assert_allclose(np.asarray(votes_q), np.asarray(votes_f),
                               atol=0.05)
    agree = (np.asarray(labels_q) == np.asarray(labels_f)).mean()
    assert agree > 0.99, agree
    # every confidently-voted position must agree exactly (disagreements
    # on a random-weight model are argmax ties between near-equal votes)
    vf = np.sort(np.asarray(votes_f), axis=2)
    margin = vf[..., -1] - vf[..., -2]
    confident = margin > 0.05
    assert confident.mean() > 0.3
    np.testing.assert_array_equal(np.asarray(labels_q)[confident],
                                  np.asarray(labels_f)[confident])

    # the public wrapper path
    labels_w, phred_w = consensus_predict(params, images,
                                          quantize_mode="static")
    np.testing.assert_array_equal(labels_w, np.asarray(labels_q))


def test_polish_static_sharded_matches_single_device(polish_model):
    """--quantized --num_devices N: mesh-sharded static consensus equals
    the single-device run exactly (batch DP with replicated int8 tree)."""
    from pepper_tpu.parallel.mesh import get_mesh
    from pepper_tpu.polish.consensus import consensus_predict

    params, images = polish_model
    labels_1, phred_1 = consensus_predict(params, images,
                                          quantize_mode="static")
    mesh = get_mesh(len(jax.devices()))
    labels_n, phred_n = consensus_predict(params, images, mesh=mesh,
                                          quantize_mode="static")
    np.testing.assert_array_equal(labels_1, labels_n)
    np.testing.assert_array_equal(phred_1, phred_n)


def test_polish_static_rejects_unknown_mode(polish_model):
    from pepper_tpu.polish.consensus import consensus_predict

    params, images = polish_model
    with pytest.raises(ValueError):
        consensus_predict(params, images, quantize_mode="bogus")
