"""Int8 weight quantization: probabilities close to float model."""

import jax
import numpy as np

from pepper_tpu.models.quantize import (
    dequantize_params, quantize_params, transducer_infer_quantized)
from pepper_tpu.models.transducer import (
    init_transducer_params, transducer_apply)


def test_quantized_inference_close():
    params = init_transducer_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x = rng.randint(-125, 126, size=(8, 33, 26)).astype(np.float32)

    expected = np.asarray(transducer_apply(params, x))
    quantized, scales = quantize_params(params)
    actual = np.asarray(
        transducer_infer_quantized(quantized, scales, x))
    # int8 weights + bf16 compute: class probabilities stay close
    np.testing.assert_allclose(actual, expected, atol=0.08)
    # and argmax rarely flips on random inputs
    agree = (actual.argmax(1) == expected.argmax(1)).mean()
    assert agree >= 0.75


def test_quantize_roundtrip_error_small():
    params = init_transducer_params(jax.random.PRNGKey(1))
    quantized, scales = quantize_params(params)
    restored = dequantize_params(quantized, scales, dtype=np.float32)
    leaf = np.asarray(params["linear_2"]["w"])
    back = np.asarray(restored["linear_2"]["w"])
    assert np.abs(leaf - back).max() < np.abs(leaf).max() / 64