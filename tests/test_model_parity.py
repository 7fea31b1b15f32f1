"""External cross-validation of the JAX models against the REFERENCE's own
torch classes, imported from /root/reference (not hand-replicated twins):

  * variant window classifier vs
    pepper_variant/modules/python/models/simple_model.py:6-88 (TransducerGRU:
    biLSTM(26->256) -> biLSTM(512->256) -> flatten -> 5x Linear+SELU -> 3)
  * polish consensus model vs
    pepper/modules/python/models/simple_model.py:5-49 (true biGRU transducer
    with explicit hidden carry)

Same weights (through models/torch_convert.py) must give the same
probabilities/logits/hidden state."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pepper_tpu.models.polish_gru import polish_forward  # noqa: E402
from pepper_tpu.models.torch_convert import (  # noqa: E402
    polish_params_from_state_dict,
    transducer_params_from_state_dict,
)
from pepper_tpu.models.transducer import (  # noqa: E402
    TransducerConfig,
    init_transducer_params,
    transducer_apply,
)

REF_VARIANT_MODEL = ("/root/reference/pepper_variant/modules/python/models/"
                     "simple_model.py")
REF_POLISH_MODEL = ("/root/reference/pepper/modules/python/models/"
                    "simple_model.py")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_VARIANT_MODEL),
    reason="reference checkout not present")


def load_reference_module(path, name, stubs):
    """Import a reference source file with its package deps stubbed in
    sys.modules (the technique test_reference_decode_parity.py uses)."""
    saved = {key: sys.modules.get(key) for key in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module
    finally:
        for key, original in saved.items():
            if original is None:
                sys.modules.pop(key, None)
            else:
                sys.modules[key] = original


def _variant_stubs():
    """The variant model imports only ImageSizeOptions (for the flatten
    width: CANDIDATE_WINDOW_SIZE + 1 columns)."""
    options = types.ModuleType("pepper_variant.modules.python.Options")

    class ImageSizeOptions:
        CANDIDATE_WINDOW_SIZE = 32

    options.ImageSizeOptions = ImageSizeOptions
    return {
        "pepper_variant": types.ModuleType("pepper_variant"),
        "pepper_variant.modules": types.ModuleType("pepper_variant.modules"),
        "pepper_variant.modules.python":
            types.ModuleType("pepper_variant.modules.python"),
        "pepper_variant.modules.python.Options": options,
    }


def test_transducer_matches_reference_torch_model():
    module = load_reference_module(REF_VARIANT_MODEL,
                                   "reference_variant_model",
                                   _variant_stubs())
    torch.manual_seed(0)
    model = module.TransducerGRU(image_features=26, gru_layers=1,
                                 hidden_size=256, num_classes=28,
                                 num_classes_type=3).eval()
    params = transducer_params_from_state_dict(model.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.RandomState(1)
    x = rng.randint(-125, 126, size=(8, 33, 26)).astype(np.float32)

    with torch.no_grad():
        expected = model(torch.from_numpy(x)).numpy()
    actual = np.asarray(transducer_apply(params, jnp.asarray(x)))

    np.testing.assert_allclose(actual, expected, atol=2e-5, rtol=1e-4)


def test_transducer_hp_shape():
    # HP mode: 48 features, window 21
    config = TransducerConfig(image_features=48, window=21)
    params = init_transducer_params(jax.random.PRNGKey(0), config)
    x = jnp.zeros((4, 21, 48))
    probs = transducer_apply(params, x)
    assert probs.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=1), 1.0, atol=1e-5)


def test_polish_gru_matches_reference_torch_model():
    """The polish model cross-validated against the reference's own class,
    including the hidden-state transpose convention ((B, 2, H) here vs the
    model's internal (2, B, H)) and the reference's gru_encoder /
    gru_decoder / dense1 state-dict naming."""
    module = load_reference_module(REF_POLISH_MODEL, "reference_polish_model",
                                   {})
    torch.manual_seed(3)
    model = module.TransducerGRU(image_channels=1, image_features=10,
                                 gru_layers=1, hidden_size=128,
                                 num_classes=5).eval()
    assert set(model.state_dict()) >= {"gru_encoder.weight_ih_l0",
                                       "dense1.weight"}
    params = polish_params_from_state_dict(model.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.RandomState(4)
    x = (rng.rand(3, 20, 10).astype(np.float32) * 254)
    hidden = (rng.randn(3, 2, 128).astype(np.float32) * 0.1)

    with torch.no_grad():
        expected, expected_hidden = model(torch.from_numpy(x),
                                          torch.from_numpy(hidden))
    logits, hidden_final = polish_forward(params, jnp.asarray(x),
                                          jnp.asarray(hidden))
    np.testing.assert_allclose(np.asarray(logits), expected.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hidden_final),
                               expected_hidden.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_polish_gru_zero_hidden_matches_reference():
    """Fresh-window path: zero initial hidden, several window lengths."""
    module = load_reference_module(REF_POLISH_MODEL, "reference_polish_model",
                                   {})
    torch.manual_seed(7)
    model = module.TransducerGRU(image_channels=1, image_features=10,
                                 gru_layers=1, hidden_size=128,
                                 num_classes=5).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, polish_params_from_state_dict(model.state_dict()))
    rng = np.random.RandomState(8)
    for batch, length in ((1, 1), (2, 50), (4, 100)):
        x = (rng.rand(batch, length, 10).astype(np.float32) * 254)
        hidden = np.zeros((batch, 2, 128), np.float32)
        with torch.no_grad():
            expected, _ = model(torch.from_numpy(x),
                                torch.from_numpy(hidden))
        logits, _ = polish_forward(params, jnp.asarray(x),
                                   jnp.asarray(hidden))
        np.testing.assert_allclose(np.asarray(logits), expected.numpy(),
                                   atol=2e-4, rtol=1e-4)
