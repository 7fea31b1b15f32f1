"""Semantic parity of the JAX transducer against an equivalently-shaped
torch model (the reference's architecture, simple_model.py:6-88): same
weights must give the same probabilities."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pepper_tpu.models.torch_convert import (  # noqa: E402
    polish_params_from_state_dict,
    transducer_params_from_state_dict,
)
from pepper_tpu.models.transducer import (  # noqa: E402
    TransducerConfig,
    init_transducer_params,
    transducer_apply,
)
from pepper_tpu.models.rnn import bigru  # noqa: E402


class TorchTransducer(nn.Module):
    """Reference-equivalent torch model (architecture from SURVEY.md §2.2:
    biLSTM(26->256) -> biLSTM(512->256) -> flatten -> 5x Linear+SELU -> 3)."""

    def __init__(self, image_features=26, window=33, hidden=256, linear=512,
                 num_classes_type=3):
        super().__init__()
        self.encoder = nn.LSTM(image_features, hidden, num_layers=1,
                               bidirectional=True, batch_first=True)
        self.decoder = nn.LSTM(2 * hidden, hidden, num_layers=1,
                               bidirectional=True, batch_first=True)
        self.activation = nn.SELU()
        self.linear_1 = nn.Linear(2 * hidden * window, linear)
        self.linear_2 = nn.Linear(linear, linear)
        self.linear_3 = nn.Linear(linear, linear)
        self.linear_4 = nn.Linear(linear, linear)
        self.linear_5 = nn.Linear(linear, linear)
        self.output_layer_type = nn.Linear(linear, num_classes_type)

    def forward(self, x):
        x, _ = self.encoder(x)
        x, _ = self.decoder(x)
        x = torch.flatten(x, 1, 2)
        for layer in (self.linear_1, self.linear_2, self.linear_3,
                      self.linear_4):
            x = self.activation(layer(x))
        x = self.activation(self.linear_5(x))
        x = self.output_layer_type(x)
        return torch.softmax(x, dim=1)


def test_transducer_matches_torch():
    torch.manual_seed(0)
    model = TorchTransducer().eval()
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


def test_bigru_matches_torch():
    torch.manual_seed(2)
    tgru = nn.GRU(10, 16, num_layers=1, bidirectional=True,
                  batch_first=True).eval()
    sd = {f"g.{k}": v for k, v in tgru.state_dict().items()}
    sd["linear.weight"] = torch.zeros(5, 32)
    sd["linear.bias"] = torch.zeros(5)
    # reuse the converter's GRU path via polish converter naming
    sd = {k.replace("g.", "encoder.").replace("linear.", "linear."): v
          for k, v in sd.items()}
    sd.update({k.replace("encoder.", "decoder."): v for k, v in sd.items()
               if k.startswith("encoder.")})
    params = polish_params_from_state_dict(sd)

    rng = np.random.RandomState(3)
    x = rng.randn(5, 7, 10).astype(np.float32)
    with torch.no_grad():
        expected, _ = tgru(torch.from_numpy(x))
    actual, _ = bigru(jnp.asarray(x),
                      jax.tree_util.tree_map(jnp.asarray, params["encoder"]))
    np.testing.assert_allclose(np.asarray(actual), expected.numpy(),
                               atol=1e-5, rtol=1e-4)
