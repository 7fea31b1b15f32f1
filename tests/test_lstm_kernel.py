"""Pallas LSTM recurrence kernel vs the lax.scan reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pepper_tpu.models.rnn import bilstm, init_lstm_params, lstm_scan
from pepper_tpu.ops.lstm_kernel import bilstm_pallas, lstm_recurrence_pallas


@pytest.mark.parametrize("batch,hidden,timesteps", [
    (16, 64, 33), (8, 32, 7), (40, 128, 10)])
def test_bilstm_pallas_matches_scan(batch, hidden, timesteps):
    params = init_lstm_params(jax.random.PRNGKey(0), 26, hidden)
    x = jnp.asarray(np.random.RandomState(1).randn(batch, timesteps, 26),
                    jnp.float32)
    expected = bilstm(x, params)
    actual = bilstm_pallas(x, params, interpret=True)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               atol=1e-5)


def test_recurrence_matches_unidirectional():
    params = init_lstm_params(jax.random.PRNGKey(2), 12, 32)
    x = jnp.asarray(np.random.RandomState(3).randn(8, 9, 12), jnp.float32)
    expected, _ = lstm_scan(x, params["w_ih_f"], params["w_hh_f"],
                            params["b_f"])
    xw = jnp.einsum("btf,fg->tbg", x, params["w_ih_f"]) + params["b_f"]
    ys = lstm_recurrence_pallas(xw, params["w_hh_f"], interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.transpose(ys, (1, 0, 2))),
                               np.asarray(expected), atol=1e-5)
