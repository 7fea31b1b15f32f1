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


@pytest.mark.parametrize("dual", [False, True])
@pytest.mark.parametrize("batch,hidden,timesteps", [
    (16, 64, 33), (8, 32, 7)])
def test_bilstm_fused_matches_scan(batch, hidden, timesteps, dual):
    from pepper_tpu.ops.lstm_kernel import bilstm_fused

    params = init_lstm_params(jax.random.PRNGKey(0), 26, hidden)
    x = jnp.asarray(np.random.RandomState(1).randn(batch, timesteps, 26),
                    jnp.float32)
    expected = bilstm(x, params)  # (B, T, 2H), [fwd|bwd]
    xt = jnp.transpose(x, (1, 0, 2))
    fwd, bwd = bilstm_fused((xt,), params, interpret=True, dual=dual)
    actual = jnp.concatenate(
        [jnp.transpose(fwd, (1, 0, 2)), jnp.transpose(bwd, (1, 0, 2))],
        axis=-1)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               atol=1e-5)


def test_bilstm_fused_multi_part_matches_concat():
    """Passing (x_a, x_b) parts must equal running on concat([x_a, x_b])."""
    from pepper_tpu.ops.lstm_kernel import bilstm_fused

    H, T, B = 32, 11, 8
    params = init_lstm_params(jax.random.PRNGKey(5), 24, H)
    rng = np.random.RandomState(6)
    xa = jnp.asarray(rng.randn(T, B, 10), jnp.float32)
    xb = jnp.asarray(rng.randn(T, B, 14), jnp.float32)
    whole = jnp.concatenate([xa, xb], axis=-1)

    f1, b1 = bilstm_fused((whole,), params, interpret=True)
    for dual in (False, True):
        f2, b2 = bilstm_fused((xa, xb), params, interpret=True, dual=dual)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), atol=1e-5)


def test_fused_transducer_forward_matches_reference():
    """The fully-fused inference forward (_fused_logits) equals the plain
    scan forward on the real model shapes."""
    from pepper_tpu.models.transducer import (
        TransducerConfig, _fused_logits, init_transducer_params,
        transducer_logits)

    config = TransducerConfig()
    params = init_transducer_params(jax.random.PRNGKey(7), config)
    x = jnp.asarray(
        np.random.RandomState(8).randn(6, config.window,
                                       config.image_features), jnp.float32)
    expected = transducer_logits(params, x, train=False)
    actual = _fused_logits(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_gru_kernel_matches_scan():
    from pepper_tpu.models.rnn import gru_scan, init_gru_params
    from pepper_tpu.ops.gru_kernel import gru_direction_pallas

    params = init_gru_params(jax.random.PRNGKey(4), 10, 32)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(8, 20, 10), jnp.float32)
    h0 = jnp.asarray(rng.randn(8, 32), jnp.float32)

    for reverse in (False, True):
        expected, hT_expected = gru_scan(
            x, params["w_ih_f"], params["w_hh_f"], params["b_ih_f"],
            params["b_hh_f"], h0=h0, reverse=reverse)
        actual, hT = gru_direction_pallas(
            x, params["w_ih_f"], params["w_hh_f"], params["b_ih_f"],
            params["b_hh_f"], h0, reverse=reverse, interpret=True)
        np.testing.assert_allclose(np.asarray(actual),
                                   np.asarray(expected), atol=1e-5)
        np.testing.assert_allclose(np.asarray(hT),
                                   np.asarray(hT_expected), atol=1e-5)


def test_fused_gru_direction_matches_scan():
    from pepper_tpu.models.rnn import gru_scan, init_gru_params
    from pepper_tpu.ops.gru_kernel import gru_direction_fused

    params = init_gru_params(jax.random.PRNGKey(10), 10, 32)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(8, 20, 10), jnp.float32)
    h0 = jnp.asarray(rng.randn(8, 32), jnp.float32)

    for reverse in (False, True):
        expected, hT_expected = gru_scan(
            x, params["w_ih_f"], params["w_hh_f"], params["b_ih_f"],
            params["b_hh_f"], h0=h0, reverse=reverse)
        ys, hT = gru_direction_fused(
            (jnp.transpose(x, (1, 0, 2)),), (params["w_ih_f"],),
            params["b_ih_f"], params["w_hh_f"], params["b_hh_f"], h0,
            reverse=reverse, interpret=True)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(ys, (1, 0, 2))), np.asarray(expected),
            atol=1e-5)
        np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_expected),
                                   atol=1e-5)


def test_fused_polish_forward_matches_scan():
    from pepper_tpu.models.polish_gru import (init_polish_params,
                                              polish_forward,
                                              polish_forward_fused)

    params = init_polish_params(jax.random.PRNGKey(12))
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.rand(4, 100, 10), jnp.float32)
    h0 = jnp.asarray(rng.randn(4, 2, 128), jnp.float32)
    el, eh = polish_forward(params, x, h0, allow_kernel=False)
    al, ah = polish_forward_fused(params, jnp.transpose(x, (1, 0, 2)), h0,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.transpose(al, (1, 0, 2))),
                               np.asarray(el), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ah), np.asarray(eh), atol=2e-5)


def test_fused_consensus_scan_matches_reference(monkeypatch):
    """The fused consensus path (time-major scan + one-pass overlap-add)
    must reproduce the reference vote/label/phred semantics exactly."""
    from pepper_tpu.models.polish_gru import init_polish_params
    from pepper_tpu.ops import gru_kernel
    from pepper_tpu.polish import consensus

    params = init_polish_params(jax.random.PRNGKey(14))
    rng = np.random.RandomState(15)
    imgs = jnp.asarray(rng.randint(0, 30, size=(3, 1000, 10)), jnp.float32)
    ev, el, ep = consensus.consensus_scan(params, imgs)

    monkeypatch.setenv("PEPPER_GRU_FUSED", "1")
    orig = gru_kernel.gru_direction_fused

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(gru_kernel, "gru_direction_fused", interp)
    # bypass the jit wrapper so the env flag is re-read at trace time
    av, al, ap = consensus.consensus_scan.__wrapped__(params, imgs)
    np.testing.assert_allclose(np.asarray(av), np.asarray(ev), atol=3e-5)
    assert (np.asarray(al) == np.asarray(el)).all()
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ep), atol=1e-3)


def test_polish_forward_kernel_path_matches():
    import os

    from pepper_tpu.models.polish_gru import (init_polish_params,
                                              polish_forward)

    os.environ["PEPPER_GRU_KERNEL"] = "1"
    try:
        params = init_polish_params(jax.random.PRNGKey(6))
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.rand(4, 50, 10), jnp.float32)
        h0 = jnp.asarray(rng.randn(4, 2, 128), jnp.float32)
        expected_logits, expected_hidden = polish_forward(
            params, x, h0, allow_kernel=False)
        # interpret mode via monkeypatched flag (CPU backend)
        from pepper_tpu.ops import gru_kernel

        orig = gru_kernel.gru_direction_pallas

        def interp(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)

        gru_kernel.gru_direction_pallas = interp
        try:
            import pepper_tpu.models.polish_gru as pg
            actual_logits, actual_hidden = pg.polish_forward(
                params, x, h0, allow_kernel=True)
        finally:
            gru_kernel.gru_direction_pallas = orig
        np.testing.assert_allclose(np.asarray(actual_logits),
                                   np.asarray(expected_logits), atol=1e-5)
        np.testing.assert_allclose(np.asarray(actual_hidden),
                                   np.asarray(expected_hidden), atol=1e-5)
    finally:
        os.environ["PEPPER_GRU_KERNEL"] = "auto"
