"""Recurrent cells as jax.lax.scan primitives, semantics-compatible with
torch.nn.LSTM / torch.nn.GRU (gate order and bidirectional output layout).

The input projection for every timestep is hoisted out of the scan into one
large matmul so the MXU sees a single (B*T, F) x (F, 4H) contraction; the
scan body is left with only the (B, H) x (H, 4H) recurrent matmul.

Weight layout convention (right-multiplication):
  w_ih: (F, G*H)   w_hh: (H, G*H)   b: (G*H,)  [b_ih + b_hh pre-summed]
with G=4 gates ordered (i, f, g, o) for LSTM — matching
torch.nn.LSTM's weight_ih_l0 chunking — and G=3 ordered (r, z, n) for GRU
(torch.nn.GRU). The GRU keeps b_hh_n separate because torch applies it
inside the reset gate: n = tanh(W_in x + b_in + r * (W_hn h + b_hn)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_recurrence(xw, w_hh, h0=None, c0=None, reverse=False):
    """LSTM recurrence over PRECOMPUTED input projections.
    xw: (T, B, 4H) = x@w_ih + b.  Returns (ys (T, B, H), (hT, cT)).
    Factored out so callers that produce xw differently (e.g. the int8
    serving path in models/quantize.py) share one recurrence."""
    B = xw.shape[1]
    H = w_hh.shape[0]
    dtype = xw.dtype
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), dtype)

    def step(carry, xw_t):
        h, c = carry
        gates = xw_t + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (hT, cT), ys = jax.lax.scan(step, (h0, c0), xw, reverse=reverse)
    return ys, (hT, cT)


def lstm_scan(x, w_ih, w_hh, b, h0=None, c0=None, reverse=False):
    """Unidirectional LSTM over x:(B,T,F) -> outputs (B,T,H), (hT, cT)."""
    # One big input projection: (B,T,F)@(F,4H)
    xw = jnp.einsum("btf,fg->btg", x, w_ih) + b
    xw = jnp.swapaxes(xw, 0, 1)  # (T,B,4H) scan over leading axis
    ys, (hT, cT) = lstm_recurrence(xw, w_hh, h0, c0, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), (hT, cT)


def bilstm(x, params, allow_kernel=True):
    """Bidirectional LSTM; output (B,T,2H) laid out [fwd, bwd] like torch.

    On TPU the recurrence dispatches to the Pallas kernel that pins h/c in
    VMEM across timesteps (ops/lstm_kernel.py); elsewhere — and whenever
    gradients are needed (the kernel defines no VJP; training passes
    allow_kernel=False) — it runs as two lax.scans.  Override with
    PEPPER_LSTM_KERNEL=0/1."""
    if allow_kernel:
        from ..ops.lstm_kernel import bilstm_pallas, use_pallas_lstm

        if use_pallas_lstm():
            return bilstm_pallas(x, params)
    fwd, _ = lstm_scan(x, params["w_ih_f"], params["w_hh_f"], params["b_f"])
    bwd, _ = lstm_scan(x, params["w_ih_b"], params["w_hh_b"], params["b_b"],
                       reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def gru_scan(x, w_ih, w_hh, b_ih, b_hh, h0=None, reverse=False):
    """Unidirectional GRU matching torch.nn.GRU semantics.

    torch computes: r = σ(W_ir x + b_ir + W_hr h + b_hr)
                    z = σ(W_iz x + b_iz + W_hz h + b_hz)
                    n = tanh(W_in x + b_in + r*(W_hn h + b_hn))
                    h' = (1-z)*n + z*h
    """
    B = x.shape[0]
    H = w_hh.shape[0]
    dtype = x.dtype
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype)

    xw = jnp.einsum("btf,fg->btg", x, w_ih) + b_ih
    xw = jnp.swapaxes(xw, 0, 1)  # (T,B,3H)

    def step(h, xw_t):
        hw = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    hT, ys = jax.lax.scan(step, h0, xw, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), hT


def bigru(x, params, h0_f=None, h0_b=None):
    """Bidirectional GRU; returns (B,T,2H) plus final hidden (hf, hb)."""
    fwd, hf = gru_scan(x, params["w_ih_f"], params["w_hh_f"],
                       params["b_ih_f"], params["b_hh_f"], h0=h0_f)
    bwd, hb = gru_scan(x, params["w_ih_b"], params["w_hh_b"],
                       params["b_ih_b"], params["b_hh_b"], h0=h0_b,
                       reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1), (hf, hb)


def uniform_init(key, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def init_lstm_params(key, in_features, hidden, dtype=jnp.float32):
    """Bidirectional LSTM params; torch's U(-1/sqrt(H), 1/sqrt(H)) init."""
    scale = 1.0 / (hidden ** 0.5)
    keys = jax.random.split(key, 8)
    G = 4 * hidden
    return {
        "w_ih_f": uniform_init(keys[0], (in_features, G), scale, dtype),
        "w_hh_f": uniform_init(keys[1], (hidden, G), scale, dtype),
        # two torch bias vectors summed
        "b_f": uniform_init(keys[2], (G,), scale, dtype)
               + uniform_init(keys[3], (G,), scale, dtype),
        "w_ih_b": uniform_init(keys[4], (in_features, G), scale, dtype),
        "w_hh_b": uniform_init(keys[5], (hidden, G), scale, dtype),
        "b_b": uniform_init(keys[6], (G,), scale, dtype)
               + uniform_init(keys[7], (G,), scale, dtype),
    }


def init_gru_params(key, in_features, hidden, dtype=jnp.float32):
    scale = 1.0 / (hidden ** 0.5)
    keys = jax.random.split(key, 8)
    G = 3 * hidden
    return {
        "w_ih_f": uniform_init(keys[0], (in_features, G), scale, dtype),
        "w_hh_f": uniform_init(keys[1], (hidden, G), scale, dtype),
        "b_ih_f": uniform_init(keys[2], (G,), scale, dtype),
        "b_hh_f": uniform_init(keys[3], (G,), scale, dtype),
        "w_ih_b": uniform_init(keys[4], (in_features, G), scale, dtype),
        "w_hh_b": uniform_init(keys[5], (hidden, G), scale, dtype),
        "b_ih_b": uniform_init(keys[6], (G,), scale, dtype),
        "b_hh_b": uniform_init(keys[7], (G,), scale, dtype),
    }


def init_linear_params(key, in_features, out_features, dtype=jnp.float32):
    """torch.nn.Linear default init (kaiming-uniform a=sqrt(5) ~ U scale)."""
    k1, k2 = jax.random.split(key)
    scale = 1.0 / (in_features ** 0.5)
    return {
        "w": uniform_init(k1, (in_features, out_features), scale, dtype),
        "b": uniform_init(k2, (out_features,), scale, dtype),
    }


def linear(x, params):
    return x @ params["w"] + params["b"]
