"""Pallas TPU kernel for the LSTM recurrence.

The jitted lax.scan LSTM is HBM-bandwidth-bound: every step round-trips the
(B, H) hidden/cell state and the (B, 4H) gate tensor through HBM.  This
kernel pins h/c (and the recurrent weights) in VMEM for the whole time
loop — per step only the precomputed input projection xw streams in and the
hidden output streams out, which is the unavoidable traffic.

Grid (n_btiles, T): batch tiles outer, time inner (sequential on TPU), so
the h/c scratch persists across the T steps of one batch tile and is reset
at t == 0.  The recurrent matmul per step is (B_TILE, H) x (H, 4H) on the
MXU in bf16 with f32 state.

Used by models/rnn.py's bilstm when running on TPU (lax.scan fallback
elsewhere); validated against the scan implementation in
tests/test_lstm_kernel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B_TILE = 1024


def batch_tile(dtype) -> int:
    """Per-grid-step batch tile.  The (1, b_tile, 4H) xw block must fit
    scoped VMEM (16MB): at H=256 that is 8MB in bf16 at 1024 rows but 16MB
    in f32 — halve the tile for 4-byte dtypes."""
    return B_TILE if jnp.dtype(dtype).itemsize <= 2 else B_TILE // 2


def _lstm_kernel(xw_ref, w_hh_ref, out_ref, h_scratch, c_scratch):
    import jax.experimental.pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = jnp.zeros_like(h_scratch)
        c_scratch[:] = jnp.zeros_like(c_scratch)

    h = h_scratch[:]
    c = c_scratch[:]
    gates = xw_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(xw_ref.dtype), w_hh_ref[:],
        preferred_element_type=jnp.float32)
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H:2 * H])
    g = jnp.tanh(gates[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H:])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    h_scratch[:] = h
    c_scratch[:] = c
    out_ref[0] = h.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def lstm_recurrence_pallas(xw, w_hh, interpret=False):
    """xw: (T, B, 4H) precomputed input projections (+bias), w_hh: (H, 4H).
    Returns hidden outputs (T, B, H).  B must be a multiple of B_TILE or
    smaller than it (padded by the caller)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    T, B, G = xw.shape
    H = G // 4
    tile = batch_tile(xw.dtype)
    n_btiles = max(1, B // tile)
    b_tile = min(B, tile)

    return pl.pallas_call(
        _lstm_kernel,
        grid=(n_btiles, T),
        in_specs=[
            pl.BlockSpec((1, b_tile, G),
                         lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, G), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b_tile, H), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xw.dtype),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, w_hh)


def use_pallas_lstm() -> bool:
    import os

    flag = os.environ.get("PEPPER_LSTM_KERNEL", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"


def bilstm_pallas(x, params, interpret=False):
    """Drop-in bidirectional LSTM using the Pallas recurrence; semantics
    identical to models.rnn.bilstm."""
    B = x.shape[0]
    tile = batch_tile(x.dtype)
    # pad batch to tile multiple (or at least sublane alignment)
    target = B + ((-B) % tile if B > tile else 0)
    if target != B:
        x = jnp.pad(x, ((0, target - B), (0, 0), (0, 0)))

    def direction(w_ih, w_hh, b, reverse):
        xs = jnp.flip(x, axis=1) if reverse else x
        xw = jnp.einsum("btf,fg->tbg", xs, w_ih) + b
        ys = lstm_recurrence_pallas(xw, w_hh, interpret=interpret)
        ys = jnp.transpose(ys, (1, 0, 2))
        return jnp.flip(ys, axis=1) if reverse else ys

    fwd = direction(params["w_ih_f"], params["w_hh_f"], params["b_f"], False)
    bwd = direction(params["w_ih_b"], params["w_hh_b"], params["b_b"], True)
    out = jnp.concatenate([fwd, bwd], axis=-1)
    return out[:B]
