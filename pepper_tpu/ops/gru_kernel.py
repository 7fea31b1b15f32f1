"""Pallas TPU kernel for the GRU recurrence (polish/HP consensus models).

Same design as ops/lstm_kernel.py — h pinned in VMEM across the time loop,
only the precomputed input projection streams per step — with two GRU
specifics: torch's reset-gate placement (n = tanh(xn + r * (h W_hn + b_hn)),
so b_hh stays separate from the input projection) and an h0 input so the
hidden state carried across sliding windows (consensus_scan) enters the
kernel.

Inference-only (no VJP); training uses the lax.scan recurrence.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

B_TILE = 1024


def _gru_kernel(xw_ref, w_hh_ref, b_hh_ref, h0_ref, out_ref, h_scratch):
    import jax.experimental.pallas as pl

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scratch[:] = h0_ref[:].astype(jnp.float32)

    h = h_scratch[:]
    H = h.shape[-1]
    hw = jnp.dot(h.astype(xw_ref.dtype), w_hh_ref[:],
                 preferred_element_type=jnp.float32) \
        + b_hh_ref[:].astype(jnp.float32)
    xw = xw_ref[0].astype(jnp.float32)
    r = jax.nn.sigmoid(xw[:, :H] + hw[:, :H])
    z = jax.nn.sigmoid(xw[:, H:2 * H] + hw[:, H:2 * H])
    n = jnp.tanh(xw[:, 2 * H:] + r * hw[:, 2 * H:])
    h = (1.0 - z) * n + z * h
    h_scratch[:] = h
    out_ref[0] = h.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def gru_recurrence_pallas(xw, w_hh, b_hh, h0, interpret=False):
    """xw: (T, B, 3H) input projections (x @ W_ih + b_ih); w_hh: (H, 3H);
    b_hh: (1, 3H); h0: (B, H).  Returns hidden outputs (T, B, H)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    T, B, G = xw.shape
    H = G // 3
    n_btiles = max(1, B // B_TILE)
    b_tile = min(B, B_TILE)

    return pl.pallas_call(
        _gru_kernel,
        grid=(n_btiles, T),
        in_specs=[
            pl.BlockSpec((1, b_tile, G), lambda b, t: (t, b, 0)),
            pl.BlockSpec((H, G), lambda b, t: (0, 0)),
            pl.BlockSpec((1, G), lambda b, t: (0, 0)),
            pl.BlockSpec((b_tile, H), lambda b, t: (b, 0)),
        ],
        out_specs=pl.BlockSpec((1, b_tile, H), lambda b, t: (t, b, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, H), xw.dtype),
        scratch_shapes=[pltpu.VMEM((b_tile, H), jnp.float32)],
        interpret=interpret,
    )(xw, w_hh, b_hh, h0)


def use_pallas_gru() -> bool:
    """Opt-in (PEPPER_GRU_KERNEL=1): measured bit-identical to the scan on
    TPU but not faster at the polish model's H=128 — the (B,128) state is
    too small for carry traffic to dominate, unlike the 256-wide LSTM.
    Kept for larger-H variants."""
    import os

    return os.environ.get("PEPPER_GRU_KERNEL", "0") == "1"


def gru_direction_pallas(x, w_ih, w_hh, b_ih, b_hh, h0, reverse=False,
                         interpret=False):
    """One GRU direction via the kernel; matches models.rnn.gru_scan.
    x: (B, T, F); h0: (B, H).  Returns (outputs (B, T, H), hT (B, H))."""
    xs = jnp.flip(x, axis=1) if reverse else x
    xw = jnp.einsum("btf,fg->tbg", xs, w_ih) + b_ih
    ys = gru_recurrence_pallas(xw, w_hh, b_hh.reshape(1, -1), h0,
                               interpret=interpret)
    hT = ys[-1]
    ys = jnp.transpose(ys, (1, 0, 2))
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, hT
