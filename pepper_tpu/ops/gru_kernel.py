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


def fused_batch_tile(dtype) -> int:
    """Batch tile for the fused GRU.  The polish model's H=128 keeps the
    per-step working set small (state scratch + (b_tile, 3H) gate
    intermediates), so much larger tiles than the LSTM's fit VMEM — and the
    tiny per-step matmuls need the rows to amortize per-grid-step
    overhead."""
    return 2048 if jnp.dtype(dtype).itemsize <= 2 else 1024


def _make_fused_gru_kernel(n_parts):
    """GRU kernel with the input projection fused in (see the LSTM analog in
    ops/lstm_kernel.py): per step it reads raw feature blocks, computes
    xw = sum_i x_i @ w_ih_i + b_ih on the MXU, and applies torch's gate
    placement.  Removes the (T, B, 3H) xw HBM round-trip."""
    import jax.experimental.pallas as pl

    def kernel(*refs):
        x_refs = refs[:n_parts]
        w_ih_refs = refs[n_parts:2 * n_parts]
        (b_ih_ref, w_hh_ref, b_hh_ref, h0_ref, out_ref,
         h_scratch) = refs[2 * n_parts:]

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scratch[:] = h0_ref[:].astype(jnp.float32)

        h = h_scratch[:]
        H = h.shape[-1]
        hw = jnp.dot(h.astype(w_hh_ref.dtype), w_hh_ref[:],
                     preferred_element_type=jnp.float32) \
            + b_hh_ref[:].astype(jnp.float32)
        xw = b_ih_ref[0].astype(jnp.float32)
        for x_ref, w_ref in zip(x_refs, w_ih_refs):
            xw = xw + jnp.dot(x_ref[0], w_ref[:],
                              preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(xw[:, :H] + hw[:, :H])
        z = jax.nn.sigmoid(xw[:, H:2 * H] + hw[:, H:2 * H])
        n = jnp.tanh(xw[:, 2 * H:] + r * hw[:, 2 * H:])
        h = (1.0 - z) * n + z * h
        h_scratch[:] = h
        out_ref[0] = h.astype(out_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def gru_direction_fused(x_parts, w_ih_parts, b_ih, w_hh, b_hh, h0,
                        reverse=False, interpret=False):
    """One GRU direction, input projection fused into the kernel.

    x_parts: tuple of (T, B, F_i) time-major feature arrays (feature-axis
    concatenation is logical — the decoder passes the encoder's fwd/bwd
    streams without materializing a concat).  h0: (B, H) initial hidden
    (the consensus sliding-window carry).  reverse=True runs the backward
    direction via index maps (no flips).  Returns (ys (T, B, H) in natural
    order, hT (B, H))."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    T, B, _ = x_parts[0].shape
    H = w_hh.shape[0]
    G = 3 * H
    dtype = x_parts[0].dtype
    tile = fused_batch_tile(dtype)
    n_btiles = max(1, B // tile)
    b_tile = min(B, tile)

    if reverse:
        seq_ix = lambda bb, t: (T - 1 - t, bb, 0)  # noqa: E731
    else:
        seq_ix = lambda bb, t: (t, bb, 0)  # noqa: E731
    const_ix = lambda bb, t: (0, 0)  # noqa: E731

    in_specs = [pl.BlockSpec((1, b_tile, xp.shape[2]), seq_ix)
                for xp in x_parts]
    in_specs += [pl.BlockSpec((xp.shape[2], G), const_ix) for xp in x_parts]
    in_specs += [
        pl.BlockSpec((1, G), const_ix),
        pl.BlockSpec((H, G), const_ix),
        pl.BlockSpec((1, G), const_ix),
        pl.BlockSpec((b_tile, H), lambda bb, t: (bb, 0)),
    ]

    ys = pl.pallas_call(
        _make_fused_gru_kernel(len(x_parts)),
        grid=(n_btiles, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, b_tile, H), seq_ix),
        out_shape=jax.ShapeDtypeStruct((T, B, H), dtype),
        scratch_shapes=[pltpu.VMEM((b_tile, H), jnp.float32)],
        interpret=interpret,
    )(*x_parts, *w_ih_parts, b_ih.reshape(1, G), w_hh, b_hh.reshape(1, G),
      h0)
    hT = ys[0] if reverse else ys[-1]
    return ys, hT


def bigru_fused(x_parts, params, h0, interpret=False):
    """Bidirectional fused GRU over time-major feature parts.
    h0: (B, 2, H) carried hidden ([:, 0] fwd, [:, 1] bwd).
    Returns (fwd (T,B,H), bwd (T,B,H), hidden_out (B, 2, H))."""
    B = x_parts[0].shape[1]
    tile = fused_batch_tile(x_parts[0].dtype)
    target = B + ((-B) % tile if B > tile else 0)
    if target != B:
        x_parts = tuple(
            jnp.pad(xp, ((0, 0), (0, target - B), (0, 0))) for xp in x_parts)
        h0 = jnp.pad(h0, ((0, target - B), (0, 0), (0, 0)))

    splits = []
    off = 0
    for xp in x_parts:
        splits.append((off, off + xp.shape[2]))
        off += xp.shape[2]

    def direction(suffix, h0d, reverse):
        w_parts = tuple(params["w_ih_" + suffix][s:e] for s, e in splits)
        return gru_direction_fused(
            x_parts, w_parts, params["b_ih_" + suffix],
            params["w_hh_" + suffix], params["b_hh_" + suffix], h0d,
            reverse=reverse, interpret=interpret)

    fwd, hf = direction("f", h0[:, 0], False)
    bwd, hb = direction("b", h0[:, 1], True)
    if target != B:
        fwd, bwd, hf, hb = (fwd[:, :B], bwd[:, :B], hf[:B], hb[:B])
    return fwd, bwd, jnp.stack([hf, hb], axis=1)


def use_fused_gru() -> bool:
    """The fused-input-projection GRU path: on by default on TPU (unlike
    the unfused kernel below, it removes the xw/flip/concat HBM passes and
    measures faster than the scan).  Override with PEPPER_GRU_FUSED=0/1."""
    import os

    flag = os.environ.get("PEPPER_GRU_FUSED", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"


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
