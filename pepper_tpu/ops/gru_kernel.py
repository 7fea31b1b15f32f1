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


def _make_fused_gru_kernel_static(n_parts, x_int8):
    """Fused-projection GRU kernel with static int8 streams (the polish
    analog of ops/lstm_kernel.py _make_fused_kernel_static): the hidden
    stream h' = (1-z)*n + z*h is bounded in (-1, 1) by construction
    (n = tanh(...), induction from h0), so its int8 scale is EXACTLY
    1/127 — the stream is emitted as round(h*127) codes and, with
    x_int8, the input projection runs int8 x int8 on the MXU with one
    fused rescale of the int32 accumulator (acc * (w_scale/127)).  The
    final hidden state is written as float through a second output so the
    consensus sliding-window carry and the encoder->decoder handoff stay
    exact."""
    import jax.experimental.pallas as pl

    def kernel(*refs):
        x_refs = refs[:n_parts]
        w_ih_refs = refs[n_parts:2 * n_parts]
        rest = refs[2 * n_parts:]
        if x_int8:
            acc_scale_ref, rest = rest[0], rest[1:]
        (b_ih_ref, w_hh_ref, b_hh_ref, h0_ref, out_ref, ht_ref,
         h_scratch) = rest

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scratch[:] = h0_ref[:].astype(jnp.float32)

        h = h_scratch[:]
        H = h.shape[-1]
        hw = jnp.dot(h.astype(w_hh_ref.dtype), w_hh_ref[:],
                     preferred_element_type=jnp.float32) \
            + b_hh_ref[:].astype(jnp.float32)
        if x_int8:
            acc = None
            for x_ref, w_ref in zip(x_refs, w_ih_refs):
                part = jnp.dot(x_ref[0], w_ref[:],
                               preferred_element_type=jnp.int32)
                acc = part if acc is None else acc + part
            xw = (acc.astype(jnp.float32) * acc_scale_ref[0]
                  + b_ih_ref[0].astype(jnp.float32))
        else:
            xw = b_ih_ref[0].astype(jnp.float32)
            for x_ref, w_ref in zip(x_refs, w_ih_refs):
                xw = xw + jnp.dot(x_ref[0], w_ref[:],
                                  preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(xw[:, :H] + hw[:, :H])
        z = jax.nn.sigmoid(xw[:, H:2 * H] + hw[:, H:2 * H])
        n = jnp.tanh(xw[:, 2 * H:] + r * hw[:, 2 * H:])
        h = (1.0 - z) * n + z * h
        h_scratch[:] = h
        out_ref[0] = jnp.round(h * 127.0).astype(jnp.int8)

        @pl.when(t == pl.num_programs(1) - 1)
        def _():
            ht_ref[:] = h.astype(ht_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def gru_direction_fused_static(x_parts, w_ih_parts, b_ih, w_hh, b_hh, h0,
                               acc_scale=None, reverse=False,
                               interpret=False):
    """One static-int8 GRU direction (see _make_fused_gru_kernel_static).
    Returns (ys (T, B, H) int8 codes in natural order, hT (B, H) f32)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    T, B, _ = x_parts[0].shape
    H = w_hh.shape[0]
    G = 3 * H
    tile = fused_batch_tile(x_parts[0].dtype)
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
    inputs = list(x_parts) + list(w_ih_parts)
    if acc_scale is not None:
        in_specs.append(pl.BlockSpec((1, G), const_ix))
        inputs.append(acc_scale.reshape(1, G))
    in_specs += [
        pl.BlockSpec((1, G), const_ix),
        pl.BlockSpec((H, G), const_ix),
        pl.BlockSpec((1, G), const_ix),
        pl.BlockSpec((b_tile, H), lambda bb, t: (bb, 0)),
    ]
    inputs += [b_ih.reshape(1, G), w_hh, b_hh.reshape(1, G), h0]

    ys, hT = pl.pallas_call(
        _make_fused_gru_kernel_static(len(x_parts), acc_scale is not None),
        grid=(n_btiles, T),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, b_tile, H), seq_ix),
                   pl.BlockSpec((b_tile, H), lambda bb, t: (bb, 0))],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), jnp.int8),
                   jax.ShapeDtypeStruct((B, H), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b_tile, H), jnp.float32)],
        interpret=interpret,
    )(*inputs)
    return ys, hT


def bigru_fused_static(x_parts, params, h0, acc_scale=None,
                       interpret=False):
    """Bidirectional static-int8 fused GRU.  h0: (B, 2, H) float carry.
    acc_scale: (as_f, as_b) per-column fused rescales when the x_parts are
    int8 codes, None for float inputs.  Returns (fwd_q (T,B,H) int8,
    bwd_q (T,B,H) int8, hidden_out (B, 2, H) f32)."""
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
        scale = None if acc_scale is None else \
            acc_scale[0 if suffix == "f" else 1]
        return gru_direction_fused_static(
            x_parts, w_parts, params["b_ih_" + suffix],
            params["w_hh_" + suffix], params["b_hh_" + suffix], h0d,
            acc_scale=scale, reverse=reverse, interpret=interpret)

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
