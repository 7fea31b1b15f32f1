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


def dual_batch_tile(dtype) -> int:
    """Batch tile for the dual-direction kernel.  At H=256/bf16 the full
    1024 tile's working set (~13MB: 4 streamed x blocks + 4 weight parts +
    4 f32 state scratches + 2 out blocks) still fits the ~16MB VMEM; f32
    needs the usual halving twice."""
    return B_TILE if jnp.dtype(dtype).itemsize <= 2 else B_TILE // 4


def _make_fused_kernel(n_parts):
    """Kernel with the input projection fused in: per grid step it reads the
    raw feature blocks x_i (instead of a precomputed (B, 4H) gate tensor),
    computes xw = sum_i x_i @ w_ih_i + b on the MXU, and runs the gate math.
    Removes the full (T, B, 4H) xw HBM round-trip of the unfused path."""
    import jax.experimental.pallas as pl

    def kernel(*refs):
        x_refs = refs[:n_parts]
        w_ih_refs = refs[n_parts:2 * n_parts]
        b_ref, w_hh_ref, out_ref, h_scratch, c_scratch = refs[2 * n_parts:]

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scratch[:] = jnp.zeros_like(h_scratch)
            c_scratch[:] = jnp.zeros_like(c_scratch)

        h = h_scratch[:]
        c = c_scratch[:]
        gates = b_ref[0].astype(jnp.float32)
        for x_ref, w_ref in zip(x_refs, w_ih_refs):
            gates = gates + jnp.dot(x_ref[0], w_ref[:],
                                    preferred_element_type=jnp.float32)
        gates = gates + jnp.dot(h.astype(w_hh_ref.dtype), w_hh_ref[:],
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

    return kernel


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def lstm_direction_fused(x_parts, w_ih_parts, b, w_hh, reverse=False,
                         interpret=False):
    """One LSTM direction with the input projection fused into the kernel.

    x_parts: tuple of (T, B, F_i) time-major feature arrays, logically
    concatenated on the feature axis (layer 2 passes layer 1's fwd and bwd
    streams here so the concat never materializes in HBM).
    w_ih_parts: matching (F_i, 4H) slices of the input weight.
    b: (4H,) bias.  w_hh: (H, 4H).
    reverse=True runs the backward direction purely through index maps
    (block t reads/writes sequence position T-1-t) — no jnp.flip copies.
    Returns hidden outputs (T, B, H) in natural sequence order.
    B must be a multiple of batch_tile(dtype) or smaller (caller pads).
    """
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    T, B, _ = x_parts[0].shape
    H = w_hh.shape[0]
    G = 4 * H
    dtype = x_parts[0].dtype
    tile = batch_tile(dtype)
    n_btiles = max(1, B // tile)
    b_tile = min(B, tile)

    if reverse:
        seq_ix = lambda bb, t: (T - 1 - t, bb, 0)  # noqa: E731
    else:
        seq_ix = lambda bb, t: (t, bb, 0)  # noqa: E731

    in_specs = [pl.BlockSpec((1, b_tile, xp.shape[2]), seq_ix)
                for xp in x_parts]
    in_specs += [pl.BlockSpec((xp.shape[2], G), lambda bb, t: (0, 0))
                 for xp in x_parts]
    in_specs += [
        pl.BlockSpec((1, G), lambda bb, t: (0, 0)),
        pl.BlockSpec((H, G), lambda bb, t: (0, 0)),
    ]

    return pl.pallas_call(
        _make_fused_kernel(len(x_parts)),
        grid=(n_btiles, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, b_tile, H), seq_ix),
        out_shape=jax.ShapeDtypeStruct((T, B, H), dtype),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        interpret=interpret,
    )(*x_parts, *w_ih_parts, b.reshape(1, G), w_hh)


def _make_fused_kernel_static(n_parts, x_int8, out_int8, rec_int8=False):
    """Fused-projection LSTM kernel with static int8 input/output streams
    (models/quantize.py's static serving mode).

    x_int8: the feature parts arrive as int8 codes q = round(x*127) of
    tanh-bounded activations; the input projection runs as an int8xint8
    MXU matmul with int32 accumulation (~1.8x the bf16 rate on v5e) and one
    fused rescale acc * (w_scale/127) — the activation scale is EXACTLY
    1/127 because LSTM hidden outputs are o*tanh(c) in (-1, 1), so there is
    nothing dynamic to compute.

    out_int8: the hidden stream is emitted as round(h*127) int8, quartering
    the HBM write (and the next layer's read) vs f32.

    rec_int8: the recurrent matmul also runs int8 — h is re-coded as
    round(h*127) every step (the same exact 1/127 scale: h = o*tanh(c) is
    bounded) against a per-column int8 w_hh with its own fused rescale.
    Cuts the recurrent MXU time ~1.8x at the cost of feeding the recurrence
    quantized hidden values.
    """
    import jax.experimental.pallas as pl

    def kernel(*refs):
        x_refs = refs[:n_parts]
        w_ih_refs = refs[n_parts:2 * n_parts]
        rest = refs[2 * n_parts:]
        if x_int8:
            acc_scale_ref, rest = rest[0], rest[1:]
        else:
            acc_scale_ref = None
        if rec_int8:
            rec_scale_ref, rest = rest[0], rest[1:]
        else:
            rec_scale_ref = None
        b_ref, w_hh_ref, out_ref, h_scratch, c_scratch = rest

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scratch[:] = jnp.zeros_like(h_scratch)
            c_scratch[:] = jnp.zeros_like(c_scratch)

        h = h_scratch[:]
        c = c_scratch[:]
        gates = b_ref[0].astype(jnp.float32)
        if x_int8:
            acc = jnp.dot(x_refs[0][0], w_ih_refs[0][:],
                          preferred_element_type=jnp.int32)
            for x_ref, w_ref in zip(x_refs[1:], w_ih_refs[1:]):
                acc = acc + jnp.dot(x_ref[0], w_ref[:],
                                    preferred_element_type=jnp.int32)
            gates = gates + acc.astype(jnp.float32) * acc_scale_ref[0]
        else:
            for x_ref, w_ref in zip(x_refs, w_ih_refs):
                gates = gates + jnp.dot(x_ref[0], w_ref[:],
                                        preferred_element_type=jnp.float32)
        if rec_int8:
            h_q = jnp.round(h * 127.0).astype(jnp.int8)
            rec = jnp.dot(h_q, w_hh_ref[:],
                          preferred_element_type=jnp.int32)
            gates = gates + rec.astype(jnp.float32) * rec_scale_ref[0]
        else:
            gates = gates + jnp.dot(h.astype(w_hh_ref.dtype), w_hh_ref[:],
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
        if out_int8:
            out_ref[0] = jnp.round(h * 127.0).astype(jnp.int8)
        else:
            out_ref[0] = h.astype(out_ref.dtype)

    return kernel


@partial(jax.jit,
         static_argnames=("reverse", "out_int8", "out_dtype", "interpret"))
def lstm_direction_fused_static(x_parts, w_ih_parts, b, w_hh, acc_scale=None,
                                rec_scale=None, reverse=False, out_int8=False,
                                out_dtype=jnp.bfloat16, interpret=False):
    """One LSTM direction with static-int8 streams (see
    _make_fused_kernel_static).

    x_parts: tuple of (T, B, F_i) arrays — all int8 codes (scale 1/127) or
    all float.  When int8, w_ih_parts are int8 per-output-column quantized
    weights and acc_scale is the (1, 4H) f32 combined rescale
    (w_scale / 127) applied once to the summed int32 accumulator.
    out_int8=True emits round(h*127) int8; else out_dtype floats.
    """
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    T, B, _ = x_parts[0].shape
    H = w_hh.shape[0]
    G = 4 * H
    x_int8 = x_parts[0].dtype == jnp.int8
    tile = B_TILE  # int8/bf16 streams: full tile fits VMEM
    if not x_int8 and jnp.dtype(x_parts[0].dtype).itemsize > 2:
        tile = B_TILE // 2
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
    operands = list(x_parts) + list(w_ih_parts)
    if x_int8:
        in_specs.append(pl.BlockSpec((1, G), const_ix))
        operands.append(acc_scale.reshape(1, G).astype(jnp.float32))
    rec_int8 = rec_scale is not None
    if rec_int8:
        in_specs.append(pl.BlockSpec((1, G), const_ix))
        operands.append(rec_scale.reshape(1, G).astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((1, G), const_ix),
        pl.BlockSpec((H, G), const_ix),
    ]
    operands += [b.reshape(1, G).astype(jnp.float32), w_hh]

    out_kind = jnp.int8 if out_int8 else out_dtype
    return pl.pallas_call(
        _make_fused_kernel_static(len(x_parts), x_int8, out_int8, rec_int8),
        grid=(n_btiles, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, b_tile, H), seq_ix),
        out_shape=jax.ShapeDtypeStruct((T, B, H), out_kind),
        scratch_shapes=[
            pltpu.VMEM((b_tile, H), jnp.float32),
            pltpu.VMEM((b_tile, H), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def bilstm_fused_static(x_parts, params, acc_scale=None, rec_scale=None,
                        out_int8=False, out_dtype=jnp.bfloat16,
                        interpret=False):
    """Bidirectional wrapper over lstm_direction_fused_static; same padding
    contract as bilstm_fused.  params uses the standard w_ih_f/w_hh_f/b_f
    naming; int8 inputs expect int8 w_ih_* and a shared acc_scale pair
    (acc_scale_f, acc_scale_b)."""
    B = x_parts[0].shape[1]
    tile = B_TILE
    if x_parts[0].dtype != jnp.int8 and \
            jnp.dtype(x_parts[0].dtype).itemsize > 2:
        tile = B_TILE // 2
    target = B + ((-B) % tile if B > tile else 0)
    if target != B:
        x_parts = tuple(
            jnp.pad(xp, ((0, 0), (0, target - B), (0, 0))) for xp in x_parts)

    splits = []
    off = 0
    for xp in x_parts:
        splits.append((off, off + xp.shape[2]))
        off += xp.shape[2]

    def direction(w_ih, w_hh, b, scale, rscale, reverse):
        w_parts = tuple(w_ih[s:e] for s, e in splits)
        return lstm_direction_fused_static(
            x_parts, w_parts, b, w_hh, acc_scale=scale, rec_scale=rscale,
            reverse=reverse, out_int8=out_int8, out_dtype=out_dtype,
            interpret=interpret)

    scale_f = scale_b = None
    if acc_scale is not None:
        scale_f, scale_b = acc_scale
    rscale_f = rscale_b = None
    if rec_scale is not None:
        rscale_f, rscale_b = rec_scale
    fwd = direction(params["w_ih_f"], params["w_hh_f"], params["b_f"],
                    scale_f, rscale_f, False)
    bwd = direction(params["w_ih_b"], params["w_hh_b"], params["b_b"],
                    scale_b, rscale_b, True)
    if target != B:
        fwd = fwd[:, :B]
        bwd = bwd[:, :B]
    return fwd, bwd


def _make_dual_kernel(n_parts):
    """Both directions in one kernel body: while one direction's gate
    nonlinearities run on the VPU, the other's recurrent matmul can occupy
    the MXU (the two recurrences are independent), hiding the VPU time that
    a single-direction kernel serializes behind each step's matmul."""
    import jax.experimental.pallas as pl

    def kernel(*refs):
        xf_refs = refs[:n_parts]
        xb_refs = refs[n_parts:2 * n_parts]
        wf_refs = refs[2 * n_parts:3 * n_parts]
        wb_refs = refs[3 * n_parts:4 * n_parts]
        (bf_ref, bb_ref, whf_ref, whb_ref, outf_ref, outb_ref,
         hf_s, cf_s, hb_s, cb_s) = refs[4 * n_parts:]

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            hf_s[:] = jnp.zeros_like(hf_s)
            cf_s[:] = jnp.zeros_like(cf_s)
            hb_s[:] = jnp.zeros_like(hb_s)
            cb_s[:] = jnp.zeros_like(cb_s)

        H = hf_s.shape[-1]

        def gates_to_state(gates, c):
            i = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H:2 * H])
            g = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c = f * c + i * g
            return o * jnp.tanh(c), c

        gf = bf_ref[0].astype(jnp.float32)
        gb = bb_ref[0].astype(jnp.float32)
        for x_ref, w_ref in zip(xf_refs, wf_refs):
            gf = gf + jnp.dot(x_ref[0], w_ref[:],
                              preferred_element_type=jnp.float32)
        for x_ref, w_ref in zip(xb_refs, wb_refs):
            gb = gb + jnp.dot(x_ref[0], w_ref[:],
                              preferred_element_type=jnp.float32)
        gf = gf + jnp.dot(hf_s[:].astype(whf_ref.dtype), whf_ref[:],
                          preferred_element_type=jnp.float32)
        gb = gb + jnp.dot(hb_s[:].astype(whb_ref.dtype), whb_ref[:],
                          preferred_element_type=jnp.float32)
        hf, cf = gates_to_state(gf, cf_s[:])
        hb, cb = gates_to_state(gb, cb_s[:])
        hf_s[:] = hf
        cf_s[:] = cf
        hb_s[:] = hb
        cb_s[:] = cb
        outf_ref[0] = hf.astype(outf_ref.dtype)
        outb_ref[0] = hb.astype(outb_ref.dtype)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def bilstm_dual_fused(x_parts, wf_parts, wb_parts, b_f, b_b, w_hh_f, w_hh_b,
                      interpret=False):
    """Fused bidirectional LSTM in a single pallas_call (see
    _make_dual_kernel).  x_parts: tuple of (T, B, F_i) time-major arrays.
    Returns (fwd, bwd) each (T, B, H) in natural sequence order."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    T, B, _ = x_parts[0].shape
    H = w_hh_f.shape[0]
    G = 4 * H
    dtype = x_parts[0].dtype
    tile = dual_batch_tile(dtype)
    n_btiles = max(1, B // tile)
    b_tile = min(B, tile)
    n = len(x_parts)

    fwd_ix = lambda bb, t: (t, bb, 0)  # noqa: E731
    bwd_ix = lambda bb, t: (T - 1 - t, bb, 0)  # noqa: E731
    const_ix = lambda bb, t: (0, 0)  # noqa: E731

    in_specs = (
        [pl.BlockSpec((1, b_tile, xp.shape[2]), fwd_ix) for xp in x_parts]
        + [pl.BlockSpec((1, b_tile, xp.shape[2]), bwd_ix) for xp in x_parts]
        + [pl.BlockSpec((xp.shape[2], G), const_ix) for xp in x_parts] * 2
        + [pl.BlockSpec((1, G), const_ix)] * 2
        + [pl.BlockSpec((H, G), const_ix)] * 2
    )

    outf, outb = pl.pallas_call(
        _make_dual_kernel(n),
        grid=(n_btiles, T),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, b_tile, H), fwd_ix),
                   pl.BlockSpec((1, b_tile, H), bwd_ix)],
        out_shape=[jax.ShapeDtypeStruct((T, B, H), dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((b_tile, H), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            # both directions' f32 gate intermediates overflow the 16MB
            # default scoped-vmem budget at the full batch tile; v5e has
            # headroom above it
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*x_parts, *x_parts, *wf_parts, *wb_parts,
      b_f.reshape(1, G), b_b.reshape(1, G), w_hh_f, w_hh_b)
    return outf, outb


def bilstm_fused(x_parts, params, interpret=False, dual=None):
    """Bidirectional LSTM over time-major feature parts; inference-only
    (no VJP — same gating as bilstm_pallas applies).

    x_parts: tuple of (T, B, F_i) arrays, concatenated feature-wise.
    Returns (fwd, bwd), each (T, B, H) in natural order — callers that need
    torch's (B, T, 2H) layout concatenate/transpose themselves; the fused
    transducer head consumes the time-major streams directly.

    dual=True (opt-in via PEPPER_LSTM_DUAL=1) runs both directions in one
    kernel; measured slightly slower than two single-direction calls on
    v5e (943k vs 993k windows/s through the transducer), so off by
    default."""
    import os

    if dual is None:
        dual = os.environ.get("PEPPER_LSTM_DUAL", "0") == "1"

    B = x_parts[0].shape[1]
    tile = (dual_batch_tile(x_parts[0].dtype) if dual
            else batch_tile(x_parts[0].dtype))
    target = B + ((-B) % tile if B > tile else 0)
    if target != B:
        x_parts = tuple(
            jnp.pad(xp, ((0, 0), (0, target - B), (0, 0))) for xp in x_parts)

    splits = []
    off = 0
    for xp in x_parts:
        splits.append((off, off + xp.shape[2]))
        off += xp.shape[2]

    if dual:
        wf = tuple(params["w_ih_f"][s:e] for s, e in splits)
        wb = tuple(params["w_ih_b"][s:e] for s, e in splits)
        fwd, bwd = bilstm_dual_fused(
            x_parts, wf, wb, params["b_f"], params["b_b"],
            params["w_hh_f"], params["w_hh_b"], interpret=interpret)
    else:
        def direction(w_ih, w_hh, b, reverse):
            w_parts = tuple(w_ih[s:e] for s, e in splits)
            return lstm_direction_fused(x_parts, w_parts, b, w_hh,
                                        reverse=reverse, interpret=interpret)

        fwd = direction(params["w_ih_f"], params["w_hh_f"],
                        params["b_f"], False)
        bwd = direction(params["w_ih_b"], params["w_hh_b"],
                        params["b_b"], True)
    if target != B:
        fwd = fwd[:, :B]
        bwd = bwd[:, :B]
    return fwd, bwd


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
