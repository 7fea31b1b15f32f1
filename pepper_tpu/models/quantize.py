"""Int8 serving mode — the role of the reference's `--quantized` ONNX
dynamic QUInt8 mode (predict_distributed_cpu.py:188-193), executed as TRUE
int8 MXU matmuls.

The TPU v5e MXU runs int8×int8→int32 at ~1.8× its bf16 rate (measured
~334 TOP/s vs ~187 TFLOP/s through XLA `dot_general` on this chip), so all
large matmuls outside the recurrence run in int8:

  * weights: per-output-channel int8 (absmax/127), computed once;
  * activations: dynamic per-row int8 (absmax/127), matching the
    reference's *dynamic* quantization choice;
  * accumulation: int32, rescaled to float32 by (row_scale × col_scale);
  * the LSTM recurrent matmuls stay bf16 (h changes every step; the
    per-step quantization overhead would exceed the matmul saving at
    H=256) — their weights are stored unquantized;
  * the recurrence itself runs through the shared Pallas kernel on TPU
    (ops/lstm_kernel.py takes precomputed projections) or the lax.scan
    fallback elsewhere.

This halves weight HBM traffic AND nearly doubles the MXU rate of ~57% of
the model FLOPs (decoder input projection + dense head), versus the
previous dequantize-to-bf16 implementation which only saved weight memory.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_QUANT_PREFIXES = ("w_ih", "w")     # input projections + dense weights
_KEEP_FLOAT = ("w_hh",)             # recurrent weights stay bf16


def _should_quantize(key: str, leaf) -> bool:
    if np.asarray(leaf).ndim < 2:
        return False                # biases / vectors
    if any(key.startswith(p) for p in _KEEP_FLOAT):
        return False
    return any(key == p or key.startswith(p) for p in _QUANT_PREFIXES)


def quantize_params(params):
    """float pytree -> ({'q': int8-or-float pytree}, {'scale': pytree}).
    Quantized leaves carry per-output-channel scales (1, N); recurrent
    weights and biases pass through unquantized with scale None."""

    def walk(node):
        q_node, s_node = {}, {}
        for key, value in node.items():
            if isinstance(value, dict):
                q_node[key], s_node[key] = walk(value)
                continue
            leaf = np.asarray(value)
            if _should_quantize(key, leaf):
                scale = np.maximum(np.abs(leaf).max(axis=0, keepdims=True),
                                   1e-8) / 127.0
                q_node[key] = np.clip(np.round(leaf / scale), -127,
                                      127).astype(np.int8)
                s_node[key] = scale.astype(np.float32)
            else:
                q_node[key] = leaf
                s_node[key] = None
        return q_node, s_node

    return walk(params)


def dequantize_params(quantized, scales, dtype=jnp.bfloat16):
    def dequantize_leaf(q, scale):
        if scale is None:
            return jnp.asarray(q, dtype)
        return jnp.asarray(q, dtype) * jnp.asarray(scale, dtype)

    return jax.tree_util.tree_map(
        dequantize_leaf, quantized, scales,
        is_leaf=lambda x: x is None or not isinstance(x, dict))


def _dynamic_quant(x):
    """Per-row (last-axis) absmax int8 quantization of activations."""
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                        1e-6) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_linear(x, w_q, w_scale, b=None):
    """x float (..., K) @ int8 (K, N) -> float32 (..., N): dynamic-quant the
    rows, int8 MXU matmul with int32 accumulation, rescale."""
    x_q, x_scale = _dynamic_quant(x)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale.astype(jnp.float32) * w_scale
    if b is not None:
        y = y + b
    return y


def _recurrence(xw, w_hh, reverse, compute_dtype):
    """xw: (B, T, 4H) float32 projections -> (B, T, H) hidden outputs,
    through the Pallas kernel on TPU or the shared lax.scan."""
    from .rnn import lstm_recurrence
    from ..ops.lstm_kernel import batch_tile, lstm_recurrence_pallas, \
        use_pallas_lstm

    xw_t = jnp.swapaxes(xw.astype(compute_dtype), 0, 1)
    B = xw_t.shape[1]
    if reverse:
        xw_t = jnp.flip(xw_t, axis=0)
    if use_pallas_lstm():
        # pad the batch to a tile multiple, as bilstm_pallas does, so the
        # kernel (not the scan) serves every batch size
        tile = batch_tile(compute_dtype)
        pad = (tile - B % tile) % tile if B > tile else 0
        if pad:
            xw_t = jnp.pad(xw_t, ((0, 0), (0, pad), (0, 0)))
        ys = lstm_recurrence_pallas(xw_t, w_hh.astype(compute_dtype))
        if pad:
            ys = ys[:, :B]
    else:
        ys, _ = lstm_recurrence(xw_t, w_hh.astype(compute_dtype))
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return jnp.swapaxes(ys, 0, 1)


def _bilstm_int8(x, q, s, compute_dtype):
    """Bidirectional LSTM whose input projections run in int8."""
    outs = []
    for suffix, reverse in (("f", False), ("b", True)):
        xw = _int8_linear(x, q[f"w_ih_{suffix}"], s[f"w_ih_{suffix}"],
                          q[f"b_{suffix}"])
        outs.append(_recurrence(xw, q[f"w_hh_{suffix}"], reverse,
                                compute_dtype))
    return jnp.concatenate(outs, axis=-1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("compute_dtype",))
def _infer_int8(quantized, scales, x, compute_dtype=jnp.bfloat16):
    x = _bilstm_int8(x.astype(jnp.float32), quantized["encoder"],
                     scales["encoder"], compute_dtype)
    x = _bilstm_int8(x, quantized["decoder"], scales["decoder"],
                     compute_dtype)
    x = x.reshape(x.shape[0], -1)
    for name in ("linear_1", "linear_2", "linear_3", "linear_4", "linear_5"):
        x = jax.nn.selu(_int8_linear(x, quantized[name]["w"],
                                     scales[name]["w"],
                                     quantized[name]["b"]))
    logits = _int8_linear(x, quantized["output_layer_type"]["w"],
                          scales["output_layer_type"]["w"],
                          quantized["output_layer_type"]["b"])
    return jax.nn.softmax(logits, axis=1)


def transducer_infer_quantized(quantized, scales, x,
                               compute_dtype=jnp.bfloat16):
    """Jitted int8 inference: (B, T, F) float -> (B, 3) float32 probs."""
    return _infer_int8(quantized, scales, x, compute_dtype)


# ---------------------------------------------------------------------------
# Static-scale int8 serving (no dynamic activation quantization)
# ---------------------------------------------------------------------------
#
# The dynamic path above pays, per batch, (a) absmax reductions + rescales
# over every activation tensor and (b) full f32 xw round-trips through HBM
# (it cannot use the fused-projection kernels).  Both costs vanish with a
# static design built on a structural fact of this model: every activation
# that feeds a big matmul after the encoder is an LSTM hidden output
# h = o*tanh(c) in (-1, 1), so its int8 scale is EXACTLY 1/127 — known at
# compile time, no calibration pass, no stored calibration state:
#
#   encoder (bf16 fused kernel)     -> emits round(h*127) int8 streams
#   decoder input projection        -> int8 x int8 MXU matmul in-kernel
#                                      (the dominant 2.33 ms stage)
#   decoder                         -> emits int8 streams
#   linear_1 (t-major head einsum)  -> int8 x int8 MXU matmul
#   linear_2..5 + output head       -> bf16 (only ~13 GFLOP of the ~850)
#
# Weights quantize per-output-channel (absmax/127) like the dynamic path;
# the per-matmul rescale folds the weight scale and the 1/127 activation
# scale into one (1, N) f32 multiply of the int32 accumulator.  Fills the
# same role as the reference's ONNX dynamic-QUInt8 serving
# (predict_distributed_cpu.py:188-193) without its per-batch quant cost.


def _quantize_cols(w):
    """(K, N) float -> int8 codes, (1, N) per-output-column scales."""
    w = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_params_static(params, rec_int8=False):
    """float param pytree -> static int8 serving tree.

    decoder w_ih_* and linear_1 w become int8 with fused rescales
    (w_scale/127 — the /127 dequantizes the int8 activation codes); the
    encoder, all recurrent weights, biases and the small head layers pass
    through as float32.

    rec_int8=True additionally quantizes the four recurrent weights
    (encoder+decoder w_hh_*) per output column; the recurrence then re-codes
    h as round(h*127) every step (exact 1/127 scale again).  ~1.8x the
    recurrent MXU rate, at the cost of quantized hidden feedback — opt-in
    (PEPPER_QUANT_REC=1 or quantize_mode="static_rec")."""
    tree = {}
    for name, node in params.items():
        tree[name] = {k: np.asarray(v, np.float32) for k, v in node.items()}

    dec = tree["decoder"]
    for sfx in ("f", "b"):
        q, scale = _quantize_cols(dec[f"w_ih_{sfx}"])
        dec[f"w_ih_{sfx}"] = q
        dec[f"as_{sfx}"] = scale / 127.0
    if rec_int8:
        for layer in ("encoder", "decoder"):
            node = tree[layer]
            for sfx in ("f", "b"):
                q, scale = _quantize_cols(node[f"w_hh_{sfx}"])
                node[f"w_hh_{sfx}"] = q
                node[f"as_hh_{sfx}"] = scale / 127.0
    lin1 = tree["linear_1"]
    q, scale = _quantize_cols(lin1["w"])
    lin1["w"] = q
    lin1["as"] = (scale / 127.0).reshape(-1)
    return tree


def _quantize_h(h):
    """float (-1, 1) hidden stream -> int8 codes q = round(h*127); matches
    the kernel epilogue bit-for-bit (round-half-to-even, no clip needed
    because |h| < 1 keeps round(h*127) within [-127, 127])."""
    return jnp.round(h.astype(jnp.float32) * 127.0).astype(jnp.int8)


def _rec_q_recurrence(xw, w_hh_q, rec_scale, reverse):
    """LSTM recurrence with int8 recurrent matmul: h re-coded as
    round(h*127) every step (matching the kernel's rec_int8 path)."""
    B = xw.shape[1]
    H = w_hh_q.shape[1] // 4
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)

    def step(carry, xw_t):
        h, c = carry
        hq = jnp.round(h * 127.0).astype(jnp.int8)
        rec = jnp.dot(hq, w_hh_q, preferred_element_type=jnp.int32)
        gates = xw_t + rec.astype(jnp.float32) * rec_scale
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, c0), xw, reverse=reverse)
    return ys


def _fallback_recurrence(xw, params, sfx, reverse):
    from .rnn import lstm_recurrence

    if f"as_hh_{sfx}" in params:
        return _rec_q_recurrence(xw, params[f"w_hh_{sfx}"],
                                 params[f"as_hh_{sfx}"], reverse)
    ys, _ = lstm_recurrence(xw, params[f"w_hh_{sfx}"].astype(jnp.float32),
                            reverse=reverse)
    return ys


def _scan_bilstm_to_q(xt, params, compute_dtype):
    """Fallback (non-TPU) encoder: lax.scan recurrence in f32 (matching the
    kernel's f32 state), int8-coded hidden streams out."""

    def direction(sfx, reverse):
        w_ih = params[f"w_ih_{sfx}"]
        xw = jnp.einsum("tbf,fg->tbg", xt.astype(compute_dtype),
                        w_ih.astype(compute_dtype)).astype(jnp.float32) \
            + params[f"b_{sfx}"]
        return _quantize_h(_fallback_recurrence(xw, params, sfx, reverse))

    return direction("f", False), direction("b", True)


def _scan_bilstm_q_to_q(x_parts_q, params, compute_dtype):
    """Fallback decoder: int8 input projections with int32 accumulation,
    fused rescale, f32 scan recurrence, int8 streams out."""

    def direction(sfx, reverse):
        w_q = params[f"w_ih_{sfx}"]
        splits, off = [], 0
        for xp in x_parts_q:
            splits.append((off, off + xp.shape[2]))
            off += xp.shape[2]
        acc = None
        for xp, (s, e) in zip(x_parts_q, splits):
            part = jnp.einsum("tbf,fg->tbg", xp, w_q[s:e],
                              preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part
        xw = (acc.astype(jnp.float32) * params[f"as_{sfx}"]
              + params[f"b_{sfx}"])
        return _quantize_h(_fallback_recurrence(xw, params, sfx, reverse))

    return direction("f", False), direction("b", True)


@partial(jax.jit, static_argnames=("compute_dtype", "use_kernel"))
def _infer_static(q, x, compute_dtype, use_kernel):
    xt = jnp.transpose(x, (1, 0, 2))  # (T, B, F) time-major

    if use_kernel:
        from ..ops.lstm_kernel import bilstm_fused_static

        rec_int8 = "as_hh_f" in q["encoder"]

        def cast_whh(node):
            if rec_int8:
                return node  # int8 recurrent weights stay int8
            node = dict(node)
            node["w_hh_f"] = node["w_hh_f"].astype(compute_dtype)
            node["w_hh_b"] = node["w_hh_b"].astype(compute_dtype)
            return node

        def rscale(node):
            if not rec_int8:
                return None
            return (node["as_hh_f"], node["as_hh_b"])

        enc = {k: (v.astype(compute_dtype)
                   if k.startswith("w_ih") else v)
               for k, v in q["encoder"].items()}
        enc = cast_whh(enc)
        f1q, b1q = bilstm_fused_static((xt.astype(compute_dtype),), enc,
                                       rec_scale=rscale(enc), out_int8=True)
        dec = cast_whh(q["decoder"])
        f2q, b2q = bilstm_fused_static(
            (f1q, b1q), dec, acc_scale=(dec["as_f"], dec["as_b"]),
            rec_scale=rscale(dec), out_int8=True)
    else:
        f1q, b1q = _scan_bilstm_to_q(xt, q["encoder"], compute_dtype)
        f2q, b2q = _scan_bilstm_q_to_q((f1q, b1q), q["decoder"],
                                       compute_dtype)

    # t-major flatten + linear_1 as two int8 einsums against views of the
    # quantized weight (rows t-major [fwd|bwd], same layout as the bf16
    # fused head)
    T = xt.shape[0]
    w1q = q["linear_1"]["w"]
    H = w1q.shape[0] // (2 * T)
    w1q = w1q.reshape(T, 2 * H, -1)
    acc = (jnp.einsum("tbh,thl->bl", f2q, w1q[:, :H],
                      preferred_element_type=jnp.int32)
           + jnp.einsum("tbh,thl->bl", b2q, w1q[:, H:],
                        preferred_element_type=jnp.int32))
    h = (acc.astype(jnp.float32) * q["linear_1"]["as"]
         + q["linear_1"]["b"])

    h = jax.nn.selu(h).astype(compute_dtype)
    for name in ("linear_2", "linear_3", "linear_4", "linear_5"):
        w = q[name]["w"].astype(compute_dtype)
        h = jax.nn.selu(h @ w + q[name]["b"].astype(compute_dtype))
    out = q["output_layer_type"]
    logits = h @ out["w"].astype(compute_dtype) + \
        out["b"].astype(compute_dtype)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=1)


def transducer_infer_static(q, x, compute_dtype=jnp.bfloat16):
    """Static-scale int8 inference: (B, T, F) float -> (B, 3) f32 probs.
    Uses the int8 fused Pallas kernels on TPU, an exactly-equivalent
    lax.scan + integer-einsum fallback elsewhere."""
    from ..ops.lstm_kernel import use_pallas_lstm

    return _infer_static(q, x, compute_dtype, use_pallas_lstm())


# ---------------- polish GRU static serving ----------------
# The polish consensus GRU's hidden stream h' = (1-z)*n + z*h is
# tanh-bounded exactly like the LSTM's o*tanh(c), so the same exact-1/127
# static scheme applies (VERDICT r4 task 5): the encoder emits round(h*127)
# int8 codes, the decoder's dominant 256->384 input projection runs
# int8 x int8 on the MXU with one fused rescale, and the per-timestep head
# einsums in int8.  Recurrent matmuls, biases and the hidden CARRY stay
# float (static_rec measured slower at this width for the LSTM; the carry
# must stay exact for the sliding-window semantics).


def polish_quantize_params_static(params):
    """float polish param pytree -> static int8 serving tree: decoder
    w_ih_* and the output head w become int8 with fused rescales."""
    tree = {}
    for name, node in params.items():
        tree[name] = {k: np.asarray(v, np.float32) for k, v in node.items()}
    dec = tree["decoder"]
    for sfx in ("f", "b"):
        q, scale = _quantize_cols(dec[f"w_ih_{sfx}"])
        dec[f"w_ih_{sfx}"] = q
        dec[f"as_{sfx}"] = scale / 127.0
    out = tree["output"]
    q, scale = _quantize_cols(out["w"])
    out["w"] = q
    out["as"] = (scale / 127.0).reshape(-1)
    return tree


def _gru_recurrence_xw(xw, w_hh, b_hh, h0, reverse):
    """GRU recurrence from precomputed input projections, f32 state —
    matches the static Pallas kernel's per-step math exactly."""
    H = w_hh.shape[0]

    def step(h, xw_t):
        hw = h @ w_hh + b_hh
        r = jax.nn.sigmoid(xw_t[:, :H] + hw[:, :H])
        z = jax.nn.sigmoid(xw_t[:, H:2 * H] + hw[:, H:2 * H])
        n = jnp.tanh(xw_t[:, 2 * H:] + r * hw[:, 2 * H:])
        h = (1.0 - z) * n + z * h
        return h, h

    hT, ys = jax.lax.scan(step, h0, xw, reverse=reverse)
    return ys, hT


def _scan_bigru_to_q(xt, params, h0, compute_dtype):
    """Fallback encoder: float input projection, f32 recurrence, int8-coded
    streams out, float final hidden.  h0: (B, 2, H)."""

    def direction(sfx, h0d, reverse):
        xw = jnp.einsum("tbf,fg->tbg", xt.astype(compute_dtype),
                        params[f"w_ih_{sfx}"].astype(compute_dtype)) \
            .astype(jnp.float32) + params[f"b_ih_{sfx}"]
        ys, hT = _gru_recurrence_xw(xw, params[f"w_hh_{sfx}"],
                                    params[f"b_hh_{sfx}"],
                                    h0d.astype(jnp.float32), reverse)
        return _quantize_h(ys), hT

    fq, hf = direction("f", h0[:, 0], False)
    bq, hb = direction("b", h0[:, 1], True)
    return fq, bq, jnp.stack([hf, hb], axis=1)


def _scan_bigru_q_to_q(x_parts_q, params, h0, compute_dtype):
    """Fallback decoder: int8 input projections with int32 accumulation and
    fused rescale, f32 recurrence, int8 streams out, float final hidden."""
    splits, off = [], 0
    for xp in x_parts_q:
        splits.append((off, off + xp.shape[2]))
        off += xp.shape[2]

    def direction(sfx, h0d, reverse):
        w_q = params[f"w_ih_{sfx}"]
        acc = None
        for xp, (s, e) in zip(x_parts_q, splits):
            part = jnp.einsum("tbf,fg->tbg", xp, w_q[s:e],
                              preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part
        xw = (acc.astype(jnp.float32) * params[f"as_{sfx}"]
              + params[f"b_ih_{sfx}"])
        ys, hT = _gru_recurrence_xw(xw, params[f"w_hh_{sfx}"],
                                    params[f"b_hh_{sfx}"],
                                    h0d.astype(jnp.float32), reverse)
        return _quantize_h(ys), hT

    fq, hf = direction("f", h0[:, 0], False)
    bq, hb = direction("b", h0[:, 1], True)
    return fq, bq, jnp.stack([hf, hb], axis=1)


def polish_forward_static(q, xt, hidden, compute_dtype=jnp.float32,
                          use_kernel=None, interpret=False):
    """Static-int8 polish forward, time-major.

    xt: (T, B, F) float window; hidden: (B, 2, H) float carry.
    Returns (logits (T, B, C) f32, hidden_final (B, 2, H) f32).  Kernel
    and scan paths agree on every int8 code (tests/test_quantize_static)."""
    if use_kernel is None:
        from ..ops.gru_kernel import use_fused_gru

        use_kernel = use_fused_gru()
    if use_kernel:
        from ..ops.gru_kernel import bigru_fused_static

        enc = {k: (v.astype(compute_dtype) if k.startswith("w_ih")
                   or k.startswith("w_hh") else v)
               for k, v in q["encoder"].items()}
        f1q, b1q, hid1 = bigru_fused_static(
            (xt.astype(compute_dtype),), enc, hidden, interpret=interpret)
        dec = {k: (v.astype(compute_dtype) if k.startswith("w_hh") else v)
               for k, v in q["decoder"].items()}
        f2q, b2q, hid_final = bigru_fused_static(
            (f1q, b1q), dec, hid1, acc_scale=(dec["as_f"], dec["as_b"]),
            interpret=interpret)
    else:
        f1q, b1q, hid1 = _scan_bigru_to_q(xt, q["encoder"], hidden,
                                          compute_dtype)
        f2q, b2q, hid_final = _scan_bigru_q_to_q((f1q, b1q), q["decoder"],
                                                 hid1, compute_dtype)

    w_q = q["output"]["w"]
    H = w_q.shape[0] // 2
    acc = (jnp.einsum("tbh,hc->tbc", f2q, w_q[:H],
                      preferred_element_type=jnp.int32)
           + jnp.einsum("tbh,hc->tbc", b2q, w_q[H:],
                        preferred_element_type=jnp.int32))
    logits = acc.astype(jnp.float32) * q["output"]["as"] + q["output"]["b"]
    return logits, hid_final
