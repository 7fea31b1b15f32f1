"""The variant-mode window classifier ("TransducerGRU" in the reference —
actually a stacked bidirectional LSTM; pepper_variant/.../models/simple_model.py:6-88).

Architecture (semantics-identical to the reference so its trained
checkpoints can be converted and reused):

  encoder: biLSTM(features -> 256)        -> (B, 33, 512)
  decoder: biLSTM(512 -> 256)             -> (B, 33, 512)
  flatten                                  -> (B, 33*512)
  5 x [Linear(512) + SELU (+dropout 0.2)] -> (B, 512)   (linear_1 maps 16896->512)
  head:   Linear(512 -> 3)                -> (B, 3)
  softmax at inference.

TPU-first implementation notes: the two biLSTMs run as `jax.lax.scan` with
the input projection hoisted into one MXU matmul per direction; the five
dense layers are plain matmuls XLA fuses with the SELUs. Weights can be held
in bfloat16 for serving (compute_dtype) while keeping float32 softmax.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from .rnn import bilstm, init_linear_params, init_lstm_params, linear

from ..options import ImageOptions


@dataclass(frozen=True)
class TransducerConfig:
    image_features: int = ImageOptions.IMAGE_HEIGHT          # 26 (48 for HP)
    window: int = ImageOptions.CANDIDATE_WINDOW_SIZE + 1      # 33 (21 for HP)
    hidden: int = 256
    linear_size: int = 512
    num_type_classes: int = ImageOptions.TOTAL_TYPE_LABELS    # 3
    dropout: float = 0.2


def init_transducer_params(key, config: TransducerConfig = TransducerConfig(),
                           dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    H, L = config.hidden, config.linear_size
    return {
        "encoder": init_lstm_params(keys[0], config.image_features, H, dtype),
        "decoder": init_lstm_params(keys[1], 2 * H, H, dtype),
        "linear_1": init_linear_params(keys[2], 2 * H * config.window, L, dtype),
        "linear_2": init_linear_params(keys[3], L, L, dtype),
        "linear_3": init_linear_params(keys[4], L, L, dtype),
        "linear_4": init_linear_params(keys[5], L, L, dtype),
        "linear_5": init_linear_params(keys[6], L, L, dtype),
        "output_layer_type": init_linear_params(keys[7], L, config.num_type_classes, dtype),
    }


def _dropout(x, rate, key):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def transducer_logits(params, x, *, train=False, dropout_rate=0.2, rng=None):
    """Forward pass to logits. x: (B, T, F) float.  Training keeps the
    differentiable lax.scan recurrence; inference may use the Pallas
    kernel."""
    if not train:
        from ..ops.lstm_kernel import use_pallas_lstm

        if use_pallas_lstm():
            return _fused_logits(params, x)

    x = bilstm(x, params["encoder"], allow_kernel=not train)
    x = bilstm(x, params["decoder"], allow_kernel=not train)

    if train and rng is not None:
        rngs = jax.random.split(rng, 5)
    else:
        rngs = None

    if rngs is not None:
        x = _dropout(x, dropout_rate, rngs[0])
    # row-major (t-major) flatten, same as torch.flatten(x, 1, 2)
    x = x.reshape(x.shape[0], -1)

    for i, name in enumerate(["linear_1", "linear_2", "linear_3", "linear_4"]):
        x = jax.nn.selu(linear(x, params[name]))
        if rngs is not None:
            x = _dropout(x, dropout_rate, rngs[i + 1])
    x = jax.nn.selu(linear(x, params["linear_5"]))
    return linear(x, params["output_layer_type"])


def _fused_logits(params, x, interpret=False):
    """Inference-only TPU forward built on the fused Pallas biLSTM
    (ops/lstm_kernel.py): the input projections run inside the kernels, the
    encoder->decoder handoff passes the fwd/bwd streams as separate feature
    parts (no concat materializes), everything stays time-major, and the
    t-major flatten + linear_1 collapses to two einsums against views of
    linear_1's weight.  Numerically equivalent to transducer_logits at
    inference (validated in tests/test_lstm_kernel.py); gate math matches
    the reference model (simple_model.py:6-88)."""
    from ..ops.lstm_kernel import bilstm_fused

    xt = jnp.transpose(x, (1, 0, 2))  # (T, B, F) time-major
    f1, b1 = bilstm_fused((xt,), params["encoder"], interpret=interpret)
    f2, b2 = bilstm_fused((f1, b1), params["decoder"], interpret=interpret)

    T = xt.shape[0]
    w1 = params["linear_1"]["w"]          # (T*2H, L), rows t-major [fwd|bwd]
    H = w1.shape[0] // (2 * T)
    w1 = w1.reshape(T, 2 * H, -1)
    x = (jnp.einsum("tbh,thl->bl", f2, w1[:, :H])
         + jnp.einsum("tbh,thl->bl", b2, w1[:, H:])
         + params["linear_1"]["b"])

    x = jax.nn.selu(x)
    for name in ["linear_2", "linear_3", "linear_4", "linear_5"]:
        x = jax.nn.selu(linear(x, params[name]))
    return linear(x, params["output_layer_type"])


def transducer_apply(params, x, *, train=False, rng=None):
    """Reference-equivalent forward: logits in train mode, softmax otherwise
    (simple_model.py:78-82)."""
    logits = transducer_logits(params, x, train=train, rng=rng)
    if train:
        return logits
    return jax.nn.softmax(logits.astype(jnp.float32), axis=1)


@partial(jax.jit, static_argnames=("compute_dtype",))
def transducer_infer(params, x, compute_dtype=jnp.float32):
    """Jitted inference step: casts inputs/params to compute_dtype (e.g.
    bfloat16 for serving) and returns float32 class probabilities."""
    params = jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params)
    x = x.astype(compute_dtype)
    return transducer_apply(params, x, train=False)
