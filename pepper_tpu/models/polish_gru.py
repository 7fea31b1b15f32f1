"""Assembly-polishing consensus model: a true bidirectional GRU transducer
with explicit hidden state in/out (reference pepper/modules/python/models/
simple_model.py:5-49).

  encoder: biGRU(10 -> 128), initial hidden = the carried hidden state
  decoder: biGRU(256 -> 128), initial hidden = encoder's final hidden
  head:    Linear(256 -> 5) per timestep (logits; softmax applied by caller)

The hidden tensor layout is (B, 2, H): [:, 0] forward, [:, 1] backward —
matching the torch model's transpose of (num_directions, B, H).  Carrying
it across 100-wide windows sliding by 50 is the reference's sequence-length
scaling mechanism (SURVEY §5.7); on TPU the window loop is a lax.scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .rnn import gru_scan, init_gru_params, init_linear_params, linear

from ..options import PolishImageOptions


@dataclass(frozen=True)
class PolishConfig:
    image_features: int = PolishImageOptions.IMAGE_HEIGHT   # 10
    hidden: int = PolishImageOptions.HIDDEN_SIZE            # 128
    num_classes: int = PolishImageOptions.TOTAL_LABELS      # 5


def init_polish_params(key, config: PolishConfig = PolishConfig(),
                       dtype=jnp.float32):
    keys = jax.random.split(key, 3)
    H = config.hidden
    return {
        "encoder": init_gru_params(keys[0], config.image_features, H, dtype),
        "decoder": init_gru_params(keys[1], 2 * H, H, dtype),
        "output": init_linear_params(keys[2], 2 * H, config.num_classes,
                                     dtype),
    }


def init_hidden(batch_size: int, hidden: int = 128, dtype=jnp.float32):
    return jnp.zeros((batch_size, 2, hidden), dtype)


def _bigru_with_hidden(x, params, h0, allow_kernel=False):
    """h0: (B, 2, H) -> outputs (B, T, 2H), hidden_out (B, 2, H)."""
    if allow_kernel:
        from ..ops.gru_kernel import gru_direction_pallas, use_pallas_gru

        if use_pallas_gru():
            fwd, hf = gru_direction_pallas(
                x, params["w_ih_f"], params["w_hh_f"], params["b_ih_f"],
                params["b_hh_f"], h0[:, 0])
            bwd, hb = gru_direction_pallas(
                x, params["w_ih_b"], params["w_hh_b"], params["b_ih_b"],
                params["b_hh_b"], h0[:, 1], reverse=True)
            return (jnp.concatenate([fwd, bwd], axis=-1),
                    jnp.stack([hf, hb], axis=1))
    fwd, hf = gru_scan(x, params["w_ih_f"], params["w_hh_f"],
                       params["b_ih_f"], params["b_hh_f"], h0=h0[:, 0])
    bwd, hb = gru_scan(x, params["w_ih_b"], params["w_hh_b"],
                       params["b_ih_b"], params["b_hh_b"], h0=h0[:, 1],
                       reverse=True)
    out = jnp.concatenate([fwd, bwd], axis=-1)
    hidden_out = jnp.stack([hf, hb], axis=1)
    return out, hidden_out


def polish_forward_fused(params, xt, hidden, interpret=False):
    """Time-major fused-Pallas forward (inference only, no VJP).

    xt: (T, B, F); hidden: (B, 2, H).  The encoder/decoder input
    projections run inside the GRU kernels, the encoder->decoder handoff
    passes fwd/bwd as separate feature parts (no concat materializes), and
    the per-timestep head splits output.w into fwd/bwd halves so everything
    stays time-major.  Returns (logits (T, B, C), hidden_final (B, 2, H))."""
    from ..ops.gru_kernel import bigru_fused

    f1, b1, hid1 = bigru_fused((xt,), params["encoder"], hidden,
                               interpret=interpret)
    f2, b2, hid_final = bigru_fused((f1, b1), params["decoder"], hid1,
                                    interpret=interpret)
    w = params["output"]["w"]                    # (2H, C)
    H = f2.shape[-1]
    logits = (jnp.einsum("tbh,hc->tbc", f2, w[:H])
              + jnp.einsum("tbh,hc->tbc", b2, w[H:])
              + params["output"]["b"])
    return logits, hid_final


def polish_forward(params, x, hidden, allow_kernel=False):
    """x: (B, T, F) float, hidden: (B, 2, H).
    Returns (logits (B, T, num_classes), hidden_final (B, 2, H)).
    allow_kernel routes the recurrence to the fused Pallas GRU on TPU —
    inference only (no VJP); training keeps the lax.scan."""
    if allow_kernel:
        from ..ops.gru_kernel import use_fused_gru

        if use_fused_gru():
            xt = jnp.transpose(x, (1, 0, 2))
            logits, hidden_final = polish_forward_fused(params, xt, hidden)
            return jnp.transpose(logits, (1, 0, 2)), hidden_final
    x, hidden_out = _bigru_with_hidden(x, params["encoder"], hidden,
                                       allow_kernel)
    x, hidden_final = _bigru_with_hidden(x, params["decoder"], hidden_out,
                                         allow_kernel)
    logits = linear(x, params["output"])
    return logits, hidden_final
