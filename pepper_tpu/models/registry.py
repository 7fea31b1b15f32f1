"""Window-classifier model-family registry.

The reference's model layer ships several architectures
(simple_model.py, simple_model_no_cnn.py, simple_model_transformers.py —
SURVEY.md §2.2) but hardwires the live path to one.  Here every family is
selectable end-to-end: `train_model --model_type`, checkpoints record the
family in their metadata, and inference auto-detects it
(infer/runner.py), so experiments are one flag instead of a code edit.

Each family provides a uniform surface:
  init(key)                      -> params pytree
  logits(params, x, train, rng)  -> (B, 3) logits
  infer(params, x, compute_dtype) -> (B, 3) float32 probabilities (jitted)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from ..options import ImageOptions

MODEL_TYPES = ("lstm", "no_cnn", "transformer")


@dataclass(frozen=True)
class ModelFamily:
    name: str
    init: Callable
    logits: Callable
    infer: Callable
    # optional post-training calibration (e.g. folding BatchNorm running
    # stats from a representative batch into the params)
    calibrate: Callable | None = None


def _make_infer(logits_fn):
    @jax.jit
    def infer_f32(params, x):
        return jax.nn.softmax(
            logits_fn(params, x, False, None).astype(jnp.float32), axis=1)

    @jax.jit
    def infer_bf16(params, x):
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
        logits = logits_fn(params, x.astype(jnp.bfloat16), False, None)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=1)

    def infer(params, x, compute_dtype=jnp.float32):
        if compute_dtype == jnp.bfloat16:
            return infer_bf16(params, x)
        return infer_f32(params, x)

    return infer


def make_family(name: str,
                image_features: int = ImageOptions.IMAGE_HEIGHT,
                window: int = ImageOptions.CANDIDATE_WINDOW_SIZE + 1,
                ) -> ModelFamily:
    """Build a family bound to concrete image dimensions (26x33 variant
    mode, 48x21 HP mode)."""
    if name == "lstm":
        from .transducer import (TransducerConfig, init_transducer_params,
                                 transducer_infer, transducer_logits)

        config = TransducerConfig(image_features=image_features,
                                  window=window)

        def logits(params, x, train, rng):
            return transducer_logits(params, x, train=train, rng=rng)

        def infer(params, x, compute_dtype=jnp.float32):
            return transducer_infer(params, x, compute_dtype)

        return ModelFamily(
            name, lambda key: init_transducer_params(key, config), logits,
            infer)

    if name == "no_cnn":
        from .alternates import NoCnnConfig, init_no_cnn_params, no_cnn_logits

        config = NoCnnConfig(image_features=image_features, window=window)

        def logits(params, x, train, rng):
            return no_cnn_logits(params, x)

        return ModelFamily(
            name, lambda key: init_no_cnn_params(key, config), logits,
            _make_infer(logits))

    if name == "transformer":
        from .alternates import (TransformerConfig, init_transformer_params,
                                 transformer_calibrate_batchnorm,
                                 transformer_logits)

        config = TransformerConfig(image_features=image_features,
                                   window=window)

        def logits(params, x, train, rng):
            return transformer_logits(params, x, config=config, train=train,
                                      rng=rng)

        return ModelFamily(
            name, lambda key: init_transformer_params(key, config), logits,
            _make_infer(logits), calibrate=transformer_calibrate_batchnorm)

    raise ValueError(
        f"unknown model_type {name!r}; expected one of {MODEL_TYPES}")
