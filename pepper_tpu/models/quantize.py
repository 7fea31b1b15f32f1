"""Weight quantization for serving — the role of the reference's
`--quantized` ONNX dynamic QUInt8 mode (predict_distributed_cpu.py:188-193).

Weights are stored int8 with per-output-channel scales and dequantized to
the compute dtype inside the jitted forward (XLA fuses the dequant into the
matmul's operand read), halving checkpoint/HBM footprint for the weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_params(params):
    """float pytree -> {'q': int8 pytree, 'scale': float pytree}."""

    def quantize_leaf(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim < 2:
            # keep vectors (biases) in float — negligible size
            return leaf, None
        scale = np.maximum(np.abs(leaf).max(axis=0, keepdims=True),
                           1e-8) / 127.0
        q = np.clip(np.round(leaf / scale), -127, 127).astype(np.int8)
        return q, scale.astype(np.float32)

    flat, treedef = jax.tree_util.tree_flatten(params)
    quantized, scales = zip(*(quantize_leaf(x) for x in flat))
    return (jax.tree_util.tree_unflatten(treedef, quantized),
            jax.tree_util.tree_unflatten(treedef, scales))


def dequantize_params(quantized, scales, dtype=jnp.bfloat16):
    def dequantize_leaf(q, scale):
        if scale is None:
            return jnp.asarray(q, dtype)
        return jnp.asarray(q, dtype) * jnp.asarray(scale, dtype)

    return jax.tree_util.tree_map(
        dequantize_leaf, quantized, scales,
        is_leaf=lambda x: x is None or not isinstance(x, dict))


def transducer_infer_quantized(quantized, scales, x,
                               compute_dtype=jnp.bfloat16):
    """Jitted quantized inference: dequant fused into the forward."""
    from .transducer import transducer_apply

    @jax.jit
    def run(quantized, scales, x):
        params = dequantize_params(quantized, scales, compute_dtype)
        return transducer_apply(params, x.astype(compute_dtype), train=False)

    return run(quantized, scales, x)
