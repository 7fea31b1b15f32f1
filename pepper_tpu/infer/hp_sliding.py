"""Legacy HP sliding-window predictor: the r0.7-era `--use_hp_info`
inference flow (pepper_variant/modules/python/models/
predict_hp_distributed_cpu.py:30-120 and predict_hp_distributed_gpu.py).

Reference semantics: per 1000-column haplotype image pair, a GRU
transducer with explicit hidden carry is slid over windows of
TRAIN_WINDOW=100 with WINDOW_JUMP=50 (Options.py:83-90); each window's
softmax is scaled by ×10000, truncated to int, zero-padded to the full
sequence length, and accumulated per haplotype
(predict_hp_distributed_cpu.py:54-95).  The integer-scaled accumulation
makes overlap votes exactly reproducible — kept here for deterministic
multi-host merges (SURVEY §7.3).

TPU-native: the window loop is one `jax.lax.scan` with the hidden state as
carry and the zero-pad + add as a static `dynamic_update_slice` scatter —
one dispatch per batch instead of one ONNX call per window per haplotype.
The per-haplotype model is the polish GRU transducer shape
(models/polish_gru.py) parameterized to the HP feature/class sizes; the
downstream consumer is decode/hp_legacy.py's CandidateFinderHP.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.polish_gru import polish_forward

TRAIN_WINDOW = 100     # TrainOptions.TRAIN_WINDOW (Options.py:84)
WINDOW_JUMP = 50       # TrainOptions.WINDOW_JUMP (Options.py:85)
VOTE_SCALE = 10000     # predict_hp_distributed_cpu.py:88


@partial(jax.jit, static_argnames=("allow_kernel",))
def hp_votes_scan(params, images, allow_kernel=True):
    """images: (B, L, F) float, L a multiple of WINDOW_JUMP.
    Returns int32 (B, L, C) accumulated ×10000 softmax votes, matching the
    reference's window loop (`for i in range(0, L, 50): if i+100 > L: break`)
    with hidden state carried across windows.  The hidden size is derived
    from the recurrent weights, so it can never desync from the params."""
    B, L, _ = images.shape
    C = params["output"]["w"].shape[1]
    hidden_size = params["encoder"]["w_hh_f"].shape[0]
    hidden0 = jnp.zeros((B, 2, hidden_size), images.dtype)
    starts = np.arange(0, L - TRAIN_WINDOW + 1, WINDOW_JUMP)
    if len(starts) == 0:
        # sequence shorter than one window: the reference loop breaks before
        # its first iteration, leaving all-zero votes
        return jnp.zeros((B, L, C), jnp.int32)

    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(images, int(s), TRAIN_WINDOW, axis=1)
         for s in starts])
    offsets = jnp.asarray(starts, jnp.int32)

    def body(carry, inputs):
        hidden, votes = carry
        window, offset = inputs
        logits, hidden = polish_forward(params, window, hidden,
                                        allow_kernel=allow_kernel)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=2)
        chunk = (probs * VOTE_SCALE).astype(jnp.int32)   # truncation, as torch
        padded = jnp.zeros((B, L, C), jnp.int32)
        padded = jax.lax.dynamic_update_slice_in_dim(padded, chunk, offset,
                                                     axis=1)
        return (hidden, votes + padded), ()

    votes0 = jnp.zeros((B, L, C), jnp.int32)
    (_, votes), _ = jax.lax.scan(body, (hidden0, votes0), (windows, offsets))
    return votes


def predict_hp(params, images_hp1, images_hp2, allow_kernel=True,
               mesh=None):
    """Both haplotype image stacks through the shared model (the reference
    runs one ONNX session for both, predict_hp_distributed_cpu.py:63-73).
    Returns (votes_hp1, votes_hp2) int32 (B, L, C) numpy arrays.

    With a mesh, each haplotype batch is sharded over the data axis with
    replicated params — the multi-accelerator fan-out of
    predict_hp_distributed_gpu.py, exact under batch DP because the hidden
    carry is per-sequence and the votes are integer-scaled."""
    if mesh is None:
        v1 = hp_votes_scan(params, images_hp1, allow_kernel=allow_kernel)
        v2 = hp_votes_scan(params, images_hp2, allow_kernel=allow_kernel)
        return np.asarray(v1), np.asarray(v2)

    from ..parallel.mesh import (pad_to_multiple, replicate_cached,
                                 shard_batch)

    n_devices = len(mesh.devices.ravel())
    params = replicate_cached(mesh, params)
    outputs = []
    for images in (images_hp1, images_hp2):
        padded, n = pad_to_multiple(np.asarray(images), n_devices)
        votes = hp_votes_scan(params, shard_batch(mesh, jnp.asarray(padded)),
                              allow_kernel=allow_kernel)
        outputs.append(np.asarray(votes)[:n])
    return outputs[0], outputs[1]
