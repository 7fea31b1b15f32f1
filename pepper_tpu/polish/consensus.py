"""Consensus inference: hidden-state-carry sliding windows as a lax.scan.

Reference semantics (pepper/modules/python/models/predict_distributed_cpu.py
:42-100): zero hidden (B, 2, 128); for i in range(0, 1000, 50) with window
100: logits, hidden = model(image[:, i:i+100], hidden); softmax votes
accumulate into a (B, 1000, 5) tensor; labels = argmax; phred from the vote
fraction with counts 2 in the interior and 1 in the 50-base edges.

TPU-native: the window loop IS the scan (hidden as carry), the overlap vote
is a static scatter-add via zero-padding inside the scan body — one jit,
no host round-trips per window.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.polish_gru import polish_forward
from ..options import PolishImageOptions

SEQ_LENGTH = PolishImageOptions.SEQ_LENGTH          # 1000
SEQ_OVERLAP = PolishImageOptions.SEQ_OVERLAP        # 50
TRAIN_WINDOW = 100
WINDOW_JUMP = 50


@partial(jax.jit, static_argnames=("num_classes",))
def consensus_scan(params, images, num_classes=5):
    """images: (B, SEQ_LENGTH, F) float.
    Returns (votes (B, SEQ_LENGTH, C) float32, labels (B, SEQ_LENGTH) int32,
    phred (B, SEQ_LENGTH) float32)."""
    B = images.shape[0]
    hidden0 = jnp.zeros((B, 2, 128), images.dtype)
    starts = np.arange(0, SEQ_LENGTH - TRAIN_WINDOW + 1, WINDOW_JUMP)

    # pre-gather the overlapping windows: (n_windows, B, TRAIN_WINDOW, F)
    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(images, int(s), TRAIN_WINDOW, axis=1)
         for s in starts])
    offsets = jnp.asarray(starts, jnp.int32)

    from ..ops.gru_kernel import use_fused_gru

    if (use_fused_gru() and TRAIN_WINDOW == 2 * WINDOW_JUMP
            and (len(starts) + 1) * WINDOW_JUMP == SEQ_LENGTH):
        # Fused-kernel path: time-major windows, scan emits the stacked
        # per-window probabilities, and the overlap-add happens once at the
        # end as two shifted half-window concatenations (window i covers
        # [50i, 50i+100), so segment j of 50 = window j's first half +
        # window j-1's second half) — instead of a (B, SEQ, C)-sized
        # zero/update/add pass per window.
        from ..models.polish_gru import polish_forward_fused

        windows_tm = jnp.transpose(windows, (0, 2, 1, 3))  # (n, W, B, F)

        def body_fused(hidden, window):
            logits, hidden = polish_forward_fused(params, window, hidden)
            return hidden, jax.nn.softmax(logits.astype(jnp.float32), axis=2)

        hidden, probs = jax.lax.scan(body_fused, hidden0, windows_tm)
        # probs: (n_windows, TRAIN_WINDOW, B, C)
        half = WINDOW_JUMP
        zeros_seg = jnp.zeros((1, half, B, num_classes), jnp.float32)
        votes_seg = (jnp.concatenate([probs[:, :half], zeros_seg], axis=0)
                     + jnp.concatenate([zeros_seg, probs[:, half:]], axis=0))
        votes = votes_seg.reshape(SEQ_LENGTH, B, num_classes)
        votes = jnp.transpose(votes, (1, 0, 2))

        base_values = jnp.max(votes, axis=2)
        labels = jnp.argmax(votes, axis=2).astype(jnp.int32)
        counts = jnp.ones((B, SEQ_LENGTH - 2 * SEQ_OVERLAP), jnp.float32)
        counts = jnp.pad(counts, ((0, 0), (SEQ_OVERLAP, SEQ_OVERLAP))) + 1.0
        fraction = base_values / counts
        phred = -10.0 * jnp.log10(jnp.maximum(1e-30, 1.0 - fraction))
        phred = jnp.where(fraction >= 1.0, 100.0, phred)
        return votes, labels, phred

    def body(carry, inputs):
        hidden, votes = carry
        window, offset = inputs
        logits, hidden = polish_forward(params, window, hidden,
                                        allow_kernel=True)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=2)
        padded = jnp.zeros((B, SEQ_LENGTH, num_classes), jnp.float32)
        padded = jax.lax.dynamic_update_slice_in_dim(padded, probs, offset,
                                                     axis=1)
        return (hidden, votes + padded), ()

    votes0 = jnp.zeros((B, SEQ_LENGTH, num_classes), jnp.float32)
    (hidden, votes), _ = jax.lax.scan(body, (hidden0, votes0),
                                      (windows, offsets))

    base_values = jnp.max(votes, axis=2)
    labels = jnp.argmax(votes, axis=2).astype(jnp.int32)
    counts = jnp.ones((B, SEQ_LENGTH - 2 * SEQ_OVERLAP), jnp.float32)
    counts = jnp.pad(counts, ((0, 0), (SEQ_OVERLAP, SEQ_OVERLAP))) + 1.0
    fraction = base_values / counts
    phred = -10.0 * jnp.log10(jnp.maximum(1e-30, 1.0 - fraction))
    phred = jnp.where(fraction >= 1.0, 100.0, phred)
    return votes, labels, phred


@partial(jax.jit, static_argnames=("num_classes",))
def consensus_scan_static(q, images, num_classes=5):
    """Static-int8 consensus (the round-3 exact-1/127 trick applied to the
    polish GRU — models/quantize.py polish_forward_static): same sliding-
    window scan and overlap-add as consensus_scan, logits from the int8
    serving tree.  images: (B, SEQ_LENGTH, F) float."""
    from ..models.quantize import polish_forward_static

    B = images.shape[0]
    hidden0 = jnp.zeros((B, 2, 128), jnp.float32)
    starts = np.arange(0, SEQ_LENGTH - TRAIN_WINDOW + 1, WINDOW_JUMP)
    assert (TRAIN_WINDOW == 2 * WINDOW_JUMP
            and (len(starts) + 1) * WINDOW_JUMP == SEQ_LENGTH)
    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(images, int(s), TRAIN_WINDOW, axis=1)
         for s in starts])
    windows_tm = jnp.transpose(windows, (0, 2, 1, 3))  # (n, W, B, F)

    def body(hidden, window):
        logits, hidden = polish_forward_static(q, window, hidden,
                                               compute_dtype=window.dtype)
        return hidden, jax.nn.softmax(logits, axis=2)

    _, probs = jax.lax.scan(body, hidden0, windows_tm)
    half = WINDOW_JUMP
    zeros_seg = jnp.zeros((1, half, B, num_classes), jnp.float32)
    votes_seg = (jnp.concatenate([probs[:, :half], zeros_seg], axis=0)
                 + jnp.concatenate([zeros_seg, probs[:, half:]], axis=0))
    votes = jnp.transpose(votes_seg.reshape(SEQ_LENGTH, B, num_classes),
                          (1, 0, 2))
    base_values = jnp.max(votes, axis=2)
    labels = jnp.argmax(votes, axis=2).astype(jnp.int32)
    counts = jnp.ones((B, SEQ_LENGTH - 2 * SEQ_OVERLAP), jnp.float32)
    counts = jnp.pad(counts, ((0, 0), (SEQ_OVERLAP, SEQ_OVERLAP))) + 1.0
    fraction = base_values / counts
    phred = -10.0 * jnp.log10(jnp.maximum(1e-30, 1.0 - fraction))
    phred = jnp.where(fraction >= 1.0, 100.0, phred)
    return votes, labels, phred


def dry_consensus_labels(images: np.ndarray):
    """Deterministic model-free backend (polish analog of the variant-mode
    --dry fixture): per-position dominant observation from the image itself.
    Channels (summary.get_feature_index): rev A..T -> 0..3, fwd A..T ->
    4..7, gap rev/fwd -> 8/9.  Label 1..4 = ACGT, 0 = gap."""
    images = images.astype(np.float32)
    base_votes = images[..., 0:4] + images[..., 4:8]        # (N, L, 4)
    gap_votes = images[..., 8] + images[..., 9]             # (N, L)
    best_base = np.argmax(base_votes, axis=-1)              # 0..3
    best_votes = np.max(base_votes, axis=-1)
    labels = np.where(gap_votes > best_votes, 0, best_base + 1)
    # all-zero columns (padding) decode to 0
    labels = np.where((base_votes.sum(-1) + gap_votes) == 0, 0, labels)
    phred = np.full(labels.shape, 60.0, np.float32)
    return labels.astype(np.int32), phred


_static_tree_cache: list = []


def _static_tree_cached(params):
    """Single-entry memo of the static-int8 serving tree keyed on the host
    params' identity, so per-file predict calls reuse one device tree (and
    replicate_cached sees a stable object under a mesh)."""
    if _static_tree_cache and _static_tree_cache[0][0] is params:
        return _static_tree_cache[0][1]
    from ..models.quantize import polish_quantize_params_static

    q = jax.tree_util.tree_map(jnp.asarray,
                               polish_quantize_params_static(params))
    _static_tree_cache[:] = [(params, q)]
    return q


def consensus_predict(params, images: np.ndarray, batch_size: int = 512,
                      compute_dtype=jnp.float32, mesh=None,
                      quantize_mode: str | None = None):
    """Batched host wrapper: (N, 1000, 10) uint8 images -> (labels, phred)
    numpy arrays, padding the final batch so jit compiles once.

    With a mesh, the chunk batch axis is sharded over the mesh's data axis
    and the params are replicated — the TPU equivalent of the reference
    fanning polish consensus over every CUDA device
    (pepper/modules/python/models/predict_distributed_gpu.py:39-70).  The
    hidden carry is per-sequence, so batch DP is exact: sharded and
    single-device runs produce identical labels/phred.

    quantize_mode="static": serve through the exact-1/127 int8 tree
    (consensus_scan_static; the reference's own quantized-serving
    recommendation, CallVariantsArguments.py:204-208)."""
    n = len(images)
    if n == 0:
        return (np.zeros((0, SEQ_LENGTH), np.int32),
                np.zeros((0, SEQ_LENGTH), np.float32))
    scan_fn = consensus_scan
    if quantize_mode == "static":
        params = _static_tree_cached(params)
        scan_fn = consensus_scan_static
    elif quantize_mode not in (None, "", "none", "off"):
        raise ValueError(
            f"unsupported polish quantize_mode: {quantize_mode!r}")
    n_devices = 1
    if mesh is not None:
        from ..parallel.mesh import replicate_cached, shard_batch

        n_devices = len(mesh.devices.ravel())
        batch_size = -(-batch_size // n_devices) * n_devices
        params = replicate_cached(mesh, params)
    all_labels = np.zeros((n, SEQ_LENGTH), np.int32)
    all_phred = np.zeros((n, SEQ_LENGTH), np.float32)
    for start in range(0, n, batch_size):
        chunk = images[start:start + batch_size]
        # pad to a power-of-two bucket (≤ batch_size) so small runs don't
        # pay a full batch while jit still compiles at most once per
        # bucket; under a mesh the bucket also rounds up to a device
        # multiple so every shard is non-empty and equal-sized
        bucket = 32
        while bucket < len(chunk):
            bucket *= 2
        bucket = min(bucket, batch_size)
        bucket = -(-bucket // n_devices) * n_devices
        padded = np.zeros((bucket, SEQ_LENGTH, images.shape[2]),
                          np.float32)
        padded[:len(chunk)] = chunk
        device_batch = jnp.asarray(padded, compute_dtype)
        if mesh is not None:
            device_batch = shard_batch(mesh, device_batch)
        _, labels, phred = scan_fn(params, device_batch)
        all_labels[start:start + len(chunk)] = np.asarray(
            labels)[:len(chunk)]
        all_phred[start:start + len(chunk)] = np.asarray(phred)[:len(chunk)]
    return all_labels, all_phred
