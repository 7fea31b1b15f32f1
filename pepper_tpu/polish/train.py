"""Polish-model training: truncated backprop through time over sliding
windows.

Reference semantics (pepper/modules/python/models/train.py:124-166): for
each 1000-column chunk, windows of 100 sliding by 50; per window: forward
with carried hidden, weighted CrossEntropyLoss (mean), backward, optimizer
step, then hidden.detach().  The reference's live DDP variant
(train_distributed.py:254-283, gloo single-node) maps to jit-over-Mesh data
parallelism here: params replicated, chunk batch sharded, XLA all-reduces
the per-window gradients.

TPU-native shape: the whole per-chunk window loop (19 windows x forward/
backward/update) runs as ONE lax.scan inside ONE jit — the optimizer state
and hidden carry travel through the scan carry, so a chunk is a single
device dispatch.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.checkpoint import save_params
from ..models.polish_gru import init_polish_params, polish_forward
from ..options import PolishImageOptions
from ..parallel.mesh import (get_mesh, host_batch_rows, make_global_batch,
                             pad_to_multiple, replicate, shard_batch)
from ..pipeline.regions import log_info
from .consensus import SEQ_LENGTH, TRAIN_WINDOW, WINDOW_JUMP

CLASS_WEIGHTS = jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0])
TEST_CLASS_WEIGHTS = jnp.asarray([0.3, 1.0, 1.0, 1.0, 1.0])


def weighted_cross_entropy_mean(logits, labels, class_weights, mask=None):
    """torch.nn.CrossEntropyLoss(weight=w) semantics: per-example weighted
    NLL averaged by the SUM OF WEIGHTS of the targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    weights = class_weights[labels]
    if mask is not None:
        weights = weights * mask
    return jnp.sum(nll * weights) / jnp.maximum(1e-9, jnp.sum(weights))


def make_tbptt_step(optimizer, mesh=None):
    """(params, opt_state, images (B,1000,F), labels (B,1000), mask (B,)) ->
    (params, opt_state, total_loss)."""
    starts = np.arange(0, SEQ_LENGTH - TRAIN_WINDOW + 1, WINDOW_JUMP)

    def window_loss(params, window, label_chunk, hidden, mask):
        logits, hidden_out = polish_forward(params, window, hidden)
        loss = weighted_cross_entropy_mean(
            logits.reshape(-1, logits.shape[-1]), label_chunk.reshape(-1),
            CLASS_WEIGHTS,
            mask=jnp.repeat(mask, label_chunk.shape[1]))
        return loss, hidden_out

    def step(params, opt_state, images, labels, mask):
        B = images.shape[0]
        hidden0 = jnp.zeros((B, 2, PolishImageOptions.HIDDEN_SIZE),
                            images.dtype)
        windows = jnp.stack([images[:, s:s + TRAIN_WINDOW] for s in starts])
        label_windows = jnp.stack(
            [labels[:, s:s + TRAIN_WINDOW] for s in starts])

        def body(carry, inputs):
            params, opt_state, hidden = carry
            window, label_chunk = inputs
            (loss, hidden_out), grads = jax.value_and_grad(
                window_loss, has_aux=True)(
                params, window, label_chunk,
                jax.lax.stop_gradient(hidden), mask)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, hidden_out), loss

        (params, opt_state, _), losses = jax.lax.scan(
            body, (params, opt_state, hidden0), (windows, label_windows))
        return params, opt_state, jnp.sum(losses)

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    return jax.jit(step,
                   in_shardings=(replicated, replicated, sharded, sharded,
                                 sharded),
                   out_shardings=(replicated, replicated, replicated))


def make_polish_eval_step(mesh=None, num_classes=5):
    def step(params, images, labels, mask):
        B = images.shape[0]
        hidden = jnp.zeros((B, 2, PolishImageOptions.HIDDEN_SIZE),
                           images.dtype)
        logits, _ = polish_forward(params, images, hidden)
        loss = weighted_cross_entropy_mean(
            logits.reshape(-1, num_classes), labels.reshape(-1),
            TEST_CLASS_WEIGHTS, mask=jnp.repeat(mask, labels.shape[1]))
        preds = jnp.argmax(logits, axis=-1)
        flat_mask = jnp.repeat(mask, labels.shape[1]).astype(jnp.int32)
        confusion = jnp.zeros((num_classes, num_classes), jnp.int32)
        confusion = confusion.at[labels.reshape(-1),
                                 preds.reshape(-1)].add(flat_mask)
        return loss, confusion

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    return jax.jit(step,
                   in_shardings=(replicated, sharded, sharded, sharded),
                   out_shardings=(replicated, replicated))


def load_polish_images(image_dir: str):
    from .datastore import PolishImageStore

    images, labels = [], []
    files = sorted(os.path.join(image_dir, f) for f in os.listdir(image_dir)
                   if f.endswith((".hdf", ".hdf5", ".h5")))
    for path in files:
        with PolishImageStore(path, "r") as store:
            for name in store.summary_names():
                record = store.read_summary(name)
                images.append(record["image"].astype(np.float32))
                labels.append(record["label"].astype(np.int32))
    if not images:
        raise ValueError(f"no polish training images under {image_dir}")
    return np.stack(images), np.stack(labels)


def evaluate_polish_model(params, images, labels, *, batch_size: int = 16,
                          mesh=None):
    """Loss/confusion/accuracy of a polish checkpoint over labeled chunks —
    the reference's pepper test_models.py / models/test.py role (weighted
    CE with TEST_CLASS_WEIGHTS, 5-class confusion matrix, accuracy =
    trace/sum)."""
    if mesh is None:
        mesh = get_mesh()
    n_devices = len(mesh.devices.ravel())
    params = replicate(mesh, params)
    eval_step = make_polish_eval_step(mesh=mesh)
    total_loss = 0.0
    confusion = np.zeros((5, 5), np.int64)
    for start in range(0, len(images), batch_size):
        imgs, n = pad_to_multiple(
            images[start:start + batch_size].astype(np.float32), n_devices)
        lbls, _ = pad_to_multiple(
            labels[start:start + batch_size].astype(np.int32), n_devices)
        mask = np.zeros(len(lbls), np.float32)
        mask[:n] = 1.0
        loss, conf = eval_step(params, imgs, lbls, mask)
        total_loss += float(loss)
        confusion += np.asarray(conf)
    accuracy = 100.0 * np.trace(confusion) / max(1, confusion.sum())
    return {"loss": total_loss, "confusion": confusion,
            "accuracy": float(accuracy)}


def test_polish_model(options, image_dir: str, model_path: str, *,
                      batch_size: int = 16):
    """CLI entry: evaluate one checkpoint on an image directory."""
    from ..models.checkpoint import load_params

    images, labels = load_polish_images(image_dir)
    params, _ = load_params(model_path)
    result = evaluate_polish_model(params, images, labels,
                                   batch_size=batch_size)
    log_info(f"TEST LOSS: {result['loss']:.4f} "
             f"ACCURACY: {result['accuracy']:.2f}")
    log_info("CONFUSION MATRIX (rows=truth *ACGT, cols=pred):\n"
             + str(result["confusion"]))
    return result


def run_polish_hyperband(options, image_dir: str, output_dir: str, *,
                         max_iter: int = 27, eta: int = 3, seed: int = 0,
                         batch_size: int = 16):
    """Hyperband lr/l2 search over the polish TBPTT trainer — the
    reference's pepper run_hyperband.py:20-168 role, sharing the variant
    package's successive-halving engine (train/hyperband.py)."""
    from ..train.hyperband import Hyperband

    os.makedirs(output_dir, exist_ok=True)

    def try_params(n_iterations, config):
        run_dir = os.path.join(output_dir, f"hb_{config['_id']}")
        checkpoint = train_polish_model(
            options, image_dir, run_dir, epochs=int(n_iterations),
            learning_rate=config["learning_rate"],
            weight_decay=config["weight_decay"], batch_size=batch_size,
            seed=seed)
        from ..models.checkpoint import load_params

        params, _ = load_params(checkpoint)
        images, labels = load_polish_images(image_dir)
        result = evaluate_polish_model(params, images, labels,
                                       batch_size=batch_size)
        return {"loss": result["loss"], "accuracy": result["accuracy"],
                "checkpoint": checkpoint}

    best = Hyperband(try_params, max_iter=max_iter, eta=eta,
                     seed=seed).run()
    log_info(f"HYPERBAND BEST: acc={best['accuracy']:.3f} "
             f"config={best['config']} checkpoint={best['checkpoint']}")
    return best


def train_polish_model(options, image_dir: str, output_dir: str, *,
                       epochs: int = 10, learning_rate: float = 1e-4,
                       weight_decay: float = 0.0, batch_size: int = 16,
                       holdout_fraction: float = 0.2, seed: int = 0):
    os.makedirs(output_dir, exist_ok=True)
    images, labels = load_polish_images(image_dir)
    log_info(f"TOTAL TRAINING CHUNKS: {len(images)}")

    rng = np.random.RandomState(seed)
    order = rng.permutation(len(images))
    n_test = max(1, int(len(images) * holdout_fraction))
    test_idx, train_idx = order[:n_test], order[n_test:]
    if len(train_idx) == 0:
        train_idx = test_idx

    # get_mesh() spans all processes' devices under jax.distributed —
    # multi-host TBPTT training (the TPU equivalent of the reference's
    # LIVE polish DDP loop, pepper/.../models/train_distributed.py:254-283):
    # per-host chunk-batch slices, cross-host psum, rank-0 checkpoints
    mesh = get_mesh()
    n_devices = len(mesh.devices.ravel())
    process_index = jax.process_index()
    process_count = jax.process_count()
    if process_count > 1:
        log_info(f"MULTI-HOST POLISH TRAINING: host {process_index}/"
                 f"{process_count}, {n_devices} global devices")

    def shard_chunks(imgs, lbls, mask):
        if process_count > 1:
            imgs = host_batch_rows(imgs, process_index, process_count)
            lbls = host_batch_rows(lbls, process_index, process_count)
            mask = host_batch_rows(mask, process_index, process_count)
        return (make_global_batch(mesh, imgs), make_global_batch(mesh, lbls),
                make_global_batch(mesh, mask))

    params = init_polish_params(jax.random.PRNGKey(seed))
    optimizer = optax.chain(optax.add_decayed_weights(weight_decay),
                            optax.adam(learning_rate))
    opt_state = optimizer.init(params)
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    tbptt_step = make_tbptt_step(optimizer, mesh=mesh)
    eval_step = make_polish_eval_step(mesh=mesh)

    def run_eval():
        total_loss = 0.0
        confusion = np.zeros((5, 5), np.int64)
        for start in range(0, len(test_idx), batch_size):
            index = test_idx[start:start + batch_size]
            imgs, n = pad_to_multiple(images[index], n_devices)
            lbls, _ = pad_to_multiple(labels[index], n_devices)
            mask = np.zeros(len(lbls), np.float32)
            mask[:n] = 1.0
            imgs, lbls, mask = shard_chunks(imgs.astype(np.float32),
                                            lbls.astype(np.int32), mask)
            loss, conf = eval_step(params, imgs, lbls, mask)
            total_loss += float(loss)
            confusion += np.asarray(conf)
        accuracy = 100.0 * np.trace(confusion) / max(1, confusion.sum())
        return total_loss, confusion, accuracy

    for epoch in range(epochs):
        epoch_loss = 0.0
        perm = rng.permutation(train_idx)
        for start in range(0, len(perm), batch_size):
            index = perm[start:start + batch_size]
            imgs, n = pad_to_multiple(images[index], n_devices)
            lbls, _ = pad_to_multiple(labels[index], n_devices)
            mask = np.zeros(len(lbls), np.float32)
            mask[:n] = 1.0
            imgs, lbls, mask = shard_chunks(imgs, lbls, mask)
            params, opt_state, loss = tbptt_step(params, opt_state, imgs,
                                                 lbls, mask)
            epoch_loss += float(loss)
        test_loss, confusion, accuracy = run_eval()
        log_info(f"EPOCH {epoch + 1} TRAIN LOSS: {epoch_loss:.4f} "
                 f"TEST LOSS: {test_loss:.4f} ACCURACY: {accuracy:.2f}")
        host_params = jax.tree_util.tree_map(np.asarray, params)
        if process_index == 0:
            save_params(os.path.join(
                output_dir, f"polish_epoch_{epoch + 1}_checkpoint.npz"),
                host_params,
                {"epochs": epoch + 1, "accuracy": float(accuracy),
                 "hidden_size": PolishImageOptions.HIDDEN_SIZE,
                 "gru_layers": 1})
    final_path = os.path.join(output_dir, "polish_model_final.npz")
    if process_index == 0:
        save_params(final_path, jax.tree_util.tree_map(np.asarray, params),
                    {"epochs": epochs,
                     "hidden_size": PolishImageOptions.HIDDEN_SIZE,
                     "gru_layers": 1})
    return final_path
