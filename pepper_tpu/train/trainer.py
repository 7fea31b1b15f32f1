"""Training loop for the window classifier.

Reference semantics (pepper_variant/.../models/train_distributed.py:107-228):
Adam + L2, CrossEntropyLoss(sum) over 3 type classes, eval every step_size
steps with a confusion matrix, checkpoints each eval, ReduceLROnPlateau on
accuracy (mode=max, patience=2).  TPU-native: jit training step over a data
mesh (params replicated, batch sharded, XLA all-reduces grads), native .npz
checkpoints, train_loss.csv/test_loss.csv/confusion matrix logs.
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

import jax
import numpy as np
import optax

from ..models.checkpoint import load_params, save_params
from ..models.transducer import TransducerConfig, init_transducer_params
from ..options import ImageOptions, ImageOptionsHP
from ..parallel.mesh import (get_mesh, host_batch_rows, make_global_batch,
                             pad_to_multiple, replicate)
from .data import batch_iterator, load_image_dir
from .step import make_eval_step, make_train_step


def _log(message: str) -> None:
    timestamp = datetime.now().strftime("%m-%d-%Y %H:%M:%S")
    sys.stderr.write(f"[{timestamp}] INFO: {message}\n")
    sys.stderr.flush()


class PlateauScheduler:
    """ReduceLROnPlateau('max', patience=2) equivalent
    (train_distributed.py:108)."""

    def __init__(self, lr: float, factor: float = 0.1, patience: int = 2,
                 min_lr: float = 0.0):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = -np.inf
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric > self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.min_lr, self.lr * self.factor)
                self.bad_epochs = 0
        return self.lr


def _pad_batch(images, labels, n_devices):
    padded_images, n = pad_to_multiple(images.astype(np.float32), n_devices)
    padded_labels, _ = pad_to_multiple(labels, n_devices)
    mask = np.zeros(len(padded_labels), np.float32)
    mask[:n] = 1.0
    return padded_images, padded_labels, mask


def evaluate(params, images, labels, eval_step, batch_size: int,
             n_devices: int, shard_fn=None):
    total_loss = 0.0
    confusion = np.zeros((3, 3), np.int64)
    for start in range(0, len(images), batch_size):
        padded_images, padded_labels, mask = _pad_batch(
            images[start:start + batch_size],
            labels[start:start + batch_size], n_devices)
        if shard_fn is not None:
            padded_images, padded_labels, mask = shard_fn(
                padded_images, padded_labels, mask)
        loss, conf = eval_step(params, padded_images, padded_labels, mask)
        total_loss += float(loss)
        confusion += np.asarray(conf)
    accuracy = (100.0 * np.trace(confusion) / max(1, confusion.sum()))
    return total_loss, confusion, accuracy


def train_model(options, image_dir: str, output_dir: str, *, epochs: int = 10,
                learning_rate: float = 1e-4, weight_decay: float = 0.0,
                step_size: int = 100, batch_size: int | None = None,
                retrain_model_path: str | None = None,
                test_file: str | None = None, holdout_fraction: float = 0.1,
                seed: int = 0, config: TransducerConfig | None = None,
                model_type: str = "lstm"):
    os.makedirs(output_dir, exist_ok=True)
    images, type_labels, _ = load_image_dir(image_dir)
    _log(f"TOTAL TRAINING EXAMPLES: {len(images)}")

    if test_file:
        test_images, test_labels, _ = load_image_dir(test_file)
    else:
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(images))
        n_test = max(1, int(len(images) * holdout_fraction))
        test_index, train_index = order[:n_test], order[n_test:]
        test_images, test_labels = images[test_index], type_labels[test_index]
        images, type_labels = images[train_index], type_labels[train_index]

    batch_size = batch_size or options.batch_size
    # get_mesh() spans jax.devices() — ALL devices, across every process
    # when jax.distributed is initialized.  Multi-host data-parallel
    # training (the TPU-native equivalent of the reference's DDP loop,
    # pepper/.../models/train_distributed.py:254-283) therefore needs no
    # separate step: params replicate over the global mesh and XLA's
    # gradient all-reduce (psum) rides ICI/DCN across hosts.  Every host
    # must load the SAME image_dir; each global batch is split into
    # per-host row slices (the DistributedSampler role) and reassembled
    # with jax.make_array_from_process_local_data.
    mesh = get_mesh()
    n_devices = len(mesh.devices.ravel())
    process_index = jax.process_index()
    process_count = jax.process_count()
    if process_count > 1:
        _log(f"MULTI-HOST TRAINING: host {process_index}/{process_count}, "
             f"{n_devices} global devices")

    def shard_train_batch(padded_images, padded_labels, mask):
        if process_count > 1:
            padded_images = host_batch_rows(padded_images, process_index,
                                            process_count)
            padded_labels = host_batch_rows(padded_labels, process_index,
                                            process_count)
            mask = host_batch_rows(mask, process_index, process_count)
        return (make_global_batch(mesh, padded_images),
                make_global_batch(mesh, padded_labels),
                make_global_batch(mesh, mask))

    if config is None:
        if options.use_hp_info:
            config = TransducerConfig(
                image_features=ImageOptionsHP.IMAGE_HEIGHT,
                window=ImageOptionsHP.CANDIDATE_WINDOW_SIZE + 1)
        else:
            config = TransducerConfig()

    family = None
    if model_type != "lstm":
        from ..models.registry import make_family

        family = make_family(model_type,
                             image_features=config.image_features,
                             window=config.window)

    if retrain_model_path:
        params, retrain_meta = load_params(retrain_model_path)
        params = jax.tree_util.tree_map(np.asarray, params)
        if retrain_meta.get("model_type", "lstm") != model_type:
            raise ValueError(
                f"checkpoint {retrain_model_path} is model_type "
                f"{retrain_meta.get('model_type', 'lstm')!r}, not "
                f"{model_type!r}")
        _log(f"RETRAINING FROM: {retrain_model_path}")
    elif model_type == "lstm":
        params = init_transducer_params(jax.random.PRNGKey(seed), config)
    else:
        params = family.init(jax.random.PRNGKey(seed))
        _log(f"MODEL FAMILY: {model_type}")

    scheduler = PlateauScheduler(learning_rate,
                                 min_lr=learning_rate * 0.75)

    # torch Adam(weight_decay) semantics: L2 added to the gradient BEFORE
    # the Adam moments (train_distributed.py:107), not decoupled AdamW.
    # BatchNorm running statistics (mean/var leaves) carry no gradient and
    # must not be decayed.
    def decay_mask(tree):
        def walk(node):
            return {k: (walk(v) if isinstance(v, dict)
                        else k not in ("mean", "var"))
                    for k, v in node.items()}
        return walk(tree)

    def make_optimizer(lr):
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.adam(lr))

    optimizer = optax.inject_hyperparams(
        lambda learning_rate: make_optimizer(learning_rate))(
        learning_rate=learning_rate)
    opt_state = optimizer.init(params)

    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    logits_fn = None if model_type == "lstm" else family.logits
    train_step = make_train_step(optimizer, mesh=mesh, logits_fn=logits_fn)
    eval_step = make_eval_step(mesh=mesh, logits_fn=logits_fn)

    # families with BatchNorm (transformer) carry no running-stat state in
    # the pure-functional trainer: fold calibration-batch statistics into
    # the params before every eval/checkpoint so inference-mode
    # normalization sees realistic stats instead of the init values
    calib_images = test_images[:min(len(test_images), 256)].astype(
        np.float32)

    def snapshot(train_params):
        if family is not None and family.calibrate is not None:
            return family.calibrate(train_params, calib_images)
        return train_params

    # only rank 0 writes logs/checkpoints (every rank still computes the
    # eval — it is a collective over the global mesh)
    class _NullLog:
        def write(self, *_):
            pass

        def close(self):
            pass

    if process_index == 0:
        train_log = open(os.path.join(output_dir, "train_loss.csv"), "w")
        test_log = open(os.path.join(output_dir, "test_loss.csv"), "w")
        confusion_log = open(
            os.path.join(output_dir, "confusion_matrix.txt"), "w")
    else:
        train_log = test_log = confusion_log = _NullLog()

    data_rng = np.random.RandomState(seed + 1)
    dropout_key = jax.random.PRNGKey(seed + 2)
    global_step = 0
    best_accuracy = -1.0
    for epoch in range(epochs):
        epoch_loss = 0.0
        for batch_images, batch_labels in batch_iterator(
                images, type_labels, batch_size, data_rng, drop_last=False):
            padded_images, padded_labels, mask = _pad_batch(
                batch_images, batch_labels, n_devices)
            dropout_key, step_key = jax.random.split(dropout_key)
            padded_images, padded_labels, mask = shard_train_batch(
                padded_images, padded_labels, mask)
            params, opt_state, metrics = train_step(
                params, opt_state, padded_images, padded_labels, step_key,
                mask)
            loss = float(metrics["loss"])
            epoch_loss += loss
            global_step += 1
            train_log.write(f"{epoch},{global_step},{loss}\n")

            if global_step % step_size == 0:
                eval_params = snapshot(params)
                test_loss, confusion, accuracy = evaluate(
                    eval_params, test_images, test_labels, eval_step,
                    batch_size, n_devices, shard_fn=shard_train_batch)
                test_log.write(f"{epoch},{global_step},{test_loss},"
                               f"{accuracy}\n")
                confusion_log.write(f"step {global_step}\n{confusion}\n")
                # deterministic given the (replicated) accuracy, so every
                # rank applies the same LR without coordination
                new_lr = scheduler.step(accuracy)
                opt_state.hyperparams["learning_rate"] = np.asarray(
                    new_lr, np.float32)
                _log(f"STEP {global_step} TEST LOSS: {test_loss:.3f} "
                     f"ACCURACY: {accuracy:.3f} LR: {new_lr:g}")
                checkpoint_path = os.path.join(
                    output_dir, f"pepper_model_step_{global_step}.npz")
                host_params = jax.tree_util.tree_map(np.asarray, eval_params)
                if process_index == 0:
                    save_params(checkpoint_path, host_params,
                                {"epochs": epoch, "step": global_step,
                                 "accuracy": float(accuracy),
                                 "hidden_size": config.hidden,
                                 "gru_layers": 1,
                                 "model_type": model_type})
                    try:  # crash-safe full train state (params + optimizer)
                        from .orbax_io import save_train_state

                        save_train_state(os.path.join(output_dir, "orbax"),
                                         global_step, params, opt_state,
                                         {"epoch": epoch,
                                          "accuracy": float(accuracy)})
                    except Exception:
                        pass  # orbax unavailable: .npz checkpoints remain
                if accuracy > best_accuracy:
                    best_accuracy = accuracy
                    if process_index == 0:
                        save_params(
                            os.path.join(output_dir,
                                         "pepper_model_best.npz"),
                            host_params,
                            {"epochs": epoch, "step": global_step,
                             "accuracy": float(accuracy),
                             "hidden_size": config.hidden,
                             "gru_layers": 1,
                             "model_type": model_type})
        _log(f"EPOCH {epoch} TRAIN LOSS: {epoch_loss:.3f}")

    # final eval + checkpoint
    eval_params = snapshot(params)
    test_loss, confusion, accuracy = evaluate(eval_params, test_images,
                                              test_labels, eval_step,
                                              batch_size, n_devices,
                                              shard_fn=shard_train_batch)
    _log(f"FINAL ACCURACY: {accuracy:.3f}")
    confusion_log.write(f"final\n{confusion}\n")
    host_params = jax.tree_util.tree_map(np.asarray, eval_params)
    meta = {"epochs": epochs, "accuracy": float(accuracy),
            "hidden_size": config.hidden, "gru_layers": 1,
            "model_type": model_type}
    if process_index == 0:
        save_params(os.path.join(output_dir, "pepper_model_final.npz"),
                    host_params, meta)
        if accuracy > best_accuracy:
            save_params(os.path.join(output_dir, "pepper_model_best.npz"),
                        host_params, meta)
    train_log.close()
    test_log.close()
    confusion_log.close()
    return os.path.join(output_dir, "pepper_model_final.npz"), accuracy


def test_model(options, image_dir: str):
    """Standalone evaluation (TestModule.py:12 / models/test.py:35-108)."""
    images, type_labels, _ = load_image_dir(image_dir)
    params, meta = load_params(options.model_path)
    mesh = get_mesh()
    n_devices = len(mesh.devices.ravel())
    params = replicate(mesh, jax.tree_util.tree_map(np.asarray, params))
    model_type = meta.get("model_type", "lstm")
    logits_fn = None
    if model_type != "lstm":
        from ..models.registry import make_family

        logits_fn = make_family(
            model_type, image_features=images.shape[2],
            window=images.shape[1]).logits
        _log(f"MODEL FAMILY: {model_type}")
    eval_step = make_eval_step(mesh=mesh, logits_fn=logits_fn)
    loss, confusion, accuracy = evaluate(params, images, type_labels,
                                         eval_step, options.batch_size,
                                         n_devices)
    _log(f"TEST LOSS: {loss:.4f}")
    _log(f"ACCURACY: {accuracy:.4f}")
    _log(f"CONFUSION MATRIX:\n{confusion}")
    return loss, confusion, accuracy
