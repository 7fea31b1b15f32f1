"""Data-parallel training/eval steps for the window classifier.

Semantics follow the reference trainer (pepper_variant/.../models/
train_distributed.py:107-168): Adam, CrossEntropyLoss with sum reduction
over the 3 type classes, periodic confusion-matrix eval.  Parallelism is
jit-over-Mesh: params replicated, batch sharded on the `data` axis; XLA
inserts the gradient all-reduce (the reference's DDP/gloo equivalent,
pepper/modules/python/models/train_distributed.py:254-258).  Batches are
padded to a multiple of the device count; a {0,1} mask keeps pad rows out
of the loss and the confusion matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models.transducer import transducer_logits


def cross_entropy_sum(logits, labels, mask=None):
    """torch.nn.CrossEntropyLoss(reduction='sum') equivalent."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_example = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if mask is not None:
        per_example = per_example * mask
    return jnp.sum(per_example)


def _shardings(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def _default_logits(params, images, train, rng, dropout_rate=0.2):
    return transducer_logits(params, images, train=train,
                             dropout_rate=dropout_rate, rng=rng)


def make_train_step(optimizer: optax.GradientTransformation, mesh=None,
                    dropout_rate=0.2, logits_fn=None):
    """Returns jitted (params, opt_state, images, labels, rng, mask) ->
    (params, opt_state, metrics).  logits_fn(params, x, train, rng) selects
    the model family (models/registry.py); default is the live LSTM
    transducer."""

    def loss_fn(params, images, labels, mask, rng):
        if logits_fn is None:
            logits = _default_logits(params, images, True, rng,
                                     dropout_rate=dropout_rate)
        else:
            logits = logits_fn(params, images, True, rng)
        loss = cross_entropy_sum(logits, labels, mask)
        correct = jnp.sum(
            (jnp.argmax(logits, axis=-1) == labels) * mask)
        return loss, correct

    def step(params, opt_state, images, labels, rng, mask):
        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, labels, mask, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "correct": correct,
                   "count": jnp.sum(mask)}
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step)

    replicated, batch_sharded = _shardings(mesh)
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, batch_sharded, batch_sharded,
                      replicated, batch_sharded),
        out_shardings=(replicated, replicated, replicated),
    )


def make_eval_step(num_classes=3, mesh=None, logits_fn=None):
    """Returns jitted (params, images, labels, mask) ->
    (loss, confusion_matrix).

    Confusion matrix accumulation mirrors torchnet's ConfusionMeter usage in
    the reference evaluator (models/test.py:35-108)."""

    def step(params, images, labels, mask):
        if logits_fn is None:
            logits = transducer_logits(params, images, train=False)
        else:
            logits = logits_fn(params, images, False, None)
        loss = cross_entropy_sum(logits, labels, mask)
        preds = jnp.argmax(logits, axis=-1)
        confusion = jnp.zeros((num_classes, num_classes), jnp.int32)
        confusion = confusion.at[labels, preds].add(mask.astype(jnp.int32))
        return loss, confusion

    if mesh is None:
        return jax.jit(step)

    replicated, batch_sharded = _shardings(mesh)
    return jax.jit(step,
                   in_shardings=(replicated, batch_sharded, batch_sharded,
                                 batch_sharded),
                   out_shardings=(replicated, replicated))
