"""Data-parallel training/eval steps for the window classifier.

Semantics follow the reference trainer (pepper_variant/.../models/
train_distributed.py:107-168): Adam, CrossEntropyLoss with sum reduction
over the 3 type classes, periodic confusion-matrix eval.  Parallelism is
jit-over-Mesh: params replicated, batch sharded on the `data` axis; XLA
inserts the gradient all-reduce (the reference's DDP/gloo equivalent,
pepper/modules/python/models/train_distributed.py:254-258).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models.transducer import transducer_logits


def cross_entropy_sum(logits, labels):
    """torch.nn.CrossEntropyLoss(reduction='sum') equivalent."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.take_along_axis(logp, labels[:, None], axis=1))


def make_train_step(optimizer: optax.GradientTransformation,
                    mesh=None, dropout_rate=0.2):
    """Returns jitted (params, opt_state, batch, rng) -> (params, opt_state,
    metrics). If mesh is given, shard the batch over its data axis."""

    def loss_fn(params, images, labels, rng):
        logits = transducer_logits(params, images, train=True,
                                   dropout_rate=dropout_rate, rng=rng)
        loss = cross_entropy_sum(logits, labels)
        correct = jnp.sum(jnp.argmax(logits, axis=-1) == labels)
        return loss, correct

    def step(params, opt_state, images, labels, rng):
        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, labels, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "correct": correct,
                   "count": jnp.asarray(labels.shape[0], jnp.int32)}
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, batch_sharded, batch_sharded,
                      replicated),
        out_shardings=(replicated, replicated, replicated),
    )


def make_eval_step(num_classes=3, mesh=None):
    """Returns jitted (params, images, labels) -> (loss, confusion_matrix).

    Confusion matrix accumulation mirrors torchnet's ConfusionMeter usage in
    the reference evaluator (models/test.py:35-108)."""

    def step(params, images, labels):
        logits = transducer_logits(params, images, train=False)
        loss = cross_entropy_sum(logits, labels)
        preds = jnp.argmax(logits, axis=-1)
        confusion = jnp.zeros((num_classes, num_classes), jnp.int32)
        confusion = confusion.at[labels, preds].add(1)
        return loss, confusion

    if mesh is None:
        return jax.jit(step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(step,
                   in_shardings=(replicated, batch_sharded, batch_sharded),
                   out_shardings=(replicated, replicated))
