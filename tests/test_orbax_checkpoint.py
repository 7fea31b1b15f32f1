"""Orbax train-state save/restore roundtrip."""

import jax
import numpy as np
import optax
import pytest

pytest.importorskip("orbax.checkpoint")

from pepper_tpu.models.transducer import (  # noqa: E402
    TransducerConfig, init_transducer_params)
from pepper_tpu.train.orbax_io import (  # noqa: E402
    latest_step, restore_train_state, save_train_state)


def test_orbax_roundtrip(tmp_path):
    config = TransducerConfig(image_features=8, window=5, hidden=16,
                              linear_size=32)
    params = init_transducer_params(jax.random.PRNGKey(0), config)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    directory = str(tmp_path / "ckpts")
    save_train_state(directory, 10, params, opt_state, {"epoch": 1})
    save_train_state(directory, 20, params, opt_state, {"epoch": 2})
    assert latest_step(directory) == 20

    step, state = restore_train_state(directory)
    assert step == 20
    assert state["meta"]["epoch"] == 2
    restored = state["params"]
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    assert len(jax.tree_util.tree_leaves(state["opt_state"])) == \
        len(jax.tree_util.tree_leaves(opt_state))
