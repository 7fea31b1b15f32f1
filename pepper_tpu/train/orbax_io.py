"""Orbax-backed training-state checkpointing (params + optimizer state +
step counter) for crash-safe resumable training — the model-state half of
SURVEY.md §5.4's checkpoint/resume plan (the pipeline half is the region
manifest in parallel/dist.py).  The portable .npz format
(models/checkpoint.py) remains the serving/interchange format."""

from __future__ import annotations

import os


def save_train_state(directory: str, step: int, params, opt_state,
                     metadata: dict | None = None) -> str:
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    host_params = jax.tree_util.tree_map(np.asarray, params)
    host_opt = jax.tree_util.tree_map(np.asarray, opt_state)
    with ocp.StandardCheckpointer() as checkpointer:
        path = os.path.join(directory, f"step_{step}")
        checkpointer.save(path, {"params": host_params,
                                 "opt_state": host_opt,
                                 "meta": metadata or {}},
                          force=True)
    return path


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_train_state(directory: str, step: int | None = None,
                        template=None):
    """Returns (step, state_dict) — state_dict has params/opt_state/meta."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    with ocp.StandardCheckpointer() as checkpointer:
        if template is not None:
            state = checkpointer.restore(path, template)
        else:
            state = checkpointer.restore(path)
    return step, state
