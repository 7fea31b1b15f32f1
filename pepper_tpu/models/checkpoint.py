"""Model checkpoint save/load.

Native format: a single .npz with '/'-flattened param keys plus metadata —
dependency-free and mmap-friendly.  Reference torch .pkl checkpoints load
through models/torch_convert.py.
"""

from __future__ import annotations

import json

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def _unflatten(flat):
    tree = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str, params, meta: dict | None = None) -> None:
    flat = _flatten(params)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_params(path: str):
    """Returns (params, meta). Accepts native .npz or reference torch .pkl."""
    if path.endswith((".pkl", ".pt", ".pth")):
        from .torch_convert import load_reference_checkpoint

        return load_reference_checkpoint(path)
    data = np.load(path, allow_pickle=False)
    flat = {}
    meta = {}
    for key in data.files:
        if key == "__meta__":
            meta = json.loads(data[key].tobytes().decode())
        else:
            flat[key] = data[key]
    return _unflatten(flat), meta
