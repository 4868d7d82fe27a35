"""Pytree checkpointing for optimization loops (SURVEY.md section 5).

The reference has no checkpointing (sample scripts hold state in TF
variables); inverse-rendering runs here can save/resume any JAX pytree of
arrays as a single ``.npz`` plus a structure descriptor — no external
dependency, safe across processes.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(_treedef_to_json(tree)).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_pytree(path: str):
    """Load a pytree saved by :func:`save_pytree` (numpy leaves)."""
    data = np.load(path, allow_pickle=False)
    spec = json.loads(bytes(data["__treedef__"].tobytes()).decode())
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    it = iter(leaves)
    return _json_to_tree(spec, it)


def _treedef_to_json(tree):
    if tree is None:
        # jax.tree_util treats None as an empty node (no leaf).
        return {"__kind__": "none"}
    if isinstance(tree, dict):
        return {"__kind__": "dict",
                "items": {k: _treedef_to_json(v)
                          for k, v in sorted(tree.items())}}
    if isinstance(tree, (list, tuple)):
        return {"__kind__": "list" if isinstance(tree, list) else "tuple",
                "items": [_treedef_to_json(v) for v in tree]}
    return {"__kind__": "leaf"}


def _json_to_tree(spec, leaves_iter):
    kind = spec["__kind__"]
    if kind == "none":
        return None
    if kind == "leaf":
        return next(leaves_iter)
    if kind == "dict":
        return {k: _json_to_tree(v, leaves_iter)
                for k, v in spec["items"].items()}
    items = [_json_to_tree(v, leaves_iter) for v in spec["items"]]
    return items if kind == "list" else tuple(items)
