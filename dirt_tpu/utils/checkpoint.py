"""Pytree checkpointing for optimization loops (SURVEY.md section 5).

The reference has no checkpointing (sample scripts hold state in TF
variables); inverse-rendering runs here can save/resume a **plain** pytree
— nests of dict (string keys) / list / tuple / None with array leaves — as
a single ``.npz`` plus a structure descriptor. No external dependency,
safe across processes.

Restrictions (validated with clear errors, not silently mis-walked):

* dict keys must be strings (JSON stringifies everything else, which
  would silently change key types/order on load);
* custom registered pytree nodes (optax states, flax structs, ...) are
  rejected — convert to plain containers first
  (e.g. ``jax.tree_util.tree_map(lambda x: x, state)`` does NOT do this;
  use the node type's own ``._asdict()``/dataclass fields);
* NamedTuples are accepted but load back as plain tuples.
"""

from __future__ import annotations

import json

import jax
import numpy as np

_LEAF_TYPES = (
    np.ndarray, np.generic, jax.Array, int, float, bool, complex, bytes, str
)


def save_pytree(path: str, tree) -> None:
    """Save a plain pytree of arrays to ``path`` (.npz).

    Raises TypeError for containers outside dict/list/tuple/None or for
    non-string dict keys (see module docstring).
    """
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
        bad = [k for k in tree if not isinstance(k, str)]
        if bad:
            raise TypeError(
                "save_pytree: dict keys must be strings (JSON would "
                f"stringify {bad[0]!r} and change the restored tree); "
                "convert keys before saving"
            )
        return {"__kind__": "dict",
                "items": {k: _treedef_to_json(v)
                          for k, v in sorted(tree.items())}}
    if isinstance(tree, (list, tuple)):
        # NamedTuples walk (and reload) as plain tuples — documented.
        return {"__kind__": "list" if isinstance(tree, list) else "tuple",
                "items": [_treedef_to_json(v) for v in tree]}
    if isinstance(tree, _LEAF_TYPES):
        return {"__kind__": "leaf"}
    raise TypeError(
        "save_pytree only handles plain dict/list/tuple/None trees with "
        f"array leaves; got a {type(tree).__name__} node. Registered "
        "custom pytree nodes (optax/flax states) flatten differently "
        "from this walker and would corrupt the leaf order — convert to "
        "plain containers first."
    )


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
