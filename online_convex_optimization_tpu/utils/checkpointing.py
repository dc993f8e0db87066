"""Checkpointing for sweep state and streaming carries.

The reference persists nothing but final PNGs (SURVEY.md §5) — a preempted
run loses everything.  Here any pytree of arrays (g(T) tables, streaming
``GameState`` carries, (n, sum, sum_sq) sweep statistics) can be saved and
restored.  Orbax is used when available (async, multi-host aware); the
fallback is a plain ``.npz`` with a JSON treedef — both produce a single
self-describing artifact keyed by the caller's config hash.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return [np.asarray(leaf) for leaf in leaves], treedef


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays to ``path`` (.npz fallback, orbax if dir).

    The .npz write is ATOMIC (tmp + os.replace): checkpoints exist to
    survive preemption, and a kill during the save itself must leave
    the previous checkpoint intact rather than a truncated zip (r5
    code-review finding)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".npz"):
        leaves, treedef = _flatten(tree)
        tmp = path + ".tmp.npz"
        np.savez(tmp, treedef=json.dumps(str(treedef)),
                 **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)})
        os.replace(tmp, path)
        return
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), tree, force=True)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by ``save_pytree``; ``like`` supplies the
    structure (its leaves' values are ignored)."""
    if path.endswith(".npz"):
        data = np.load(path)
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
        _, treedef = jax.tree_util.tree_flatten(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), like)


def exists(path: str) -> bool:
    return os.path.exists(path)
