"""Checkpoint/restore for simulation state pytrees.

The reference's "checkpointing" is Context cloning
(context.h:463 SetTimeStateAndParametersFrom) plus YAML config round trips
— in-memory only, no on-disk state serialization.  Here the state IS a
pytree, so checkpointing is flatten -> npz with key paths, restorable into
the same structure (the orbax role, dependency-free).
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import numpy as np


def _key_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts) if parts else "_root"


def save_checkpoint(path: str, state: Any, step: Optional[int] = None,
                    metadata: Optional[dict] = None) -> None:
    """Write a pytree checkpoint to ``path`` (npz)."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for i, (kp, leaf) in enumerate(leaves):
        arrays[f"{i:04d}|{_key_str(kp)}"] = np.asarray(leaf)
    meta = {"step": step, "metadata": metadata or {},
            "num_leaves": len(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_checkpoint(path: str, like: Any):
    """Restore a checkpoint into the structure of ``like``.

    Returns (state, step, metadata).  Leaf order and key paths must match
    the saved structure (checked), so refactors that reshape the state
    pytree fail loudly instead of silently permuting fields.
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        keys = sorted(k for k in data.files if k != "__meta__")
        flat, treedef = jax.tree_util.tree_flatten(like)
        if len(keys) != len(flat):
            raise ValueError(
                f"checkpoint has {len(keys)} leaves; template has "
                f"{len(flat)}"
            )
        # Verify key paths against the template.
        tpl_leaves = jax.tree_util.tree_flatten_with_path(like)[0]
        new_flat = []
        for i, (key, (kp, tpl)) in enumerate(zip(keys, tpl_leaves)):
            saved_path = key.split("|", 1)[1]
            tpl_path = _key_str(kp)
            if saved_path != tpl_path:
                raise ValueError(
                    f"leaf {i}: checkpoint path '{saved_path}' != template "
                    f"path '{tpl_path}'"
                )
            arr = data[key]
            new_flat.append(
                jax.numpy.asarray(arr, getattr(tpl, "dtype", None))
                if hasattr(tpl, "dtype")
                else arr
            )
        state = jax.tree_util.tree_unflatten(treedef, new_flat)
    return state, meta["step"], meta["metadata"]
