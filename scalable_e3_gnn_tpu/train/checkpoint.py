"""Checkpoint / resume (SURVEY.md §5.4).

Self-contained numpy ``.npz`` backend (no orbax dependency — the sandbox
pins its own stack and the state pytrees here are plain dicts of arrays).
Two modes, selected automatically:

- **single process**: one full-array ``ckpt_<step>.npz`` (atomic rename)
  holding every leaf, plus a JSON manifest.  Works for replicated or
  single-device state.
- **multi process** (``jax.process_count() > 1``): per-process shard files
  ``ckpt_<step>.p<pid>.npz`` — each process writes only its *addressable*
  shards, keyed by the shard's global index, so non-fully-addressable
  ``jax.Array`` state (graph-sharded arrays spanning hosts) round-trips
  without ever materializing globally.  Restore assumes the same process
  topology (the restart-the-world supervisor in ``parallel/failover.py``
  restarts with an identical world) and reassembles each leaf with
  ``jax.make_array_from_single_device_arrays`` against the template's
  sharding; a missing shard index is a hard error, not a silent zero.

Saves the full train state (params, optimizer state, step) plus the data-PRNG
key so resumed runs are bitwise-continuable; the resume-exactness contract
(train 2N steps ≡ train N, save, restore, train N) is enforced by
tests/test_checkpoint.py and the 2-process sharded round-trip by
tests/test_multihost.py::test_two_process_sharded_checkpoint.
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


def _index_key(index, shape) -> str:
    """Canonical string for a global shard index (tuple of slices)."""
    parts = []
    for sl, dim in zip(index, shape):
        start, stop, step = sl.indices(dim)
        assert step == 1, "strided shards unsupported"
        parts.append(f"{start}-{stop}")
    return "_".join(parts) if parts else "scalar"


def save_checkpoint(directory: str, step: int, state, extra: Optional[dict] = None) -> str:
    """Write the checkpoint for ``step``; returns the path this process wrote.

    Single process: ``<dir>/ckpt_<step>.npz`` (atomic rename) + manifest.
    Multi process: ``<dir>/ckpt_<step>.p<pid>.npz`` per process (addressable
    shards only, shard-index-keyed); process 0 also writes the manifest.
    """
    os.makedirs(directory, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    # per-process shard files ONLY when the state actually holds arrays this
    # process cannot address in full — fully-addressable state (numpy,
    # single-device, host-local) keeps the single-file layout even in a
    # multi-process world, where callers coordinate the writer (e.g. the
    # failover worker saves from process 0 only)
    sharded = jax.process_count() > 1 and any(
        isinstance(x, jax.Array) and not x.is_fully_addressable
        for x in leaves
    )
    if not sharded:
        path = os.path.join(directory, f"ckpt_{step}.npz")
        tmp = path + ".tmp.npz"  # ends in .npz so np.savez won't append another
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
        write_manifest = jax.process_count() == 1 or jax.process_index() == 0
    else:
        pid = jax.process_index()
        path = os.path.join(directory, f"ckpt_{step}.p{pid}.npz")
        tmp = path + f".tmp{pid}.npz"
        arrays: Dict[str, np.ndarray] = {}
        for i, x in enumerate(leaves):
            if isinstance(x, jax.Array) and hasattr(x, "addressable_shards"):
                seen = set()
                for sh in x.addressable_shards:
                    k = _index_key(sh.index, x.shape)
                    if k in seen:  # replicated: one copy per distinct index
                        continue
                    seen.add(k)
                    arrays[f"leaf_{i}/{k}"] = np.asarray(sh.data)
            else:
                arrays[f"leaf_{i}/full"] = np.asarray(x)
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
        write_manifest = jax.process_index() == 0
    if write_manifest:
        manifest = {
            "step": step,
            "num_leaves": len(leaves),
            "num_processes": jax.process_count(),
            "treedef": str(treedef),
            "extra": extra or {},
        }
        mtmp = os.path.join(directory, f"ckpt_{step}.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(directory, f"ckpt_{step}.json"))
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if not (name.startswith("ckpt_") and name.endswith(".npz")):
            continue
        stem = name[5:-4]
        if ".p" in stem:  # per-process shard file ckpt_<step>.p<pid>.npz
            stem = stem.split(".p")[0]
        try:
            steps.append(int(stem))
        except ValueError:
            pass
    return max(steps) if steps else None


def _restore_leaf_sharded(data, i, template_leaf):
    """Reassemble leaf i for this process from its shard file ``data``."""
    full_key = f"leaf_{i}/full"
    if full_key in data:
        return jnp.asarray(data[full_key], dtype=template_leaf.dtype)
    if not (isinstance(template_leaf, jax.Array) or hasattr(template_leaf, "sharding")):
        raise ValueError(
            f"leaf {i} was saved sharded but the template leaf carries no "
            "sharding to reassemble against"
        )
    sharding = template_leaf.sharding
    shape = template_leaf.shape
    idx_map = sharding.addressable_devices_indices_map(shape)
    singles = []
    for dev, index in idx_map.items():
        k = f"leaf_{i}/{_index_key(index, shape)}"
        if k not in data:
            raise ValueError(
                f"shard {k} missing from this process's checkpoint file — "
                "restore topology must match save topology"
            )
        singles.append(jax.device_put(
            data[k].astype(template_leaf.dtype), dev))
    return jax.make_array_from_single_device_arrays(shape, sharding, singles)


def restore_checkpoint(directory: str, state_template, step: Optional[int] = None):
    """Restore into the structure (and shardings) of ``state_template``;
    returns (state, step).

    In multi-process mode each process reads only its own shard file; the
    template's leaves must be ``jax.Array``s carrying the target shardings
    (e.g. the live state produced by the distributed step).  Raises
    FileNotFoundError when no checkpoint exists.
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    leaves_t, treedef = jax.tree_util.tree_flatten(state_template)
    single = os.path.join(directory, f"ckpt_{step}.npz")
    if jax.process_count() == 1 or os.path.exists(single):
        path = single
        data = np.load(path)
        if len(leaves_t) != len(data.files):
            raise ValueError(
                f"checkpoint has {len(data.files)} leaves, template has {len(leaves_t)}"
            )
        leaves = [
            jnp.asarray(data[f"leaf_{i}"], dtype=leaves_t[i].dtype)
            for i in range(len(leaves_t))
        ]
    else:
        pid = jax.process_index()
        path = os.path.join(directory, f"ckpt_{step}.p{pid}.npz")
        data = np.load(path)
        nsaved = len({k.split("/")[0] for k in data.files})
        if len(leaves_t) != nsaved:
            raise ValueError(
                f"checkpoint has {nsaved} leaves, template has {len(leaves_t)}"
            )
        leaves = [
            _restore_leaf_sharded(data, i, leaves_t[i])
            for i in range(len(leaves_t))
        ]
    return jax.tree_util.tree_unflatten(treedef, leaves), step
