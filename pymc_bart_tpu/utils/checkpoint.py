"""Checkpoint / resume of sampler state.

The reference has no persistence at all — trees live in an in-memory
Manager list and die with the process (SURVEY 5.3-5.4).  Here the whole
carried sampler state (tree tensors, RNG keys, tuning statistics, HMC
adaptation) is one pytree of arrays, so checkpointing is a flat save of
named leaves; ``sample(..., checkpoint_dir=...)`` writes one every chunk
and ``resume=True`` continues a crashed run.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

# Bump when stored-state SEMANTICS change, not just shapes: version 2 =
# hash-salted Subset split words (0.4.0); version 1 = category-bitmask
# Subset words (0.3.0).  Resuming a checkpoint across the change would
# silently reinterpret subset-rule words as salts and alter routing
# (round-4 ADVICE low #2), so ``sample(resume=True)`` refuses a
# mismatched (or unstamped pre-0.4.0) checkpoint.
FORMAT_VERSION = 2


def _flatten_with_names(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}, treedef


def save_checkpoint(directory: str, state, meta: Optional[Dict[str, Any]] = None,
                    step: int = 0) -> str:
    """Save a sampler-state pytree; returns the checkpoint path."""
    os.makedirs(directory, exist_ok=True)
    arrays, _treedef = _flatten_with_names(state)
    path = os.path.join(directory, f"ckpt_{step:08d}.npz")
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)
    from .. import __version__

    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump({"step": step, "format_version": FORMAT_VERSION,
                   "package_version": __version__, **(meta or {})}, f)
    return path


def load_meta(directory: str) -> Dict[str, Any]:
    """The meta.json written next to the checkpoints ({} if absent)."""
    path = os.path.join(directory, "meta.json")
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return json.load(f)


def check_format(directory: str) -> None:
    """Refuse to resume from a checkpoint whose stored-state semantics
    do not match this build (see FORMAT_VERSION)."""
    meta = load_meta(directory)
    found = meta.get("format_version")
    if found != FORMAT_VERSION:
        raise ValueError(
            f"checkpoint in {directory!r} has format_version={found!r} "
            f"(this build writes {FORMAT_VERSION}; package "
            f"{meta.get('package_version', '<unknown>')}).  Stored-state "
            "semantics changed between formats (e.g. Subset split words "
            "were category bitmasks in 0.3.0 and are hash salts since "
            "0.4.0), so resuming would silently alter routing.  Restart "
            "the run, or convert the checkpoint explicitly.")


def latest_checkpoint(directory: str) -> Optional[Tuple[str, int]]:
    if not os.path.isdir(directory):
        return None
    ckpts = sorted(
        f for f in os.listdir(directory)
        if f.startswith("ckpt_") and f.endswith(".npz")
    )
    if not ckpts:
        return None
    path = os.path.join(directory, ckpts[-1])
    step = int(ckpts[-1][5:-4])
    return path, step


def save_draw_chunk(directory: str, step: int, outs) -> str:
    """Persist one collected draw chunk (host pytree) next to the state
    checkpoints, so ``resume=True`` keeps the draws already sampled
    instead of only the carry."""
    import pickle

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"draws_{step:08d}.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(outs, f)
    os.replace(tmp, path)
    return path


def load_draw_chunks(directory: str, upto_step: Optional[int] = None) -> list:
    """Draw chunks saved by ``save_draw_chunk``, in step order."""
    import pickle

    if not os.path.isdir(directory):
        return []
    out = []
    for fname in sorted(os.listdir(directory)):
        if not (fname.startswith("draws_") and fname.endswith(".pkl")):
            continue
        step = int(fname[6:-4])
        if upto_step is not None and step > upto_step:
            continue
        with open(os.path.join(directory, fname), "rb") as f:
            out.append(pickle.load(f))
    return out


def load_checkpoint(path: str, like_state):
    """Restore a pytree saved by ``save_checkpoint`` into the structure of
    ``like_state`` (shapes/dtypes must match)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like_state)
    restored = [
        np.asarray(data[f"leaf_{i}"]).astype(np.asarray(leaf).dtype)
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, restored)
