"""Checkpoint/resume for env batches and training state.

The reference's only state persistence is the in-memory
`p.saveState()/restoreState()` episode-reset fast path
[ref: walker_base_env.py · reset — SURVEY §5]; nothing survives the
process. Here the whole world is a pytree of arrays, so checkpointing is a
flat npz dump and deterministic resume is (checkpoint, same binary) —
including every env's RNG identity (seed, env_id, epoch) and episode
bookkeeping.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _flatten(tree) -> dict:
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save(path: str, tree: Any) -> None:
    """Save any pytree (EnvState, TrainState, ...) to one .npz file."""
    leaves, treedef = jax.tree.flatten(tree)
    np.savez_compressed(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load(path: str, like: Any) -> Any:
    """Load a pytree saved by `save`. `like` supplies the tree structure
    (e.g. a freshly built EnvState/TrainState of the same shapes)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    n = len(leaves_like)
    missing = [i for i in range(n) if f"leaf_{i}" not in data]
    if missing:
        raise ValueError(
            f"checkpoint has fewer leaves than the template "
            f"(missing leaf_{missing[0]} of {n}) ({path})"
        )
    if f"leaf_{n}" in data:
        raise ValueError(
            f"checkpoint has more leaves than the template ({path})"
        )
    if "__treedef__" in data:
        saved_td = bytes(data["__treedef__"]).decode()
        if saved_td != str(treedef):
            raise ValueError(
                f"checkpoint tree structure differs from the template "
                f"({path}): saved {saved_td[:120]}... != {str(treedef)[:120]}..."
            )
    saved = [data[f"leaf_{i}"] for i in range(n)]
    out = []
    for i, (s, l) in enumerate(zip(saved, leaves_like)):
        if tuple(s.shape) != tuple(np.shape(l)):
            raise ValueError(
                f"leaf {i}: checkpoint shape {s.shape} != template "
                f"{np.shape(l)} ({path})"
            )
        out.append(s.astype(np.asarray(l).dtype))
    return jax.tree.unflatten(treedef, out)
