"""Checkpoint / resume.

Capability of the reference's accelerate checkpointing
(`save_state` on step/time triggers, reference src/models/trainer.py:755-770,
835-842; resume via `load_state` + step arithmetic + dataloader
fast-forward, trainer.py:668-713).  Format: one directory per step
(`step_N/`) holding the flattened state leaves (npz) + json metadata.
Non-numpy dtypes (bf16) are stored as f32 and cast back on load against the
target structure, so any pytree — including int8 optimizer states
(QTensor) — round-trips.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_savable(x):
    x = np.asarray(x)
    if x.dtype.name == "bfloat16":
        return x.astype(np.float32), "bfloat16"
    return x, x.dtype.name


def _sidecar(path: str) -> str:
    # documented layout: step_N/{state.npz, dtypes.json, meta.json}
    return os.path.join(os.path.dirname(path) or ".", "dtypes.json")


def save_pytree(path: str, tree) -> None:
    leaves = jax.tree.leaves(tree)
    arrays, dtypes = {}, []
    for i, leaf in enumerate(leaves):
        arr, dt = _to_savable(leaf)
        arrays[f"leaf_{i}"] = arr
        dtypes.append(dt)
    np.savez(path, **arrays)
    with open(_sidecar(path), "w") as f:
        json.dump(dtypes, f)


def load_pytree(path: str, target=None):
    """Restore into the structure (and dtypes/shardings) of `target`.

    With ``target=None`` returns the flat leaf list with the original
    dtypes restored from the dtypes.json sidecar (inspection/conversion
    tools have no target structure).
    """
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    n = len(data.files)
    if target is None:
        with open(_sidecar(npz_path)) as f:
            dtypes = json.load(f)
        if len(dtypes) != n:
            raise ValueError(
                f"dtypes.json has {len(dtypes)} entries for {n} leaves"
            )
        return [
            jnp.asarray(data[f"leaf_{i}"], dtype=dtypes[i]) for i in range(n)
        ]
    t_leaves, treedef = jax.tree.flatten(target)
    if len(t_leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves but target structure has "
            f"{len(t_leaves)} — wrong model/optimizer config for this "
            f"checkpoint"
        )
    leaves = []
    for i, t in enumerate(t_leaves):
        arr = data[f"leaf_{i}"]
        arr = jnp.asarray(arr, dtype=t.dtype)
        if hasattr(t, "sharding"):
            arr = jax.device_put(arr, t.sharding)
        leaves.append(arr)
    return jax.tree.unflatten(treedef, leaves)


class CheckpointManager:
    """step_N directory layout with latest-checkpoint discovery
    (the reference parses epoch/step from the dir name the same way,
    trainer.py:694-713)."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _step_dirs(self) -> list[tuple[int, str]]:
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", name)
            if m:
                out.append((int(m.group(1)), os.path.join(self.directory, name)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        dirs = self._step_dirs()
        return dirs[-1][0] if dirs else None

    def save(self, step: int, state, metadata: Optional[dict] = None) -> str:
        path = os.path.join(self.directory, f"step_{step}")
        os.makedirs(path, exist_ok=True)
        save_pytree(os.path.join(path, "state.npz"), state)
        meta: dict[str, Any] = {"step": step}
        if metadata:
            meta.update(metadata)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        self._gc()
        return path

    def restore(self, state_like, step: Optional[int] = None):
        """Returns (state, metadata) or (None, None) when empty."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None, None
        path = os.path.join(self.directory, f"step_{step}")
        state = load_pytree(os.path.join(path, "state.npz"), state_like)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return state, meta

    def _gc(self) -> None:
        dirs = self._step_dirs()
        for _, path in dirs[: max(0, len(dirs) - self.keep)]:
            import shutil

            shutil.rmtree(path, ignore_errors=True)
