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


# ---------------------------------------------------------------------------
# Multi-host sharded IO (SURVEY §5.4 TPU-equivalent row): each host writes
# only the leaf shards its addressable devices own (orbax-style layout —
# per-shard index metadata, replica-0 dedup), and load reassembles and
# re-shards onto the *current* mesh, which may have a different topology.
# ---------------------------------------------------------------------------


def _shard_entries(leaf, host_id, host_of):
    """Yield (index, numpy) for the shards THIS host must write.

    The global replica_id == 0 rule picks exactly one writer per unique
    shard index across all hosts (replicated leaves are written once)."""
    if not hasattr(leaf, "addressable_shards"):
        if host_id == 0:
            yield (None, np.asarray(leaf))
        return
    for sh in leaf.addressable_shards:
        if sh.replica_id != 0:
            continue
        owner = host_of(sh.device) if host_of else sh.device.process_index
        if owner != host_id:
            continue
        yield (sh.index, np.asarray(sh.data))


def _index_to_json(index, shape):
    if index is None:
        return [[0, int(d)] for d in shape]
    out = []
    for sl, d in zip(index, shape):
        out.append([int(sl.start or 0), int(d if sl.stop is None else sl.stop)])
    return out


def save_pytree_sharded(
    directory: str,
    tree,
    *,
    host_id: int | None = None,
    host_of=None,
) -> None:
    """Write this host's shard file: ``{directory}/host_{h}.npz`` plus a
    ``host_{h}.layout.json`` mapping each stored array to (leaf index,
    global shape, dtype, slice).  Every host must call this; pass
    ``host_of`` (device -> host id) to simulate a multi-host topology in
    a single-process test."""
    if host_id is None:
        host_id = jax.process_index()
    os.makedirs(directory, exist_ok=True)
    leaves = jax.tree.leaves(tree)
    arrays: dict[str, np.ndarray] = {}
    layout = []
    for i, leaf in enumerate(leaves):
        shape = tuple(getattr(leaf, "shape", np.shape(leaf)))
        for j, (index, data) in enumerate(_shard_entries(leaf, host_id, host_of)):
            key = f"l{i}_s{j}"
            data, dt = _to_savable(data)
            arrays[key] = data
            layout.append(
                {
                    "leaf": i,
                    "key": key,
                    "shape": list(shape),
                    "dtype": dt,
                    "index": _index_to_json(index, shape),
                }
            )
    np.savez(os.path.join(directory, f"host_{host_id}.npz"), **arrays)
    with open(os.path.join(directory, f"host_{host_id}.layout.json"), "w") as f:
        json.dump({"n_leaves": len(leaves), "entries": layout}, f)


def load_pytree_sharded(directory: str, target):
    """Reassemble from every host's shard file and re-shard onto `target`'s
    shardings (the current mesh — topology changes are fine)."""
    host_files = sorted(
        f for f in os.listdir(directory)
        if re.fullmatch(r"host_\d+\.layout\.json", f)
    )
    if not host_files:
        raise FileNotFoundError(f"no host shard files under {directory}")
    t_leaves, treedef = jax.tree.flatten(target)
    buffers: dict[int, np.ndarray] = {}
    filled: dict[int, int] = {}
    for lf in host_files:
        with open(os.path.join(directory, lf)) as f:
            layout = json.load(f)
        if layout["n_leaves"] != len(t_leaves):
            raise ValueError(
                f"checkpoint has {layout['n_leaves']} leaves but target has "
                f"{len(t_leaves)}"
            )
        data = np.load(os.path.join(directory, lf.replace(".layout.json", ".npz")))
        for e in layout["entries"]:
            i = e["leaf"]
            if i not in buffers:
                buffers[i] = np.empty(
                    e["shape"],
                    np.float32 if e["dtype"] == "bfloat16" else e["dtype"],
                )
                filled[i] = 0
            sl = tuple(slice(s, t) for s, t in e["index"])
            buffers[i][sl] = data[e["key"]]
            filled[i] += int(data[e["key"]].size)
    leaves = []
    for i, t in enumerate(t_leaves):
        if i not in buffers:
            raise ValueError(f"leaf {i} missing from every host shard file")
        if filled[i] < buffers[i].size:
            raise ValueError(
                f"leaf {i} incomplete: {filled[i]}/{buffers[i].size} elements "
                f"written (a host shard file is missing)"
            )
        arr = jnp.asarray(buffers[i], dtype=t.dtype)
        if hasattr(t, "sharding"):
            arr = jax.device_put(arr, t.sharding)
        leaves.append(arr)
    return jax.tree.unflatten(treedef, leaves)


class CheckpointManager:
    """step_N directory layout with latest-checkpoint discovery
    (the reference parses epoch/step from the dir name the same way,
    trainer.py:694-713).

    ``sharded=True`` switches to per-host shard files (each host writes
    its addressable shards; restore auto-detects the format and
    reassembles onto the current mesh).  ``host_of`` simulates a host
    topology in tests."""

    def __init__(
        self, directory: str, keep: int = 3, *, sharded: bool = False,
        host_of=None,
    ):
        self.directory = directory
        self.keep = keep
        self.sharded = sharded
        self.host_of = host_of
        os.makedirs(directory, exist_ok=True)

    def _step_dirs(self) -> list[tuple[int, str]]:
        """Complete checkpoints only: meta.json is the COMMIT MARKER —
        written last in save(), so a directory without it is a crashed
        partial write (truncated state.npz / missing shard files) that
        resume must skip, not crash on."""
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step_(\d+)", name)
            if m and os.path.exists(
                os.path.join(self.directory, name, "meta.json")
            ):
                out.append((int(m.group(1)), os.path.join(self.directory, name)))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        self.wait()  # an in-flight async save may be creating step_N
        dirs = self._step_dirs()
        return dirs[-1][0] if dirs else None

    def save(self, step: int, state, metadata: Optional[dict] = None) -> str:
        path = os.path.join(self.directory, f"step_{step}")

        def _sync(tag: str) -> None:
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(tag)

        if jax.process_index() == 0:
            # leftover of a crashed save of this same step: clear it so
            # stale partial files can't mix with the fresh write.  ONE
            # cleaner only — a non-zero rank running this check races
            # rank 0's in-progress write of the same step (it sees a dir
            # without the commit marker and rmtree's live shard files;
            # found by the real 2-process test, tests/test_multiprocess.py)
            if os.path.isdir(path) and not os.path.exists(
                os.path.join(path, "meta.json")
            ):
                import shutil

                shutil.rmtree(path, ignore_errors=True)
            os.makedirs(path, exist_ok=True)
        # every host waits for the cleanup before writing its shards,
        # then ensures the dir exists (non-shared-FS hosts make their own)
        _sync(f"ckpt_clean_{step}")
        os.makedirs(path, exist_ok=True)
        if self.sharded:
            if self.host_of is None:
                save_pytree_sharded(path, state)
            else:  # simulated topology: write every simulated host's file
                n_hosts = max(
                    self.host_of(d) for d in jax.devices()
                ) + 1
                for h in range(n_hosts):
                    save_pytree_sharded(
                        path, state, host_id=h, host_of=self.host_of
                    )
        elif jax.process_index() == 0:
            # non-sharded multi-host: exactly ONE writer — concurrent
            # np.savez of the same path from N hosts interleaves into a
            # corrupt zip
            save_pytree(os.path.join(path, "state.npz"), state)
        # every host's shard files must be on disk before the commit
        # marker appears
        _sync(f"ckpt_save_{step}")
        if jax.process_index() == 0:
            # COMMIT MARKER — written last; _step_dirs ignores dirs
            # without it, so a crash anywhere above leaves the previous
            # checkpoint as the resume point instead of a broken one
            meta: dict[str, Any] = {"step": step}
            if metadata:
                meta.update(metadata)
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
            # rank-0-only sweep: a non-zero rank's _gc can run between
            # the barrier and rank 0's commit marker and sweep this very
            # step as a "crashed partial"
            self._gc()
        # no rank may return (and e.g. immediately restore) before the
        # commit marker exists
        _sync(f"ckpt_commit_{step}")
        return path

    def restore(self, state_like, step: Optional[int] = None):
        """Returns (state, metadata) or (None, None) when empty.  The
        on-disk format (monolithic vs per-host sharded) is auto-detected,
        so runs can move between single- and multi-host topologies."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None, None
        path = os.path.join(self.directory, f"step_{step}")
        if any(
            re.fullmatch(r"host_\d+\.layout\.json", f) for f in os.listdir(path)
        ):
            state = load_pytree_sharded(path, state_like)
        else:
            state = load_pytree(os.path.join(path, "state.npz"), state_like)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        return state, meta

    # ------------------------------------------------------------- async

    def save_async(self, step: int, state, metadata: Optional[dict] = None):
        """Non-blocking save: snapshot the state with an on-device copy
        (donated train-step buffers mutate in place, so the live arrays
        cannot be fetched later), then fetch + write in a background
        thread while training continues.  At most one save is in flight;
        a second call waits for the first (orbax-style async save —
        matters when the device↔host link is slow)."""
        import threading

        self.wait()
        snap = jax.tree.map(jnp.copy, state)

        def _write():
            self.save(step, snap, metadata)

        self._pending = threading.Thread(target=_write, daemon=True)
        self._pending.start()
        return self._pending

    def wait(self) -> None:
        """Block until any in-flight async save has finished."""
        t = getattr(self, "_pending", None)
        if t is not None:
            t.join()
            self._pending = None

    def _gc(self) -> None:
        import shutil

        dirs = self._step_dirs()
        for _, path in dirs[: max(0, len(dirs) - self.keep)]:
            shutil.rmtree(path, ignore_errors=True)
        # sweep crashed partials (no commit marker): runs only at the end
        # of a completed save, so no in-flight write can be swept
        complete = {p for _, p in dirs}
        for name in os.listdir(self.directory):
            if re.fullmatch(r"step_(\d+)", name):
                p = os.path.join(self.directory, name)
                if p not in complete:
                    shutil.rmtree(p, ignore_errors=True)
