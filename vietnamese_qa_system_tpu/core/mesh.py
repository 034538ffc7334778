"""Device mesh construction — the TPU-native replacement for the reference's
process-group machinery (accelerate Accelerator init, reference
src/models/trainer.py:293, and the accelerate YAML `distributed_type` switch,
reference src/models/configs/*.yaml).

On TPU there is no backend daemon: a single SPMD program runs over a
`jax.sharding.Mesh` and XLA inserts the collectives.  The mesh axes used
throughout this framework:

- ``data``  — data parallelism (gradient psum over ICI; capability of the
  reference's DDP / ZeRO configs).
- ``model`` — tensor parallelism (attention heads / MLP hidden sharding;
  capability of the reference's `deepspeed.init_inference(mp_size=...)`,
  reference src/models/trainer.py:905-925).
- ``shard`` — retrieval-corpus sharding: each device owns a contiguous slab
  of the vector index; queries run per-shard top-k + all-gather merge.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
SHARD_AXIS = "shard"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape.  Axis sizes of -1 are inferred from the device
    count (at most one -1, like a reshape)."""

    axes: Mapping[str, int]

    def resolve(self, n_devices: int) -> dict[str, int]:
        axes = dict(self.axes)
        unknown = [k for k, v in axes.items() if v == -1]
        if len(unknown) > 1:
            raise ValueError(f"at most one inferred axis, got {unknown}")
        known = math.prod(v for v in axes.values() if v != -1)
        if unknown:
            if n_devices % known:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {axes}"
                )
            axes[unknown[0]] = n_devices // known
        elif known > n_devices:
            raise ValueError(
                f"mesh {axes} needs {known} devices, only {n_devices} available"
            )
        return axes


def create_mesh(
    axes: Mapping[str, int] | MeshSpec | None = None,
    *,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a Mesh over all (or the given) devices.

    Defaults to a 1-D ``data`` mesh covering every device — the moral
    equivalent of the reference's default DDP config
    (config_defaultMultiGPU.yaml).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {DATA_AXIS: len(devices)}
    spec = axes if isinstance(axes, MeshSpec) else MeshSpec(axes)
    resolved = spec.resolve(len(devices))
    names = tuple(resolved)
    shape = tuple(resolved[n] for n in names)
    n_used = math.prod(shape)  # a mesh smaller than the host uses a prefix
    dev_array = np.asarray(devices[:n_used]).reshape(shape)
    return Mesh(dev_array, names)


def local_mesh(axis: str = DATA_AXIS) -> Mesh:
    """Single-axis mesh over all visible devices (1 device on a single chip)."""
    return create_mesh({axis: -1})
