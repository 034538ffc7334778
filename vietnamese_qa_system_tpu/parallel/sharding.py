"""Parameter / batch sharding rules over the device mesh.

TPU-native replacement for the reference's launcher-selected distribution
strategies (accelerate YAMLs, reference src/models/configs/*.yaml, and the
DeepSpeed/FSDP wrapping in reference src/models/trainer.py:164-231,614-618).
Under XLA GSPMD these all become *sharding annotations* on one SPMD program:

- ``dp``      — replicate params, shard the batch on ``data``
                (capability of DDP / config_defaultMultiGPU.yaml).
- ``zero2``   — params replicated, optimizer state sharded on ``data``
                (capability of DeepSpeed ZeRO-2, accelerate_ds_zero2_config).
- ``fsdp``    — params + optimizer state sharded on ``data``
                (capability of ZeRO-3 / FSDP,
                accelerate_ds_zero3_cpu_offload_config / fsdp_llamma2).
- ``tp``      — attention heads / MLP hidden sharded on ``model``
                (capability of deepspeed.init_inference tensor slicing,
                reference src/models/trainer.py:905-925).
- ``fsdp_tp`` — 2-D: tp rules first, remaining large axis on ``data``.

Gradient all-reduce, weight all-gathers and activation collectives are
inserted by XLA from these annotations — there is no NCCL-like backend to
drive (reference SURVEY §2.3 NCCL row).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS


@dataclasses.dataclass(frozen=True)
class ShardingRules:
    """Ordered (path-regex, partition-spec template) rules.

    A template is a tuple with one entry per tensor dim: an axis name,
    None (replicated), or "?data" meaning "shard here if divisible".
    First matching rule wins; unmatched leaves use FSDP-style auto rules
    when ``auto_fsdp`` else replication.
    """

    rules: Sequence[tuple[str, tuple]]
    auto_fsdp: bool = False


# Tensor-parallel layout: shard the head/hidden dimension.  Column-parallel
# for q/k/v and mlp-in (output dim on `model`), row-parallel for the output
# projections (input dim on `model`), vocab-sharded embedding table.
#
# Quantized bases (models/quantize.py) follow the same layout: w_q mirrors
# w's (d_in, d_out) (packed nf4 halves d_in — divisibility still holds for
# power-of-two meshes) and w_s is (d_in/block, d_out), so column-parallel
# shards both on the output dim and row-parallel on the input/block dim.
TP_RULES = ShardingRules(
    rules=[
        (r".*/(attn|cross_attn)/w[qkv]/(w|w_q|w_s|s_q)$", (None, MODEL_AXIS)),
        (r".*/(attn|cross_attn)/w[qkv]/b$", (MODEL_AXIS,)),
        (r".*/(attn|cross_attn)/wo/(w|w_q|w_s|s_q)$", (MODEL_AXIS, None)),
        # wi covers the plain MLP in-projection; wg is the SwiGLU gate
        # (llama family) — both are column-parallel with wo row-parallel
        (r".*/mlp/(wi|wg)/(w|w_q|w_s|s_q)$", (None, MODEL_AXIS)),
        (r".*/mlp/(wi|wg)/b$", (MODEL_AXIS,)),
        (r".*/mlp/wo/(w|w_q|w_s|s_q)$", (MODEL_AXIS, None)),
        (r".*tok_embed$", (MODEL_AXIS, None)),
        (r".*/lm_head/w$", (None, MODEL_AXIS)),
    ]
)

DP_RULES = ShardingRules(rules=[])
FSDP_RULES = ShardingRules(rules=[], auto_fsdp=True)
FSDP_TP_RULES = ShardingRules(rules=TP_RULES.rules, auto_fsdp=True)

STRATEGIES = {
    "dp": DP_RULES,
    "zero2": DP_RULES,  # params replicated; optim state gets fsdp (see train/)
    "fsdp": FSDP_RULES,
    "tp": TP_RULES,
    "fsdp_tp": FSDP_TP_RULES,
}


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/" + "/".join(parts)


def _auto_fsdp_spec(shape, spec, mesh: Mesh):
    """Fill the largest still-replicated, divisible dim with the data axis."""
    if DATA_AXIS not in mesh.shape:
        return spec
    n = mesh.shape[DATA_AXIS]
    best = None
    for i, (dim, s) in enumerate(zip(shape, spec)):
        if s is None and dim % n == 0 and dim >= n:
            if best is None or dim > shape[best]:
                best = i
    if best is None:
        return spec
    out = list(spec)
    out[best] = DATA_AXIS
    return tuple(out)


def _spec_for(path_s: str, leaf, rules: ShardingRules, mesh: Mesh) -> P:
    shape = getattr(leaf, "shape", ())
    spec = tuple(None for _ in shape)
    for pattern, template in rules.rules:
        if re.match(pattern, path_s):
            if len(template) == len(shape) - 1:
                # scan-over-layers stacked leaf: same rule, leading layer
                # dim replicated (collectives stay per-layer inside the
                # scan body)
                template = (None,) + tuple(template)
            if len(template) != len(shape):
                break  # rule written for a different rank; fall through
            # drop axes the mesh doesn't have or that don't divide
            spec = tuple(
                ax
                if ax is not None
                and ax in mesh.shape
                and mesh.shape[ax] > 1
                and dim % mesh.shape[ax] == 0
                else None
                for ax, dim in zip(template, shape)
            )
            break
    if rules.auto_fsdp:
        spec = _auto_fsdp_spec(shape, spec, mesh)
    return P(*spec)


def param_sharding(params, mesh: Mesh, strategy: str = "fsdp"):
    """Pytree of NamedSharding for `params` under the named strategy."""
    rules = STRATEGIES[strategy] if isinstance(strategy, str) else strategy

    def one(path, leaf):
        return NamedSharding(mesh, _spec_for(_path_str(path), leaf, rules, mesh))

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh):
    """Batch leaves sharded along the leading (batch) dim on `data`."""
    axis = DATA_AXIS if DATA_AXIS in mesh.shape and mesh.shape[DATA_AXIS] > 1 else None
    return NamedSharding(mesh, P(axis))


def accum_batch_sharding(mesh: Mesh):
    """(accum, batch, ...) leaves: shard the second (batch) dim on `data`."""
    axis = DATA_AXIS if DATA_AXIS in mesh.shape and mesh.shape[DATA_AXIS] > 1 else None
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(params, shardings):
    """Place (and lay out) params according to `shardings`."""
    return jax.device_put(params, shardings)
