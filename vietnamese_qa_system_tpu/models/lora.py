"""LoRA adapters as parameter-pytree surgery.

Capability of the reference's peft usage — `LoraConfig` + `get_peft_model`
(reference src/models/trainer.py:489-497,604) and `merge_adapter` /
`merge_and_unload` (reference src/models/trainer.py:84-161) — without the
device_map gymnastics: an adapter is just a second pytree mirroring the
targeted dense weights; "wrapping" is a functional merge
``W' = W + (alpha/r) * A @ B`` applied inside the loss, so gradients w.r.t.
the adapter are exact LoRA gradients and the base stays frozen by
construction (grad is only taken w.r.t. the adapter pytree).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

# Dense-weight leaf names eligible for adaptation, mirroring the reference's
# default target_modules (q/k/v/o projections + MLP in/out).
DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "wi")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 8
    alpha: int = 16
    targets: Sequence[str] = DEFAULT_TARGETS
    # dropout intentionally omitted: the reference defaults lora_dropout=0.05
    # but on TPU we train with deterministic kernels by default.

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def _is_dense(node) -> bool:
    return isinstance(node, dict) and (
        ("w" in node and hasattr(node["w"], "ndim")) or "w_q" in node
    )


def _dense_rank(node) -> int:
    if "w" in node:
        return node["w"].ndim
    return node["w_q"].ndim  # 2-D, or 3-D when scan-stacked


def init_lora(key, params, cfg: LoraConfig):
    """Build an adapter pytree with the same nesting as `params`, containing
    {"a","b"} factors only at targeted dense leaves (None elsewhere is
    pruned).  A ~ N(0, 1/r), B = 0 so the initial adapted model equals the
    base model (standard LoRA init).  Works over float and quantized
    (models/quantize.py) bases alike."""
    from .quantize import dense_shape

    keys = iter(jax.random.split(key, 4096))

    def walk(node, name=""):
        if _is_dense(node):
            if name in cfg.targets and _dense_rank(node) == 2:
                d_in, d_out = dense_shape(node)
                return {
                    "a": jax.random.normal(next(keys), (d_in, cfg.r), jnp.float32)
                    / cfg.r,
                    "b": jnp.zeros((cfg.r, d_out), jnp.float32),
                }
            if name in cfg.targets and _dense_rank(node) == 3:
                # scan-over-layers stacked leaf (L, d_in, d_out) — float
                # or quantized: one independent adapter per layer,
                # stacked the same way
                n_l, d_in, d_out = dense_shape(node)
                return {
                    "a": jax.random.normal(
                        next(keys), (n_l, d_in, cfg.r), jnp.float32
                    )
                    / cfg.r,
                    "b": jnp.zeros((n_l, cfg.r, d_out), jnp.float32),
                }
            return None
        if isinstance(node, dict):
            sub = {k: walk(v, k) for k, v in node.items()}
            sub = {k: v for k, v in sub.items() if v is not None}
            return sub or None
        if isinstance(node, list):
            sub = [walk(v, name) for v in node]
            return sub if any(s is not None for s in sub) else None
        return None

    adapter = walk(params)
    return adapter if adapter is not None else {}


def merge_lora(params, adapter, cfg: LoraConfig):
    """Return params with ``W + scale * A@B`` at adapted leaves.

    Used both inside the train step (functional 'wrap') and for export
    (capability of reference merge_and_unload, trainer.py:150-157).
    The base is passed through ``stop_gradient`` HERE so differentiating
    the merged forward w.r.t. either argument trains only the adapter —
    callers don't need to wrap the base themselves (a no-op outside jit
    and under a second wrap).
    """
    params = jax.lax.stop_gradient(params)

    def walk(p, a):
        if a is None:
            return p
        if _is_dense(p):
            if isinstance(a, dict) and "a" in a:
                merged = dict(p)
                if "w_q" in p:
                    # quantized base: attach the factors; layers.dense
                    # applies (x@A)@B lazily (the int8/nf4 codes cannot
                    # absorb a float delta without destroying the scales)
                    merged["lora_a"] = a["a"]
                    merged["lora_b"] = a["b"] * cfg.scale
                    return merged
                if a["a"].ndim == 3:
                    # stacked (L, d_in, r) @ (L, r, d_out) per layer
                    delta = jnp.einsum(
                        "lir,lro->lio", a["a"], a["b"],
                        preferred_element_type=jnp.float32,
                    ) * cfg.scale
                else:
                    delta = jnp.dot(
                        a["a"], a["b"], preferred_element_type=jnp.float32
                    ) * cfg.scale
                merged["w"] = p["w"] + delta.astype(p["w"].dtype)
                return merged
            return p
        if isinstance(p, dict):
            return {k: walk(v, a.get(k) if isinstance(a, dict) else None) for k, v in p.items()}
        if isinstance(p, list):
            if isinstance(a, list):
                return [walk(v, av) for v, av in zip(p, a)]
            return p
        return p

    return walk(params, adapter)


def stack_adapters(adapters: Sequence, cfg: LoraConfig):
    """Stack N same-shaped adapter pytrees into a serving BANK: every
    {"a","b"} leaf gains a leading adapter dim, ``b`` is pre-scaled by
    alpha/r (so the bank is self-contained), and index 0 is a ZERO
    adapter (the unmodified base model) — per-request "no adapter" costs
    one wasted rank-r matmul instead of a branch.

    Multi-LoRA serving (beyond-parity): the reference fine-tunes one PEFT
    adapter per run (reference src/models/trainer.py:489-497) and serves
    it merged (merge_adapter :84-161) — one model per deployment.  A bank
    serves MANY fine-tunes over one shared base in one compiled program
    (see models/decode_engine.py + engine/continuous.py ``adapters=``).
    """
    if not adapters:
        raise ValueError("stack_adapters needs at least one adapter")
    structs = [
        jax.tree_util.tree_structure(ad) for ad in adapters
    ]
    if any(s != structs[0] for s in structs[1:]):
        raise ValueError(
            "adapters target different leaves (same base + same "
            "LoraConfig.targets required)"
        )

    def stack(*leaves):
        if any(l.shape != leaves[0].shape for l in leaves[1:]):
            raise ValueError(
                f"adapter leaf shapes differ: {[l.shape for l in leaves]} "
                "(same rank r required)"
            )
        zero = jnp.zeros_like(leaves[0])
        return jnp.stack([zero, *leaves])

    bank = jax.tree_util.tree_map(stack, *adapters)

    def scale_b(node):
        if isinstance(node, dict) and "a" in node and "b" in node:
            return {"a": node["a"], "b": node["b"] * cfg.scale}
        if isinstance(node, dict):
            return {k: scale_b(v) for k, v in node.items()}
        if isinstance(node, list):
            return [scale_b(v) for v in node]
        return node

    return scale_b(bank)


def select_adapters(params, bank, idx):
    """Attach per-ROW adapter factors gathered from ``bank`` at ``idx``
    (B,) onto the targeted dense leaves: ``lora_a`` (B, d_in, r) /
    ``lora_b`` (B, r, d_out), which layers.dense applies as batched
    rank-r corrections — each batch row runs its own fine-tune.

    Stacked scan-over-layers leaves (bank (N, L, d_in, r)) are gathered
    then moved to (L, B, d_in, r) so lax.scan slices the layer dim and
    dense still sees the batched (B, d_in, r) form.  Mutually exclusive
    with a single lazily-attached adapter (merge_lora on a quantized
    base): select overwrites those factors.
    """

    def walk(p, a):
        if a is None:
            return p
        if _is_dense(p):
            if isinstance(a, dict) and "a" in a:
                out = dict(p)
                ga, gb = a["a"][idx], a["b"][idx]
                if a["a"].ndim == 4 and ga.ndim == 4:
                    # stacked-blocks bank (N, L, d_in, r) gathered with a
                    # (B,) index: (B, L, ..) -> (L, B, ..).  A SCALAR index
                    # keeps (L, d_in, r) — the single-adapter stacked form
                    # that lax.scan slices per layer.
                    ga = jnp.moveaxis(ga, 0, 1)
                    gb = jnp.moveaxis(gb, 0, 1)
                out["lora_a"] = ga
                out["lora_b"] = gb
                return out
            return p
        if isinstance(p, dict):
            return {
                k: walk(v, a.get(k) if isinstance(a, dict) else None)
                for k, v in p.items()
            }
        if isinstance(p, list):
            if isinstance(a, list):
                return [walk(v, av) for v, av in zip(p, a)]
            return p
        return p

    return walk(params, bank)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))


def resize_embeddings(params, new_vocab: int, key=None):
    """Grow (or shrink) the token embedding table + untied LM head to
    `new_vocab` rows — capability of the reference's
    `model.resize_token_embeddings(len(tokenizer))` after adding special
    tokens (reference src/models/trainer.py:580-587).  New rows initialize
    to the mean of existing embeddings (HF's default heuristic)."""
    import jax
    import jax.numpy as jnp

    out = dict(params)

    def grow_rows(table):
        old = table.shape[0]
        if new_vocab == old:
            return table
        if new_vocab < old:
            return table[:new_vocab]
        mean = jnp.mean(table, axis=0, keepdims=True)
        extra = jnp.broadcast_to(mean, (new_vocab - old, table.shape[1]))
        return jnp.concatenate([table, extra], axis=0)

    out["tok_embed"] = grow_rows(params["tok_embed"])
    if "lm_head" in params:
        head = dict(params["lm_head"])
        w = head["w"]  # (d_model, vocab)
        old = w.shape[1]
        if new_vocab < old:
            head["w"] = w[:, :new_vocab]
        elif new_vocab > old:
            mean = jnp.mean(w, axis=1, keepdims=True)
            extra = jnp.broadcast_to(mean, (w.shape[0], new_vocab - old))
            head["w"] = jnp.concatenate([w, extra], axis=1)
        out["lm_head"] = head
    return out
