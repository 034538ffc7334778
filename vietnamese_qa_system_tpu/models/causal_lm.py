"""Decoder-only causal LM (RoPE/NeoX and learned-position/GPT-Neo/GPT-2
families, tied or untied LM head).

Capability of the reference's CAUSAL_LM task path (`AutoModelForCausalLM`
load at reference src/models/trainer.py:536-551; gpt-neo-125m in reference
scripts/train.sh:7, pythia-410m in scripts/train_test.sh:9, the gpt2
special case at trainer.py:529), rebuilt as a functional JAX transformer:
static shapes, fp32 loss accumulation, -100 label masking identical to the
reference collators (reference src/data/dataloader.py:397,406,456).
GPT-Neo's alternating local attention is a static sliding-window mask in
cache-slot space (see ``_window_mask``); real HF weights for all three
families import via models/convert_hf.py and are verified against
transformers logits in tests/test_convert_hf.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .layers import (
    alibi_bias,
    block,
    causal_mask,
    init_block,
    init_dense,
    init_layernorm,
    init_rmsnorm,
    layernorm,
    remat_wrap,
    rope_frequencies,
)

IGNORE_INDEX = -100  # label positions excluded from the loss


def stack_blocks(params: dict) -> dict:
    """List-of-blocks pytree -> stacked pytree with a leading layer dim
    (the scan-over-layers format; every block leaf becomes (L, ...)).
    Idempotent on already-stacked params."""
    blocks = params["blocks"]
    if isinstance(blocks, dict):
        return params
    out = dict(params)
    out["blocks"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *blocks
    )
    return out


def unstack_blocks(params: dict, n_layers: int) -> dict:
    """Inverse of :func:`stack_blocks` (for HF export / interop)."""
    blocks = params["blocks"]
    if isinstance(blocks, list):
        return params
    out = dict(params)
    out["blocks"] = [
        jax.tree_util.tree_map(lambda x: x[i], blocks) for i in range(n_layers)
    ]
    return out


def blocks_stacked(params: dict) -> bool:
    return isinstance(params["blocks"], dict)


def init_causal_lm(key, cfg: ModelConfig):
    ks = jax.random.split(key, cfg.n_layers + 4)
    if (
        cfg.scan_layers
        and cfg.attention_layers is not None
        and len(set(cfg.attention_layers)) > 1
    ):
        raise ValueError(
            "scan_layers requires homogeneous layers (GPT-Neo's "
            "local/global alternation cannot be scanned; an all-local "
            "Mistral-style stack can)"
        )
    params = {
        "tok_embed": jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model)) * 0.02,
        "blocks": [
            init_block(
                ks[1 + i], cfg.d_model, cfg.n_heads, cfg.d_ff,
                norm=cfg.norm, gated_mlp=cfg.mlp_gated,
                n_kv_heads=cfg.n_kv_heads, use_bias=cfg.attention_bias,
            )
            for i in range(cfg.n_layers)
        ],
        "ln_f": (
            init_rmsnorm(cfg.d_model) if cfg.norm == "rmsnorm"
            else init_layernorm(cfg.d_model)
        ),
    }
    if cfg.positional == "learned":
        # GPT-Neo / GPT-2 family: learned absolute position table (wpe)
        params["pos_embed"] = (
            jax.random.normal(ks[-2], (cfg.max_seq_len, cfg.d_model)) * 0.02
        )
    if cfg.embed_layernorm:
        # BLOOM family: LayerNorm over the token embeddings
        params["emb_ln"] = init_layernorm(cfg.d_model)
    if not cfg.tie_embeddings:
        params["lm_head"] = init_dense(
            ks[-1], cfg.d_model, cfg.vocab_size, use_bias=False
        )
    if cfg.scan_layers:
        params = stack_blocks(params)
    return params


def _layer_kinds(cfg: ModelConfig):
    """Per-layer attention kind: "global" | "local" (GPT-Neo alternates;
    everything else is all-global)."""
    if cfg.attention_layers is None:
        return ("global",) * cfg.n_layers
    assert len(cfg.attention_layers) == cfg.n_layers
    return cfg.attention_layers


def _window_mask(q_slots, k_slots, window: int):
    """Sliding-window constraint in cache-SLOT space: a query may see keys
    at most ``window - 1`` slots behind it.  Slot distance equals logical
    position distance on every path we run (right-padded training batches:
    slot == position; left-padded decode: query and key positions shift by
    the same per-row pad offset), so this is exact for GPT-Neo local
    attention while staying shape-static.  ``q_slots`` may be (T,) or — on
    the speculative path with per-row cache cursors — (B, T), yielding a
    broadcastable (B, T, K) mask."""
    return (q_slots[..., :, None] - k_slots[None, :]) < window


def hidden_states(
    params,
    cfg: ModelConfig,
    ids,
    attn_mask=None,
    *,
    positions=None,
    cache=None,
    cache_index=None,
):
    """ids (B, T) → final-layernorm hidden states (B, T, D) fp32 (the LM
    head is applied by :func:`forward`, or streamed chunk-wise by the
    training loss — see ops/xent.py).

    With ``cache`` (KV dict per layer, see models/generate.py) the mask must
    cover the cache length and ``(x, new_caches)`` is returned; used for
    autoregressive decode.
    """
    b, t = ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = params["tok_embed"][ids]
    if cfg.scale_embedding:
        # Gemma (and mBART-style) sqrt(d_model) embedding scaling
        x = x * jnp.asarray(cfg.d_model**0.5, x.dtype)
    rope = None
    if cfg.positional == "learned":
        x = x + params["pos_embed"][positions]
    elif cfg.positional == "rope":
        rot = int(cfg.head_dim * cfg.rope_pct)
        rot -= rot % 2
        rope = rope_frequencies(rot, cfg.max_seq_len, cfg.rope_theta)
    # "alibi" (BLOOM): no position signal at the embedding; a per-head
    # linear score bias is added inside attention (see `bias` below)
    adt = jnp.bfloat16 if cfg.activations_bf16 else None
    if cfg.embed_layernorm:
        x = layernorm(params["emb_ln"], x, cfg.norm_eps, out_dtype=adt)
    elif adt is not None:
        x = x.astype(adt)
    kinds = _layer_kinds(cfg)
    has_local = "local" in kinds
    alibi = cfg.positional == "alibi"

    if cache is None:
        flash = None
        bias = (
            alibi_bias(cfg.n_heads, jnp.arange(t), cfg.alibi_mode,
                       cfg.alibi_bias_max)
            if alibi else None
        )
        mask = causal_mask(t)
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, :].astype(jnp.bool_)
        if cfg.use_flash_attention:
            # right-padded batches: the (causal & padding) mask is exactly
            # (kv_lens, causal=True) for the fused kernel.  kv_lens=None
            # (no mask) compiles the kernel's lens-free specialization
            # (see ops/attention._fa_kernel); loss_fn drops the mask
            # entirely (exact — see its docstring).
            lens = (
                jnp.sum(attn_mask, axis=1).astype(jnp.int32)
                if attn_mask is not None
                else None
            )
            flash = {"kv_lens": lens, "causal": True}
        local_mask = None
        flash_local = None
        if has_local:
            slots = jnp.arange(t)
            local_mask = mask & _window_mask(slots, slots, cfg.attention_window)
            if flash is not None:
                # (causal & padding & window) is exactly the fused kernel's
                # sliding-window mode — local layers stay on the flash path
                flash_local = dict(flash, window=cfg.attention_window)
        new_caches = None
        # scan stacks are homogeneous: all-local stacks (Mistral-style
        # sliding window) scan with the local mask/kernel.  init_causal_lm
        # guards this at init, but a mixed pytree stacked externally via
        # stack_blocks would otherwise silently compute EVERY layer as
        # local — enforce it here too.
        scan_mask = local_mask if has_local else mask
        scan_flash = flash_local if has_local else flash
        if blocks_stacked(params):
            if len(set(kinds)) > 1:
                raise ValueError(
                    "scan-over-layers requires homogeneous attention_layers "
                    f"(got {sorted(set(kinds))}); keep mixed global/local "
                    "stacks as list pytrees"
                )
            # scan-over-layers: one traced/compiled layer regardless of
            # depth, with per-layer remat (the standard TPU checkpointing
            # granularity — bwd recomputes one layer at a time)
            def body(h, p_blk):
                h2, _ = block(
                    p_blk, h, n_heads=cfg.n_heads, mask=scan_mask,
                    rope=rope, positions=positions, eps=cfg.norm_eps,
                    flash=scan_flash,
                    parallel_residual=cfg.parallel_residual,
                    scale=cfg.attention_scale, activation=cfg.activation,
                    n_kv_heads=cfg.n_kv_heads, bias=bias, clip=cfg.clip_qkv,
                    activation_dtype=adt,
                )
                return h2, None

            # blocks emit f32 activations unless the bf16 policy is on;
            # pin the carry dtype for scan's type invariance
            x, _ = jax.lax.scan(
                remat_wrap(body, cfg.remat_policy),
                x.astype(adt or jnp.float32),
                params["blocks"],
            )
        else:
            for p_blk, kind in zip(params["blocks"], kinds):
                local = kind == "local"
                x, _ = block(
                    p_blk, x, n_heads=cfg.n_heads,
                    mask=local_mask if local else mask,
                    rope=rope, positions=positions, eps=cfg.norm_eps,
                    flash=flash_local if local else flash,
                    parallel_residual=cfg.parallel_residual,
                    scale=cfg.attention_scale, activation=cfg.activation,
                    n_kv_heads=cfg.n_kv_heads, bias=bias, clip=cfg.clip_qkv,
                    activation_dtype=adt,
                )
    else:
        # decode step: keys live in the cache; mask is (B, T, cache_len)
        # (for ALiBi the bias uses cache-SLOT positions: a per-row padding
        # shift of all key positions is a softmax row constant — see
        # layers.alibi_bias)
        cache_len = (
            cache["k"].shape[2] if blocks_stacked(params)
            else cache[0]["k"].shape[1]
        )
        bias = (
            alibi_bias(cfg.n_heads, jnp.arange(cache_len), cfg.alibi_mode,
                       cfg.alibi_bias_max)
            if alibi else None
        )
        mask = attn_mask
        local_mask = None
        if has_local:
            if getattr(cache_index, "ndim", 0) == 1:
                q_slots = cache_index[:, None] + jnp.arange(t)[None, :]
            else:
                q_slots = cache_index + jnp.arange(t)
            k_slots = jnp.arange(cache_len)
            local_mask = mask & _window_mask(
                q_slots, k_slots, cfg.attention_window
            )
        if blocks_stacked(params):
            # stacked KV cache: leaves carry a leading layer dim (see
            # models/generate.py::_make_cache); scan threads (layer
            # params, layer cache) together and re-stacks the new cache
            def body(h, xs):
                p_blk, layer_cache = xs
                h2, nc = block(
                    p_blk, h, n_heads=cfg.n_heads,
                    mask=local_mask if has_local else mask,
                    rope=rope, positions=positions,
                    cache=layer_cache, cache_index=cache_index,
                    eps=cfg.norm_eps,
                    parallel_residual=cfg.parallel_residual,
                    scale=cfg.attention_scale, activation=cfg.activation,
                    n_kv_heads=cfg.n_kv_heads, bias=bias, clip=cfg.clip_qkv,
                    activation_dtype=adt,
                )
                return h2, nc

            x, new_caches = jax.lax.scan(
                body, x.astype(adt or jnp.float32), (params["blocks"], cache)
            )
        else:
            new_caches = []
            for p_blk, layer_cache, kind in zip(params["blocks"], cache, kinds):
                x, nc = block(
                    p_blk, x, n_heads=cfg.n_heads,
                    mask=local_mask if kind == "local" else mask,
                    rope=rope, positions=positions,
                    cache=layer_cache, cache_index=cache_index, eps=cfg.norm_eps,
                    parallel_residual=cfg.parallel_residual,
                    scale=cfg.attention_scale, activation=cfg.activation,
                    n_kv_heads=cfg.n_kv_heads, bias=bias, clip=cfg.clip_qkv,
                    activation_dtype=adt,
                )
                new_caches.append(nc)

    x = layernorm(params["ln_f"], x, cfg.norm_eps)
    if cache is not None:
        return x, new_caches
    return x


def _head_weight(params, cfg: ModelConfig):
    """(D, V) classifier matrix: embedding transpose for tied heads."""
    if cfg.tie_embeddings:
        return params["tok_embed"].T
    return params["lm_head"]["w"]


def forward(
    params,
    cfg: ModelConfig,
    ids,
    attn_mask=None,
    *,
    positions=None,
    cache=None,
    cache_index=None,
):
    """ids (B, T) → logits (B, T, V) fp32 (hidden_states + LM head)."""
    out = hidden_states(
        params, cfg, ids, attn_mask,
        positions=positions, cache=cache, cache_index=cache_index,
    )
    x, new_caches = out if cache is not None else (out, None)
    logits = jnp.dot(
        x.astype(jnp.bfloat16),
        _head_weight(params, cfg).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (logits, new_caches) if cache is not None else logits


# Vocabularies at least this large take the chunked streaming loss
# (ops/xent.py): the (B*T, V) fp32 logits of the naive path are ~1.6 GB
# per step for the gpt-125m preset — pure HBM traffic on the TPU's usual
# bottleneck.  Small test vocabularies keep the simple path.
CHUNKED_XENT_MIN_VOCAB = 16384


def loss_fn(params, cfg: ModelConfig, batch):
    """Next-token cross-entropy with -100 masking.

    batch: {"input_ids" (B,T), "attention_mask" (B,T), "labels" (B,T)}.
    Labels use the reference's convention: IGNORE_INDEX (-100) positions
    (padding + prompt tokens under completion-only masking) are excluded.
    Returns (mean_loss, n_target_tokens).

    Real-vocabulary models stream the classifier in chunks so full logits
    never materialize (ops/xent.py); the paths are numerically equivalent
    (tested to 1e-5 on loss and grads).

    The attention mask is deliberately NOT passed to the forward: with
    right padding and causal attention, no real query can attend a padded
    key (pads sit at positions >= the query's), and padded positions carry
    IGNORE_INDEX labels, so their logits never reach the loss — identical
    loss AND grads (tested), while the maskless forward compiles the flash
    kernel's simpler lens-free specialization (ops/attention).
    """
    labels = batch["labels"][:, 1:]
    if cfg.vocab_size >= CHUNKED_XENT_MIN_VOCAB:
        from ..ops.xent import masked_mean_xent

        h = hidden_states(params, cfg, batch["input_ids"], None)
        return masked_mean_xent(
            h[:, :-1], _head_weight(params, cfg), labels, IGNORE_INDEX
        )
    logits = forward(params, cfg, batch["input_ids"], None)
    logits = logits[:, :-1]
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid, token_ll, 0.0)) / n
    return loss, n
