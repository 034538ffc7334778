"""Decoder-only causal LM with RoPE and tied LM head.

Capability of the reference's CAUSAL_LM task path (`AutoModelForCausalLM`
load at reference src/models/trainer.py:536-551, gpt-neo/pythia models in
reference scripts/train*.sh), rebuilt as a functional JAX transformer:
static shapes, fp32 loss accumulation, -100 label masking identical to the
reference collators (reference src/data/dataloader.py:397,406,456).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .layers import (
    block,
    causal_mask,
    init_block,
    init_dense,
    init_layernorm,
    layernorm,
    rope_frequencies,
)

IGNORE_INDEX = -100  # label positions excluded from the loss


def init_causal_lm(key, cfg: ModelConfig):
    ks = jax.random.split(key, cfg.n_layers + 3)
    params = {
        "tok_embed": jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model)) * 0.02,
        "blocks": [
            init_block(ks[1 + i], cfg.d_model, cfg.n_heads, cfg.d_ff)
            for i in range(cfg.n_layers)
        ],
        "ln_f": init_layernorm(cfg.d_model),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = init_dense(
            ks[-1], cfg.d_model, cfg.vocab_size, use_bias=False
        )
    return params


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
    """ids (B, T) → logits (B, T, V) fp32.

    With ``cache`` (KV dict per layer, see models/generate.py) the mask must
    cover the cache length; used for autoregressive decode.
    """
    b, t = ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = params["tok_embed"][ids]
    rot = int(cfg.head_dim * cfg.rope_pct)
    rot -= rot % 2
    rope = rope_frequencies(rot, cfg.max_seq_len, cfg.rope_theta)

    if cache is None:
        flash = None
        mask = causal_mask(t)
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, :].astype(jnp.bool_)
        if cfg.use_flash_attention:
            # right-padded batches: the (causal & padding) mask is exactly
            # (kv_lens, causal=True) for the fused kernel
            lens = (
                jnp.sum(attn_mask, axis=1).astype(jnp.int32)
                if attn_mask is not None
                else jnp.full((b,), t, jnp.int32)
            )
            flash = {"kv_lens": lens, "causal": True}
        new_caches = None
        for p_blk in params["blocks"]:
            x, _ = block(
                p_blk, x, n_heads=cfg.n_heads, mask=mask,
                rope=rope, positions=positions, eps=cfg.norm_eps,
                flash=flash, parallel_residual=cfg.parallel_residual,
            )
    else:
        # decode step: keys live in the cache; mask is (B, T, cache_len)
        mask = attn_mask
        new_caches = []
        for p_blk, layer_cache in zip(params["blocks"], cache):
            x, nc = block(
                p_blk, x, n_heads=cfg.n_heads, mask=mask,
                rope=rope, positions=positions,
                cache=layer_cache, cache_index=cache_index, eps=cfg.norm_eps,
                parallel_residual=cfg.parallel_residual,
            )
            new_caches.append(nc)

    x = layernorm(params["ln_f"], x, cfg.norm_eps)
    if cfg.tie_embeddings:
        logits = jnp.dot(
            x.astype(jnp.bfloat16),
            params["tok_embed"].T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        from .layers import dense

        logits = dense(params["lm_head"], x)
    return (logits, new_caches) if cache is not None else logits


def loss_fn(params, cfg: ModelConfig, batch):
    """Next-token cross-entropy with -100 masking.

    batch: {"input_ids" (B,T), "attention_mask" (B,T), "labels" (B,T)}.
    Labels use the reference's convention: IGNORE_INDEX (-100) positions
    (padding + prompt tokens under completion-only masking) are excluded.
    Returns (mean_loss, n_target_tokens).
    """
    logits = forward(params, cfg, batch["input_ids"], batch.get("attention_mask"))
    logits = logits[:, :-1]
    labels = batch["labels"][:, 1:]
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid, token_ll, 0.0)) / n
    return loss, n
