"""Bidirectional sentence encoder: token+position embed → pre-LN blocks →
masked mean-pool → L2 norm.

Capability of the sentence-transformers encoders the reference uses inside
txtai (`paraphrase-MiniLM-L12-v2` / `paraphrase-mpnet-base-v2`,
reference inference_pipeline/db_utils/heavy_ranker.py:78-88 and
src/test.py:97-101): text → fixed-size normalized embedding for
inner-product retrieval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .layers import (
    block,
    init_block,
    init_layernorm,
    layernorm,
    padding_mask,
)


def init_encoder(key, cfg: ModelConfig):
    ks = jax.random.split(key, cfg.n_layers + 4)
    scale = 0.02
    params = {
        "tok_embed": jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model)) * scale,
        "pos_embed": jax.random.normal(ks[1], (cfg.max_seq_len, cfg.d_model)) * scale,
        "blocks": [
            init_block(ks[2 + i], cfg.d_model, cfg.n_heads, cfg.d_ff)
            for i in range(cfg.n_layers)
        ],
    }
    if cfg.bert_embeddings:
        # BERT-style: token-type table + LayerNorm over the summed embeddings
        params["type_embed"] = (
            jax.random.normal(ks[-1], (2, cfg.d_model)) * scale
        )
        params["emb_ln"] = init_layernorm(cfg.d_model)
    if cfg.norm_position == "pre":
        params["ln_f"] = init_layernorm(cfg.d_model)
    return params


def encode(params, cfg: ModelConfig, ids, attn_mask):
    """ids/attn_mask: (B, T) int32 / {0,1}.  Returns (B, T, D) fp32 hidden."""
    t = ids.shape[1]
    x = params["tok_embed"][ids] + params["pos_embed"][:t][None]
    if cfg.bert_embeddings:
        x = x + params["type_embed"][0][None, None, :]
        x = layernorm(params["emb_ln"], x, cfg.norm_eps)
    mask = padding_mask(attn_mask)[:, None, 0, :]  # (B, 1, T) -> broadcast (B, Tq, Tk)
    mask = jnp.broadcast_to(mask, (ids.shape[0], t, t))
    for p_blk in params["blocks"]:
        x, _ = block(
            p_blk, x, n_heads=cfg.n_heads, mask=mask, eps=cfg.norm_eps,
            norm_position=cfg.norm_position,
        )
    if cfg.norm_position == "pre":
        return layernorm(params["ln_f"], x, cfg.norm_eps)
    return x.astype(jnp.float32)


def sentence_embed(params, cfg: ModelConfig, ids, attn_mask):
    """Masked mean-pool + L2 normalize → (B, D) unit embeddings.

    Mirrors the sentence-transformers pooling used by the reference's
    txtai indexes so inner product == cosine similarity.
    """
    h = encode(params, cfg, ids, attn_mask)
    m = attn_mask[:, :, None].astype(jnp.float32)
    pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)
