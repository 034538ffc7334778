"""Bidirectional sentence encoder: token+position embed → pre-LN blocks →
masked mean-pool → L2 norm.

Capability of the sentence-transformers encoders the reference uses inside
txtai (`paraphrase-MiniLM-L12-v2` / `paraphrase-mpnet-base-v2`,
reference inference_pipeline/db_utils/heavy_ranker.py:78-88 and
src/test.py:97-101): text → fixed-size normalized embedding for
inner-product retrieval.
"""

from __future__ import annotations

import functools

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
    ks = jax.random.split(key, cfg.n_layers + 5)
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
    elif cfg.embed_layernorm:
        # MPNet-style: LayerNorm over word+position, no token-type table
        params["emb_ln"] = init_layernorm(cfg.d_model)
    if cfg.relative_attention_buckets:
        # one (buckets, heads) bias table shared by every layer (MPNet
        # encoder.relative_attention_bias)
        params["rel_bias"] = (
            jax.random.normal(
                ks[-2], (cfg.relative_attention_buckets, cfg.n_heads)
            )
            * scale
        )
    if cfg.norm_position == "pre":
        params["ln_f"] = init_layernorm(cfg.d_model)
    return params


def _relative_position_bucket(rel, num_buckets: int, max_distance: int):
    """T5/MPNet bidirectional log-bucketing of relative positions.

    rel = key_pos - query_pos; half the buckets cover each sign, the
    near half of those are exact and the far half log-spaced up to
    ``max_distance`` (matches HF MPNetEncoder.relative_position_bucket)."""
    n = -rel
    half = num_buckets // 2
    ret = (n < 0).astype(jnp.int32) * half
    n = jnp.abs(n)
    max_exact = half // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, half - 1)
    return ret + jnp.where(is_small, n, val_large)


def relative_attention_bias(table, t: int, cfg: ModelConfig):
    """(buckets, H) table -> (1, H, T, T) additive attention bias."""
    pos = jnp.arange(t)
    rel = pos[None, :] - pos[:, None]  # key - query
    buckets = _relative_position_bucket(
        rel,
        cfg.relative_attention_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = table[buckets]  # (T, T, H)
    return jnp.transpose(bias, (2, 0, 1))[None]


def encode(params, cfg: ModelConfig, ids, attn_mask):
    """ids/attn_mask: (B, T) int32 / {0,1}.  Returns (B, T, D) fp32 hidden."""
    t = ids.shape[1]
    if cfg.position_offset:
        # RoBERTa/MPNet indexing: the i-th real token sits at position
        # i + offset, padding at offset - 1 (HF create_position_ids_from_
        # input_ids with padding_idx = offset - 1)
        pos_ids = (
            jnp.cumsum(attn_mask, axis=1) * attn_mask + cfg.position_offset - 1
        )
        pos = params["pos_embed"][pos_ids]
    else:
        pos = params["pos_embed"][:t][None]
    adt = jnp.bfloat16 if cfg.activations_bf16 else None
    x = params["tok_embed"][ids] + pos
    if cfg.bert_embeddings:
        x = x + params["type_embed"][0][None, None, :]
    if cfg.bert_embeddings or cfg.embed_layernorm:
        x = layernorm(params["emb_ln"], x, cfg.norm_eps, out_dtype=adt)
    elif adt is not None:
        x = x.astype(adt)
    bias = None
    if cfg.relative_attention_buckets:
        bias = relative_attention_bias(params["rel_bias"], t, cfg)
    mask = padding_mask(attn_mask)[:, None, 0, :]  # (B, 1, T) -> broadcast (B, Tq, Tk)
    mask = jnp.broadcast_to(mask, (ids.shape[0], t, t))
    flash = None
    if cfg.use_flash_attention and t >= 256:
        # bidirectional fused path: right-padded key masking via kv_lens,
        # relative bias rides into the kernel (differentiable for q/k/v;
        # the bias table gets a zero cotangent — fine here: the retrieval
        # encoders are inference models).  Only pays off at longer
        # sequences: at T=128 the (BH, 1, 1) grid of tiny blocks loses to
        # XLA's batched einsum (measured 94.9 vs 82.1 ms for mpnet-class
        # B=256; identical outputs), while at T>=256 the O(T^2) score
        # materialization XLA writes to HBM starts to dominate.
        lens = jnp.sum(attn_mask, axis=1).astype(jnp.int32)
        flash = {"kv_lens": lens, "causal": False}
    for p_blk in params["blocks"]:
        x, _ = block(
            p_blk, x, n_heads=cfg.n_heads, mask=mask, eps=cfg.norm_eps,
            norm_position=cfg.norm_position, bias=bias, flash=flash,
            activation_dtype=adt,
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


# One shared jitted entry point for every embed call site (ingest, query,
# serving): distinct module-level `jax.jit` wrappers are distinct cache
# entries, so `cli serve` (which builds both a Retriever and an
# IngestPipeline over the SAME params/shapes) would compile the identical
# encoder program twice — minutes of avoidable latency on the axon
# remote-compile tunnel.
jit_sentence_embed = functools.partial(jax.jit, static_argnames=("cfg",))(
    sentence_embed
)
