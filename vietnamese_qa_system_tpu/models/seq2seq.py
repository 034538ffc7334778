"""Encoder-decoder (seq2seq) LM with cross-attention.

Capability of the reference's SEQ_2_SEQ_LM task path
(`AutoModelForSeq2SeqLM`, reference src/models/trainer.py:536-544; mt5 in
reference src/test.py:106-147; the prompt/target split in
reference src/data/configs/advance_instruct_sample.py:60-100).
Decoder uses RoPE; encoder uses learned positions, matching the two stacks'
different roles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .causal_lm import IGNORE_INDEX
from .layers import (
    block,
    causal_mask,
    init_block,
    init_layernorm,
    layernorm,
    padding_mask,
    rope_frequencies,
)


def init_seq2seq(key, cfg: ModelConfig):
    n_dec = cfg.decoder_layers
    ks = jax.random.split(key, cfg.n_layers + n_dec + 4)
    params = {
        "tok_embed": jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model)) * 0.02,
        "enc_pos_embed": jax.random.normal(ks[1], (cfg.max_seq_len, cfg.d_model))
        * 0.02,
        "enc_blocks": [
            init_block(ks[2 + i], cfg.d_model, cfg.n_heads, cfg.d_ff)
            for i in range(cfg.n_layers)
        ],
        "enc_ln_f": init_layernorm(cfg.d_model),
        "dec_blocks": [
            init_block(
                ks[2 + cfg.n_layers + i], cfg.d_model, cfg.n_heads, cfg.d_ff,
                cross=True,
            )
            for i in range(n_dec)
        ],
        "dec_ln_f": init_layernorm(cfg.d_model),
    }
    return params


def encode(params, cfg: ModelConfig, ids, attn_mask):
    b, t = ids.shape
    x = params["tok_embed"][ids] + params["enc_pos_embed"][:t][None]
    mask = jnp.broadcast_to(padding_mask(attn_mask), (b, t, t))
    for p_blk in params["enc_blocks"]:
        x, _ = block(p_blk, x, n_heads=cfg.n_heads, mask=mask, eps=cfg.norm_eps)
    return layernorm(params["enc_ln_f"], x, cfg.norm_eps)


def precompute_cross_kv(params, cfg: ModelConfig, enc_out):
    """Per-layer cross-attention K/V, computed once per sequence.  Decode
    loops pass this to ``decode(cross_kv=...)`` so each generated token
    reuses the projections instead of re-running dense(wk/wv, enc_out) in
    every layer at every step (the HF past_key_values cross half)."""
    from .layers import cross_attention_kv

    return [
        cross_attention_kv(p_blk["cross_attn"], enc_out, cfg.n_heads)
        for p_blk in params["dec_blocks"]
    ]


def decode(
    params,
    cfg: ModelConfig,
    dec_ids,
    enc_out,
    enc_mask,
    dec_mask=None,
    *,
    positions=None,
    cache=None,
    cache_index=None,
    hidden_only: bool = False,
    cross_kv=None,
):
    b, t = dec_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = params["tok_embed"][dec_ids]
    rope = rope_frequencies(cfg.head_dim, cfg.max_seq_len, cfg.rope_theta)
    cross_mask = jnp.broadcast_to(
        padding_mask(enc_mask), (b, t, enc_mask.shape[1])
    )
    if cache is None:
        self_mask = causal_mask(t)
        if dec_mask is not None:
            self_mask = self_mask & dec_mask[:, None, :].astype(jnp.bool_)
        new_caches = None
        for p_blk in params["dec_blocks"]:
            x, _ = block(
                p_blk, x, n_heads=cfg.n_heads, mask=self_mask,
                enc_out=enc_out, enc_mask=cross_mask,
                rope=rope, positions=positions, eps=cfg.norm_eps,
            )
    else:
        if cross_kv is None:
            # same work as projecting inside each layer; decode loops
            # (models/generate.py) hoist this out of their step scan
            cross_kv = precompute_cross_kv(params, cfg, enc_out)
        new_caches = []
        for p_blk, layer_cache, layer_ckv in zip(
            params["dec_blocks"], cache, cross_kv
        ):
            x, nc = block(
                p_blk, x, n_heads=cfg.n_heads, mask=dec_mask,
                enc_mask=cross_mask, cross_kv=layer_ckv,
                rope=rope, positions=positions,
                cache=layer_cache, cache_index=cache_index, eps=cfg.norm_eps,
            )
            new_caches.append(nc)
    x = layernorm(params["dec_ln_f"], x, cfg.norm_eps)
    if hidden_only:
        return (x, new_caches) if cache is not None else x
    logits = jnp.dot(
        x.astype(jnp.bfloat16),
        params["tok_embed"].T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (logits, new_caches) if cache is not None else logits


def forward(params, cfg: ModelConfig, batch):
    enc_out = encode(params, cfg, batch["input_ids"], batch["attention_mask"])
    return decode(
        params,
        cfg,
        batch["decoder_input_ids"],
        enc_out,
        batch["attention_mask"],
        batch.get("decoder_attention_mask"),
    )


def loss_fn(params, cfg: ModelConfig, batch):
    """Seq2seq cross-entropy.  Decoder inputs are the labels shifted right
    (teacher forcing); -100 labels are excluded — the convention of the
    reference's DataCollatorForSeq2Seq path (reference
    src/data/dataloader.py:513).  Real vocabularies stream the tied LM
    head chunk-wise (ops/xent.py) so full logits never materialize."""
    labels = batch["labels"]
    start = jnp.zeros_like(labels[:, :1])  # BOS = 0 by convention
    dec_in = jnp.concatenate([start, jnp.where(labels == IGNORE_INDEX, 0, labels)[:, :-1]], axis=1)
    dec_mask = (labels != IGNORE_INDEX).astype(jnp.int32)
    enc_out = encode(params, cfg, batch["input_ids"], batch["attention_mask"])
    from .causal_lm import CHUNKED_XENT_MIN_VOCAB

    if cfg.vocab_size >= CHUNKED_XENT_MIN_VOCAB:
        from ..ops.xent import masked_mean_xent

        h = decode(
            params, cfg, dec_in, enc_out, batch["attention_mask"], dec_mask,
            hidden_only=True,
        )
        return masked_mean_xent(
            h, params["tok_embed"].T, labels, IGNORE_INDEX
        )
    logits = decode(
        params, cfg, dec_in, enc_out, batch["attention_mask"], dec_mask
    )
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, token_ll, 0.0)) / n, n
