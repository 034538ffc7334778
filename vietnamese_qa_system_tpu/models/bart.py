"""mBART-family encoder-decoder: faithful HF layout for weight import.

The reference's actual translation model is ``vinai/vinai-translate-en2vi``
(reference src/data/features/final_storge_converted/data_parser.py:75-93
loads it 4-bit for the offline en→vi branch; reference src/test.py:27-38
drives it manually) — an mBART-architecture seq2seq.  ``models/t5.py``
covers the reference's mt5 path; this module covers the mBART layout so
vinai-translate / mbart-50-class checkpoints load and match HF outputs
(models/convert_hf.py::load_mbart), and plug into `etl/translate.py`'s
``Seq2SeqTranslator`` — closing the translation-model parity loop.

Architecture facts honoured (HF ``modeling_mbart.py``):

- Shared token embedding, scaled by sqrt(d_model) when
  ``scale_embedding`` (mBART sets it); tied LM head plus the
  ``final_logits_bias`` row (a zeros buffer in practice, imported anyway).
- LEARNED absolute positions with a +2 offset (HF
  MBartLearnedPositionalEmbedding stores ``max_position_embeddings + 2``
  rows and indexes at ``position + 2``); per-stack tables.
- ``layernorm_embedding`` right after embed+pos, per stack.
- Pre-LN blocks (mBART ``normalize_before``): x + attn(ln(x)), with a
  final ``layer_norm`` on each stack's output.  (Vanilla post-LN BART is
  NOT this module; the importer rejects model_type "bart".)
- Standard 1/sqrt(head_dim) attention scaling; q/k/v/out projections all
  carry biases; FFN is fc2(act(fc1)) with biases, activation "gelu" (erf).
- decoder_start_token_id = eos (2); generation then FORCES the target
  language id as the first produced token (``forced_bos_token_id``) —
  threaded through models/generate.py's GenerationConfig.
- Training shift: mBART's ``shift_tokens_right`` ROTATES — the last
  non-pad label token (the language id) wraps to decoder position 0
  (see :func:`loss_fn`), unlike T5's pad-start shift.

``decode`` keeps the exact call contract of ``seq2seq.decode`` /
``t5.decode`` so the shared generation, beam, and slot-engine drivers
(models/generate.py, models/decode_engine.py) dispatch by family without
branching on call shape.  No scan-over-layers form: mBART-50-class depth
(12+12) compiles fine unrolled; ``init_bart`` rejects ``scan_layers``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .causal_lm import IGNORE_INDEX
from .layers import (
    attention,
    causal_mask,
    dense,
    init_dense,
    init_layernorm,
    layernorm,
    padding_mask,
)

POS_OFFSET = 2  # HF MBartLearnedPositionalEmbedding offset


def _init_attn(key, d_model: int):
    ks = jax.random.split(key, 4)
    return {
        "wq": init_dense(ks[0], d_model, d_model),
        "wk": init_dense(ks[1], d_model, d_model),
        "wv": init_dense(ks[2], d_model, d_model),
        "wo": init_dense(ks[3], d_model, d_model),
    }


def _init_ffn(key, cfg: ModelConfig):
    k1, k2 = jax.random.split(key, 2)
    return {
        "fc1": init_dense(k1, cfg.d_model, cfg.d_ff),
        "fc2": init_dense(k2, cfg.d_ff, cfg.d_model),
    }


def _act(cfg: ModelConfig, x):
    if cfg.activation == "relu":
        return jax.nn.relu(x)
    # "gelu" = erf form (HF ACT2FN default, mBART's activation_function);
    # "gelu_new" = tanh approximation
    return jax.nn.gelu(x, approximate=cfg.activation == "gelu_new")


def _ffn(p, x, cfg: ModelConfig):
    return dense(p["fc2"], _act(cfg, dense(p["fc1"], x)))


def init_bart(key, cfg: ModelConfig):
    if cfg.scan_layers:
        raise ValueError(
            "the bart family has no scan-over-layers form (mBART-class "
            "depth compiles fine unrolled) — set scan_layers=False"
        )
    n_dec = cfg.decoder_layers
    ks = jax.random.split(key, 2 * cfg.n_layers + 3 * n_dec + 8)
    it = iter(ks)

    def enc_block():
        return {
            "ln1": init_layernorm(cfg.d_model),
            "attn": _init_attn(next(it), cfg.d_model),
            "ln2": init_layernorm(cfg.d_model),
            "mlp": _init_ffn(next(it), cfg),
        }

    def dec_block():
        return {
            "ln1": init_layernorm(cfg.d_model),
            "attn": _init_attn(next(it), cfg.d_model),
            "ln_cross": init_layernorm(cfg.d_model),
            "cross_attn": _init_attn(next(it), cfg.d_model),
            "ln2": init_layernorm(cfg.d_model),
            "mlp": _init_ffn(next(it), cfg),
        }

    pos_rows = cfg.max_seq_len + POS_OFFSET
    return {
        "tok_embed": jax.random.normal(next(it), (cfg.vocab_size, cfg.d_model))
        * 0.02,
        "enc_pos_embed": jax.random.normal(next(it), (pos_rows, cfg.d_model))
        * 0.02,
        "dec_pos_embed": jax.random.normal(next(it), (pos_rows, cfg.d_model))
        * 0.02,
        "enc_ln_emb": init_layernorm(cfg.d_model),
        "dec_ln_emb": init_layernorm(cfg.d_model),
        "enc_blocks": [enc_block() for _ in range(cfg.n_layers)],
        "enc_ln_f": init_layernorm(cfg.d_model),
        "dec_blocks": [dec_block() for _ in range(n_dec)],
        "dec_ln_f": init_layernorm(cfg.d_model),
    }


def _embed_scale(cfg: ModelConfig) -> float:
    return float(cfg.d_model) ** 0.5 if cfg.scale_embedding else 1.0


def encode(params, cfg: ModelConfig, ids, attn_mask):
    """ids/attn_mask: (B, T).  Returns (B, T, D) fp32 hidden states."""
    b, t = ids.shape
    x = params["tok_embed"][ids] * _embed_scale(cfg)
    x = x + params["enc_pos_embed"][POS_OFFSET : POS_OFFSET + t][None]
    x = layernorm(params["enc_ln_emb"], x, cfg.norm_eps)
    mask = jnp.broadcast_to(padding_mask(attn_mask), (b, t, t))
    for p_blk in params["enc_blocks"]:
        h, _ = attention(
            p_blk["attn"], layernorm(p_blk["ln1"], x, cfg.norm_eps),
            n_heads=cfg.n_heads, mask=mask,
        )
        x = x + h
        x = x + _ffn(p_blk["mlp"], layernorm(p_blk["ln2"], x, cfg.norm_eps), cfg)
    return layernorm(params["enc_ln_f"], x, cfg.norm_eps)


def precompute_cross_kv(params, cfg: ModelConfig, enc_out):
    """Per-layer cross-attention K/V, computed once per sequence (the HF
    past_key_values cross half; see seq2seq.precompute_cross_kv)."""
    from .layers import cross_attention_kv

    return [
        cross_attention_kv(p_blk["cross_attn"], enc_out, cfg.n_heads)
        for p_blk in params["dec_blocks"]
    ]


def _logits(params, x):
    from .layers import _matmul

    out = _matmul(x, params["tok_embed"].T)
    if "logits_bias" in params:
        # final_logits_bias is a zeros buffer in every published mBART
        # checkpoint; the importer stores it ONLY when nonzero, so its
        # presence in the pytree is self-describing (like the rmsnorm
        # scale-only convention in layers.layernorm)
        out = out + params["logits_bias"]
    return out


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
    """Same signature/contract as :func:`seq2seq.decode`.  ``positions``
    are ABSOLUTE decoder positions (0-based; the +2 HF table offset is
    applied here); cached per-slot decode passes per-row cursors."""
    b, t = dec_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = params["tok_embed"][dec_ids] * _embed_scale(cfg)
    x = x + params["dec_pos_embed"][positions + POS_OFFSET]
    x = layernorm(params["dec_ln_emb"], x, cfg.norm_eps)
    cross_mask = jnp.broadcast_to(
        padding_mask(enc_mask), (b, t, enc_mask.shape[1])
    )
    if cross_kv is None:
        # same work as projecting inside each layer; decode loops hoist
        # this out of their step scan (models/generate.py)
        if cache is not None:
            cross_kv = precompute_cross_kv(params, cfg, enc_out)

    def dec_layer(h, p_blk, layer_cache, layer_ckv):
        if cache is None:
            self_mask = causal_mask(t)
            if dec_mask is not None:
                self_mask = self_mask & dec_mask[:, None, :].astype(jnp.bool_)
        else:
            self_mask = dec_mask
        a, nc = attention(
            p_blk["attn"], layernorm(p_blk["ln1"], h, cfg.norm_eps),
            n_heads=cfg.n_heads, mask=self_mask,
            cache=layer_cache, cache_index=cache_index,
        )
        h = h + a
        if layer_ckv is not None:
            a, _ = attention(
                p_blk["cross_attn"],
                layernorm(p_blk["ln_cross"], h, cfg.norm_eps),
                n_heads=cfg.n_heads, mask=cross_mask, static_kv=layer_ckv,
            )
        else:
            a, _ = attention(
                p_blk["cross_attn"],
                layernorm(p_blk["ln_cross"], h, cfg.norm_eps),
                n_heads=cfg.n_heads, kv_x=enc_out, mask=cross_mask,
            )
        h = h + a
        return h + _ffn(
            p_blk["mlp"], layernorm(p_blk["ln2"], h, cfg.norm_eps), cfg
        ), nc

    if cache is None:
        for p_blk in params["dec_blocks"]:
            x, _ = dec_layer(x, p_blk, None, None)
        new_caches = None
    else:
        new_caches = []
        for p_blk, layer_cache, layer_ckv in zip(
            params["dec_blocks"], cache, cross_kv
        ):
            x, nc = dec_layer(x, p_blk, layer_cache, layer_ckv)
            new_caches.append(nc)
    x = layernorm(params["dec_ln_f"], x, cfg.norm_eps)
    if hidden_only:
        return (x, new_caches) if cache is not None else x
    logits = _logits(params, x)
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


def shift_labels_mbart(labels, pad_id: int = 1):
    """mBART's ``shift_tokens_right``: decoder inputs are the labels
    ROTATED right by one, with the last non-ignored token of each row
    (the language id in mBART's ``X </s> <lid>`` target format) wrapped
    to position 0 — NOT a pad/BOS start (HF modeling_mbart.py).
    IGNORE_INDEX positions become ``pad_id`` in the decoder stream."""
    clean = jnp.where(labels == IGNORE_INDEX, pad_id, labels)
    valid = labels != IGNORE_INDEX
    # index of the last valid token per row (rows with no valid token — all
    # masked — fall back to 0; their loss contributes nothing anyway)
    last = jnp.maximum(
        jnp.sum(valid.astype(jnp.int32), axis=1) - 1, 0
    )
    start = jnp.take_along_axis(clean, last[:, None], axis=1)
    return jnp.concatenate([start, clean[:, :-1]], axis=1)


def loss_fn(params, cfg: ModelConfig, batch):
    """Seq2seq cross-entropy with the mBART rotation shift (see
    :func:`shift_labels_mbart`); -100 labels are excluded.  Real
    vocabularies (mbart-50: 250k) stream the tied LM head chunk-wise
    (ops/xent.py) so full logits never materialize."""
    from .causal_lm import CHUNKED_XENT_MIN_VOCAB

    labels = batch["labels"]
    dec_in = shift_labels_mbart(labels)
    dec_mask = (labels != IGNORE_INDEX).astype(jnp.int32)
    enc_out = encode(params, cfg, batch["input_ids"], batch["attention_mask"])
    if cfg.vocab_size >= CHUNKED_XENT_MIN_VOCAB:
        from ..ops.xent import masked_mean_xent

        if "logits_bias" in params:
            # the chunked streaming head has no bias hook; a checkpoint
            # with a genuinely nonzero final_logits_bias (none published)
            # must take the materialized-logits path below
            raise ValueError(
                "chunked xent does not support a nonzero final_logits_bias"
            )
        h = decode(
            params, cfg, dec_in, enc_out, batch["attention_mask"], dec_mask,
            hidden_only=True,
        )
        return masked_mean_xent(h, params["tok_embed"].T, labels, IGNORE_INDEX)
    logits = decode(
        params, cfg, dec_in, enc_out, batch["attention_mask"], dec_mask
    )
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, token_ll, 0.0)) / n, n
