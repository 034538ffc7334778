"""T5/mT5-family encoder-decoder: faithful HF layout for weight import.

The reference fine-tunes mt5 with LoRA (reference src/test.py:106-147) and
its trainer loads any ``AutoModelForSeq2SeqLM`` for the SEQ_2_SEQ_LM task
(reference src/models/trainer.py:536-544).  ``models/seq2seq.py`` is the
framework's native encoder-decoder; this module is the *import-compatible*
family so real t5/mt5/flan-t5 checkpoints load and match HF outputs
(models/convert_hf.py::load_t5).

Architecture facts honoured (vs the native stack):

- T5 LayerNorm: RMS, no bias, no mean subtraction (the bias-free param
  dict selects RMS in :func:`layers.layernorm`).
- No absolute position embeddings; a SHARED per-stack bucketed relative
  attention bias, owned by layer 0 in the HF checkpoint (bidirectional
  buckets for the encoder, causal buckets for the decoder; cross-attention
  has no bias).
- Attention scores are UNSCALED (no 1/sqrt(d_kv) — absorbed into init),
  and the attention inner dim is ``n_heads * d_kv`` which may differ from
  ``d_model`` (mt5-small: 6*64=384 vs 512).
- FFN: v1.1/mt5 gated-gelu (wi_0 gelu_new gate * wi_1, then wo); v1.0
  relu(wi) -> wo.  No biases anywhere.
- Logits: tied head scales hidden by d_model**-0.5 (T5 v1.0); mt5/v1.1
  use an untied lm_head with no scaling.
- decoder_start_token_id = pad = 0 (the shift-right convention in
  :func:`loss_fn` matches ``seq2seq.loss_fn``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .causal_lm import IGNORE_INDEX
from .encoder import _relative_position_bucket
from .layers import (
    attention,
    causal_mask,
    dense,
    init_dense,
    layernorm,
    padding_mask,
    remat_wrap,
)


def _init_rms(d):
    return {"scale": jnp.ones((d,), jnp.float32)}


def _init_attn(key, d_model: int, inner: int):
    ks = jax.random.split(key, 4)
    return {
        "wq": init_dense(ks[0], d_model, inner, use_bias=False),
        "wk": init_dense(ks[1], d_model, inner, use_bias=False),
        "wv": init_dense(ks[2], d_model, inner, use_bias=False),
        "wo": init_dense(ks[3], inner, d_model, use_bias=False),
    }


def _init_ffn(key, cfg: ModelConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "wi": init_dense(k1, cfg.d_model, cfg.d_ff, use_bias=False),
        "wo": init_dense(k2, cfg.d_ff, cfg.d_model, use_bias=False),
    }
    if cfg.mlp_gated:
        p["wg"] = init_dense(k3, cfg.d_model, cfg.d_ff, use_bias=False)
    return p


def _ffn(p, x, cfg: ModelConfig):
    if "wg" in p:
        # v1.1/mt5 gated-gelu: gelu_new(wi_0(x)) * wi_1(x) -> wo
        h = jax.nn.gelu(dense(p["wg"], x), approximate=True) * dense(p["wi"], x)
    else:
        h = jax.nn.relu(dense(p["wi"], x))
    return dense(p["wo"], h)


def init_t5(key, cfg: ModelConfig):
    inner = cfg.n_heads * cfg.head_dim
    n_dec = cfg.decoder_layers
    # encoder blocks draw 2 keys each, decoder blocks 3 (self + cross +
    # ffn); +8 covers embeddings/bias tables/head with slack
    ks = jax.random.split(key, 2 * cfg.n_layers + 3 * n_dec + 8)
    it = iter(ks)

    def enc_block():
        return {
            "ln1": _init_rms(cfg.d_model),
            "attn": _init_attn(next(it), cfg.d_model, inner),
            "ln2": _init_rms(cfg.d_model),
            "mlp": _init_ffn(next(it), cfg),
        }

    def dec_block():
        return {
            "ln1": _init_rms(cfg.d_model),
            "attn": _init_attn(next(it), cfg.d_model, inner),
            "ln_cross": _init_rms(cfg.d_model),
            "cross_attn": _init_attn(next(it), cfg.d_model, inner),
            "ln2": _init_rms(cfg.d_model),
            "mlp": _init_ffn(next(it), cfg),
        }

    params = {
        "tok_embed": jax.random.normal(next(it), (cfg.vocab_size, cfg.d_model))
        * 1.0,
        "enc_rel_bias": jax.random.normal(
            next(it), (cfg.relative_attention_buckets, cfg.n_heads)
        )
        * 0.02,
        "dec_rel_bias": jax.random.normal(
            next(it), (cfg.relative_attention_buckets, cfg.n_heads)
        )
        * 0.02,
        "enc_blocks": [enc_block() for _ in range(cfg.n_layers)],
        "enc_ln_f": _init_rms(cfg.d_model),
        "dec_blocks": [dec_block() for _ in range(n_dec)],
        "dec_ln_f": _init_rms(cfg.d_model),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {
            "w": jax.random.normal(next(it), (cfg.d_model, cfg.vocab_size))
            * 0.02
        }
    if cfg.scan_layers:
        params = stack_t5(params)
    return params


def _causal_bucket(rel, num_buckets: int, max_distance: int):
    """T5 UNIDIRECTIONAL bucketing (decoder self-attention): rel =
    key_pos - query_pos; future keys (rel > 0) collapse to bucket 0, past
    distances use all ``num_buckets`` (near-exact, far log-spaced) —
    matches HF T5Attention._relative_position_bucket(bidirectional=False)."""
    n = -jnp.minimum(rel, 0)  # distance into the past, >= 0
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return jnp.where(is_small, n, val_large)


def _enc_bias(table, t: int, cfg: ModelConfig):
    """(buckets, H) -> (1, H, T, T) bidirectional bias (same bucketing as
    MPNet — HF MPNet copied T5's function verbatim)."""
    pos = jnp.arange(t)
    rel = pos[None, :] - pos[:, None]
    buckets = _relative_position_bucket(
        rel, cfg.relative_attention_buckets,
        cfg.relative_attention_max_distance,
    )
    return jnp.transpose(table[buckets], (2, 0, 1))[None]


def _dec_bias(table, q_pos, kv_len: int, cfg: ModelConfig,
              per_row: bool = False):
    """(buckets, H) -> causal bias for query positions ``q_pos`` (1-D int
    array) against keys 0..kv_len-1.

    ``per_row=False``: q_pos indexes query SLOTS of one shared layout —
    returns (1, H, Tq, Tk).  ``per_row=True``: q_pos is one position PER
    BATCH ROW (the slot engine's diverging cursors, decode_engine.py) —
    returns (B, H, 1, Tk)."""
    rel = jnp.arange(kv_len)[None, :] - q_pos[:, None]
    buckets = _causal_bucket(
        rel, cfg.relative_attention_buckets,
        cfg.relative_attention_max_distance,
    )
    if per_row:
        return jnp.transpose(table[buckets], (0, 2, 1))[:, :, None, :]
    return jnp.transpose(table[buckets], (2, 0, 1))[None]


def _enc_layer(p, x, cfg, mask, bias, flash=None):
    h, _ = attention(
        p["attn"], layernorm(p["ln1"], x, cfg.norm_eps),
        n_heads=cfg.n_heads, mask=mask, bias=bias, scale=1.0, flash=flash,
    )
    x = x + h
    x = x + _ffn(p["mlp"], layernorm(p["ln2"], x, cfg.norm_eps), cfg)
    return x


def stack_t5(params: dict) -> dict:
    """List-of-blocks -> stacked (leading layer dim) pytree for both
    stacks — the scan-over-layers format (see models/causal_lm.py).
    Idempotent on already-stacked params."""
    if isinstance(params["enc_blocks"], dict):
        return params
    out = dict(params)
    for k in ("enc_blocks", "dec_blocks"):
        out[k] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params[k])
    return out


def unstack_t5(params: dict, cfg: ModelConfig) -> dict:
    """Inverse of :func:`stack_t5` (HF export / interop)."""
    if isinstance(params["enc_blocks"], list):
        return params
    out = dict(params)
    for k, n in (("enc_blocks", cfg.n_layers), ("dec_blocks", cfg.decoder_layers)):
        out[k] = [
            jax.tree_util.tree_map(lambda x: x[i], params[k]) for i in range(n)
        ]
    return out


def t5_stacked(params: dict) -> bool:
    return isinstance(params["enc_blocks"], dict)


def encode(params, cfg: ModelConfig, ids, attn_mask):
    """ids/attn_mask: (B, T).  Returns (B, T, D) fp32 hidden states.

    With ``cfg.use_flash_attention`` (and T >= 256, below which XLA's
    batched einsum wins), self-attention runs the fused Pallas kernel with
    the relative bias riding in-kernel.  The fused path gives the bias
    TABLE a zero cotangent — exact for inference and LoRA training (tables
    frozen); full fine-tuning must keep flash off (the trainer guards
    this).
    """
    b, t = ids.shape
    x = params["tok_embed"][ids]
    bias = _enc_bias(params["enc_rel_bias"], t, cfg)
    mask = jnp.broadcast_to(padding_mask(attn_mask), (b, t, t))
    flash = None
    if cfg.use_flash_attention and t >= 256:
        lens = jnp.sum(attn_mask, axis=1).astype(jnp.int32)
        flash = {"kv_lens": lens, "causal": False}
    if t5_stacked(params):
        # scan-over-layers with per-layer remat: one traced/compiled layer
        # regardless of depth (kills the per-layer Mosaic compiles that
        # dominate deep flash models; see docs/BENCHMARKS.md)
        def body(h, p_blk):
            return _enc_layer(p_blk, h, cfg, mask, bias, flash=flash), None

        # blocks emit f32 (fp32-accum matmuls + residual); pin the carry
        # dtype so bf16 embeddings don't break scan's type invariance
        x, _ = jax.lax.scan(
            remat_wrap(body, cfg.remat_policy),
            x.astype(jnp.float32), params["enc_blocks"],
        )
    else:
        for p_blk in params["enc_blocks"]:
            x = _enc_layer(p_blk, x, cfg, mask, bias, flash=flash)
    return layernorm(params["enc_ln_f"], x, cfg.norm_eps)


def _logits(params, cfg: ModelConfig, x):
    if "lm_head" in params:
        return dense(params["lm_head"], x)
    # tied head (T5 v1.0): scale hidden by d_model**-0.5 before the
    # embedding-transpose projection (HF T5ForConditionalGeneration)
    from .layers import _matmul

    x = x * (cfg.d_model ** -0.5)
    return _matmul(x, params["tok_embed"].T)


def precompute_cross_kv(params, cfg: ModelConfig, enc_out):
    """Per-layer cross-attention K/V computed once per sequence (the HF
    past_key_values cross half).  Stacked params return a stacked pytree
    with a leading layer dim so the decode scan consumes it as xs."""
    from .layers import cross_attention_kv

    if t5_stacked(params):
        return jax.vmap(
            lambda p_blk: cross_attention_kv(
                p_blk["cross_attn"], enc_out, cfg.n_heads
            )
        )(params["dec_blocks"])
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
    """Same signature/contract as :func:`seq2seq.decode` so the shared
    generation/beam-search drivers (models/generate.py) dispatch on the
    config's family without branching on call shape.  ``hidden_only``
    skips the LM head (the chunked training loss streams it instead)."""
    b, t = dec_ids.shape
    x = params["tok_embed"][dec_ids]
    cross_mask = jnp.broadcast_to(
        padding_mask(enc_mask), (b, t, enc_mask.shape[1])
    )

    if cache is None:
        pos = jnp.arange(t)
        self_bias = _dec_bias(params["dec_rel_bias"], pos, t, cfg)
        self_mask = causal_mask(t)
        if dec_mask is not None:
            self_mask = self_mask & dec_mask[:, None, :].astype(jnp.bool_)
        flash = None
        if cfg.use_flash_attention and t >= 256:
            # fused causal self-attention with the in-kernel relative bias
            # (zero bias-table cotangent — LoRA/inference only, see encode)
            # kv_lens=None drops the kernel's lens operand (the fast
            # specialization, ops/attention._fa_kernel)
            lens = (
                jnp.sum(dec_mask, axis=1).astype(jnp.int32)
                if dec_mask is not None
                else None
            )
            flash = {"kv_lens": lens, "causal": True}
        new_caches = None

        def dec_layer(h, p_blk):
            a, _ = attention(
                p_blk["attn"], layernorm(p_blk["ln1"], h, cfg.norm_eps),
                n_heads=cfg.n_heads, mask=self_mask, bias=self_bias,
                scale=1.0, flash=flash,
            )
            h = h + a
            a, _ = attention(
                p_blk["cross_attn"],
                layernorm(p_blk["ln_cross"], h, cfg.norm_eps),
                n_heads=cfg.n_heads, kv_x=enc_out, mask=cross_mask,
                scale=1.0,
            )
            h = h + a
            return h + _ffn(
                p_blk["mlp"], layernorm(p_blk["ln2"], h, cfg.norm_eps), cfg
            )

        if t5_stacked(params):
            x, _ = jax.lax.scan(
                remat_wrap(lambda h, p: (dec_layer(h, p), None),
                           cfg.remat_policy),
                x.astype(jnp.float32), params["dec_blocks"],
            )
        else:
            for p_blk in params["dec_blocks"]:
                x = dec_layer(x, p_blk)
    else:
        total = (
            cache["k"].shape[2] if t5_stacked(params)
            else cache[0]["k"].shape[1]
        )
        # per-step bias row for the current query position (cache_index);
        # a (B,) cache_index (slot-engine diverging cursors) gets one
        # bias row per batch row
        per_row = getattr(cache_index, "ndim", 0) == 1
        q_pos = jnp.zeros((1,), jnp.int32) + cache_index
        self_bias = _dec_bias(
            params["dec_rel_bias"], q_pos, total, cfg, per_row=per_row
        )
        if cross_kv is None:
            # same work as projecting inside each layer; decode loops
            # (models/generate.py) hoist this out of their step scan
            cross_kv = precompute_cross_kv(params, cfg, enc_out)

        def dec_layer_cached(h, p_blk, layer_cache, layer_ckv):
            a, nc = attention(
                p_blk["attn"], layernorm(p_blk["ln1"], h, cfg.norm_eps),
                n_heads=cfg.n_heads, mask=dec_mask, bias=self_bias,
                scale=1.0, cache=layer_cache, cache_index=cache_index,
            )
            h = h + a
            a, _ = attention(
                p_blk["cross_attn"],
                layernorm(p_blk["ln_cross"], h, cfg.norm_eps),
                n_heads=cfg.n_heads, mask=cross_mask,
                scale=1.0, static_kv=layer_ckv,
            )
            h = h + a
            h = h + _ffn(
                p_blk["mlp"], layernorm(p_blk["ln2"], h, cfg.norm_eps), cfg
            )
            return h, nc

        if t5_stacked(params):
            def body(h, xs):
                p_blk, layer_cache, layer_ckv = xs
                return dec_layer_cached(h, p_blk, layer_cache, layer_ckv)

            x, new_caches = jax.lax.scan(
                body,
                x.astype(jnp.float32),
                (params["dec_blocks"], cache, cross_kv),
            )
        else:
            new_caches = []
            for p_blk, layer_cache, layer_ckv in zip(
                params["dec_blocks"], cache, cross_kv
            ):
                x, nc = dec_layer_cached(x, p_blk, layer_cache, layer_ckv)
                new_caches.append(nc)
    x = layernorm(params["dec_ln_f"], x, cfg.norm_eps)
    if hidden_only:
        return (x, new_caches) if cache is not None else x
    logits = _logits(params, cfg, x)
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
    """Identical convention to seq2seq.loss_fn (shift-right with start=0 =
    T5's decoder_start_token_id=pad, -100 ignored).

    Real (mt5-sized, V=250k) vocabularies stream the LM head chunk-wise
    so full logits never materialize (ops/xent.py)."""
    from .causal_lm import CHUNKED_XENT_MIN_VOCAB

    labels = batch["labels"]
    start = jnp.zeros_like(labels[:, :1])
    dec_in = jnp.concatenate(
        [start, jnp.where(labels == IGNORE_INDEX, 0, labels)[:, :-1]], axis=1
    )
    dec_mask = (labels != IGNORE_INDEX).astype(jnp.int32)
    enc_out = encode(params, cfg, batch["input_ids"], batch["attention_mask"])
    if cfg.vocab_size >= CHUNKED_XENT_MIN_VOCAB:
        from ..ops.xent import masked_mean_xent

        h = decode(
            params, cfg, dec_in, enc_out, batch["attention_mask"], dec_mask,
            hidden_only=True,
        )
        if "lm_head" in params:
            w = params["lm_head"]["w"]
        else:
            h = h * (cfg.d_model ** -0.5)
            w = params["tok_embed"].T
        return masked_mean_xent(h, w, labels, IGNORE_INDEX)
    logits = decode(
        params, cfg, dec_in, enc_out, batch["attention_mask"], dec_mask
    )
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, token_ll, 0.0)) / n, n
