"""Functional transformer building blocks (pure JAX, params as pytrees).

No module framework: every block is an ``init_*(key, ...) -> params`` +
``apply(params, x, ...) -> y`` pair.  This keeps the whole model a plain
pytree — LoRA surgery (models/lora.py), sharding rules (parallel/sharding.py)
and checkpointing (train/checkpoint.py) all operate on the same structure.

All matmuls run in bf16 with fp32 accumulation (``preferred_element_type``);
layer norms and softmax run in fp32 — the TPU-native equivalent of the
reference's accelerate ``mixed_precision: bf16`` configs.
"""

from __future__ import annotations

import contextvars

import jax
import jax.numpy as jnp

COMPUTE_DTYPE = jnp.bfloat16

# Trace-time flag set by remat_wrap("proj_bf16") while the wrapped layer
# body traces (forward AND the checkpoint's backward re-trace): dense()
# rounds its return value to bf16 and tags it "proj_bf16" so the policy
# saves exactly the projection outputs, in bf16.
_TAG_PROJ_BF16 = contextvars.ContextVar("tag_proj_bf16", default=False)


def _maybe_tag_proj(y):
    if _TAG_PROJ_BF16.get():
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(y.astype(COMPUTE_DTYPE), "proj_bf16")
    return y


def _matmul(x, w):
    return jnp.dot(
        x.astype(COMPUTE_DTYPE),
        w.astype(COMPUTE_DTYPE),
        preferred_element_type=jnp.float32,
    )


def remat_wrap(fn, policy_name: str):
    """Wrap a scan body in ``jax.checkpoint`` per ``ModelConfig.remat_policy``.

    - ``"full"``: classic per-layer remat — save only the layer boundary,
      recompute the whole layer forward in the backward pass.  Minimal
      memory; the recompute re-runs every matmul (~+2N FLOPs/token of the
      8N total) AND, on the flash path, the whole Pallas forward kernel.
    - ``"dots"``: selective remat — save matmul outputs (XLA dots with no
      batch dims: the q/k/v/o and MLP projections) plus the flash-attention
      kernel output AND logsumexp (tagged ``checkpoint_name`` "flash_out"/
      "flash_lse" in ops/attention.py's custom_vjp forwards — without the
      lse the Pallas forward would re-run in the backward just to
      regenerate that residual), recomputing only the cheap elementwise
      glue (norms, activations, nf4 dequants).  Trades ~B*T*(4*d + 2*ff)
      saved f32/layer for skipping the forward recompute (~25% of step
      FLOPs) — the standard TPU training trade once HBM allows it
      (measured numbers in docs/BENCHMARKS.md).
    - ``"proj_bf16"``: selective remat with BF16 saves — every
      projection output (layers.dense return value: qkv, attention out,
      MLP up/gate/down, incl. LoRA correction) is rounded to bf16 and
      saved, plus the flash kernel output/lse; the backward recomputes
      only norms/activations/residual glue.  Halves the saved-bytes
      cost that made ``dots`` OOM (XLA saves raw f32 dot accumulators;
      round-3 measured 22.6 GB at llama1b B=8) and, unlike ``dots``,
      also skips the nf4/int8 dequant re-gather in fused QLoRA.  The
      bf16 rounding of saved activations is the same precision the
      activation-dtype policy already applies to the residual stream;
      only this policy's saved tensors round — "full"/"dots" numerics
      are untouched (measured numbers in docs/BENCHMARKS.md round-5).
    - ``"none"``: no remat — scan saves everything XLA decides to keep
      (deep flash stacks typically OOM; small models profile fastest).

    Equivalent capability to torch's ``gradient_checkpointing_enable``
    (used by the reference at src/models/trainer.py:527-533), with the
    selectivity the reference's all-or-nothing flag lacks.
    """
    if policy_name == "none":
        return fn
    if policy_name == "dots":
        cp = jax.checkpoint_policies
        policy = cp.save_from_both_policies(
            cp.dots_with_no_batch_dims_saveable,
            cp.save_only_these_names("flash_out", "flash_lse"),
        )
        return jax.checkpoint(fn, policy=policy)
    if policy_name == "proj_bf16":
        def tagged(*a, **k):
            tok = _TAG_PROJ_BF16.set(True)
            try:
                return fn(*a, **k)
            finally:
                _TAG_PROJ_BF16.reset(tok)

        policy = jax.checkpoint_policies.save_only_these_names(
            "proj_bf16", "flash_out", "flash_lse"
        )
        return jax.checkpoint(tagged, policy=policy)
    if policy_name == "full":
        return jax.checkpoint(fn)
    raise ValueError(
        f"unknown remat_policy {policy_name!r}; "
        "want full | dots | proj_bf16 | none"
    )


# -----------------------------------------------------------------------------
# Dense
# -----------------------------------------------------------------------------


def init_dense(key, d_in: int, d_out: int, *, use_bias: bool = True):
    scale = 1.0 / jnp.sqrt(d_in)
    p = {"w": jax.random.uniform(key, (d_in, d_out), jnp.float32, -scale, scale)}
    if use_bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def dense(p, x):
    if "w_q" in p:
        from ..ops.w8_matmul import supports as _w8_supports

        q = p["w_q"]
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if (
            q.ndim == 2
            and q.dtype == jnp.int8
            and p.get("w_s") is not None
            and p["w_s"].shape[0] == 1  # int8c: per-output-channel scales
            and _w8_supports(rows, q.shape[0], q.shape[1])
        ):
            # serving decode hot path: the w8 GEMM kernel streams the
            # int8 weight from HBM at byte rate and folds the column
            # scale after the MXU contraction (ops/w8_matmul.py) — the
            # dequantize-then-matmul XLA path below writes a full bf16
            # copy of the weight every step and measured SLOWER than an
            # unquantized model (docs/BENCHMARKS.md round-4 serving)
            from ..ops.w8_matmul import w8_matmul

            xf = x.reshape(rows, x.shape[-1]).astype(COMPUTE_DTYPE)
            y = w8_matmul(xf, q, p["w_s"], out_dtype=jnp.float32)
            y = y.reshape(*x.shape[:-1], q.shape[1])
        else:
            # quantized base weight (models/quantize.py): dequantize at
            # the point of use — the bf16 copy is transient and sits
            # next to its matmul in the schedule (recomputed in the bwd
            # under remat)
            from .quantize import dequantize_weight

            y = _matmul(x, dequantize_weight(p, COMPUTE_DTYPE))
    else:
        y = _matmul(x, p["w"])
    if "b" in p:
        y = y + p["b"]
    if "lora_a" in p:
        if p["lora_a"].ndim == 3:
            # per-ROW adapters (multi-LoRA serving, lora.select_adapters):
            # lora_a (B, d_in, r) / lora_b (B, r, d_out) — each batch row
            # applies its own rank-r correction in one batched matmul
            # (lora_b carries alpha/r)
            xa = jnp.einsum(
                "b...i,bir->b...r",
                x.astype(COMPUTE_DTYPE),
                p["lora_a"].astype(COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            y = y + jnp.einsum(
                "b...r,bro->b...o",
                xa.astype(COMPUTE_DTYPE),
                p["lora_b"].astype(COMPUTE_DTYPE),
                preferred_element_type=jnp.float32,
            )
            return _maybe_tag_proj(y)
        # lazily applied LoRA on a quantized base (merge_lora attaches the
        # factors; lora_b already carries alpha/r): y += (x @ A) @ B — the
        # full-rank delta is never materialized (QLoRA compute)
        xa = jnp.dot(
            x.astype(COMPUTE_DTYPE),
            p["lora_a"].astype(COMPUTE_DTYPE),
            preferred_element_type=jnp.float32,
        )
        y = y + jnp.dot(
            xa.astype(COMPUTE_DTYPE),
            p["lora_b"].astype(COMPUTE_DTYPE),
            preferred_element_type=jnp.float32,
        )
    return _maybe_tag_proj(y)


# -----------------------------------------------------------------------------
# Layer norm (fp32)
# -----------------------------------------------------------------------------


def init_layernorm(d: int):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def layernorm(p, x, eps: float = 1e-6, out_dtype=None):
    """Normalize in fp32; ``out_dtype`` optionally casts the result (the
    bf16 activation policy halves the HBM traffic of the normalized
    stream — norm MATH always stays fp32)."""
    x = x.astype(jnp.float32)
    if "bias" not in p:
        # RMSNorm (llama family): no mean subtraction, no bias — the param
        # dict's shape selects the norm, keeping checkpoints self-describing
        out = x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps
        ) * p["scale"]
    else:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        out = (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return out if out_dtype is None else out.astype(out_dtype)


def init_rmsnorm(d: int):
    return {"scale": jnp.ones((d,), jnp.float32)}


# -----------------------------------------------------------------------------
# Rotary position embedding
# -----------------------------------------------------------------------------


def rope_frequencies(head_dim: int, max_len: int, theta: float = 10000.0):
    """Precompute (max_len, head_dim/2) cos/sin tables."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)  # (max_len, head_dim/2)
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x, cos, sin, positions):
    """x: (B, T, H, Dh); positions: (B, T) int32 absolute positions.

    Rotates only the first ``2 * cos.shape[-1]`` feature dims (partial
    rotary, GPT-NeoX rotary_pct); the rest pass through unchanged.
    """
    rot = 2 * cos.shape[-1]
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    cos_t = cos[positions][:, :, None, :]  # (B, T, 1, rot/2)
    sin_t = sin[positions][:, :, None, :]
    x1, x2 = jnp.split(x_rot.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate(
        [x1 * cos_t - x2 * sin_t, x2 * cos_t + x1 * sin_t], axis=-1
    ).astype(x.dtype)
    if x_pass.shape[-1]:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


def alibi_slopes(n_heads: int, mode: str = "bloom", bias_max: float = 8.0):
    """Per-head ALiBi slopes.

    ``mode="bloom"``: the published geometric sequence — for a power-of-two
    head count, slope_h = 2^(-8h/n); otherwise the closest LOWER power of
    two's sequence is extended with the odd terms of the doubled-head
    sequence (the HF ``build_alibi_tensor`` recipe, so imported BLOOM
    weights reproduce transformers logits exactly).

    ``mode="mpt"``: the MosaicML MPT recipe (HF ``build_mpt_alibi_tensor``
    — the MPT/PhoGPT family): slopes for the next HIGHER power of two
    n2 = 2^ceil(log2(n)) as 2^(-bias_max*h/n2), then for non-power-of-two
    head counts the odd-index terms are moved ahead of the even-index
    terms and the list truncated to n heads.  Identical to "bloom" for
    power-of-two head counts at bias_max=8.
    """
    import math

    if mode == "mpt":
        n2 = 2 ** math.ceil(math.log2(n_heads))
        slopes = [2.0 ** (-bias_max * i / n2) for i in range(1, n2 + 1)]
        if n2 != n_heads:
            slopes = (slopes[1::2] + slopes[0::2])[:n_heads]
        return jnp.asarray(slopes, jnp.float32)

    closest = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base ** i for i in range(1, closest + 1)]
    if closest != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        slopes += [
            extra_base ** i for i in range(1, 2 * (n_heads - closest) + 1, 2)
        ]
    return jnp.asarray(slopes, jnp.float32)


def alibi_bias(n_heads: int, key_positions, mode: str = "bloom",
               bias_max: float = 8.0):
    """(1, H, 1, K) additive attention-score bias: slope_h * key_position.

    ALiBi's relative form ``-slope * (q_pos - k_pos)`` differs from this
    key-only form by a per-query-row constant, which softmax ignores — so
    the key-only form is exact for causal attention while being O(K)
    instead of O(QK), independent of padding offsets (a per-row shift of
    both q and k positions is also a row constant).
    """
    slopes = alibi_slopes(n_heads, mode, bias_max)
    k = jnp.asarray(key_positions, jnp.float32)
    return slopes[None, :, None, None] * k[None, None, None, :]


# -----------------------------------------------------------------------------
# KV-cache quantization
# -----------------------------------------------------------------------------

# absmax scales below this are clamped (all-zero K/V rows: pad columns,
# fresh cache) so the dequant multiply never divides by zero
_KV_SCALE_EPS = 1e-8


def kv_quantize(x):
    """Per-(token, head) symmetric int8 quantization of a K/V slab.

    ``x`` (…, T, H, D) → ``(codes int8, scales f32 (…, T, H, 1))`` with
    ``codes * scales ≈ x`` (absmax/127 scaling, max elementwise error
    ``scales/2``).  Scales keep a trailing singleton dim so every cache
    leaf has the token axis at -3 — crop/widen/insert tree ops stay
    rank-uniform (models/decode_engine.py::crop_kv, prefill_extend).

    The serving capability this buys mirrors the reference's bitsandbytes
    8-bit side (reference src/models/trainer.py:470-487) applied to the
    DECODE bottleneck: each generated token re-reads the whole KV cache,
    so int8 halves the dominant HBM stream and doubles the requests a
    chip can hold resident.
    """
    x = x.astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0, _KV_SCALE_EPS
    )
    return jnp.round(x / s).astype(jnp.int8), s


def kv_dequantize(codes, scales, dtype=jnp.float32):
    """Inverse of :func:`kv_quantize` (exact given the stored scales)."""
    return (codes.astype(jnp.float32) * scales).astype(dtype)


# -----------------------------------------------------------------------------
# Attention
# -----------------------------------------------------------------------------


def init_attention(key, d_model: int, n_heads: int, *, n_kv_heads=None,
                   use_bias=True):
    """``use_bias``: True = all projections biased (GPT families), False =
    bias-free (llama), "qkv" = q/k/v only (Qwen2 family)."""
    ks = jax.random.split(key, 4)
    kv_dim = d_model if n_kv_heads is None else d_model // n_heads * n_kv_heads
    qkv_bias = use_bias in (True, "qkv")
    return {
        "wq": init_dense(ks[0], d_model, d_model, use_bias=qkv_bias),
        "wk": init_dense(ks[1], d_model, kv_dim, use_bias=qkv_bias),
        "wv": init_dense(ks[2], d_model, kv_dim, use_bias=qkv_bias),
        "wo": init_dense(ks[3], d_model, d_model, use_bias=use_bias is True),
    }


def _split_heads(x, n_heads: int):
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def cross_attention_kv(p, enc_out, n_heads: int) -> dict:
    """Project encoder output to head-split cross-attention K/V ONCE per
    sequence (the cross half of HF past_key_values).  Feed the result to
    ``attention(static_kv=...)``.  Under one jit XLA's loop-invariant code
    motion already hoists these projections out of a lax.scan decode loop
    (measured neutral, scripts/probe_cross_kv.py); the explicit cache
    guarantees it for eager/per-step callers and keeps the scan body lean."""
    return {
        "k": _split_heads(dense(p["wk"], enc_out), n_heads),
        "v": _split_heads(dense(p["wv"], enc_out), n_heads),
    }


def attention(
    p,
    x,
    *,
    n_heads: int,
    mask=None,
    kv_x=None,
    rope=None,
    positions=None,
    cache=None,
    cache_index=None,
    flash=None,
    bias=None,
    scale=None,
    n_kv_heads=None,
    static_kv=None,
    clip=None,
):
    """Multi-head attention.

    - self-attention: ``kv_x=None``; cross-attention: pass encoder output.
    - ``mask``: (B, Tq, Tk) or broadcastable boolean; True = attend.
    - ``rope``: optional (cos, sin) tables; ``positions`` (B, T) required.
    - ``cache``: optional dict {"k","v"} of (B, max_len, H, Dh) for
      autoregressive decode; new keys/values are written at
      ``cache_index`` and attention runs over the full cache.
      Returns (out, new_cache).
    - ``bias``: optional (1|B, H, Tq, Tk) additive score bias (MPNet/T5
      relative position bias), applied after the 1/sqrt(d) scaling.
    - ``scale``: score multiplier; None = 1/sqrt(head_dim).  GPT-Neo
      attends unscaled (scale=1.0).
    - ``n_kv_heads``: grouped-query attention (llama family) — k/v carry
      fewer heads; query head h reads kv head h // (n_heads // n_kv_heads).
      The KV cache stores the UNREPEATED heads (memory win is the point).
    - ``static_kv``: precomputed head-split K/V dict (cross-attention; see
      :func:`cross_attention_kv`) — skips the wk/wv projections entirely.
    - ``clip``: clamp q/k/v projection outputs to [-clip, clip] (MPT
      attn_config.clip_qkv; clamping the split projections equals HF's
      clamp of the fused Wqkv output).
    """

    def _cl(y):
        return y if clip is None else jnp.clip(y, -clip, clip)

    kv_in = x if kv_x is None else kv_x
    kv_h = n_heads if n_kv_heads is None else n_kv_heads
    q = _split_heads(_cl(dense(p["wq"], x)), n_heads)
    if static_kv is not None:
        # precomputed cross-attention K/V (cross_attention_kv): the encoder
        # projections are sequence-invariant, so decode loops compute them
        # once instead of once per generated token
        k, v = static_kv["k"], static_kv["v"]
    else:
        k = _split_heads(_cl(dense(p["wk"], kv_in)), kv_h)
        v = _split_heads(_cl(dense(p["wv"], kv_in)), kv_h)

    if rope is not None:
        cos, sin = rope
        q = apply_rope(q, cos, sin, positions)
        kpos = positions if kv_x is None else jnp.arange(k.shape[1])[None, :]
        k = apply_rope(k, cos, sin, kpos)

    new_cache = None
    k_fold = v_fold = None  # int8 KV: per-(token, head) scales to fold
    if cache is not None:
        quant = "k_s" in cache  # int8 KV cache (see kv_quantize)
        if quant:
            k_w, k_s = kv_quantize(k)
            v_w, v_s = kv_quantize(v)
        else:
            k_w, v_w = k.astype(cache["k"].dtype), v.astype(cache["v"].dtype)
        if getattr(cache_index, "ndim", 0) == 1:
            # per-row write offsets (B,) — speculative decode: rows accept
            # different numbers of drafted tokens, so their cache cursors
            # diverge and the uniform dynamic_update_slice no longer fits.
            # Scatter the (B, t) window at slots cache_index[b] + arange(t).
            b_idx = jnp.arange(k.shape[0])[:, None]
            slots = cache_index[:, None] + jnp.arange(k.shape[1])[None, :]
            new_cache = {
                "k": cache["k"].at[b_idx, slots].set(k_w),
                "v": cache["v"].at[b_idx, slots].set(v_w),
            }
            if quant:
                new_cache["k_s"] = cache["k_s"].at[b_idx, slots].set(k_s)
                new_cache["v_s"] = cache["v_s"].at[b_idx, slots].set(v_s)
        else:
            new_cache = {
                "k": jax.lax.dynamic_update_slice(
                    cache["k"], k_w, (0, cache_index, 0, 0)
                ),
                "v": jax.lax.dynamic_update_slice(
                    cache["v"], v_w, (0, cache_index, 0, 0)
                ),
            }
            if quant:
                new_cache["k_s"] = jax.lax.dynamic_update_slice(
                    cache["k_s"], k_s, (0, cache_index, 0, 0)
                )
                new_cache["v_s"] = jax.lax.dynamic_update_slice(
                    cache["v_s"], v_s, (0, cache_index, 0, 0)
                )
        k, v = new_cache["k"], new_cache["v"]
        if quant:
            # scale-FOLDING, not dequantization: the matmuls run on the
            # raw int8 codes (cast to bf16 — exact, |codes| <= 127) and
            # the per-(token, head) scales multiply the tiny (B, H, Q, K)
            # score/prob matrices below.  A full elementwise
            # codes*scales over the cache slab measured 0.64x the bf16
            # chunk on v5e (the f32 product stream swamps the int8 read
            # win); folding touches scale data 1/head_dim the size.
            k_fold, v_fold = new_cache["k_s"], new_cache["v_s"]

    if kv_h != n_heads:
        # repeat AFTER the cache write: query head h -> kv head h // rep
        # (matches HF repeat_kv interleaving)
        rep = n_heads // kv_h
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        if k_fold is not None:
            k_fold = jnp.repeat(k_fold, rep, axis=2)
            v_fold = jnp.repeat(v_fold, rep, axis=2)

    if flash is not None and cache is None and kv_x is None:
        # fused Pallas path (ops/attention.py); mask semantics are
        # ((causal?) x right-padded keys) expressed via flash["kv_lens"];
        # an additive (1, H, Tq, Tk) score bias rides along (fwd-only path)
        from ..ops.attention import flash_attention

        out = flash_attention(
            q,
            k,
            v,
            kv_lens=flash.get("kv_lens"),
            causal=flash.get("causal", True),
            scale=scale,
            bias=None if bias is None else jnp.asarray(bias)[0],
            window=flash.get("window"),
        )
        b_, t_ = out.shape[:2]
        return dense(p["wo"], out.reshape(b_, t_, -1)), None

    head_dim = q.shape[-1]
    if scale is None:
        scale = 1.0 / float(head_dim) ** 0.5
    logits = (
        jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.astype(COMPUTE_DTYPE),
            k.astype(COMPUTE_DTYPE),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    if k_fold is not None:
        # int8 KV scale-folding: logits[b,h,q,t] *= k_scale[b,t,h]
        logits = logits * jnp.swapaxes(k_fold[..., 0], 1, 2)[:, :, None, :]
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        logits = jnp.where(mask[:, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_fold is not None:
        # fold v scales into the prob matrix: out = (probs*s) @ codes
        probs = probs * jnp.swapaxes(v_fold[..., 0], 1, 2)[:, :, None, :]
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        probs.astype(COMPUTE_DTYPE),
        v.astype(COMPUTE_DTYPE),
        preferred_element_type=jnp.float32,
    )
    b, t = out.shape[:2]
    out = dense(p["wo"], out.reshape(b, t, -1))
    return out, new_cache


# -----------------------------------------------------------------------------
# MLP
# -----------------------------------------------------------------------------


def init_mlp(key, d_model: int, d_ff: int, *, gated: bool = False,
             use_bias: bool = True):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "wi": init_dense(k1, d_model, d_ff, use_bias=use_bias),
        "wo": init_dense(k2, d_ff, d_model, use_bias=use_bias),
    }
    if gated:
        p["wg"] = init_dense(k3, d_model, d_ff, use_bias=use_bias)
    return p


def mlp(p, x, activation: str = "gelu"):
    if "wg" in p:
        # gated MLP: act(x @ Wg) * (x @ Wi) @ Wo.  The gate activation is
        # silu (SwiGLU, llama family) unless the config explicitly asks
        # for the tanh-GELU gate ("gelu_new" — GeGLU, the Gemma family's
        # hidden_act="gelu_pytorch_tanh"); no gated family uses exact
        # gelu, so the default "gelu" keeps the llama meaning (silu).
        g = dense(p["wg"], x)
        a = (
            jax.nn.gelu(g, approximate=True) if activation == "gelu_new"
            else jax.nn.silu(g)
        )
        return dense(p["wo"], a * dense(p["wi"], x))
    # "gelu" = exact (erf), HF's default; "gelu_new" = tanh approximation
    # (GPT-Neo / GPT-2 families)
    h = jax.nn.gelu(dense(p["wi"], x), approximate=(activation == "gelu_new"))
    return dense(p["wo"], h)


# -----------------------------------------------------------------------------
# Transformer block (pre-LN)
# -----------------------------------------------------------------------------


def init_block(key, d_model: int, n_heads: int, d_ff: int, *,
               cross: bool = False, norm: str = "layernorm",
               gated_mlp: bool = False, n_kv_heads=None,
               use_bias=True):
    ks = jax.random.split(key, 5)
    init_norm = init_rmsnorm if norm == "rmsnorm" else init_layernorm
    p = {
        "ln1": init_norm(d_model),
        "attn": init_attention(
            ks[0], d_model, n_heads, n_kv_heads=n_kv_heads, use_bias=use_bias
        ),
        "ln2": init_norm(d_model),
        # "qkv" (Qwen2) biases the attention projections only
        "mlp": init_mlp(ks[1], d_model, d_ff, gated=gated_mlp,
                        use_bias=use_bias is True),
    }
    if cross:
        p["ln_cross"] = init_norm(d_model)
        p["cross_attn"] = init_attention(ks[2], d_model, n_heads)
    return p


def block(
    p,
    x,
    *,
    n_heads: int,
    mask=None,
    enc_out=None,
    enc_mask=None,
    rope=None,
    positions=None,
    cache=None,
    cache_index=None,
    eps: float = 1e-6,
    flash=None,
    parallel_residual: bool = False,
    norm_position: str = "pre",
    bias=None,
    scale=None,
    activation: str = "gelu",
    n_kv_heads=None,
    activation_dtype=None,
    cross_kv=None,
    clip=None,
):
    """``activation_dtype`` (e.g. bf16) keeps the residual stream and norm
    outputs in that dtype — the mixed-precision activation policy that
    halves inter-op HBM traffic.  Norm/softmax math stays fp32 regardless.
    None (default) = fp32 activations (exact-parity mode)."""
    adt = activation_dtype

    def cast(h):
        return h if adt is None else h.astype(adt)

    if norm_position == "post":
        # BERT layout: LN after each residual add (ln1 = attention-output
        # LN, ln2 = MLP-output LN)
        h, new_cache = attention(
            p["attn"], x, n_heads=n_heads, mask=mask, rope=rope,
            positions=positions, cache=cache, cache_index=cache_index,
            flash=flash, bias=bias, scale=scale, clip=clip,
        )
        x = layernorm(p["ln1"], x + cast(h), eps, out_dtype=adt)
        x = layernorm(
            p["ln2"], x + cast(mlp(p["mlp"], x, activation)), eps,
            out_dtype=adt,
        )
        return x, new_cache

    h, new_cache = attention(
        p["attn"],
        layernorm(p["ln1"], x, eps, out_dtype=adt),
        n_heads=n_heads,
        mask=mask,
        rope=rope,
        positions=positions,
        cache=cache,
        cache_index=cache_index,
        flash=flash,
        bias=bias,
        scale=scale,
        n_kv_heads=n_kv_heads,
        clip=clip,
    )
    if parallel_residual:
        # GPT-NeoX style: x + attn(ln1(x)) + mlp(ln2(x))
        m = mlp(p["mlp"], layernorm(p["ln2"], x, eps, out_dtype=adt), activation)
        return x + cast(h) + cast(m), new_cache
    x = x + cast(h)
    if enc_out is not None or cross_kv is not None:
        h, _ = attention(
            p["cross_attn"],
            layernorm(p["ln_cross"], x, eps, out_dtype=adt),
            n_heads=n_heads,
            mask=enc_mask,
            kv_x=enc_out,
            static_kv=cross_kv,
        )
        x = x + cast(h)
    x = x + cast(mlp(p["mlp"], layernorm(p["ln2"], x, eps, out_dtype=adt), activation))
    return x, new_cache


# -----------------------------------------------------------------------------
# Masks
# -----------------------------------------------------------------------------


def causal_mask(t: int):
    """(1, T, T) boolean lower-triangular mask."""
    return jnp.tril(jnp.ones((1, t, t), jnp.bool_))


def padding_mask(attn_mask):
    """attn_mask (B, T) {0,1} -> (B, 1, T) key-side mask."""
    return attn_mask[:, None, :].astype(jnp.bool_)
