"""Autoregressive generation with a static-shape KV cache.

Capability of the reference's `inference_model.generate(...)` eval path
(reference src/models/trainer.py:942-946,1005-1030) rebuilt TPU-first:
prompts are LEFT-padded to a fixed length (the reference also pads left for
causal generation, src/data/dataloader.py:183), the cache is a fixed
(B, prompt+max_new, H, Dh) buffer per layer, and the decode loop is a
`jax.lax.scan` over `max_new_tokens` steps — one traced program, no
data-dependent shapes.  RoPE positions are logical (pads excluded) via
cumsum of the attention mask.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .config import ModelConfig
from . import causal_lm


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Typed subset of the reference's HF GenerationConfig surface
    (reference src/models/trainer.py:390-413: the eval/generation flags
    threaded from the ~80-flag argparse into inference_model.generate).
    ``num_beams > 1`` switches to deterministic beam search; otherwise
    ``temperature == 0`` is greedy and ``> 0`` samples."""

    max_new_tokens: int = 32
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    min_new_tokens: int = 0
    no_repeat_ngram_size: int = 0
    num_beams: int = 1
    length_penalty: float = 1.0
    seed: int = 0
    # "ngram" = prompt-lookup speculative decoding, "draft" = draft-model
    # speculative decoding (token-exact greedy / distribution-exact
    # sampled; beyond-parity serving capability — see generate_speculative
    # and generate_speculative_draft; "draft" needs the `draft=` pair on
    # generate_with_config)
    speculative: str = "none"
    draft_tokens: int = 8
    draft_ngram: int = 3
    # "int8" stores the KV cache quantized (layers.kv_quantize): half the
    # per-token HBM read at a small logits perturbation.  Causal
    # greedy/sampled path only (beams/seq2seq/speculative keep bf16).
    kv_dtype: str = "bf16"
    # mBART-style forced first generated token (HF forced_bos_token_id):
    # the target-language id for translation checkpoints like
    # vinai-translate (models/bart.py).  Seq2seq paths only.
    forced_bos_token_id: int | None = None
    # HF forced_eos_token_id (an MBartConfig DEFAULT): rows still running
    # at the last step emit eos instead of their argmax.  Seq2seq only.
    forced_eos_token_id: int | None = None


def generate_with_config(
    params,
    cfg: ModelConfig,
    ids,
    attn_mask,
    gen: GenerationConfig,
    *,
    eos_id: int | None = None,
    bos_id: int = 0,
    draft=None,
):
    """Dispatch a GenerationConfig to the right decode loop.

    ``draft``: (draft_params, draft_cfg) pair, required when
    ``gen.speculative == "draft"``.

    Returns (B, T+max_new) for causal (prompt included) and
    (B, max_new) for seq2seq — matching generate()/generate_seq2seq()."""
    if gen.no_repeat_ngram_size > 0 and (
        gen.num_beams > 1 or cfg.arch == "seq2seq"
    ):
        # the n-gram ban needs the generated-sequence buffer the causal
        # sampled loop carries; silently ignoring the flag would hide
        # repeated n-grams from a caller who asked to ban them
        raise ValueError(
            "no_repeat_ngram_size is only supported on the causal "
            "sampled/greedy path (num_beams=1); got "
            f"num_beams={gen.num_beams}, arch={cfg.arch!r}"
        )
    if gen.speculative not in ("none", "ngram", "draft"):
        raise ValueError(
            f"unknown speculative mode {gen.speculative!r} "
            "(none|ngram|draft)"
        )
    if (
        gen.forced_bos_token_id is not None
        or gen.forced_eos_token_id is not None
    ) and cfg.arch != "seq2seq":
        raise ValueError(
            "forced_bos/eos_token_id are seq2seq conventions (mBART "
            "language forcing); causal prompts carry their own start"
        )
    if gen.kv_dtype != "bf16" and (
        cfg.arch == "seq2seq" or gen.num_beams > 1
        or gen.speculative != "none"
    ):
        raise ValueError(
            "kv_dtype='int8' is supported on the causal greedy/sampled "
            "path only (num_beams=1, speculative='none'); the continuous "
            "engine carries its own int8 speculative path"
        )
    if gen.speculative in ("ngram", "draft"):
        # greedy is token-exact; sampling is distribution-exact (rejection
        # sampling).  History-dependent logit post-processors (penalties,
        # n-gram bans) would break the verify-window independence, and
        # beams/seq2seq have no speculative driver.
        unsupported = []
        if cfg.arch == "seq2seq":
            unsupported.append("seq2seq arch")
        if gen.num_beams > 1:
            unsupported.append("num_beams > 1")
        if gen.repetition_penalty != 1.0:
            unsupported.append("repetition_penalty")
        if gen.no_repeat_ngram_size > 0:
            unsupported.append("no_repeat_ngram_size")
        if gen.min_new_tokens > 0:
            unsupported.append("min_new_tokens")
        if unsupported:
            raise ValueError(
                "speculative decoding is causal greedy/sampled only; "
                f"unsupported options set: {', '.join(unsupported)}"
            )
        if gen.speculative == "draft":
            if draft is None:
                raise ValueError(
                    "speculative='draft' needs draft=(draft_params, "
                    "draft_cfg)"
                )
            return generate_speculative_draft(
                params, cfg, draft[0], draft[1], ids, attn_mask,
                max_new_tokens=gen.max_new_tokens,
                eos_id=eos_id,
                draft_tokens=gen.draft_tokens,
                temperature=gen.temperature,
                top_k=gen.top_k,
                top_p=gen.top_p,
                key=jax.random.key(gen.seed),
            )
        return generate_speculative(
            params, cfg, ids, attn_mask,
            max_new_tokens=gen.max_new_tokens,
            eos_id=eos_id,
            draft_tokens=gen.draft_tokens,
            draft_ngram=gen.draft_ngram,
            temperature=gen.temperature,
            top_k=gen.top_k,
            top_p=gen.top_p,
            key=jax.random.key(gen.seed),
        )
    if cfg.arch == "seq2seq":
        if gen.num_beams > 1:
            return beam_search_seq2seq(
                params, cfg, ids, attn_mask,
                max_new_tokens=gen.max_new_tokens,
                num_beams=gen.num_beams,
                eos_id=eos_id,
                bos_id=bos_id,
                length_penalty=gen.length_penalty,
                repetition_penalty=gen.repetition_penalty,
                min_new_tokens=gen.min_new_tokens,
                forced_bos_id=gen.forced_bos_token_id,
                forced_eos_id=gen.forced_eos_token_id,
            )
        return generate_seq2seq(
            params, cfg, ids, attn_mask,
            max_new_tokens=gen.max_new_tokens,
            temperature=gen.temperature,
            top_k=gen.top_k,
            top_p=gen.top_p,
            repetition_penalty=gen.repetition_penalty,
            min_new_tokens=gen.min_new_tokens,
            eos_id=eos_id,
            bos_id=bos_id,
            forced_bos_id=gen.forced_bos_token_id,
            forced_eos_id=gen.forced_eos_token_id,
            key=jax.random.key(gen.seed),
        )
    if gen.num_beams > 1:
        return beam_search(
            params, cfg, ids, attn_mask,
            max_new_tokens=gen.max_new_tokens,
            num_beams=gen.num_beams,
            eos_id=eos_id,
            length_penalty=gen.length_penalty,
            repetition_penalty=gen.repetition_penalty,
            min_new_tokens=gen.min_new_tokens,
        )
    return generate(
        params, cfg, ids, attn_mask,
        max_new_tokens=gen.max_new_tokens,
        temperature=gen.temperature,
        top_k=gen.top_k,
        top_p=gen.top_p,
        repetition_penalty=gen.repetition_penalty,
        min_new_tokens=gen.min_new_tokens,
        no_repeat_ngram_size=gen.no_repeat_ngram_size,
        eos_id=eos_id,
        key=jax.random.key(gen.seed),
    )




def _top_p_mask(logits, top_p: float, iters: int = 26):
    """Nucleus keep-mask by THRESHOLD BISECTION instead of a full-vocab
    sort.  The nucleus {minimal sorted prefix with mass >= top_p} equals
    {p_i >= tau*} for tau* = sup{tau : mass(p >= tau) >= top_p} (modulo
    exact probability ties at the boundary, where this keeps ALL tied
    tokens and a sort keeps an arbitrary subset).  mass(tau) is monotone,
    so 26 halvings pin tau* to p_max/2^26 — each iteration is one
    elementwise select+sum over (..., V), which the VPU streams, vs an
    O(V log^2 V) bitonic argsort: measured 8.4 -> 2.0 ms/step on the
    plain sampled decode path (gpt-125m-class, B=8, top_p=0.95, v5e)."""
    p = jax.nn.softmax(logits, axis=-1)
    lo = jnp.zeros(p.shape[:-1] + (1,), p.dtype)
    hi = jnp.max(p, axis=-1, keepdims=True)

    def step(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(p >= mid, p, 0.0), axis=-1, keepdims=True)
        ok = mass >= top_p
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, step, (lo, hi))
    return p >= lo


def _process_logits(logits, *, temperature, top_k, top_p):
    """Temperature/top-k/nucleus logit processing over (..., V): the
    softmax of the result IS the sampling target distribution (shared by
    the per-token samplers and speculative rejection sampling)."""
    logits = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -1e30, logits)
    if top_p < 1.0:
        logits = jnp.where(_top_p_mask(logits, top_p), logits, -1e30)
    return logits


def _sample_logits(logits, key, *, temperature, top_k, top_p):
    """Greedy / temperature / top-k / nucleus sampling over (B, V) logits —
    capability of the reference's GenerationConfig surface (top_k, top_p,
    temperature, reference src/models/trainer.py:390-413)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = _process_logits(
        logits, temperature=temperature, top_k=top_k, top_p=top_p
    )
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _make_cache(cfg: ModelConfig, b: int, total_len: int, n_layers: int,
                stacked: bool = False, kv_dtype: str = "bf16"):
    # GQA (llama family): the cache stores only the kv heads
    shape = (b, total_len, cfg.kv_heads, cfg.head_dim)
    if kv_dtype not in ("bf16", "int8"):
        raise ValueError(f"kv_dtype must be bf16|int8, got {kv_dtype!r}")

    def layer(s):
        if kv_dtype == "int8":
            # quantized KV (layers.kv_quantize): int8 codes + per-(token,
            # head) f32 scales with a trailing singleton dim, so every
            # leaf keeps the token axis at -3 (crop/widen/insert reuse)
            ss = s[:-1] + (1,)
            return {
                "k": jnp.zeros(s, jnp.int8), "v": jnp.zeros(s, jnp.int8),
                "k_s": jnp.zeros(ss, jnp.float32),
                "v_s": jnp.zeros(ss, jnp.float32),
            }
        return {"k": jnp.zeros(s, jnp.bfloat16), "v": jnp.zeros(s, jnp.bfloat16)}

    if stacked:
        # scan-over-layers format: one leading layer dim per leaf
        return layer((n_layers,) + shape)
    return [layer(shape) for _ in range(n_layers)]


def _reorder_cache(cache, idx):
    """Gather cache rows by ``idx`` along the batch/beam axis — dim 0 for
    list-of-layers caches, dim 1 for stacked (L, B, ...) caches."""
    if isinstance(cache, list):
        return [jax.tree.map(lambda x: x[idx], layer) for layer in cache]
    return jax.tree.map(lambda x: x[:, idx], cache)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "eos_id", "top_k", "top_p",
        "repetition_penalty", "min_new_tokens", "no_repeat_ngram_size",
        "kv_dtype",
    ),
)
def generate(
    params,
    cfg: ModelConfig,
    ids,
    attn_mask,
    *,
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    min_new_tokens: int = 0,
    no_repeat_ngram_size: int = 0,
    eos_id: int | None = None,
    key=None,
    kv_dtype: str = "bf16",
):
    """Greedy (temperature=0) or sampled decode.

    ids/attn_mask: (B, T) LEFT-padded prompts.  Returns (B, T+max_new)
    ids where finished rows are padded with eos after their first eos.
    ``repetition_penalty`` / ``min_new_tokens`` follow HF semantics
    (reference GenerationConfig fields, trainer.py:390-413).
    ``kv_dtype="int8"`` quantizes the KV cache (layers.kv_quantize) —
    half the per-token HBM reads at a small logits perturbation; the
    continuous engine's int8 mode is pinned token-identical to this.
    """
    b, t = ids.shape
    total = t + max_new_tokens
    if key is None:
        key = jax.random.key(0)

    positions = jnp.maximum(jnp.cumsum(attn_mask, axis=1) - 1, 0)
    n_prompt = jnp.sum(attn_mask, axis=1)  # (B,) true prompt lengths

    cache = _make_cache(
        cfg, b, total, cfg.n_layers,
        stacked=causal_lm.blocks_stacked(params), kv_dtype=kv_dtype,
    )
    # Prefill: causal over prompt, keys limited to prompt slots.
    j = jnp.arange(total)[None, None, :]  # (1, 1, total)
    q_pos = jnp.arange(t)[None, :, None]  # (1, T, 1)
    key_valid = jnp.concatenate(
        [attn_mask.astype(jnp.bool_), jnp.zeros((b, max_new_tokens), jnp.bool_)],
        axis=1,
    )  # (B, total)
    prefill_mask = (j <= q_pos) & key_valid[:, None, :]
    logits, cache = causal_lm.forward(
        params, cfg, ids, prefill_mask,
        positions=positions, cache=cache, cache_index=0,
    )
    last_logits = logits[:, -1]  # (B, V) — last prompt slot (right edge; left-padded)

    def sample(logits, k, seen, step_idx, seq_buf, cur_end):
        logits = logits.astype(jnp.float32)
        if no_repeat_ngram_size == 1:
            # HF semantics for n=1: ban every token already present in
            # (prompt + generated) — exactly the `seen` table.
            logits = jnp.where(seen, -1e30, logits)
        elif no_repeat_ngram_size > 0:
            # HF semantics: ban any token that would complete an n-gram
            # already present in (prompt + generated).  seq_buf is the
            # left-padded full sequence; windows that touch padding or the
            # not-yet-generated tail are excluded.
            n = no_repeat_ngram_size
            L = seq_buf.shape[1]
            # a window at position p covers seq[p : p+n-1]; it matches when
            # it equals the last (n-1) tokens, banning seq[p+n-1]
            pos = jnp.arange(L - n + 1)
            windows = jnp.stack(
                [seq_buf[:, i : L - n + 1 + i] for i in range(n - 1)], axis=-1
            )  # (B, L-n+1, n-1)
            cur_prefix = jax.lax.dynamic_slice(
                seq_buf, (0, cur_end - (n - 1)), (seq_buf.shape[0], n - 1)
            )  # (B, n-1) — last n-1 tokens of the sequence so far
            match = jnp.all(
                windows == cur_prefix[:, None, :], axis=-1
            )  # (B, L-n+1)
            # window must lie fully inside [pad_start, cur_end)
            window_ok = (pos[None, :] + n <= cur_end) & (
                pos[None, :] >= pad_start[:, None]
            )
            match &= window_ok
            banned = seq_buf[:, n - 1 :]  # (B, L-n+1)
            ban_mask = (
                jnp.zeros((logits.shape[0], logits.shape[1]), jnp.bool_)
                .at[jnp.arange(logits.shape[0])[:, None], banned]
                .max(match)
            )
            logits = jnp.where(ban_mask, -1e30, logits)
        if repetition_penalty != 1.0:
            # HF semantics: shrink positive logits, amplify negative ones
            penalized = jnp.where(
                logits > 0, logits / repetition_penalty,
                logits * repetition_penalty,
            )
            logits = jnp.where(seen, penalized, logits)
        if eos_id is not None and min_new_tokens > 0:
            logits = jnp.where(
                (step_idx < min_new_tokens)
                & (jnp.arange(logits.shape[-1])[None, :] == eos_id),
                -1e30,
                logits,
            )
        return _sample_logits(
            logits, k, temperature=temperature, top_k=top_k, top_p=top_p
        )

    done0 = jnp.zeros((b,), jnp.bool_)
    # the (B, vocab) seen table / (B, total) sequence buffer ride the scan
    # carry — keep them as (B, 1) placeholders when the features that read
    # them are off, so greedy/sampled decode doesn't scatter-update dead
    # state every token (the other drivers already do this)
    needs_seen = repetition_penalty != 1.0 or no_repeat_ngram_size == 1
    needs_buf = no_repeat_ngram_size >= 2
    if needs_seen:
        # token-seen table for the repetition penalty (prompt tokens count)
        seen0 = (
            jnp.zeros((b, cfg.vocab_size), jnp.bool_)
            .at[jnp.arange(b)[:, None], ids]
            .max(attn_mask.astype(jnp.bool_))
        )
    else:
        seen0 = jnp.zeros((b, 1), jnp.bool_)
    if needs_buf:
        # full left-padded sequence buffer for n-gram banning
        seq_buf0 = jnp.concatenate(
            [ids, jnp.zeros((b, max_new_tokens), jnp.int32)], axis=1
        )
    else:
        seq_buf0 = jnp.zeros((b, 1), jnp.int32)
    pad_start = t - n_prompt  # first real token per row (left padding)

    def step(carry, step_key):
        cache, last_logits, done, step_idx, seen, seq_buf = carry
        tok = sample(last_logits, step_key, seen, step_idx, seq_buf, t + step_idx)
        if eos_id is not None:
            tok = jnp.where(done, eos_id, tok)
            done = done | (tok == eos_id)
        if needs_seen:
            seen = seen.at[jnp.arange(b), tok].set(True)
        if needs_buf:
            seq_buf = jax.lax.dynamic_update_slice(
                seq_buf, tok[:, None], (0, t + step_idx)
            )
        # decode position: logical position = n_prompt + step_idx
        pos = (n_prompt + step_idx)[:, None]  # (B, 1)
        cache_slot = t + step_idx
        # keys valid: prompt mask ∪ generated slots <= current
        jj = jnp.arange(total)[None, None, :]
        gen_valid = (jj >= t) & (jj <= cache_slot)
        step_mask = key_valid[:, None, :] | gen_valid  # (B, 1, total)
        logits, new_cache = causal_lm.forward(
            params, cfg, tok[:, None], step_mask,
            positions=pos, cache=cache, cache_index=cache_slot,
        )
        return (new_cache, logits[:, 0], done, step_idx + 1, seen, seq_buf), tok

    keys = jax.random.split(key, max_new_tokens)
    (_, _, _, _, _, _), toks = jax.lax.scan(
        step, (cache, last_logits, done0, jnp.int32(0), seen0, seq_buf0), keys
    )
    out = jnp.concatenate([ids, toks.T], axis=1)
    return out


def _ngram_draft(seq_buf, cur_end, pad_start, gamma: int, ngram: int):
    """Prompt-lookup drafting: propose the ``gamma`` tokens that followed
    the most recent earlier occurrence of the stream's last ``ngram``
    tokens.  Pure gather/compare — no draft model.  RAG/QA answers copy
    retrieved context heavily, so matches are common exactly where decode
    throughput matters (the serve path).

    seq_buf: (B, L) prompt+generated stream (left-padded prompts).
    cur_end: (B,) exclusive end of the decided stream.
    pad_start: (B,) first real token per row.
    Returns (B, gamma) draft tokens (garbage when no match — the verifier
    rejects bad drafts, so correctness never depends on draft quality).
    """
    b, length = seq_buf.shape
    b_idx = jnp.arange(b)[:, None]
    tail_idx = jnp.clip(
        cur_end[:, None] - ngram + jnp.arange(ngram)[None, :], 0, length - 1
    )
    tail = seq_buf[b_idx, tail_idx]  # (B, ngram)
    # windows[p] = seq_buf[p : p+ngram]; match against the tail
    win = jnp.stack(
        [seq_buf[:, q : length - ngram + 1 + q] for q in range(ngram)], axis=-1
    )  # (B, L-ngram+1, ngram)
    p_idx = jnp.arange(length - ngram + 1)
    ok = (
        jnp.all(win == tail[:, None, :], axis=-1)
        & (p_idx[None, :] >= pad_start[:, None])
        # strictly before the tail itself, fully inside the decided stream
        & (p_idx[None, :] + ngram < cur_end[:, None])
    )
    best = jnp.max(jnp.where(ok, p_idx[None, :], -1), axis=1)  # (B,)
    # The match hypothesis is "the stream continues as it did after the
    # match", i.e. it is periodic with period dist = (cur_end-ngram) - p.
    # The continuation start is cur_end - dist, so draft j reads
    # seq[cur_end - dist + (j mod dist)]: for far-back matches (RAG
    # context copies, dist >= gamma) this is the plain following-token
    # lookup; for matches near the stream end (short loops, dist < gamma)
    # the mod wraps instead of running past the decided region into
    # uninitialized fill.  No-match fallback: dist=1 repeats the last
    # token (cheap; usually rejected, costing one plain step).
    dist = jnp.where(
        best >= 0, cur_end - ngram - best, jnp.ones_like(cur_end)
    )
    d_idx = jnp.clip(
        (cur_end - dist)[:, None]
        + (jnp.arange(gamma)[None, :] % dist[:, None]),
        0,
        length - 1,
    )
    return seq_buf[b_idx, d_idx]


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "eos_id", "draft_tokens", "draft_ngram",
        "temperature", "top_k", "top_p", "return_stats",
    ),
)
def generate_speculative(
    params,
    cfg: ModelConfig,
    ids,
    attn_mask,
    *,
    max_new_tokens: int = 32,
    eos_id: int | None = None,
    draft_tokens: int = 8,
    draft_ngram: int = 3,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    key=None,
    return_stats: bool = False,
):
    """Lossless greedy OR distribution-exact sampled decode via
    prompt-lookup speculative decoding.

    Greedy (``temperature=0``): output is token-identical to
    ``generate(temperature=0)`` — speculation only changes HOW MANY model
    passes produce it.  (One caveat, shared with HF assisted generation:
    the 1-token step and the multi-token verify window reduce their
    matmuls in different orders, so an argmax whose top-2 logit margin is
    ~float-epsilon can flip; scripts/probe_spec.py checks any observed
    divergence is such a tie.)

    Sampled (``temperature>0``, with top-k/top-p): exact rejection
    sampling over the POINT-MASS draft distribution (the speculative
    sampling correctness argument of Leviathan et al. 2023 specialized to
    a deterministic drafter): draft token d at a position with target
    distribution p is accepted with probability p(d); on rejection the
    replacement is drawn from p renormalized with d excluded, so the
    marginal is p(x) exactly — the SAME distribution plain sampled
    ``generate`` draws from, at fewer model passes (per-position
    marginals verified against enumerated exact marginals in
    tests/test_speculative.py).

    Each iteration drafts ``draft_tokens`` tokens by n-gram lookup over
    the prompt+generated stream (:func:`_ngram_draft`), verifies the
    whole window in ONE model pass, and accepts the longest holding
    prefix plus a correction/bonus token.  Decode at serving batch sizes
    is weight-streaming-bound (docs/BENCHMARKS.md "Greedy decode":
    0.82 ms/step ≈ the 250 MB bf16 weight stream), so accepted drafts are
    a direct multiple on tokens/s.

    TPU-first mechanics: a ``lax.while_loop`` with static shapes; rows
    accept different draft counts, so each row keeps its own cache cursor
    (per-row scatter writes in layers.attention) and the KV slots of
    rejected drafts are overwritten by the next window before they can be
    attended.  The reference has no speculative path (HF `generate` in
    reference src/models/trainer.py:942-946 decodes one token per pass);
    this is a beyond-parity serving capability.

    Returns (B, T+max_new) like ``generate``; with ``return_stats`` also a
    dict with ``iterations`` (model passes) and ``drafted_accepted``.
    """
    b, t = ids.shape
    gamma = draft_tokens
    ngram = draft_ngram
    if gamma < 1:
        raise ValueError(f"draft_tokens must be >= 1, got {gamma}")
    if ngram < 1:
        raise ValueError(f"draft_ngram must be >= 1, got {ngram}")
    total = t + max_new_tokens + gamma  # window may overhang by gamma slots
    positions = jnp.maximum(jnp.cumsum(attn_mask, axis=1) - 1, 0)
    n_prompt = jnp.sum(attn_mask, axis=1)
    pad_start = t - n_prompt

    cache = _make_cache(
        cfg, b, total, cfg.n_layers, stacked=causal_lm.blocks_stacked(params)
    )
    j = jnp.arange(total)[None, None, :]
    q_pos = jnp.arange(t)[None, :, None]
    key_valid = jnp.concatenate(
        [
            attn_mask.astype(jnp.bool_),
            jnp.zeros((b, total - t), jnp.bool_),
        ],
        axis=1,
    )
    prefill_mask = (j <= q_pos) & key_valid[:, None, :]
    logits, cache = causal_lm.forward(
        params, cfg, ids, prefill_mask,
        positions=positions, cache=cache, cache_index=0,
    )
    if key is None:
        key = jax.random.key(0)
    key, k0 = jax.random.split(key)
    g0 = _sample_logits(
        logits[:, -1], k0, temperature=temperature, top_k=top_k, top_p=top_p
    )

    # produced token i lives at seq_buf[:, t+i]; one dump column at the end
    # absorbs masked writes so clipping can never corrupt a real slot
    buf_len = t + max_new_tokens + 1
    dump = t + max_new_tokens
    fill = eos_id if eos_id is not None else 0
    seq_buf0 = jnp.concatenate(
        [ids, jnp.full((b, max_new_tokens + 1), fill, jnp.int32)], axis=1
    )
    seq_buf0 = seq_buf0.at[:, t].set(g0)
    n_dec0 = jnp.zeros((b,), jnp.int32)  # index of the pending token
    done0 = (
        (g0 == eos_id) if eos_id is not None else jnp.zeros((b,), jnp.bool_)
    )
    b_idx = jnp.arange(b)[:, None]
    s_win = jnp.arange(gamma + 1)

    def cond(carry):
        _, _, n_dec, done, _, _, _ = carry
        return jnp.any(~done & (n_dec < max_new_tokens - 1))

    def body(carry):
        cache, seq_buf, n_dec, done, iters, n_spec, loop_key = carry
        cur_end = t + n_dec + 1
        drafts = _ngram_draft(seq_buf, cur_end, pad_start, gamma, ngram)
        pending = seq_buf[jnp.arange(b), t + n_dec]
        window = jnp.concatenate([pending[:, None], drafts], axis=1)
        pos = (n_prompt + n_dec)[:, None] + s_win[None, :]
        write_at = t + n_dec  # (B,) per-row cache cursors
        jj = jnp.arange(total)[None, None, :]
        gen_ok = (jj >= t) & (
            jj <= (t + n_dec[:, None, None] + s_win[None, :, None])
        )
        mask = key_valid[:, None, :] | gen_ok  # (B, gamma+1, total)
        logits, cache = causal_lm.forward(
            params, cfg, window, mask,
            positions=pos, cache=cache, cache_index=write_at,
        )
        if temperature == 0.0:
            y = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, gamma+1)
            # draft s (window col s, s>=1) holds iff the model's greedy
            # pick after col s-1 equals it, and every earlier draft held
            hold = jnp.cumprod(
                (y[:, :gamma] == window[:, 1:]).astype(jnp.int32), axis=1
            )
            a = jnp.sum(hold, axis=1)  # (B,) accepted drafts in [0, gamma]
            bonus = jnp.take_along_axis(y, a[:, None], axis=1)[:, 0]
        else:
            # exact rejection sampling against the point-mass drafter:
            # accept d with prob p(d); replace a rejected d by a draw from
            # p with d excluded (renormalized) — marginal is exactly p
            loop_key, k_u, k_r = jax.random.split(loop_key, 3)
            proc = _process_logits(
                logits, temperature=temperature, top_k=top_k, top_p=top_p
            )  # (B, gamma+1, V); softmax(proc) is the target distribution
            logp = jax.nn.log_softmax(proc, axis=-1)
            p_draft = jnp.exp(
                jnp.take_along_axis(
                    logp[:, :gamma], window[:, 1:, None], axis=-1
                )[..., 0]
            )  # (B, gamma): target prob of each draft at its position
            u = jax.random.uniform(k_u, (b, gamma))
            hold = jnp.cumprod((u < p_draft).astype(jnp.int32), axis=1)
            a = jnp.sum(hold, axis=1)
            # one categorical per window position: positions < gamma ban
            # their (rejected) draft token, position gamma (all accepted)
            # samples the bonus from the unmodified target
            v = proc.shape[-1]
            ban = jax.nn.one_hot(window[:, 1:], v, dtype=jnp.bool_)
            proc = proc.at[:, :gamma].set(
                jnp.where(ban, -1e30, proc[:, :gamma])
            )
            res = jax.random.categorical(k_r, proc, axis=-1).astype(jnp.int32)
            bonus = jnp.take_along_axis(res, a[:, None], axis=1)[:, 0]
        # writes: produced indices n_dec+1 .. n_dec+a+1 get [d_1..d_a, bonus]
        jw = jnp.arange(gamma + 1)[None, :]
        drafts_pad = jnp.concatenate(
            [window[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1
        )
        vals = jnp.where(jw < a[:, None], drafts_pad, bonus[:, None])
        idx_prod = n_dec[:, None] + 1 + jw
        write_ok = (
            (jw <= a[:, None])
            & ~done[:, None]
            & (idx_prod < max_new_tokens)
        )
        if eos_id is not None:
            # a window may accept tokens AFTER an eos it also accepted
            # (the model's greedy/sampled continuation past eos) — those
            # must not be written: generate() emits eos-fill after the
            # first eos, and the unwritten tail is already eos-filled
            prior_eos = jnp.cumsum(
                (vals == eos_id).astype(jnp.int32), axis=1
            ) - (vals == eos_id).astype(jnp.int32)
            write_ok = write_ok & (prior_eos == 0)
        slots = jnp.where(write_ok, t + idx_prod, dump)
        seq_buf = seq_buf.at[b_idx, slots].set(
            jnp.where(write_ok, vals, seq_buf[b_idx, slots])
        )
        n_written = jnp.sum(write_ok, axis=1)
        # drafts that became real output tokens (everything written except
        # the one correction/bonus token the model produces anyway)
        n_spec = n_spec + jnp.sum(
            jnp.where(done, 0, jnp.maximum(n_written - 1, 0))
        )
        if eos_id is not None:
            done = done | jnp.any(write_ok & (vals == eos_id), axis=1)
        n_dec = n_dec + n_written
        return cache, seq_buf, n_dec, done, iters + 1, n_spec, loop_key

    _, seq_buf, n_dec, _, iters, n_spec, _ = jax.lax.while_loop(
        cond,
        body,
        (cache, seq_buf0, n_dec0, done0, jnp.int32(0), jnp.int32(0), key),
    )
    toks = seq_buf[:, t : t + max_new_tokens]
    if eos_id is not None:
        # identical tail semantics to generate(): everything after the
        # first eos becomes eos
        seen = jnp.cumsum((toks == eos_id).astype(jnp.int32), axis=1)
        toks = jnp.where(seen > 1, eos_id, toks)
        # rows that hit max_new without eos keep their real tokens; rows
        # that finished early were already eos-filled at init
    out = jnp.concatenate([ids, toks], axis=1)
    if return_stats:
        return out, {"iterations": iters, "drafted_accepted": n_spec}
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "draft_cfg", "max_new_tokens", "eos_id", "draft_tokens",
        "temperature", "top_k", "top_p", "return_stats",
    ),
)
def generate_speculative_draft(
    params,
    cfg: ModelConfig,
    draft_params,
    draft_cfg: ModelConfig,
    ids,
    attn_mask,
    *,
    max_new_tokens: int = 32,
    eos_id: int | None = None,
    draft_tokens: int = 6,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    key=None,
    return_stats: bool = False,
):
    """Draft-MODEL speculative decoding (Leviathan et al. 2023 / Chen et
    al. 2023): a small causal LM proposes ``draft_tokens`` tokens with
    ``draft_tokens`` cheap sequential passes, the target model verifies
    the whole window in ONE pass.

    Greedy (``temperature=0``): accept drafts while they equal the
    target's argmax — output token-identical to ``generate(temperature=0)``
    regardless of draft quality (a bad draft only costs speed).

    Sampled: drafts are SAMPLED from the draft distribution q; draft d is
    accepted with probability min(1, p(d)/q(d)); the first rejected
    position resamples from norm(max(p - q, 0)).  The marginal is exactly
    the target distribution p — same theorem as the paper, verified
    against enumerated marginals with a deliberately DIFFERENT draft model
    in tests/test_speculative.py.

    Both models stream the same accepted token sequence, so they share
    one per-row cursor: each keeps its own KV cache written at per-row
    offsets (layers.attention scatter path), and — as in
    :func:`generate_speculative` — every stale rejected-draft cache slot
    is overwritten by the next window before it could be attended.
    Requires ``cfg.vocab_size == draft_cfg.vocab_size`` (same tokenizer).

    Prefer :func:`generate_speculative` (prompt-lookup) when outputs quote
    the prompt (RAG); prefer a trained draft model for free-form text
    where no n-gram structure exists.  The reference has neither (HF
    generate, one token per pass, reference src/models/trainer.py:942-946).
    """
    if cfg.vocab_size != draft_cfg.vocab_size:
        raise ValueError(
            "target and draft must share a vocabulary: "
            f"{cfg.vocab_size} != {draft_cfg.vocab_size}"
        )
    b, t = ids.shape
    gamma = draft_tokens
    if gamma < 1:
        raise ValueError(f"draft_tokens must be >= 1, got {gamma}")
    total = t + max_new_tokens + gamma
    positions = jnp.maximum(jnp.cumsum(attn_mask, axis=1) - 1, 0)
    n_prompt = jnp.sum(attn_mask, axis=1)

    cache = _make_cache(
        cfg, b, total, cfg.n_layers, stacked=causal_lm.blocks_stacked(params)
    )
    d_cache = _make_cache(
        draft_cfg, b, total, draft_cfg.n_layers,
        stacked=causal_lm.blocks_stacked(draft_params),
    )
    j = jnp.arange(total)[None, None, :]
    q_pos = jnp.arange(t)[None, :, None]
    key_valid = jnp.concatenate(
        [attn_mask.astype(jnp.bool_), jnp.zeros((b, total - t), jnp.bool_)],
        axis=1,
    )
    prefill_mask = (j <= q_pos) & key_valid[:, None, :]
    logits, cache = causal_lm.forward(
        params, cfg, ids, prefill_mask,
        positions=positions, cache=cache, cache_index=0,
    )
    # prefill the draft cache too (its logits are unused; its K/V are)
    _, d_cache = causal_lm.forward(
        draft_params, draft_cfg, ids, prefill_mask,
        positions=positions, cache=d_cache, cache_index=0,
    )
    if key is None:
        key = jax.random.key(0)
    key, k0 = jax.random.split(key)
    g0 = _sample_logits(
        logits[:, -1], k0, temperature=temperature, top_k=top_k, top_p=top_p
    )

    dump = t + max_new_tokens
    fill = eos_id if eos_id is not None else 0
    seq_buf0 = jnp.concatenate(
        [ids, jnp.full((b, max_new_tokens + 1), fill, jnp.int32)], axis=1
    )
    seq_buf0 = seq_buf0.at[:, t].set(g0)
    n_dec0 = jnp.zeros((b,), jnp.int32)
    done0 = (
        (g0 == eos_id) if eos_id is not None else jnp.zeros((b,), jnp.bool_)
    )
    b_idx = jnp.arange(b)[:, None]
    s_win = jnp.arange(gamma + 1)
    v = cfg.vocab_size

    def cond(carry):
        _, _, _, n_dec, done, _, _, _ = carry
        return jnp.any(~done & (n_dec < max_new_tokens - 1))

    def body(carry):
        cache, d_cache, seq_buf, n_dec, done, iters, n_spec, loop_key = carry
        pending = seq_buf[jnp.arange(b), t + n_dec]
        jj = jnp.arange(total)[None, None, :]

        # ---- draft phase: gamma sequential small-model steps -------------
        loop_key, k_d = jax.random.split(loop_key)

        def draft_step(dc, s):
            d_cache, tok = dc
            slot = t + n_dec + s  # (B,)
            mask = (key_valid | ((jj[:, 0] >= t)
                                 & (jj[:, 0] <= slot[:, None])))[:, None, :]
            lg, d_cache = causal_lm.forward(
                draft_params, draft_cfg, tok[:, None], mask,
                positions=(n_prompt + n_dec + s)[:, None],
                cache=d_cache, cache_index=slot,
            )
            lg = lg[:, 0]
            if temperature == 0.0:
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                q_tok = jnp.zeros((b, v), jnp.float32)  # unused placeholder
            else:
                proc = _process_logits(
                    lg, temperature=temperature, top_k=top_k, top_p=top_p
                )
                nxt = jax.random.categorical(
                    jax.random.fold_in(k_d, s), proc, axis=-1
                ).astype(jnp.int32)
                q_tok = jax.nn.softmax(proc, axis=-1)
            return (d_cache, nxt), (nxt, q_tok)

        (d_cache, _), (drafts_t, q_t) = jax.lax.scan(
            draft_step, (d_cache, pending), jnp.arange(gamma)
        )
        drafts = drafts_t.T  # (B, gamma)
        window = jnp.concatenate([pending[:, None], drafts], axis=1)

        # ---- verify phase: one target pass over the window ---------------
        pos = (n_prompt + n_dec)[:, None] + s_win[None, :]
        gen_ok = (jj >= t) & (
            jj <= (t + n_dec[:, None, None] + s_win[None, :, None])
        )
        mask = key_valid[:, None, :] | gen_ok
        logits, cache = causal_lm.forward(
            params, cfg, window, mask,
            positions=pos, cache=cache, cache_index=t + n_dec,
        )
        if temperature == 0.0:
            y = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            hold = jnp.cumprod(
                (y[:, :gamma] == window[:, 1:]).astype(jnp.int32), axis=1
            )
            a = jnp.sum(hold, axis=1)
            bonus = jnp.take_along_axis(y, a[:, None], axis=1)[:, 0]
        else:
            # ratio acceptance + residual resampling (exact: marginal = p)
            loop_key, k_u, k_r, k_b = jax.random.split(loop_key, 4)
            proc = _process_logits(
                logits, temperature=temperature, top_k=top_k, top_p=top_p
            )  # (B, gamma+1, V)
            p = jax.nn.softmax(proc, axis=-1)
            q = jnp.transpose(q_t, (1, 0, 2))  # (B, gamma, V)
            p_d = jnp.take_along_axis(
                p[:, :gamma], window[:, 1:, None], axis=-1
            )[..., 0]
            q_d = jnp.take_along_axis(q, window[:, 1:, None], axis=-1)[..., 0]
            u = jax.random.uniform(k_u, (b, gamma))
            hold = jnp.cumprod(
                (u * q_d < p_d).astype(jnp.int32), axis=1
            )  # u < p/q without the division
            a = jnp.sum(hold, axis=1)
            resid = jnp.maximum(p[:, :gamma] - q, 0.0)
            res_logits = jnp.where(resid > 0, jnp.log(resid), -1e30)
            res = jax.random.categorical(
                k_r, res_logits, axis=-1
            ).astype(jnp.int32)  # (B, gamma)
            bonus_full = jax.random.categorical(
                k_b, jnp.log(jnp.maximum(p[:, gamma], 1e-30)), axis=-1
            ).astype(jnp.int32)  # all-accepted case
            cand = jnp.concatenate([res, bonus_full[:, None]], axis=1)
            bonus = jnp.take_along_axis(cand, a[:, None], axis=1)[:, 0]

        # ---- shared write/advance logic (as generate_speculative) --------
        jw = jnp.arange(gamma + 1)[None, :]
        drafts_pad = jnp.concatenate(
            [window[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1
        )
        vals = jnp.where(jw < a[:, None], drafts_pad, bonus[:, None])
        idx_prod = n_dec[:, None] + 1 + jw
        write_ok = (
            (jw <= a[:, None]) & ~done[:, None] & (idx_prod < max_new_tokens)
        )
        if eos_id is not None:
            # no writes past the first in-window eos (see
            # generate_speculative: generate() emits eos-fill after eos)
            prior_eos = jnp.cumsum(
                (vals == eos_id).astype(jnp.int32), axis=1
            ) - (vals == eos_id).astype(jnp.int32)
            write_ok = write_ok & (prior_eos == 0)
        slots = jnp.where(write_ok, t + idx_prod, dump)
        seq_buf = seq_buf.at[b_idx, slots].set(
            jnp.where(write_ok, vals, seq_buf[b_idx, slots])
        )
        n_written = jnp.sum(write_ok, axis=1)
        n_spec = n_spec + jnp.sum(
            jnp.where(done, 0, jnp.maximum(n_written - 1, 0))
        )
        if eos_id is not None:
            done = done | jnp.any(write_ok & (vals == eos_id), axis=1)
        n_dec = n_dec + n_written
        return (cache, d_cache, seq_buf, n_dec, done, iters + 1, n_spec,
                loop_key)

    (_, _, seq_buf, n_dec, _, iters, n_spec, _) = jax.lax.while_loop(
        cond,
        body,
        (cache, d_cache, seq_buf0, n_dec0, done0, jnp.int32(0),
         jnp.int32(0), key),
    )
    toks = seq_buf[:, t : t + max_new_tokens]
    if eos_id is not None:
        seen = jnp.cumsum((toks == eos_id).astype(jnp.int32), axis=1)
        toks = jnp.where(seen > 1, eos_id, toks)
    out = jnp.concatenate([ids, toks], axis=1)
    if return_stats:
        return out, {"iterations": iters, "drafted_accepted": n_spec}
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "temperature", "eos_id", "top_k", "top_p",
        "repetition_penalty", "min_new_tokens", "forced_bos_id",
        "forced_eos_id",
    ),
)
def generate_seq2seq(
    params,
    cfg: ModelConfig,
    enc_ids,
    enc_mask,
    *,
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    min_new_tokens: int = 0,
    eos_id: int | None = None,
    bos_id: int = 0,
    forced_bos_id: int | None = None,
    forced_eos_id: int | None = None,
    key=None,
):
    """Encoder-decoder decode (capability of the reference's seq2seq
    `generate` eval path, trainer.py:928-949): encode once, then scan
    decoder steps with a self-attention KV cache; cross-attention reads the
    fixed encoder output.  Returns (B, max_new_tokens) generated ids."""
    from .families import s2s_module, s2s_stacked

    s2s = s2s_module(cfg)
    b = enc_ids.shape[0]
    if key is None:
        key = jax.random.key(0)
    enc_out = s2s.encode(params, cfg, enc_ids, enc_mask)
    # cross-attention K/V once per sequence, not once per generated token
    cross_kv = s2s.precompute_cross_kv(params, cfg, enc_out)

    total = max_new_tokens + 1  # slot 0 holds BOS
    cache = _make_cache(
        cfg, b, total, cfg.decoder_layers,
        stacked=s2s_stacked(cfg, params),
    )
    jj = jnp.arange(total)[None, None, :]

    def sample(logits, k):
        return _sample_logits(
            logits, k, temperature=temperature, top_k=top_k, top_p=top_p
        )

    def step(carry, step_key):
        cache, tok, done, idx, seen = carry
        pos = jnp.broadcast_to(idx[None, None], (b, 1))
        dec_mask = (jj <= idx).astype(jnp.bool_)  # (1, 1, total) broadcast
        logits, new_cache = s2s.decode(
            params,
            cfg,
            tok[:, None],
            enc_out,
            enc_mask,
            jnp.broadcast_to(dec_mask, (b, 1, total)),
            positions=pos,
            cache=cache,
            cache_index=idx,
            cross_kv=cross_kv,
        )
        lg = logits[:, 0].astype(jnp.float32)
        if forced_bos_id is not None:
            # mBART-style forced first token (the target-language id; HF
            # forced_bos_token_id): step 0 can only produce it
            lg = jnp.where(
                (idx == 0)
                & (jnp.arange(lg.shape[-1])[None, :] != forced_bos_id),
                -1e30,
                lg,
            )
        if forced_eos_id is not None:
            # HF forced_eos_token_id (an MBartConfig default): rows still
            # running at the last step emit eos instead of their argmax
            lg = jnp.where(
                (idx == max_new_tokens - 1)
                & (jnp.arange(lg.shape[-1])[None, :] != forced_eos_id),
                -1e30,
                lg,
            )
        if repetition_penalty != 1.0:
            lg = jnp.where(
                seen,
                jnp.where(lg > 0, lg / repetition_penalty,
                          lg * repetition_penalty),
                lg,
            )
        if eos_id is not None and min_new_tokens > 0:
            lg = jnp.where(
                (idx < min_new_tokens)
                & (jnp.arange(lg.shape[-1])[None, :] == eos_id),
                -1e30,
                lg,
            )
        nxt = sample(lg, step_key)
        if eos_id is not None:
            nxt = jnp.where(done, eos_id, nxt)
            done = done | (nxt == eos_id)
        if repetition_penalty != 1.0:
            seen = seen | (
                jnp.arange(seen.shape[-1])[None, :] == nxt[:, None]
            )
        return (new_cache, nxt, done, idx + 1, seen), nxt

    tok0 = jnp.full((b,), bos_id, jnp.int32)
    done0 = jnp.zeros((b,), jnp.bool_)
    # token-seen table for the repetition penalty (decoder stream only —
    # the encoder input is not part of the generated id stream); a (B, 1)
    # placeholder when the penalty is off so the carry shape stays static
    if repetition_penalty != 1.0:
        seen0 = jnp.arange(cfg.vocab_size)[None, :] == bos_id
        seen0 = jnp.broadcast_to(seen0, (b, cfg.vocab_size))
    else:
        seen0 = jnp.zeros((b, 1), jnp.bool_)
    keys = jax.random.split(key, max_new_tokens)
    _, toks = jax.lax.scan(
        step, (cache, tok0, done0, jnp.int32(0), seen0), keys
    )
    return toks.T


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "num_beams", "eos_id",
                     "bos_id", "length_penalty", "repetition_penalty",
                     "min_new_tokens", "forced_bos_id", "forced_eos_id"),
)
def beam_search_seq2seq(
    params,
    cfg: ModelConfig,
    enc_ids,
    enc_mask,
    *,
    max_new_tokens: int = 32,
    num_beams: int = 4,
    eos_id: int | None = None,
    bos_id: int = 0,
    length_penalty: float = 1.0,
    repetition_penalty: float = 1.0,
    min_new_tokens: int = 0,
    forced_bos_id: int | None = None,
    forced_eos_id: int | None = None,
):
    """Encoder-decoder beam search (num_beams capability of the
    reference's GenerationConfig on the seq2seq eval path,
    trainer.py:390-413,928-949): encode once, expand beams as a batch
    dimension over the decoder scan, reorder the self-attention cache by
    parent beam each step.  Returns (B, max_new_tokens) — the best beam
    per row under HF length normalization."""
    from .families import s2s_module, s2s_stacked

    s2s = s2s_module(cfg)
    b = enc_ids.shape[0]
    w = num_beams
    neg = -1e30
    enc_out = s2s.encode(params, cfg, enc_ids, enc_mask)
    enc_out_w = jnp.repeat(enc_out, w, axis=0)  # (B*W, T, D)
    enc_mask_w = jnp.repeat(enc_mask, w, axis=0)
    # cross K/V once per sequence; beams of one row share the encoder input
    # so the per-step parent reorder leaves these invariant (like enc_out_w)
    cross_kv_w = s2s.precompute_cross_kv(params, cfg, enc_out_w)

    total = max_new_tokens + 1  # slot 0 holds BOS
    cache = _make_cache(
        cfg, b * w, total, cfg.decoder_layers,
        stacked=s2s_stacked(cfg, params),
    )
    jj = jnp.arange(total)[None, None, :]

    def decode_step(cache, tok, idx):
        pos = jnp.broadcast_to(idx[None, None], (b * w, 1))
        dec_mask = jnp.broadcast_to(
            (jj <= idx).astype(jnp.bool_), (b * w, 1, total)
        )
        logits, new_cache = s2s.decode(
            params, cfg, tok[:, None], enc_out_w, enc_mask_w, dec_mask,
            positions=pos, cache=cache, cache_index=idx,
            cross_kv=cross_kv_w,
        )
        return logits[:, 0].astype(jnp.float32), new_cache

    last_logits, cache = decode_step(
        cache, jnp.full((b * w,), bos_id, jnp.int32), jnp.int32(0)
    )
    v = last_logits.shape[-1]
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((w - 1,), neg)])[None, :],
        (b, 1),
    )
    toks0 = jnp.zeros((b, w, max_new_tokens), jnp.int32)
    done0 = jnp.zeros((b, w), jnp.bool_)

    def step(carry, step_idx):
        cache, last_logits, scores, toks, done, seen = carry
        ll = last_logits
        if forced_bos_id is not None:
            # mBART-style forced first token (HF forced_bos_token_id):
            # every beam's step 0 can only produce the target-language id
            ll = jnp.where(
                (step_idx == 0)
                & (jnp.arange(ll.shape[-1])[None, :] != forced_bos_id),
                neg,
                ll,
            )
        if forced_eos_id is not None:
            # HF forced_eos_token_id (an MBartConfig default): beams still
            # running at the last step can only emit eos
            ll = jnp.where(
                (step_idx == max_new_tokens - 1)
                & (jnp.arange(ll.shape[-1])[None, :] != forced_eos_id),
                neg,
                ll,
            )
        if repetition_penalty != 1.0:  # HF semantics: on logits, pre-softmax
            flat_seen = seen.reshape(b * w, v)
            ll = jnp.where(
                flat_seen,
                jnp.where(ll > 0, ll / repetition_penalty,
                          ll * repetition_penalty),
                ll,
            )
        if eos_id is not None and min_new_tokens > 0:
            ll = jnp.where(
                (step_idx < min_new_tokens)
                & (jnp.arange(v)[None, :] == eos_id),
                neg,
                ll,
            )
        logp = jax.nn.log_softmax(ll, axis=-1).reshape(b, w, v)
        if eos_id is not None:
            eos_onehot = jnp.arange(v)[None, None, :] == eos_id
            logp = jnp.where(
                done[:, :, None], jnp.where(eos_onehot, 0.0, neg), logp
            )
        flat = (scores[:, :, None] + logp).reshape(b, w * v)
        top_s, top_i = jax.lax.top_k(flat, w)
        parent = top_i // v
        token = (top_i % v).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None]
        toks = toks[batch_idx, parent].at[:, :, step_idx].set(token)
        new_done = done[batch_idx, parent]
        if eos_id is not None:
            new_done = new_done | (token == eos_id)
        if repetition_penalty != 1.0:  # reorder by parent, then mark token
            seen = seen[batch_idx, parent] | (
                jnp.arange(v)[None, None, :] == token[:, :, None]
            )
        flat_parent = (batch_idx * w + parent).reshape(b * w)
        cache = _reorder_cache(cache, flat_parent)
        logits, cache = decode_step(
            cache, token.reshape(b * w), step_idx + 1
        )
        return (cache, logits, top_s, toks, new_done, seen), None

    if repetition_penalty != 1.0:
        seen0 = jnp.broadcast_to(
            jnp.arange(v)[None, None, :] == bos_id, (b, w, v)
        )
    else:  # (B, W, 1) placeholder keeps the carry static when off
        seen0 = jnp.zeros((b, w, 1), jnp.bool_)
    (cache, _, scores, toks, done, _), _ = jax.lax.scan(
        step, (cache, last_logits, scores0, toks0, done0, seen0),
        jnp.arange(max_new_tokens),
    )
    if eos_id is not None:
        lengths = jnp.where(
            done, jnp.argmax(toks == eos_id, axis=-1) + 1, max_new_tokens
        ).astype(jnp.float32)
    else:
        lengths = jnp.full((b, w), float(max_new_tokens))
    norm = scores / jnp.power(jnp.maximum(lengths, 1.0), length_penalty)
    best = jnp.argmax(norm, axis=1)
    best_toks = toks[jnp.arange(b), best]
    if eos_id is not None:
        seen = jnp.cumsum((best_toks == eos_id).astype(jnp.int32), axis=1)
        best_toks = jnp.where(seen > 1, eos_id, best_toks)
    return best_toks


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "num_beams", "eos_id",
                     "length_penalty", "repetition_penalty",
                     "min_new_tokens"),
)
def beam_search(
    params,
    cfg: ModelConfig,
    ids,
    attn_mask,
    *,
    max_new_tokens: int = 32,
    num_beams: int = 4,
    eos_id: int | None = None,
    length_penalty: float = 1.0,
    repetition_penalty: float = 1.0,
    min_new_tokens: int = 0,
):
    """Batched beam search with a KV cache (num_beams capability of the
    reference's GenerationConfig, trainer.py:390-413).

    ids/attn_mask: (B, T) LEFT-padded prompts.  Returns (B, T+max_new) —
    the highest-scoring beam per row (log-prob sum, divided by
    length**length_penalty when finished).  Static shapes throughout:
    beams are an expanded batch dimension, and the per-step cache reorder
    is a gather over the beam axis.
    """
    b, t = ids.shape
    w = num_beams
    total = t + max_new_tokens
    neg = -1e30

    # Prefill ONCE at batch B (all W beams of a row share the prompt —
    # prefilling at B*W would recompute identical logits/KV W times, the
    # dominant cost for long prompts), then expand the cache and logits
    # to (B*W) by a repeat-gather.  beam_search_seq2seq encodes once the
    # same way.
    positions = jnp.maximum(jnp.cumsum(attn_mask, axis=1) - 1, 0)
    n_prompt = jnp.tile(jnp.sum(attn_mask, axis=1)[:, None], (1, w))

    cache = _make_cache(
        cfg, b, total, cfg.n_layers,
        stacked=causal_lm.blocks_stacked(params),
    )
    j = jnp.arange(total)[None, None, :]
    q_pos = jnp.arange(t)[None, :, None]
    key_valid_b = jnp.concatenate(
        [attn_mask.astype(jnp.bool_), jnp.zeros((b, max_new_tokens), jnp.bool_)],
        axis=1,
    )
    prefill_mask = (j <= q_pos) & key_valid_b[:, None, :]
    logits, cache = causal_lm.forward(
        params, cfg, ids, prefill_mask,
        positions=positions, cache=cache, cache_index=0,
    )
    expand = jnp.repeat(jnp.arange(b), w)  # row i -> beams i*w..i*w+w-1
    cache = _reorder_cache(cache, expand)
    key_valid = key_valid_b[expand]
    last_logits = logits[:, -1].astype(jnp.float32)[expand]  # (B*W, V)
    v = last_logits.shape[-1]

    # beam 0 starts live, the rest start at -inf so the first expansion
    # picks W distinct continuations of the same prompt
    beam_scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((w - 1,), neg)])[None, :],
        (b, 1),
    )
    toks0 = jnp.zeros((b, w, max_new_tokens), jnp.int32)
    done0 = jnp.zeros((b, w), jnp.bool_)

    def step(carry, step_idx):
        cache, last_logits, scores, toks, done, seen = carry
        ll = last_logits
        if repetition_penalty != 1.0:  # HF semantics: on logits, pre-softmax
            flat_seen = seen.reshape(b * w, v)
            ll = jnp.where(
                flat_seen,
                jnp.where(ll > 0, ll / repetition_penalty,
                          ll * repetition_penalty),
                ll,
            )
        if eos_id is not None and min_new_tokens > 0:
            ll = jnp.where(
                (step_idx < min_new_tokens)
                & (jnp.arange(v)[None, :] == eos_id),
                neg,
                ll,
            )
        logp = jax.nn.log_softmax(ll, axis=-1).reshape(b, w, v)
        if eos_id is not None:
            # finished beams may only "continue" with eos at no cost
            eos_onehot = (
                jnp.arange(v)[None, None, :] == eos_id
            )
            logp = jnp.where(
                done[:, :, None], jnp.where(eos_onehot, 0.0, neg), logp
            )
        cand = scores[:, :, None] + logp  # (B, W, V)
        flat = cand.reshape(b, w * v)
        top_s, top_i = jax.lax.top_k(flat, w)  # (B, W)
        parent = top_i // v  # (B, W) beam index
        token = (top_i % v).astype(jnp.int32)

        # reorder beam state by parent
        batch_idx = jnp.arange(b)[:, None]
        toks = toks[batch_idx, parent]  # (B, W, max_new)
        toks = toks.at[:, :, step_idx].set(token)
        new_done = done[batch_idx, parent]
        if eos_id is not None:
            new_done = new_done | (token == eos_id)
        if repetition_penalty != 1.0:  # reorder by parent, then mark token
            seen = seen[batch_idx, parent] | (
                jnp.arange(v)[None, None, :] == token[:, :, None]
            )

        # reorder the KV cache: rows are (B*W); gather along beams
        flat_parent = (batch_idx * w + parent).reshape(b * w)

        cache = _reorder_cache(cache, flat_parent)

        # run one decode step for every beam
        pos = (n_prompt[batch_idx, parent] + step_idx).reshape(b * w, 1)
        cache_slot = t + step_idx
        jj = jnp.arange(total)[None, None, :]
        gen_valid = (jj >= t) & (jj <= cache_slot)
        step_mask = key_valid[:, None, :] | gen_valid
        logits, cache = causal_lm.forward(
            params, cfg, token.reshape(b * w, 1), step_mask,
            positions=pos, cache=cache, cache_index=cache_slot,
        )
        return (cache, logits[:, 0].astype(jnp.float32), top_s, toks,
                new_done, seen), None

    if repetition_penalty != 1.0:
        # prompt tokens count as seen (HF applies the penalty over the
        # full input_ids stream for causal models — same as generate())
        seen0_b = jnp.zeros((b, v), jnp.bool_).at[
            jnp.arange(b)[:, None], ids
        ].max(attn_mask.astype(jnp.bool_))
        seen0 = jnp.broadcast_to(seen0_b[:, None, :], (b, w, v))
    else:  # (B, W, 1) placeholder keeps the carry static when off
        seen0 = jnp.zeros((b, w, 1), jnp.bool_)
    (cache, _, scores, toks, done, _), _ = jax.lax.scan(
        step, (cache, last_logits, beam_scores0, toks0, done0, seen0),
        jnp.arange(max_new_tokens),
    )

    # pick the best beam per row with HF-style length normalization
    if eos_id is not None:
        lengths = jnp.where(
            done,
            jnp.argmax(toks == eos_id, axis=-1) + 1,
            max_new_tokens,
        ).astype(jnp.float32)
    else:
        lengths = jnp.full((b, w), float(max_new_tokens))
    norm = scores / jnp.power(jnp.maximum(lengths, 1.0), length_penalty)
    best = jnp.argmax(norm, axis=1)  # (B,)
    best_toks = toks[jnp.arange(b), best]  # (B, max_new)
    if eos_id is not None:
        # pad everything after the first eos with eos
        seen = jnp.cumsum((best_toks == eos_id).astype(jnp.int32), axis=1)
        best_toks = jnp.where(seen > 1, eos_id, best_toks)
    return jnp.concatenate([ids, best_toks], axis=1)
