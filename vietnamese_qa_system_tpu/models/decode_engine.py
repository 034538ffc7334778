"""Slot-based continuous-batching decode state (prefill / insert / decode).

The reference serves generation one whole batch at a time: HF `generate`
runs every sequence in lockstep and the batch finishes when its LAST row
does (reference src/models/trainer.py:942-946; the ds_inference REPL is
B=1, reference src/models/model_utils/ds_inference.py:52-60).  Under a
request stream that shape wastes most of the chip: short answers idle
behind long ones, and new requests wait for the whole batch to drain.

This module is the TPU-first replacement: a JetStream-style decode state
of ``n_slots`` independent sequences sharing ONE static-shape KV cache.

- :func:`prefill` runs a prompt (bucketed length, so a handful of
  compiles total) and returns its KV prefix + first sampled token.
- :func:`insert` scatters that prefix into a free slot of the live
  decode state — while every other slot keeps decoding.
- :func:`decode_chunk` advances ALL slots ``n_steps`` tokens in one
  dispatch (a `lax.scan`, so the host syncs once per chunk, not once per
  token — the axon tunnel adds ~1.3-1.8 ms per un-batched dispatch).
- :func:`release` frees a finished slot.

Everything is static-shape: per-slot progress lives in per-row cursors
(the scatter-write KV path built for speculative decoding,
layers.attention cache_index (B,)) and a per-slot ``key_valid`` mask, so
slots at different lengths coexist in one compiled program.  The host
scheduler that drives these functions is engine/continuous.py.

Correctness invariants (tested in tests/test_continuous.py):
- a slot's token stream is identical to ``generate()`` greedy output for
  the same prompt (modulo float argmax ties — same caveat as
  models/generate.py speculative paths), regardless of what the other
  slots are doing;
- writes from done/inactive slots land on ``key_valid=False`` cache
  columns (or are dropped as out-of-bounds scatters), so they can never
  be attended;
- ``insert`` fully re-initializes a slot (cache prefix, key_valid row,
  cursors), so stale state from the previous occupant is unreachable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import causal_lm
from .config import ModelConfig
from .generate import _make_cache

# per-request top_k is clamped to this: one lax.top_k program at a static
# width serves every request (a dynamic k would recompile per value)
TOPK_CAP = 64


def _sample_dynamic(logits, key, temp, top_k, top_p):
    """Per-ROW temperature / top-k / nucleus sampling over (B, V) —
    sampling knobs are runtime arrays, so one compiled program serves
    requests with different settings (the HF GenerationConfig surface,
    reference src/models/trainer.py:390-413, as serving-time per-request
    parameters).

    temp (B,) f32: 0 = greedy, >0 = sample at that temperature.
    top_k (B,) int32: 0 = off; clamped to :data:`TOPK_CAP`.
    top_p (B,) f32: 1 = off (nucleus by threshold bisection, the
    generate.py::_top_p_mask scheme with a per-row target).

    All-greedy batches skip the sampling pipeline via ``lax.cond`` (the
    serving default costs one argmax, not a softmax + top-k sweep).
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sampled(_):
        b, v = logits.shape
        proc = logits / jnp.maximum(temp, 1e-6)[:, None]

        def with_topk(pr):
            kcap = min(TOPK_CAP, v)
            vals = jax.lax.top_k(pr, kcap)[0]  # (B, kcap) sorted desc
            kk = jnp.clip(top_k, 1, kcap) - 1
            kth = jnp.take_along_axis(vals, kk[:, None], axis=1)
            return jnp.where((top_k[:, None] > 0) & (pr < kth), -1e30, pr)

        proc = jax.lax.cond(
            jnp.any(top_k > 0), with_topk, lambda pr: pr, proc
        )

        def with_topp(pr):
            p = jax.nn.softmax(pr, axis=-1)
            lo = jnp.zeros((b, 1), p.dtype)
            hi = jnp.max(p, axis=-1, keepdims=True)

            def halve(_, lohi):
                lo, hi = lohi
                mid = 0.5 * (lo + hi)
                mass = jnp.sum(
                    jnp.where(p >= mid, p, 0.0), axis=-1, keepdims=True
                )
                ok = mass >= top_p[:, None]
                return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

            lo, _ = jax.lax.fori_loop(0, 26, halve, (lo, hi))
            return jnp.where(p >= lo, pr, -1e30)

        proc = jax.lax.cond(
            jnp.any(top_p < 1.0), with_topp, lambda pr: pr, proc
        )
        return jax.random.categorical(key, proc, axis=-1).astype(jnp.int32)

    drawn = jax.lax.cond(
        jnp.any(temp > 0.0), sampled, lambda _: greedy, None
    )
    return jnp.where(temp > 0.0, drawn, greedy)


def make_decode_state(cfg: ModelConfig, n_slots: int, total: int, *,
                      stacked: bool = False, kv_dtype: str = "bf16"):
    """Fresh all-slots-free decode state.

    ``total`` is the per-slot cache length (max prompt bucket + decode
    headroom); it must not exceed ``cfg.max_seq_len`` (RoPE/learned
    position tables).  ``kv_dtype="int8"`` quantizes the shared cache
    (layers.kv_quantize): half the HBM read per decode step and twice
    the resident slots per chip; :func:`prefill` must be called with the
    same ``kv_dtype`` so its prefix pytree matches :func:`insert`.
    """
    if total > cfg.max_seq_len:
        raise ValueError(
            f"total={total} exceeds cfg.max_seq_len={cfg.max_seq_len}"
        )
    return {
        "cache": _make_cache(cfg, n_slots, total, cfg.n_layers,
                             stacked=stacked, kv_dtype=kv_dtype),
        # which cache columns hold attendable tokens, per slot
        "key_valid": jnp.zeros((n_slots, total), jnp.bool_),
        # the last decided token (fed to the model on the next step)
        "last_tok": jnp.zeros((n_slots,), jnp.int32),
        # logical position of last_tok (pads excluded)
        "pos": jnp.zeros((n_slots,), jnp.int32),
        # cache column last_tok's K/V will be written to
        "cursor": jnp.zeros((n_slots,), jnp.int32),
        # slot owned by a request (host-managed)
        "active": jnp.zeros((n_slots,), jnp.bool_),
        # slot finished (eos / cache full); still owned until released
        "done": jnp.ones((n_slots,), jnp.bool_),
        # per-request sampling knobs (see _sample_dynamic)
        "temp": jnp.zeros((n_slots,), jnp.float32),
        "top_k": jnp.zeros((n_slots,), jnp.int32),
        "top_p": jnp.ones((n_slots,), jnp.float32),
        # per-request adapter index into the LoRA bank (0 = base model;
        # unused unless a bank is passed to prefill/decode_chunk)
        "adapter": jnp.zeros((n_slots,), jnp.int32),
        # decided token stream, slot-aligned (column i = position i);
        # invariant: toks[s, cursor[s]] == last_tok[s] (the pending
        # token).  Read by decode_chunk_spec's n-gram drafting.
        "toks": jnp.zeros((n_slots, total), jnp.int32),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "kv_dtype"))
def prefill(
    params,
    cfg: ModelConfig,
    ids,
    attn_mask,
    key,
    temp,
    top_k,
    top_p,
    bank=None,
    adapter=None,
    kv_dtype: str = "bf16",
):
    """Run RIGHT-padded prompts (B, T) and sample their first tokens.

    Right padding makes cache SLOT equal logical POSITION for every
    token — prompt at columns [0, n), generated tokens appended at the
    per-slot cursor — which is what prefix reuse (:func:`prefill_extend`)
    and the slot-space families (ALiBi bias, GPT-Neo local windows)
    want.  Logits at real positions are bit-equal to the left-padded
    layout (masked keys contribute exactly zero), so streams still match
    ``generate()``.

    ``temp``/``top_k``/``top_p`` are (B,) runtime arrays (see
    :func:`_sample_dynamic`) — per-request sampling without recompiles.
    ``bank``/``adapter``: optional stacked LoRA bank
    (lora.stack_adapters) + per-row indices — each prompt runs its own
    fine-tune over the shared base (multi-LoRA serving).
    Returns ``(kv, first_tok, n_prompt)`` where ``kv`` is the per-layer
    prompt KV prefix (cache pytree of length-T columns) to hand to
    :func:`insert`.  T should be a bucket size — each distinct T compiles
    once.
    """
    if bank is not None:
        from .lora import select_adapters

        params = select_adapters(params, bank, adapter)
    b, t = ids.shape
    positions = jnp.maximum(jnp.cumsum(attn_mask, axis=1) - 1, 0)
    cache = _make_cache(
        cfg, b, t, cfg.n_layers,
        stacked=causal_lm.blocks_stacked(params), kv_dtype=kv_dtype,
    )
    j = jnp.arange(t)[None, None, :]
    q_pos = jnp.arange(t)[None, :, None]
    mask = (j <= q_pos) & attn_mask[:, None, :].astype(jnp.bool_)
    logits, kv = causal_lm.forward(
        params, cfg, ids, mask,
        positions=positions, cache=cache, cache_index=0,
    )
    n_prompt = jnp.sum(attn_mask, axis=1).astype(jnp.int32)
    last = jnp.take_along_axis(
        logits, (n_prompt - 1)[:, None, None], axis=1
    )[:, 0]
    first = _sample_dynamic(last, key, temp, top_k, top_p)
    return kv, first, n_prompt


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill_extend(
    params,
    cfg: ModelConfig,
    prefix_kv,
    prefix_len,
    ids,
    attn_mask,
    key,
    temp,
    top_k,
    top_p,
    bank=None,
    adapter=None,
):
    """Prefill only the SUFFIX of a prompt whose first ``prefix_len``
    tokens already have KV (a prefix-cache hit — RAG prompts share their
    system prompt + retrieved contexts, so most of the prompt FLOPs are
    redundant across requests).

    ``prefix_kv``: cache pytree of width P (a bucket), columns
    [0, prefix_len) valid — the ``kv`` a previous :func:`prefill` /
    prefill_extend returned.  ``ids``/``attn_mask``: (1, S) RIGHT-padded
    suffix tokens.  ``prefix_len``: (1,) int32.

    The suffix is written at per-row cursor ``prefix_len`` (the scatter
    KV path), so the result stays HOLE-FREE: slot == position still
    holds and ALiBi / local-window families remain exact.  Returns
    ``(kv, first_tok, n_total)`` with ``kv`` of width P + S, valid
    columns [0, n_total) — insert it with a key_valid mask of
    ``arange(P+S) < n_total``.  Compiles once per (P, S) bucket pair.
    """
    if bank is not None:
        from .lora import select_adapters

        params = select_adapters(params, bank, adapter)
    b, s = ids.shape
    stacked = causal_lm.blocks_stacked(params)

    def widen(leaf):
        pad_shape = list(leaf.shape)
        pad_shape[-3] = s
        return jnp.concatenate(
            [leaf, jnp.zeros(pad_shape, leaf.dtype)], axis=-3
        )

    cache = jax.tree.map(widen, prefix_kv)
    w = (cache["k"] if stacked else cache[0]["k"]).shape[-3]
    p = prefix_len  # (1,)
    n_sfx = jnp.sum(attn_mask, axis=1).astype(jnp.int32)
    positions = p[:, None] + jnp.maximum(
        jnp.cumsum(attn_mask, axis=1) - 1, 0
    )
    jj = jnp.arange(w)[None, None, :]
    q = jnp.arange(s)[None, :, None]
    # causal across the boundary: suffix query q (absolute position p+q)
    # sees keys at slots <= p+q — the prefix plus the suffix written so
    # far; stale columns past the suffix writes are > p+q, never seen
    mask = jj <= (p[:, None, None] + q)
    logits, kv = causal_lm.forward(
        params, cfg, ids, mask,
        positions=positions, cache=cache, cache_index=p,
    )
    last = jnp.take_along_axis(
        logits, (n_sfx - 1)[:, None, None], axis=1
    )[:, 0]
    first = _sample_dynamic(last, key, temp, top_k, top_p)
    return kv, first, p + n_sfx


@functools.partial(jax.jit, static_argnames=("width",))
def crop_kv(kv, width: int):
    """Crop or zero-pad a prefill KV pytree to ``width`` columns (the
    prefix cache normalizes stored widths to the bucket grid so
    :func:`prefill_extend` compiles O(buckets^2) programs, not one per
    emergent width)."""

    def fix(leaf):
        if leaf.shape[-3] >= width:
            return leaf[..., :width, :, :]
        pad_shape = list(leaf.shape)
        pad_shape[-3] = width - leaf.shape[-3]
        return jnp.concatenate(
            [leaf, jnp.zeros(pad_shape, leaf.dtype)], axis=-3
        )

    return jax.tree.map(fix, kv)


def _write_prefix(state_leaf, kv_leaf, slot, stacked: bool):
    """Scatter a (…, 1, T, H, D) prompt-KV leaf into cache column range
    [0, T) of row ``slot`` — leading layer dim when stacked."""
    if stacked:
        return jax.lax.dynamic_update_slice(
            state_leaf, kv_leaf.astype(state_leaf.dtype), (0, slot, 0, 0, 0)
        )
    return jax.lax.dynamic_update_slice(
        state_leaf, kv_leaf.astype(state_leaf.dtype), (slot, 0, 0, 0)
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def insert(state, kv, ids, attn_mask, first_tok, n_prompt, slot,
           temp, top_k, top_p, adapter=None):
    """Install a prefilled request into slot ``slot`` (traced scalar).

    ``kv``/``attn_mask``/``first_tok``/``n_prompt`` are the B=1 outputs of
    :func:`prefill` (bucket length T <= total); ``ids`` the matching
    (1, T) right-padded prompt tokens (kept in ``state["toks"]`` for
    speculative drafting); ``temp``/``top_k``/``top_p`` are (1,)
    per-request sampling knobs; ``adapter`` the (1,) LoRA-bank index
    (None = base).  Compiles once per bucket.
    """
    stacked = not isinstance(state["cache"], list)
    t = attn_mask.shape[1]
    total = state["key_valid"].shape[1]
    if stacked:
        new_cache = jax.tree.map(
            lambda s, p: _write_prefix(s, p, slot, True),
            state["cache"], kv,
        )
    else:
        new_cache = [
            jax.tree.map(lambda s, p: _write_prefix(s, p, slot, False),
                         s_layer, p_layer)
            for s_layer, p_layer in zip(state["cache"], kv)
        ]
    row = jnp.concatenate(
        [attn_mask.astype(jnp.bool_),
         jnp.zeros((1, total - t), jnp.bool_)], axis=1
    )
    return {
        "cache": new_cache,
        "key_valid": jax.lax.dynamic_update_slice(
            state["key_valid"], row, (slot, 0)
        ),
        "last_tok": state["last_tok"].at[slot].set(first_tok[0]),
        "pos": state["pos"].at[slot].set(n_prompt[0]),
        # right-padded layout: the next write slot is the true prompt
        # length, so pad columns between n and the bucket edge are never
        # consumed — decode headroom is total - n, not total - bucket
        "cursor": state["cursor"].at[slot].set(n_prompt[0]),
        "active": state["active"].at[slot].set(True),
        "done": state["done"].at[slot].set(False),
        "temp": state["temp"].at[slot].set(temp[0]),
        "top_k": state["top_k"].at[slot].set(top_k[0]),
        "top_p": state["top_p"].at[slot].set(top_p[0]),
        "adapter": (
            state["adapter"] if adapter is None
            else state["adapter"].at[slot].set(adapter[0])
        ),
        # prompt tokens at their positions, then the pending first token
        # at column n (invariant: toks[s, cursor] == last_tok[s])
        "toks": jax.lax.dynamic_update_slice(
            state["toks"],
            jnp.concatenate(
                [ids * attn_mask, jnp.zeros((1, total - t), jnp.int32)],
                axis=1,
            ),
            (slot, 0),
        ).at[slot, n_prompt[0]].set(first_tok[0]),
    }


@functools.partial(jax.jit, donate_argnums=(0,))
def release(state, slot):
    """Free slot ``slot``: nothing in it can be attended afterwards."""
    total = state["key_valid"].shape[1]
    return {
        **state,
        "key_valid": jax.lax.dynamic_update_slice(
            state["key_valid"],
            jnp.zeros((1, total), jnp.bool_),
            (slot, 0),
        ),
        "active": state["active"].at[slot].set(False),
        "done": state["done"].at[slot].set(True),
    }


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "eos_id"),
    donate_argnums=(1,),
)
def decode_chunk(
    params,
    state,
    key,
    cfg: ModelConfig,
    *,
    n_steps: int = 8,
    eos_id: int | None = None,
    bank=None,
):
    """Advance every live slot ``n_steps`` tokens in ONE dispatch.

    Returns ``(state, toks)`` with ``toks`` (n_slots, n_steps) — the
    tokens emitted this chunk, row-aligned with slots.  Emissions after a
    slot's eos (or from free slots) are eos-filled (0 when ``eos_id`` is
    None); the host scheduler truncates per-request.

    Safety of the unconditional KV write in layers.attention: a row that
    must not advance (done/inactive) still writes its token's K/V at
    ``cursor``, but that column's ``key_valid`` bit is only raised under
    ``write_ok``, and a cursor at ``total`` scatters out of bounds, which
    JAX drops — either way the garbage is unreachable.
    """
    if bank is not None:
        # adapter assignments only change at insert (between chunks), so
        # one gather per chunk serves every step of its scan
        from .lora import select_adapters

        params = select_adapters(params, bank, state["adapter"])
    n_slots, total = state["key_valid"].shape
    fill = jnp.int32(eos_id if eos_id is not None else 0)
    rows = jnp.arange(n_slots)

    def step(st, k_s):
        write_ok = st["active"] & ~st["done"] & (st["cursor"] < total)
        key_valid = st["key_valid"].at[rows, st["cursor"]].max(write_ok)
        logits, cache = causal_lm.forward(
            params, cfg, st["last_tok"][:, None], key_valid[:, None, :],
            positions=st["pos"][:, None],
            cache=st["cache"], cache_index=st["cursor"],
        )
        nxt = _sample_dynamic(
            logits[:, 0], k_s, st["temp"], st["top_k"], st["top_p"]
        )
        nxt = jnp.where(write_ok, nxt, fill)
        done = st["done"] | ~st["active"] | (st["cursor"] + 1 >= total)
        if eos_id is not None:
            done = done | (nxt == eos_id)
        new_cursor = st["cursor"] + write_ok
        new_st = {
            **st,
            "cache": cache,
            "key_valid": key_valid,
            "last_tok": jnp.where(write_ok, nxt, st["last_tok"]),
            "pos": st["pos"] + write_ok,
            "cursor": new_cursor,
            "done": done,
            # record the new pending token at its position (OOB dropped
            # for rows that didn't advance)
            "toks": st["toks"].at[
                rows, jnp.where(write_ok, new_cursor, total)
            ].set(nxt),
        }
        return new_st, nxt

    keys = jax.random.split(key, n_steps)
    state, toks = jax.lax.scan(step, state, keys)
    return state, toks.T


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "eos_id", "gamma", "ngram"),
    donate_argnums=(1,),
)
def decode_chunk_spec(
    params,
    state,
    cfg: ModelConfig,
    *,
    n_steps: int = 4,
    eos_id: int | None = None,
    gamma: int = 8,
    ngram: int = 3,
    bank=None,
):
    """Speculative decode chunk: prompt-lookup drafting PER SLOT, greedy
    only (the host scheduler falls back to :func:`decode_chunk` while any
    sampled request occupies a slot).

    Each of the ``n_steps`` iterations drafts ``gamma`` tokens per slot
    by n-gram lookup over the slot's own stream (``state["toks"]`` —
    generate._ngram_draft with pad_start=0, the right-padded layout),
    verifies the window in ONE forward at the per-slot cursors, and
    accepts the longest holding prefix plus the model's bonus token —
    the slot-scheduled form of models/generate.py::generate_speculative,
    so each step emits 1..gamma+1 tokens per live slot and the output is
    token-identical to the plain chunk (same greedy argmax caveat as the
    standalone driver).  Rejected-draft KV is overwritten by the next
    window before it could ever be attended (the next window starts at
    the new pending and spans gamma+1 >= leftover stale columns).

    Returns ``(state, vals, counts)``: ``vals`` (n_slots, n_steps,
    gamma+1) emitted-token windows, ``counts`` (n_slots, n_steps) how
    many of each window are real — the host consumes ``vals[s, j,
    :counts[s, j]]`` in order.
    """
    if bank is not None:
        from .lora import select_adapters

        params = select_adapters(params, bank, state["adapter"])
    from .generate import _ngram_draft

    n_slots, total = state["key_valid"].shape
    rows = jnp.arange(n_slots)
    s_win = jnp.arange(gamma + 1)
    jw = s_win[None, :]

    def step(st, _):
        live = st["active"] & ~st["done"]
        cursor = st["cursor"]
        drafts = _ngram_draft(
            st["toks"], cursor + 1, jnp.zeros_like(cursor), gamma, ngram
        )
        window = jnp.concatenate([st["last_tok"][:, None], drafts], axis=1)
        pos = jnp.minimum(
            st["pos"][:, None] + s_win[None, :], total - 1
        )
        jj = jnp.arange(total)[None, None, :]
        win_ok = (jj >= cursor[:, None, None]) & (
            jj <= (cursor[:, None] + s_win[None, :])[:, :, None]
        )
        mask = st["key_valid"][:, None, :] | win_ok
        logits, cache = causal_lm.forward(
            params, cfg, window, mask,
            positions=pos, cache=st["cache"], cache_index=cursor,
        )
        y = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        hold = jnp.cumprod(
            (y[:, :gamma] == window[:, 1:]).astype(jnp.int32), axis=1
        )
        a = jnp.sum(hold, axis=1)  # accepted drafts in [0, gamma]
        bonus = jnp.take_along_axis(y, a[:, None], axis=1)[:, 0]
        drafts_pad = jnp.concatenate(
            [window[:, 1:], jnp.zeros((n_slots, 1), jnp.int32)], axis=1
        )
        vals = jnp.where(jw < a[:, None], drafts_pad, bonus[:, None])
        col = cursor[:, None] + 1 + jw  # produced token positions
        # col == total is allowed to EMIT (parity with decode_chunk,
        # whose final emission's recording is OOB-dropped the same way);
        # its toks/key_valid writes drop and done is forced below
        write_ok = (jw <= a[:, None]) & live[:, None] & (col <= total)
        if eos_id is not None:
            # nothing is produced past the first in-window eos (the eos
            # itself IS produced; the host stops the request there)
            prior_eos = jnp.cumsum(
                (vals == eos_id).astype(jnp.int32), axis=1
            ) - (vals == eos_id).astype(jnp.int32)
            write_ok = write_ok & (prior_eos == 0)
        # stream record (OOB columns drop)
        toks = st["toks"].at[
            rows[:, None], jnp.where(write_ok, col, total)
        ].set(vals)
        # cache validity: the pending token (window col 0) plus accepted
        # drafts that were PRODUCED (their KV cols == their positions);
        # the bonus has no KV yet — it is the next pending
        key_valid = st["key_valid"].at[
            rows, jnp.where(live & (cursor < total), cursor, total)
        ].max(True)
        key_valid = key_valid.at[
            rows[:, None],
            jnp.where(write_ok & (jw < a[:, None]) & (col < total),
                      col, total),
        ].max(True)
        n_written = jnp.sum(write_ok, axis=1)
        new_cursor = cursor + n_written
        last = jnp.take_along_axis(
            vals, jnp.maximum(n_written - 1, 0)[:, None], axis=1
        )[:, 0]
        new_last = jnp.where(n_written > 0, last, st["last_tok"])
        done = st["done"] | ~st["active"] | (new_cursor + 1 >= total)
        if eos_id is not None:
            done = done | jnp.any(write_ok & (vals == eos_id), axis=1)
        counts = jnp.where(live, n_written, 0)
        new_st = {
            **st,
            "cache": cache,
            "key_valid": key_valid,
            "toks": toks,
            "last_tok": new_last,
            "pos": st["pos"] + n_written,
            "cursor": new_cursor,
            "done": done,
        }
        return new_st, (vals, counts)

    state, (vals, counts) = jax.lax.scan(
        step, state, jnp.arange(n_steps)
    )
    return state, jnp.transpose(vals, (1, 0, 2)), counts.T


# -----------------------------------------------------------------------------
# Seq2seq (encoder-decoder) slot engine
# -----------------------------------------------------------------------------
#
# The same continuous-batching shape for the reference's SEQ_2_SEQ_LM task
# (AutoModelForSeq2SeqLM, reference src/models/trainer.py:536-544; its
# seq2seq eval decodes whole batches in lockstep at :928-949).  Per-slot
# state adds what the decoder needs that causal slots don't have: the
# cross-attention K/V of the slot's OWN encoder input (width-padded to one
# shared enc_width so every chunk is one compiled program) and its encoder
# padding mask.  The decoder stream is dense (no prompt in the cache —
# column 0 is BOS), so cursor == position and prompt bucketing applies to
# the ENCODER side only.


def _s2s_mod(cfg: ModelConfig):
    from .families import s2s_module

    return s2s_module(cfg)


def _s2s_stacked(cfg: ModelConfig, params) -> bool:
    from .families import s2s_stacked

    return s2s_stacked(cfg, params)


def make_decode_state_seq2seq(cfg: ModelConfig, n_slots: int, total: int,
                              enc_width: int, *, stacked: bool = False):
    """Fresh all-slots-free seq2seq decode state.

    ``total``: decoder cache length (BOS + up to total-1 generated
    tokens).  ``enc_width``: shared encoder width — per-slot cross-KV is
    stored padded to it (the largest encoder bucket)."""
    if total > cfg.max_seq_len:
        raise ValueError(
            f"total={total} exceeds cfg.max_seq_len={cfg.max_seq_len}"
        )
    ckv_shape = (n_slots, enc_width, cfg.n_heads, cfg.head_dim)
    if stacked:
        ckv_shape = (cfg.decoder_layers,) + ckv_shape
        cross_kv = {
            "k": jnp.zeros(ckv_shape, jnp.bfloat16),
            "v": jnp.zeros(ckv_shape, jnp.bfloat16),
        }
    else:
        cross_kv = [
            {"k": jnp.zeros(ckv_shape, jnp.bfloat16),
             "v": jnp.zeros(ckv_shape, jnp.bfloat16)}
            for _ in range(cfg.decoder_layers)
        ]
    return {
        "cache": _make_cache(cfg, n_slots, total, cfg.decoder_layers,
                             stacked=stacked),
        # bf16 storage is bit-neutral: attention casts K/V to bf16 at the
        # score/value matmuls either way (layers.attention COMPUTE_DTYPE)
        "cross_kv": cross_kv,
        "enc_mask": jnp.zeros((n_slots, enc_width), jnp.int32),
        "key_valid": jnp.zeros((n_slots, total), jnp.bool_),
        "last_tok": jnp.zeros((n_slots,), jnp.int32),
        "cursor": jnp.zeros((n_slots,), jnp.int32),
        "active": jnp.zeros((n_slots,), jnp.bool_),
        "done": jnp.ones((n_slots,), jnp.bool_),
        "temp": jnp.zeros((n_slots,), jnp.float32),
        "top_k": jnp.zeros((n_slots,), jnp.int32),
        "top_p": jnp.ones((n_slots,), jnp.float32),
    }


@functools.partial(jax.jit, static_argnames=("cfg", "bos_id"))
def prefill_seq2seq(
    params,
    cfg: ModelConfig,
    enc_ids,
    enc_mask,
    key,
    temp,
    top_k,
    top_p,
    bos_id: int = 0,
):
    """Encode one RIGHT-padded prompt (1, T_enc bucket), precompute its
    cross-attention K/V, run the BOS decoder step, and sample the first
    token.  Returns ``(cross_kv, dec_kv, first_tok)`` — ``cross_kv`` at
    the prompt's bucket width (insert pads to the state's enc_width),
    ``dec_kv`` the width-1 decoder self-KV of the BOS step.  Compiles
    once per encoder bucket."""
    s2s = _s2s_mod(cfg)
    stacked = _s2s_stacked(cfg, params)
    enc_out = s2s.encode(params, cfg, enc_ids, enc_mask)
    cross_kv = s2s.precompute_cross_kv(params, cfg, enc_out)
    cross_kv = jax.tree.map(lambda x: x.astype(jnp.bfloat16), cross_kv)
    cache = _make_cache(cfg, 1, 1, cfg.decoder_layers, stacked=stacked)
    bos = jnp.full((1, 1), bos_id, jnp.int32)
    logits, dec_kv = s2s.decode(
        params, cfg, bos, None, enc_mask,
        jnp.ones((1, 1, 1), jnp.bool_),
        positions=jnp.zeros((1, 1), jnp.int32),
        cache=cache, cache_index=0, cross_kv=cross_kv,
    )
    first = _sample_dynamic(logits[:, 0], key, temp, top_k, top_p)
    return cross_kv, dec_kv, first


@functools.partial(jax.jit, donate_argnums=(0,))
def insert_seq2seq(state, cross_kv, enc_mask, dec_kv, first_tok, slot,
                   temp, top_k, top_p):
    """Install a prefilled seq2seq request into slot ``slot``.

    ``cross_kv`` must already be padded to the state's enc_width
    (crop_kv — same token-axis-at(-3) layout as decoder KV).  Fully
    re-initializes the slot: cross-KV, enc mask, BOS self-KV column,
    cursors.  Compiles ONCE (no per-bucket widths reach insert)."""
    stacked = not isinstance(state["cache"], list)
    total = state["key_valid"].shape[1]
    if stacked:
        new_cache = jax.tree.map(
            lambda s, p: _write_prefix(s, p, slot, True),
            state["cache"], dec_kv,
        )
        new_ckv = jax.tree.map(
            lambda s, p: _write_prefix(s, p, slot, True),
            state["cross_kv"], cross_kv,
        )
    else:
        new_cache = [
            jax.tree.map(lambda s, p: _write_prefix(s, p, slot, False),
                         s_layer, p_layer)
            for s_layer, p_layer in zip(state["cache"], dec_kv)
        ]
        new_ckv = [
            jax.tree.map(lambda s, p: _write_prefix(s, p, slot, False),
                         s_layer, p_layer)
            for s_layer, p_layer in zip(state["cross_kv"], cross_kv)
        ]
    row = jnp.zeros((1, total), jnp.bool_).at[0, 0].set(True)  # BOS column
    return {
        "cache": new_cache,
        "cross_kv": new_ckv,
        "enc_mask": jax.lax.dynamic_update_slice(
            state["enc_mask"], enc_mask.astype(jnp.int32), (slot, 0)
        ),
        "key_valid": jax.lax.dynamic_update_slice(
            state["key_valid"], row, (slot, 0)
        ),
        "last_tok": state["last_tok"].at[slot].set(first_tok[0]),
        "cursor": state["cursor"].at[slot].set(1),
        "active": state["active"].at[slot].set(True),
        "done": state["done"].at[slot].set(False),
        "temp": state["temp"].at[slot].set(temp[0]),
        "top_k": state["top_k"].at[slot].set(top_k[0]),
        "top_p": state["top_p"].at[slot].set(top_p[0]),
    }


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "eos_id"),
    donate_argnums=(1,),
)
def decode_chunk_seq2seq(
    params,
    state,
    key,
    cfg: ModelConfig,
    *,
    n_steps: int = 8,
    eos_id: int | None = None,
):
    """Advance every live seq2seq slot ``n_steps`` decoder tokens in ONE
    dispatch (the seq2seq form of :func:`decode_chunk`).  Cross-attention
    reads each slot's stored cross-KV under its own encoder mask; decoder
    self-attention scatters at per-slot cursors (t5 relative bias gets a
    per-row query position via _dec_bias(per_row=True))."""
    s2s = _s2s_mod(cfg)
    n_slots, total = state["key_valid"].shape
    fill = jnp.int32(eos_id if eos_id is not None else 0)
    rows = jnp.arange(n_slots)

    def step(st, k_s):
        write_ok = st["active"] & ~st["done"] & (st["cursor"] < total)
        key_valid = st["key_valid"].at[rows, st["cursor"]].max(write_ok)
        logits, cache = s2s.decode(
            params, cfg, st["last_tok"][:, None], None, st["enc_mask"],
            key_valid[:, None, :],
            positions=st["cursor"][:, None],
            cache=st["cache"], cache_index=st["cursor"],
            cross_kv=st["cross_kv"],
        )
        nxt = _sample_dynamic(
            logits[:, 0], k_s, st["temp"], st["top_k"], st["top_p"]
        )
        nxt = jnp.where(write_ok, nxt, fill)
        done = st["done"] | ~st["active"] | (st["cursor"] + 1 >= total)
        if eos_id is not None:
            done = done | (nxt == eos_id)
        new_st = {
            **st,
            "cache": cache,
            "key_valid": key_valid,
            "last_tok": jnp.where(write_ok, nxt, st["last_tok"]),
            "cursor": st["cursor"] + write_ok,
            "done": done,
        }
        return new_st, nxt

    keys = jax.random.split(key, n_steps)
    state, toks = jax.lax.scan(step, state, keys)
    return state, toks.T


@functools.partial(jax.jit, donate_argnums=(0,))
def release_seq2seq(state, slot):
    """Free seq2seq slot ``slot``."""
    total = state["key_valid"].shape[1]
    enc_w = state["enc_mask"].shape[1]
    return {
        **state,
        "key_valid": jax.lax.dynamic_update_slice(
            state["key_valid"],
            jnp.zeros((1, total), jnp.bool_),
            (slot, 0),
        ),
        "enc_mask": jax.lax.dynamic_update_slice(
            state["enc_mask"], jnp.zeros((1, enc_w), jnp.int32), (slot, 0)
        ),
        "active": state["active"].at[slot].set(False),
        "done": state["done"].at[slot].set(True),
    }
