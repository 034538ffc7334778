"""Prefix caching (decode_engine.prefill_extend + engine/continuous.py
_PrefixCache).

Contract: a prefix-cache hit changes HOW MUCH prefill work runs, never
the tokens — every stream must stay identical to a cold generate() of
the full prompt, across chained prefixes, repeat prompts, LoRA adapters
(which must never share entries), eviction, and the slot-space families
(ALiBi, GPT-Neo local windows) that prefix reuse could misalign.

Beyond-parity: the reference recomputes the full prompt per request (HF
generate, reference src/models/trainer.py:942-946); RAG prompts share
system + retrieved-context prefixes, which is exactly the serve path.
"""

import jax
import numpy as np
import pytest

from vietnamese_qa_system_tpu.engine.continuous import ContinuousEngine
from vietnamese_qa_system_tpu.models import ModelConfig
from vietnamese_qa_system_tpu.models.causal_lm import init_causal_lm
from vietnamese_qa_system_tpu.models.generate import generate

BASE = dict(arch="causal", vocab_size=97, d_model=32, n_heads=4,
            n_layers=2, d_ff=64, max_seq_len=256)


def _mk(cfg, seed=0):
    return init_causal_lm(jax.random.key(seed), cfg)


def _prompt(rng, n):
    return [int(x) for x in rng.integers(4, 90, (n,))]


def _ref(params, cfg, prompt, bucket, max_new):
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, bucket - len(prompt):] = prompt
    mask[0, bucket - len(prompt):] = 1
    out = np.asarray(
        generate(params, cfg, ids, mask, max_new_tokens=max_new)
    )[0, bucket:]
    return [int(x) for x in out]


def _bucket_of(n, buckets=(16, 32)):
    for b in buckets:
        if n <= b:
            return b
    raise AssertionError


@pytest.fixture
def engine_factory():
    engines = []

    def make(params, cfg, **kw):
        kw.setdefault("n_slots", 2)
        kw.setdefault("total", 96)
        kw.setdefault("buckets", (16, 32))
        kw.setdefault("chunk_steps", 4)
        kw.setdefault("prefix_cache_mb", 64.0)
        kw.setdefault("min_cached_prompt", 4)
        eng = ContinuousEngine(params, cfg, **kw)
        engines.append(eng)
        return eng

    yield make
    for eng in engines:
        eng.close()


def test_chained_prefix_hits_match_cold(engine_factory):
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(0)
    a = _prompt(rng, 12)
    ab = a + _prompt(rng, 8)
    abc = ab + _prompt(rng, 9)
    eng = engine_factory(params, cfg)
    for p in (a, ab, abc):
        out = eng.generate_ids(p, 12)
        assert out == _ref(params, cfg, p, _bucket_of(len(p)), 12), len(p)
    s = eng.snapshot_stats()
    assert s["prefix_hits"] == 2
    # ab reused a's 12 tokens; abc reused ab's 20
    assert s["prefix_tokens_reused"] == 12 + 20
    assert s["prefix_cache"]["entries"] >= 2


def test_repeat_prompt_reuses_all_but_last_token(engine_factory):
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(1), 14)
    eng = engine_factory(params, cfg)
    out1 = eng.generate_ids(prompt, 10)
    out2 = eng.generate_ids(prompt, 10)
    assert out1 == out2 == _ref(params, cfg, prompt, 16, 10)
    s = eng.snapshot_stats()
    assert s["prefix_hits"] == 1
    assert s["prefix_tokens_reused"] == len(prompt) - 1


def test_adapters_never_share_prefixes(engine_factory):
    """The same token prefix under a LoRA adapter has different K/V; a
    cross-adapter hit would silently corrupt the stream."""
    from vietnamese_qa_system_tpu.models.lora import (
        LoraConfig, init_lora, select_adapters, stack_adapters,
    )

    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    lcfg = LoraConfig(r=4, alpha=8)
    ad = init_lora(jax.random.key(1), params, lcfg)
    leaves, tree = jax.tree_util.tree_flatten(ad)
    ks = jax.random.split(jax.random.key(2), len(leaves))
    ad = jax.tree_util.tree_unflatten(
        tree, [jax.random.normal(k, l.shape, l.dtype) * 0.3
               for k, l in zip(ks, leaves)]
    )
    eng = engine_factory(params, cfg, adapters={"vi": ad}, lora_config=lcfg)
    rng = np.random.default_rng(3)
    a = _prompt(rng, 10)
    ab = a + _prompt(rng, 5)
    out_base = eng.generate_ids(a, 10)  # cold, stored under adapter 0
    out_vi = eng.submit(ab, 10, adapter="vi").result(timeout=180)["ids"]
    s = eng.snapshot_stats()
    assert s["prefix_hits"] == 0  # base entry must NOT serve adapter vi
    bank = stack_adapters([ad], lcfg)
    ids, mask = _pad_lr(ab, 16)
    ref_vi = [int(x) for x in np.asarray(generate(
        select_adapters(params, bank, jax.numpy.int32(1)), cfg,
        ids, mask, max_new_tokens=10,
    ))[0, 16:]]
    assert out_vi == ref_vi
    assert out_base == _ref(params, cfg, a, 16, 10)


def _pad_lr(prompt, bucket):
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, bucket - len(prompt):] = prompt
    mask[0, bucket - len(prompt):] = 1
    import jax.numpy as jnp

    return jnp.asarray(ids), jnp.asarray(mask)


def test_eviction_keeps_serving_correctly(engine_factory):
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(4)
    # tiny budget: two entries at most (tiny model KV = 4 KB per
    # 16-bucket entry: 2 layers x k+v x (1, 16, 4, 8) bf16)
    eng = engine_factory(params, cfg, prefix_cache_mb=0.008)
    prompts = [_prompt(rng, 12) for _ in range(3)]
    for p in prompts:
        assert eng.generate_ids(p, 8) == _ref(params, cfg, p, 16, 8)
    s = eng.snapshot_stats()
    assert s["prefix_cache"]["entries"] <= 2
    assert s["prefix_cache"]["mb"] <= 0.008 + 1e-6


def test_alibi_and_local_window_families(engine_factory):
    """Slot-space families: prefix reuse keeps slot == position (the
    suffix is written at the per-row cursor, hole-free), so ALiBi biases
    and GPT-Neo local windows stay exact through a hit."""
    alibi = ModelConfig(**{**BASE, "positional": "alibi",
                           "embed_layernorm": True})
    neo = ModelConfig(
        **{**BASE, "positional": "learned", "attention_scale": 1.0,
           "activation": "gelu_new"},
        attention_layers=("global", "local"),
        attention_window=8,
    )
    rng = np.random.default_rng(6)
    for cfg in (alibi, neo):
        params = _mk(cfg)
        a = _prompt(rng, 11)
        ab = a + _prompt(rng, 7)
        eng = engine_factory(params, cfg)
        assert eng.generate_ids(a, 10) == _ref(params, cfg, a, 16, 10)
        assert eng.generate_ids(ab, 10) == _ref(
            params, cfg, ab, _bucket_of(len(ab)), 10
        )
        assert eng.snapshot_stats()["prefix_hits"] == 1


def test_stacked_base_prefix_hits(engine_factory):
    from vietnamese_qa_system_tpu.models.causal_lm import stack_blocks

    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    sparams = stack_blocks(params)
    rng = np.random.default_rng(8)
    a = _prompt(rng, 10)
    ab = a + _prompt(rng, 6)
    eng = engine_factory(sparams, cfg)
    assert eng.generate_ids(a, 10) == _ref(params, cfg, a, 16, 10)
    assert eng.generate_ids(ab, 10) == _ref(params, cfg, ab, 16, 10)
    assert eng.snapshot_stats()["prefix_hits"] == 1


def test_cache_disabled_by_default():
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    eng = ContinuousEngine(params, cfg, n_slots=1, total=64, buckets=(16,))
    try:
        prompt = _prompt(np.random.default_rng(9), 10)
        eng.generate_ids(prompt, 6)
        eng.generate_ids(prompt, 6)
        s = eng.snapshot_stats()
        assert s["prefix_hits"] == 0 and "prefix_cache" not in s
    finally:
        eng.close()
