"""int8 KV-cache quantization (layers.kv_quantize + kv_dtype plumbing).

The contract has two halves:
- NUMERICS: per-(token, head) absmax int8 quantization bounds the
  elementwise K/V error by scale/2, and a decode forward over an int8
  cache stays close to the bf16-cache forward (a perturbation, not a
  different function).
- PLUMBING EXACTNESS: the continuous engine with ``kv_dtype="int8"`` is
  token-identical to ``generate(kv_dtype="int8")`` — the engine may only
  change WHEN K/V are quantized (slot writes vs monolithic decode),
  never WHAT the codes are.  This mirrors the bf16 exactness pinning in
  tests/test_continuous.py.

Capability analog in the reference: bitsandbytes 8-bit quantization
(reference src/models/trainer.py:470-487), applied here to the serving
decode bottleneck instead of the base weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.engine.continuous import ContinuousEngine
from vietnamese_qa_system_tpu.models import ModelConfig
from vietnamese_qa_system_tpu.models import causal_lm
from vietnamese_qa_system_tpu.models.causal_lm import (
    init_causal_lm,
    stack_blocks,
)
from vietnamese_qa_system_tpu.models.generate import _make_cache, generate
from vietnamese_qa_system_tpu.models.layers import kv_dequantize, kv_quantize

BASE = dict(arch="causal", vocab_size=97, d_model=32, n_heads=4,
            n_layers=2, d_ff=64, max_seq_len=256)


def _mk(cfg, seed=0):
    return init_causal_lm(jax.random.key(seed), cfg)


def _prompt(rng, n, vocab_hi=90):
    return [int(x) for x in rng.integers(4, vocab_hi, (n,))]


def _ref_int8(params, cfg, prompt, bucket, max_new, eos):
    """generate(kv_dtype="int8") at the engine's padded width, prompt
    stripped, truncated after the first eos (inclusive)."""
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, bucket - len(prompt):] = prompt
    mask[0, bucket - len(prompt):] = 1
    out = np.asarray(
        generate(params, cfg, ids, mask, max_new_tokens=max_new,
                 eos_id=eos, kv_dtype="int8")
    )[0, bucket:]
    if eos is not None:
        hits = np.nonzero(out == eos)[0]
        if hits.size:
            out = out[: hits[0] + 1]
    return [int(x) for x in out]


@pytest.fixture
def engine_factory():
    engines = []

    def make(params, cfg, **kw):
        eng = ContinuousEngine(params, cfg, **kw)
        engines.append(eng)
        return eng

    yield make
    for eng in engines:
        eng.close()


def test_kv_quantize_error_bound():
    """|dequant(quantize(x)) - x| <= scale/2 elementwise, scales are
    per-(token, head) absmax/127 with a trailing singleton dim."""
    x = jax.random.normal(jax.random.key(0), (3, 7, 4, 16)) * jnp.logspace(
        -3, 2, 7
    )[None, :, None, None]
    codes, scales = kv_quantize(x)
    assert codes.dtype == jnp.int8
    assert scales.shape == (3, 7, 4, 1)
    err = np.abs(np.asarray(kv_dequantize(codes, scales)) - np.asarray(x))
    bound = np.asarray(scales) / 2 + 1e-12
    assert (err <= bound).all()
    # zero input must not divide by zero and must roundtrip to zero
    codes0, s0 = kv_quantize(jnp.zeros((1, 2, 2, 8)))
    assert np.asarray(codes0).max() == 0
    assert np.isfinite(np.asarray(s0)).all()


def test_int8_cache_forward_close_to_bf16():
    """One decode forward over a prefilled cache: int8 logits are a small
    perturbation of the bf16-cache logits (same function, quantized
    memory)."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(4, 90, (2, 24)), jnp.int32)
    t = 32
    outs = {}
    for kvd in ("bf16", "int8"):
        cache = _make_cache(cfg, 2, t, cfg.n_layers, kv_dtype=kvd)
        j = jnp.arange(t)[None, None, :]
        q = jnp.arange(24)[None, :, None]
        mask = (j <= q) & (j < 24)
        logits, kv = causal_lm.forward(
            params, cfg, ids, mask,
            positions=jnp.broadcast_to(jnp.arange(24)[None], (2, 24)),
            cache=cache, cache_index=0,
        )
        # one decode step attending the whole cached prompt
        step_mask = (jnp.arange(t)[None, None, :] < 25)
        l2, _ = causal_lm.forward(
            params, cfg, ids[:, -1:], step_mask,
            positions=jnp.full((2, 1), 24, jnp.int32),
            cache=kv, cache_index=24,
        )
        outs[kvd] = np.asarray(l2[:, 0], np.float32)
    scale = np.abs(outs["bf16"]).max()
    assert np.abs(outs["int8"] - outs["bf16"]).max() < 0.05 * scale


def test_engine_int8_matches_generate_int8(engine_factory):
    """Engine streams under kv_dtype=int8 == generate(kv_dtype=int8),
    through BOTH the speculative and plain chunk paths."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(11)
    prompts = [_prompt(rng, n) for n in (6, 12, 15, 9)]
    for spec in ("ngram", "off"):
        eng = engine_factory(params, cfg, n_slots=2, total=64,
                             buckets=(16,), chunk_steps=4,
                             kv_dtype="int8", speculative=spec,
                             draft_tokens=4, draft_ngram=2, spec_steps=2)
        for p in prompts:
            assert eng.generate_ids(p, 18) == _ref_int8(
                params, cfg, p, 16, 18, None
            )


def test_engine_int8_gqa_stacked(engine_factory):
    """GQA kv-head cache + scan-over-layers stacked blocks ride the int8
    path (stacked leaves carry a leading layer dim; scales follow)."""
    cfg = ModelConfig(**{**BASE, "n_heads": 4, "n_kv_heads": 2})
    params = stack_blocks(_mk(cfg))
    rng = np.random.default_rng(13)
    prompts = [_prompt(rng, n) for n in (8, 14)]
    eng = engine_factory(params, cfg, n_slots=2, total=64, buckets=(16,),
                         chunk_steps=4, kv_dtype="int8")
    for p in prompts:
        assert eng.generate_ids(p, 14) == _ref_int8(
            params, cfg, p, 16, 14, None
        )


def test_engine_int8_alibi(engine_factory):
    """ALiBi (BLOOM family) in slot space with quantized KV."""
    cfg = ModelConfig(**{**BASE, "positional": "alibi"})
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(17), 10)
    eng = engine_factory(params, cfg, n_slots=1, total=64, buckets=(16,),
                         chunk_steps=4, kv_dtype="int8")
    assert eng.generate_ids(prompt, 16) == _ref_int8(
        params, cfg, prompt, 16, 16, None
    )


def test_prefix_cache_hits_stay_exact_under_int8(engine_factory):
    """Prefix-cache hits reuse stored int8 codes; quantization is
    deterministic per position, so hit streams == cold int8 streams."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(19)
    prefix = _prompt(rng, 20)
    p2 = prefix + _prompt(rng, 9)  # extends the cached prompt
    eng = engine_factory(params, cfg, n_slots=2, total=96, buckets=(32, 48),
                         chunk_steps=4, kv_dtype="int8",
                         prefix_cache_mb=8, min_cached_prompt=8)
    out1 = eng.generate_ids(prefix, 12)
    out2 = eng.generate_ids(p2, 12)
    assert eng.snapshot_stats()["prefix_hits"] >= 1
    assert out1 == _ref_int8(params, cfg, prefix, 32, 12, None)
    assert out2 == _ref_int8(params, cfg, p2, 32, 12, None)


def test_int8_cache_memory_halves():
    """The int8 state's cache bytes are ~half the bf16 state's (codes are
    1 B vs 2 B; scales add 1/head_dim overhead)."""
    from vietnamese_qa_system_tpu.models.decode_engine import (
        make_decode_state,
    )

    cfg = ModelConfig(**{**BASE, "d_model": 64, "n_heads": 4})
    def cache_bytes(kvd):
        st = make_decode_state(cfg, 4, 128, kv_dtype=kvd)
        return sum(
            l.size * l.dtype.itemsize for l in jax.tree.leaves(st["cache"])
        )

    b16, i8 = cache_bytes("bf16"), cache_bytes("int8")
    # head_dim 16: int8 = (1 + 4/16) / 2 = 0.625 of bf16
    assert i8 < 0.7 * b16
