"""Prompt-lookup speculative decoding (models/generate.py::generate_speculative).

The contract under test is LOSSLESSNESS: speculative greedy output must be
token-identical to generate(temperature=0) for every architecture variant,
batch shape and eos configuration — speculation may only change how many
model passes produce the tokens.  (Beyond-parity capability: the reference
decodes one token per pass via HF generate, src/models/trainer.py:942-946.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.models import ModelConfig
from vietnamese_qa_system_tpu.models.causal_lm import init_causal_lm
from vietnamese_qa_system_tpu.models.generate import (
    GenerationConfig,
    generate,
    generate_speculative,
    generate_with_config,
)


def _mk(cfg, seed=0):
    return init_causal_lm(jax.random.key(seed), cfg)


def _prompts(rng, b, t, vocab_hi=90):
    ids = rng.integers(4, vocab_hi, (b, t)).astype(np.int32)
    lens = rng.integers(3, t + 1, (b,))
    mask = np.zeros((b, t), np.int32)
    for r in range(b):
        mask[r, t - lens[r]:] = 1
        ids[r, : t - lens[r]] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


BASE = dict(arch="causal", vocab_size=97, d_model=32, n_heads=4,
            n_layers=2, d_ff=64, max_seq_len=256)


@pytest.mark.parametrize("b,t,eos,gamma,ngram", [
    (1, 16, 2, 5, 2),
    (3, 20, None, 8, 3),
    (2, 8, 2, 3, 1),
])
def test_speculative_matches_greedy(b, t, eos, gamma, ngram):
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    ids, mask = _prompts(np.random.default_rng(b), b, t)
    ref = generate(params, cfg, ids, mask, max_new_tokens=24, eos_id=eos)
    out = generate_speculative(
        params, cfg, ids, mask, max_new_tokens=24, eos_id=eos,
        draft_tokens=gamma, draft_ngram=ngram,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_speculative_saves_model_passes():
    """A random tiny model falls into n-gram loops, so lookup drafting must
    finish in well under one pass per token (the whole point)."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    ids, mask = _prompts(np.random.default_rng(0), 1, 16)
    out, stats = generate_speculative(
        params, cfg, ids, mask, max_new_tokens=32, eos_id=None,
        draft_tokens=6, draft_ngram=2, return_stats=True,
    )
    assert out.shape == (1, 48)
    assert int(stats["iterations"]) < 32
    assert int(stats["drafted_accepted"]) > 0


def test_speculative_gpt_neo_local_windows():
    """Per-row cache cursors must compose with GPT-Neo's slot-space
    sliding-window mask (the (B, T) q_slots branch in causal_lm)."""
    cfg = ModelConfig(
        **{**BASE, "positional": "learned", "attention_scale": 1.0,
           "activation": "gelu_new"},
        attention_layers=("global", "local"),
        attention_window=8,
    )
    params = _mk(cfg)
    ids, mask = _prompts(np.random.default_rng(2), 2, 20)
    ref = generate(params, cfg, ids, mask, max_new_tokens=16, eos_id=2)
    out = generate_speculative(
        params, cfg, ids, mask, max_new_tokens=16, eos_id=2,
        draft_tokens=4, draft_ngram=2,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_speculative_stacked_scan_layers():
    """Stacked-blocks (scan-over-layers) caches use dim-1 slots; the
    per-row scatter write must land identically."""
    from vietnamese_qa_system_tpu.models.causal_lm import stack_blocks

    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    stacked = stack_blocks(params)
    ids, mask = _prompts(np.random.default_rng(3), 2, 12)
    ref = generate(params, cfg, ids, mask, max_new_tokens=16, eos_id=2)
    out = generate_speculative(
        stacked, cfg, ids, mask, max_new_tokens=16, eos_id=2,
        draft_tokens=5, draft_ngram=2,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_speculative_gqa_alibi_families():
    """GQA (fewer kv heads in the cache) and ALiBi (slot-space bias) both
    ride the same scatter path."""
    gqa = ModelConfig(**{**BASE, "n_kv_heads": 2, "norm": "rmsnorm",
                         "mlp_gated": True})
    alibi = ModelConfig(**{**BASE, "positional": "alibi",
                           "embed_layernorm": True})
    for cfg in (gqa, alibi):
        params = _mk(cfg)
        ids, mask = _prompts(np.random.default_rng(4), 2, 12)
        ref = generate(params, cfg, ids, mask, max_new_tokens=12, eos_id=2)
        out = generate_speculative(
            params, cfg, ids, mask, max_new_tokens=12, eos_id=2,
            draft_tokens=4, draft_ngram=2,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_speculative_copy_task_accepts_long_runs():
    """On a model trained to copy its prompt, the prompt-lookup drafter
    should accept nearly every draft — few passes for many tokens."""
    from vietnamese_qa_system_tpu.train.trainer import Trainer, TrainConfig

    cfg = TrainConfig(
        model=ModelConfig(**{**BASE, "vocab_size": 64}),
        lr=5e-3, epochs=1, log_every=1000,
    )
    tr = Trainer(cfg, total_steps=80)
    rng = np.random.default_rng(0)
    period = rng.integers(4, 60, (8,)).astype(np.int32)

    def batches(epoch=0):
        for _ in range(80):
            reps = np.tile(period, (8, 24 // 8 + 1))[:, :24]
            yield {"input_ids": reps, "attention_mask": np.ones_like(reps),
                   "labels": reps.copy()}

    tr.fit(batches)
    params = tr.state["params"]
    prompt = np.tile(period, (1, 2)).astype(np.int32)  # two periods
    mask = np.ones_like(prompt)
    out, stats = generate_speculative(
        params, cfg.model, jnp.asarray(prompt), jnp.asarray(mask),
        max_new_tokens=32, eos_id=None, draft_tokens=8, draft_ngram=3,
        return_stats=True,
    )
    ref = generate(params, cfg.model, jnp.asarray(prompt),
                   jnp.asarray(mask), max_new_tokens=32, eos_id=None)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    # 32 tokens with gamma=8: a perfect drafter needs ceil(32/9)=4 passes
    assert int(stats["iterations"]) <= 8


def test_generation_config_dispatch_and_guards():
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    ids, mask = _prompts(np.random.default_rng(5), 2, 10)
    out = generate_with_config(
        params, cfg, ids, mask,
        GenerationConfig(max_new_tokens=8, speculative="ngram"),
        eos_id=2,
    )
    ref = generate(params, cfg, ids, mask, max_new_tokens=8, eos_id=2)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    for bad in (
        GenerationConfig(speculative="ngram", temperature=0.7),
        GenerationConfig(speculative="ngram", num_beams=2),
        GenerationConfig(speculative="ngram", repetition_penalty=1.2),
        GenerationConfig(speculative="magic"),
    ):
        with pytest.raises(ValueError):
            generate_with_config(params, cfg, ids, mask, bad, eos_id=2)


def test_speculative_over_quantized_base():
    """Serving composition: int8/nf4 decode bases (dequant-at-use in
    layers.dense) must ride the speculative path unchanged — quantization
    cuts the per-pass weight stream, speculation cuts the pass count."""
    from vietnamese_qa_system_tpu.models import quantize_dense_tree

    cfg = ModelConfig(**BASE)
    base = _mk(cfg)
    ids, mask = _prompts(np.random.default_rng(6), 2, 16)
    for fmt in ("int8", "nf4"):
        params = quantize_dense_tree(base, fmt)
        ref = generate(params, cfg, ids, mask, max_new_tokens=16, eos_id=2)
        out = generate_speculative(
            params, cfg, ids, mask, max_new_tokens=16, eos_id=2,
            draft_tokens=4, draft_ngram=2,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
