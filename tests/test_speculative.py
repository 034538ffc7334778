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
        GenerationConfig(speculative="ngram", num_beams=2),
        GenerationConfig(speculative="ngram", repetition_penalty=1.2),
        GenerationConfig(speculative="magic"),
    ):
        with pytest.raises(ValueError):
            generate_with_config(params, cfg, ids, mask, bad, eos_id=2)
    # sampling IS supported (distribution-exact rejection sampling)
    out = generate_with_config(
        params, cfg, ids, mask,
        GenerationConfig(max_new_tokens=8, speculative="ngram",
                         temperature=0.8, top_k=20),
        eos_id=2,
    )
    assert np.asarray(out).shape == (2, 18)


def test_speculative_sampling_marginals_exact():
    """Sampled speculation must draw from EXACTLY the target distribution.
    With a tiny vocabulary the per-position marginals are enumerable:
    compare the empirical distribution of generated tokens (4096 iid rows)
    at produced positions 1 and 2 — positions that pass through the
    accept/resample machinery — against the exact enumerated marginal.
    A plain sampled generate() run is measured as calibration control."""
    from vietnamese_qa_system_tpu.models.causal_lm import forward

    v = 13
    cfg = ModelConfig(arch="causal", vocab_size=v, d_model=16, n_heads=2,
                      n_layers=1, d_ff=32, max_seq_len=64)
    params = _mk(cfg, seed=3)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, v, (1, 6)).astype(np.int32)
    n_rows = 4096
    ids = jnp.asarray(np.tile(prompt, (n_rows, 1)))
    mask = jnp.ones((n_rows, prompt.shape[1]), jnp.int32)

    def dist_after(prefix_batch):
        """softmax over the last position for each prefix row."""
        lg = np.asarray(forward(
            params, cfg, jnp.asarray(prefix_batch),
            jnp.ones(prefix_batch.shape, jnp.int32),
        ))[:, -1].astype(np.float64)
        e = np.exp(lg - lg.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    # exact marginals at produced positions 0, 1, 2 by enumeration
    p0 = dist_after(prompt)[0]                                   # (V,)
    pre1 = np.concatenate(
        [np.tile(prompt, (v, 1)), np.arange(v)[:, None]], axis=1
    ).astype(np.int32)
    p1_cond = dist_after(pre1)                                   # (V, V)
    m1 = p0 @ p1_cond
    pairs = np.stack(np.meshgrid(np.arange(v), np.arange(v),
                                 indexing="ij"), -1).reshape(-1, 2)
    pre2 = np.concatenate(
        [np.tile(prompt, (v * v, 1)), pairs], axis=1
    ).astype(np.int32)
    p2_cond = dist_after(pre2).reshape(v, v, v)
    m2 = np.einsum("i,ij,ijk->k", p0, p1_cond, p2_cond)

    t = prompt.shape[1]
    tol = 0.08  # TV noise at N=4096, V=13 is ~0.03
    for name, sample_fn in (
        ("speculative", lambda: generate_speculative(
            params, cfg, ids, mask, max_new_tokens=4, eos_id=None,
            draft_tokens=3, draft_ngram=2, temperature=1.0,
            key=jax.random.key(42),
        )),
        ("plain control", lambda: generate(
            params, cfg, ids, mask, max_new_tokens=4, eos_id=None,
            temperature=1.0, key=jax.random.key(43),
        )),
    ):
        toks = np.asarray(sample_fn())[:, t:]
        for pos, exact in ((0, p0), (1, m1), (2, m2)):
            emp = np.bincount(toks[:, pos], minlength=v) / n_rows
            tv = 0.5 * np.abs(emp - exact).sum()
            assert tv < tol, f"{name} pos {pos}: TV {tv:.3f}"


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


def test_top_p_threshold_mask_matches_sort_reference():
    """The bisection nucleus (no full-vocab sort — measured 4x faster
    per sampled decode step on chip) must keep exactly the HF sorted-
    prefix set, except at boundary probability TIES where it keeps all
    tied tokens (a sort keeps an arbitrary subset)."""
    from vietnamese_qa_system_tpu.models.generate import _top_p_mask

    rng = np.random.default_rng(0)
    f = jax.jit(_top_p_mask, static_argnums=1)
    for v in (16, 503):
        for trial in range(10):
            logits = jnp.asarray(rng.normal(0, 3, (3, v)).astype(np.float32))
            for top_p in (0.1, 0.5, 0.9, 0.97):
                got = np.asarray(f(logits, top_p))
                l = np.asarray(logits, np.float64)
                p = np.exp(l - l.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                for r in range(3):
                    order = np.argsort(-p[r])
                    cum = np.cumsum(p[r][order])
                    keep_sorted = cum - p[r][order] < top_p
                    ref = np.zeros(v, bool)
                    ref[order] = keep_sorted
                    if not np.array_equal(got[r], ref):
                        diff = got[r] != ref
                        boundary = p[r][order][keep_sorted.sum() - 1]
                        assert np.allclose(p[r][diff], boundary, rtol=1e-4)


def test_generate_under_tensor_parallel_sharding():
    """DS-TP inference capability (reference ds_inference.py): generation
    over tp-sharded params must be bit-identical to single-device decode,
    for both the plain and the speculative driver (the per-row cache
    scatter must compose with GSPMD-propagated head sharding)."""
    from vietnamese_qa_system_tpu.core.mesh import create_mesh
    from vietnamese_qa_system_tpu.parallel.sharding import (
        param_sharding,
        shard_params,
    )

    cfg = ModelConfig(**{**BASE, "d_model": 64, "n_heads": 8, "d_ff": 128})
    params = _mk(cfg)
    mesh = create_mesh({"model": 8})
    sp = shard_params(params, param_sharding(params, mesh, strategy="tp"))
    ids, mask = _prompts(np.random.default_rng(7), 2, 16)
    ref = np.asarray(generate(params, cfg, ids, mask,
                              max_new_tokens=12, eos_id=2))
    tp = np.asarray(generate(sp, cfg, ids, mask, max_new_tokens=12, eos_id=2))
    np.testing.assert_array_equal(ref, tp)
    tps = np.asarray(generate_speculative(
        sp, cfg, ids, mask, max_new_tokens=12, eos_id=2,
        draft_tokens=4, draft_ngram=2,
    ))
    np.testing.assert_array_equal(ref, tps)


DRAFT = dict(arch="causal", vocab_size=97, d_model=16, n_heads=2,
             n_layers=1, d_ff=32, max_seq_len=256)


def test_draft_model_greedy_matches_regardless_of_draft():
    """Draft-model speculation: greedy output must be token-identical to
    plain greedy no matter how bad the draft is (an unrelated random
    draft accepts ~nothing; correctness must not depend on it)."""
    from vietnamese_qa_system_tpu.models.generate import (
        generate_speculative_draft,
    )

    cfg = ModelConfig(**BASE)
    dcfg = ModelConfig(**DRAFT)
    params, dparams = _mk(cfg), _mk(dcfg, seed=5)
    ids, mask = _prompts(np.random.default_rng(8), 3, 16)
    ref = generate(params, cfg, ids, mask, max_new_tokens=20, eos_id=2)
    out = generate_speculative_draft(
        params, cfg, dparams, dcfg, ids, mask,
        max_new_tokens=20, eos_id=2, draft_tokens=4,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_draft_model_self_draft_accepts_everything():
    """With draft == target, every draft matches the target argmax
    (modulo fp ties), so the pass count approaches ceil(new/(gamma+1))."""
    from vietnamese_qa_system_tpu.models.generate import (
        generate_speculative_draft,
    )

    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    ids, mask = _prompts(np.random.default_rng(9), 2, 12)
    out, st = generate_speculative_draft(
        params, cfg, params, cfg, ids, mask,
        max_new_tokens=20, eos_id=None, draft_tokens=4, return_stats=True,
    )
    ref = generate(params, cfg, ids, mask, max_new_tokens=20, eos_id=None)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert int(st["iterations"]) <= 10  # perfect drafter: 4 passes


def test_draft_model_vocab_mismatch_raises():
    from vietnamese_qa_system_tpu.models.generate import (
        generate_speculative_draft,
    )

    cfg = ModelConfig(**BASE)
    dcfg = ModelConfig(**{**DRAFT, "vocab_size": 64})
    ids, mask = _prompts(np.random.default_rng(0), 1, 8)
    with pytest.raises(ValueError):
        generate_speculative_draft(
            _mk(cfg), cfg, _mk(dcfg), dcfg, ids, mask, max_new_tokens=4,
        )


def test_draft_model_sampling_marginals_exact():
    """The ratio-acceptance + residual-resampling theorem: with a
    DIFFERENT draft model the sampled marginals must still be exactly the
    TARGET model's (enumerated) marginals — the draft may only change the
    pass count, never the distribution."""
    from vietnamese_qa_system_tpu.models.causal_lm import forward
    from vietnamese_qa_system_tpu.models.generate import (
        generate_speculative_draft,
    )

    v = 13
    cfg = ModelConfig(arch="causal", vocab_size=v, d_model=16, n_heads=2,
                      n_layers=1, d_ff=32, max_seq_len=64)
    dcfg = ModelConfig(arch="causal", vocab_size=v, d_model=8, n_heads=1,
                       n_layers=1, d_ff=16, max_seq_len=64)
    params, dparams = _mk(cfg, seed=3), _mk(dcfg, seed=11)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, v, (1, 6)).astype(np.int32)
    n_rows = 4096
    ids = jnp.asarray(np.tile(prompt, (n_rows, 1)))
    mask = jnp.ones((n_rows, prompt.shape[1]), jnp.int32)

    def dist_after(prefix_batch):
        lg = np.asarray(forward(
            params, cfg, jnp.asarray(prefix_batch),
            jnp.ones(prefix_batch.shape, jnp.int32),
        ))[:, -1].astype(np.float64)
        e = np.exp(lg - lg.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    p0 = dist_after(prompt)[0]
    pre1 = np.concatenate(
        [np.tile(prompt, (v, 1)), np.arange(v)[:, None]], axis=1
    ).astype(np.int32)
    m1 = p0 @ dist_after(pre1)

    toks = np.asarray(generate_speculative_draft(
        params, cfg, dparams, dcfg, ids, mask, max_new_tokens=3,
        eos_id=None, draft_tokens=2, temperature=1.0,
        key=jax.random.key(21),
    ))[:, prompt.shape[1]:]
    for pos, exact in ((0, p0), (1, m1)):
        emp = np.bincount(toks[:, pos], minlength=v) / n_rows
        tv = 0.5 * np.abs(emp - exact).sum()
        assert tv < 0.08, f"pos {pos}: TV {tv:.3f}"


def test_speculative_eos_inside_window_matches_greedy():
    """Regression (review finding): a verify window can accept an eos AND
    tokens after it — those must not be written.  Construct the repro
    both ways: (a) self-draft with an eos the model emits mid-stream,
    (b) ngram drafting with eos present in the prompt so the drafter can
    propose it.  Output must equal generate()'s eos-then-eos-fill tail."""
    from vietnamese_qa_system_tpu.models.generate import (
        generate_speculative_draft,
    )

    cfg = ModelConfig(**BASE)
    rng = np.random.default_rng(0)
    found = 0
    for seed in range(6):
        params = _mk(cfg, seed=seed)
        ids = jnp.asarray(rng.integers(4, 90, (2, 12)).astype(np.int32))
        mask = jnp.ones_like(ids)
        ref0 = np.asarray(generate(params, cfg, ids, mask,
                                   max_new_tokens=24, eos_id=None))
        # pick an eos that the model actually emits mid-stream
        emitted = [t for t in np.unique(ref0[:, 12 + 2:]) if t > 3]
        if not emitted:
            continue
        eos = int(emitted[0])
        found += 1
        ref = generate(params, cfg, ids, mask, max_new_tokens=24, eos_id=eos)
        out_d = generate_speculative_draft(
            params, cfg, params, cfg, ids, mask,
            max_new_tokens=24, eos_id=eos, draft_tokens=5,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out_d))
        out_n = generate_speculative(
            params, cfg, ids, mask, max_new_tokens=24, eos_id=eos,
            draft_tokens=5, draft_ngram=2,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out_n))
        # (b) eos embedded in the prompt: the ngram drafter can draft it
        ids2 = np.asarray(ids).copy()
        ids2[:, 5] = eos
        ids2 = jnp.asarray(ids2)
        ref2 = generate(params, cfg, ids2, mask, max_new_tokens=24,
                        eos_id=eos)
        out2 = generate_speculative(
            params, cfg, ids2, mask, max_new_tokens=24, eos_id=eos,
            draft_tokens=5, draft_ngram=2,
        )
        np.testing.assert_array_equal(np.asarray(ref2), np.asarray(out2))
    assert found >= 2, "test never constructed an emitted-eos scenario"
