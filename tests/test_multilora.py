"""Multi-LoRA serving (lora.stack_adapters/select_adapters + the
continuous engine's per-slot adapter indices).

Contracts:
- algebra: a bank-selected row computes the same function as merge_lora
  of that adapter (to bf16 matmul tolerance — merged adds a full-rank
  delta to W, the bank applies the rank-r factors lazily);
- serving: each request's stream is token-identical to generate() over
  the SAME lazily-attached adapter, no matter which adapters share the
  decode batch (slot isolation extends to model weights).

Beyond-parity: the reference serves exactly one merged PEFT adapter per
deployment (reference src/models/trainer.py:84-161,489-497).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.engine.continuous import ContinuousEngine
from vietnamese_qa_system_tpu.models import ModelConfig
from vietnamese_qa_system_tpu.models.causal_lm import (
    forward,
    init_causal_lm,
    stack_blocks,
)
from vietnamese_qa_system_tpu.models.generate import generate
from vietnamese_qa_system_tpu.models.lora import (
    LoraConfig,
    init_lora,
    merge_lora,
    select_adapters,
    stack_adapters,
)

BASE = dict(arch="causal", vocab_size=97, d_model=32, n_heads=4,
            n_layers=2, d_ff=64, max_seq_len=256)
LCFG = LoraConfig(r=4, alpha=8)


def _adapter(params, seed):
    """A non-trivial adapter: init_lora then randomize B (zero B would
    equal the base and the test would vacuously pass)."""
    ad = init_lora(jax.random.key(seed), params, LCFG)
    leaves, tree = jax.tree_util.tree_flatten(ad)
    keys = jax.random.split(jax.random.key(seed + 100), len(leaves))
    leaves = [
        jax.random.normal(k, l.shape, l.dtype) * 0.3
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(tree, leaves)


def _prompt(rng, n):
    return [int(x) for x in rng.integers(4, 90, (n,))]


def _pad(prompt, bucket):
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, bucket - len(prompt):] = prompt
    mask[0, bucket - len(prompt):] = 1
    return jnp.asarray(ids), jnp.asarray(mask)


def _lazy_ref(params, bank, ix, cfg, prompt, bucket, max_new):
    """generate() over the bank's adapter ix attached lazily (scalar
    index -> the 2-D single-adapter dense path) — the engine's exact
    algebra, so streams must match token-for-token."""
    p = select_adapters(params, bank, jnp.int32(ix))
    out = np.asarray(
        generate(p, cfg, *_pad(prompt, bucket), max_new_tokens=max_new)
    )[0, bucket:]
    return [int(x) for x in out]


def test_selected_matches_merged_logits():
    cfg = ModelConfig(**BASE)
    params = init_causal_lm(jax.random.key(0), cfg)
    a1, a2 = _adapter(params, 1), _adapter(params, 2)
    bank = stack_adapters([a1, a2], LCFG)
    ids, mask = _pad(_prompt(np.random.default_rng(0), 12), 16)
    ids3 = jnp.tile(ids, (3, 1))
    mask3 = jnp.tile(mask, (3, 1))
    got = forward(
        select_adapters(params, bank, jnp.asarray([0, 1, 2])),
        cfg, ids3, mask3,
    )
    base_l = forward(params, cfg, ids, mask)
    m1 = forward(merge_lora(params, a1, LCFG), cfg, ids, mask)
    m2 = forward(merge_lora(params, a2, LCFG), cfg, ids, mask)
    np.testing.assert_allclose(got[0], base_l[0], rtol=0, atol=1e-5)
    for row, ref in ((1, m1), (2, m2)):
        np.testing.assert_allclose(
            np.asarray(got[row]), np.asarray(ref[0]), rtol=5e-2, atol=0.3
        )
    # the adapters must actually change the function
    assert not np.allclose(np.asarray(m1[0]), np.asarray(base_l[0]), atol=0.1)


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


def test_mixed_adapter_streams_are_isolated(engine_factory):
    """Base / adapter-1 / adapter-2 requests share the decode batch; each
    stream must equal its own model's generate() output exactly."""
    cfg = ModelConfig(**BASE)
    params = init_causal_lm(jax.random.key(0), cfg)
    a1, a2 = _adapter(params, 1), _adapter(params, 2)
    bank = stack_adapters([a1, a2], LCFG)
    eng = engine_factory(
        params, cfg, n_slots=3, total=64, buckets=(16,), chunk_steps=4,
        adapters={"vi": a1, "math": a2}, lora_config=LCFG,
    )
    rng = np.random.default_rng(5)
    prompts = [_prompt(rng, n) for n in (10, 12, 9)]
    futs = [
        eng.submit(prompts[0], 16),
        eng.submit(prompts[1], 16, adapter="vi"),
        eng.submit(prompts[2], 16, adapter="math"),
    ]
    outs = [f.result(timeout=180)["ids"] for f in futs]
    refs = [
        _lazy_ref(params, bank, ix, cfg, p, 16, 16)
        for ix, p in zip((0, 1, 2), prompts)
    ]
    assert outs == refs
    # and the two adapters genuinely produce different continuations of
    # the same prompt (otherwise isolation is untested)
    same_prompt = [
        eng.submit(prompts[0], 16, adapter=a).result(timeout=180)["ids"]
        for a in ("vi", "math")
    ]
    assert same_prompt[0] != same_prompt[1] or outs[0] != same_prompt[0]


def test_multilora_on_stacked_base(engine_factory):
    """Scan-over-layers base: bank leaves (N, L, d_in, r) gather+transpose
    to (L, B, d_in, r) so scan slices layers and dense sees batched rows."""
    cfg = ModelConfig(**BASE)
    params = init_causal_lm(jax.random.key(0), cfg)
    sparams = stack_blocks(params)
    a1 = _adapter(sparams, 3)  # stacked adapter (leaves carry L dim)
    eng = engine_factory(
        sparams, cfg, n_slots=2, total=64, buckets=(16,), chunk_steps=4,
        adapters={"vi": a1}, lora_config=LCFG,
    )
    prompt = _prompt(np.random.default_rng(7), 11)
    out = eng.submit(prompt, 14, adapter="vi").result(timeout=180)["ids"]
    bank = stack_adapters([a1], LCFG)
    assert out == _lazy_ref(sparams, bank, 1, cfg, prompt, 16, 14)


def test_unknown_adapter_rejected(engine_factory):
    cfg = ModelConfig(**BASE)
    params = init_causal_lm(jax.random.key(0), cfg)
    a1 = _adapter(params, 1)
    eng = engine_factory(params, cfg, n_slots=1, total=64, buckets=(16,),
                         adapters={"vi": a1}, lora_config=LCFG)
    with pytest.raises(ValueError, match="unknown adapter"):
        eng.submit([5, 6], 4, adapter="nope")
    eng2 = engine_factory(params, cfg, n_slots=1, total=64, buckets=(16,))
    with pytest.raises(ValueError, match="unknown adapter"):
        eng2.submit([5, 6], 4, adapter="vi")


def test_bank_validation():
    cfg = ModelConfig(**BASE)
    params = init_causal_lm(jax.random.key(0), cfg)
    a1 = _adapter(params, 1)
    a_bad = init_lora(jax.random.key(9), params, LoraConfig(r=8, alpha=8))
    with pytest.raises(ValueError, match="shapes differ"):
        stack_adapters([a1, a_bad], LCFG)
    with pytest.raises(ValueError, match="at least one"):
        stack_adapters([], LCFG)
