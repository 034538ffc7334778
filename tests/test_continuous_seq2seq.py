"""Continuous batching for encoder-decoder models.

Same contract as the causal engine (tests/test_continuous.py): each
request's decoder stream must be token-identical to a standalone
``generate_seq2seq()`` greedy run at the engine's encoder bucket width,
no matter how requests interleave or reuse slots.  Beyond-parity for the
reference's SEQ_2_SEQ_LM branch, which only ever decodes whole batches
in lockstep (reference src/models/trainer.py:928-949).
"""

import jax
import numpy as np
import pytest

from vietnamese_qa_system_tpu.engine.continuous import ContinuousEngine
from vietnamese_qa_system_tpu.models import ModelConfig
from vietnamese_qa_system_tpu.models import seq2seq as s2s_native
from vietnamese_qa_system_tpu.models import t5 as t5_mod
from vietnamese_qa_system_tpu.models.generate import generate_seq2seq

NATIVE = dict(arch="seq2seq", vocab_size=89, d_model=32, n_heads=4,
              n_layers=2, n_decoder_layers=2, d_ff=64, max_seq_len=256)
T5 = dict(arch="seq2seq", seq2seq_family="t5", vocab_size=89, d_model=32,
          n_heads=2, d_kv=8, n_layers=2, n_decoder_layers=2, d_ff=64,
          max_seq_len=256, mlp_gated=True, tie_embeddings=False,
          relative_attention_buckets=8, attention_bias=False)


def _mk(cfg, seed=0):
    init = t5_mod.init_t5 if cfg.seq2seq_family == "t5" \
        else s2s_native.init_seq2seq
    return init(jax.random.key(seed), cfg)


def _prompt(rng, n):
    return [int(x) for x in rng.integers(4, 80, (n,))]


def _ref(params, cfg, prompt, bucket, max_new, eos):
    """generate_seq2seq greedy at the engine's encoder bucket width,
    truncated after the first eos (inclusive)."""
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, : len(prompt)] = prompt
    mask[0, : len(prompt)] = 1
    out = np.asarray(
        generate_seq2seq(
            params, cfg, ids, mask, max_new_tokens=max_new,
            eos_id=eos, bos_id=0,
        )
    )[0]
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


@pytest.mark.parametrize("family", ["native", "t5"])
def test_seq2seq_engine_matches_generate(engine_factory, family):
    cfg = ModelConfig(**(T5 if family == "t5" else NATIVE))
    params = _mk(cfg)
    rng = np.random.default_rng(61)
    prompts = [_prompt(rng, n) for n in (6, 13, 9, 15)]
    eng = engine_factory(params, cfg, n_slots=2, total=32, buckets=(16,),
                         chunk_steps=4)
    futs = [eng.submit(p, 14) for p in prompts]
    outs = [f.result(timeout=180)["ids"] for f in futs]
    for p, out in zip(prompts, outs):
        assert out == _ref(params, cfg, p, 16, 14, None)


def test_seq2seq_engine_mixed_enc_buckets(engine_factory):
    """Prompts landing in different ENCODER buckets share one decoder
    state (cross-KV padded to the widest bucket); streams must match
    generate_seq2seq at each prompt's own bucket width — right-padded
    encoder keys are masked, so bucket width never changes logits."""
    cfg = ModelConfig(**NATIVE)
    params = _mk(cfg)
    rng = np.random.default_rng(67)
    p_small, p_big = _prompt(rng, 7), _prompt(rng, 25)
    eng = engine_factory(params, cfg, n_slots=2, total=32,
                         buckets=(16, 32), chunk_steps=4)
    out_s = eng.generate_ids(p_small, 10)
    out_b = eng.generate_ids(p_big, 10)
    assert out_s == _ref(params, cfg, p_small, 16, 10, None)
    assert out_b == _ref(params, cfg, p_big, 32, 10, None)


def test_seq2seq_eos_and_capacity(engine_factory):
    """eos from the model's own continuation stops the stream; a budget
    larger than the decoder cache truncates at total-1 new tokens."""
    cfg = ModelConfig(**NATIVE)
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(71), 10)
    free = _ref(params, cfg, prompt, 16, 20, None)
    eos = free[2]
    ref = _ref(params, cfg, prompt, 16, 20, eos)
    eng = engine_factory(params, cfg, n_slots=1, total=24, buckets=(16,),
                         chunk_steps=4, eos_id=eos)
    assert eng.generate_ids(prompt, 20) == ref
    eng2 = engine_factory(params, cfg, n_slots=1, total=12, buckets=(8,),
                          chunk_steps=4)
    out = eng2.generate_ids(prompt[:7], 500)
    # BOS + 11 written columns carry 11 steps; the final step's emission
    # needs no KV column -> total emittable = total
    assert len(out) == 12
    assert out == _ref(params, cfg, prompt[:7], 8, 12, None)


def test_seq2seq_stacked_t5(engine_factory):
    """Scan-over-layers T5 (stacked enc/dec blocks + stacked cross-KV
    with a leading layer dim) rides the slot engine."""
    cfg = ModelConfig(**{**T5, "scan_layers": True})
    params = t5_mod.stack_t5(_mk(ModelConfig(**T5)))
    rng = np.random.default_rng(73)
    prompts = [_prompt(rng, n) for n in (8, 12)]
    eng = engine_factory(params, cfg, n_slots=2, total=32, buckets=(16,),
                         chunk_steps=4)
    for p in prompts:
        assert eng.generate_ids(p, 10) == _ref(params, cfg, p, 16, 10, None)


def test_seq2seq_per_request_sampling(engine_factory):
    """A sampled co-rider must not perturb a greedy request's stream."""
    cfg = ModelConfig(**NATIVE)
    params = _mk(cfg)
    rng = np.random.default_rng(79)
    p_greedy, p_sampled = _prompt(rng, 9), _prompt(rng, 11)
    eng = engine_factory(params, cfg, n_slots=2, total=32, buckets=(16,),
                         chunk_steps=4)
    f1 = eng.submit(p_greedy, 12)
    f2 = eng.submit(p_sampled, 12, temperature=1.0)
    out1 = f1.result(timeout=180)["ids"]
    out2 = f2.result(timeout=180)["ids"]
    assert out1 == _ref(params, cfg, p_greedy, 16, 12, None)
    assert len(out2) == 12


def test_seq2seq_rejects_causal_only_features():
    cfg = ModelConfig(**NATIVE)
    params = _mk(cfg)
    with pytest.raises(ValueError, match="does not support"):
        ContinuousEngine(params, cfg, n_slots=1, total=16, buckets=(8,),
                         prefix_cache_mb=4)
    with pytest.raises(ValueError, match="does not support"):
        ContinuousEngine(params, cfg, n_slots=1, total=16, buckets=(8,),
                         kv_dtype="int8")
