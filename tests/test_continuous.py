"""Continuous batching (models/decode_engine.py + engine/continuous.py).

The contract: each request's token stream is identical to a standalone
``generate()`` greedy run of the same prompt (at the same padded width),
no matter how requests interleave, queue, or reuse slots — continuous
batching may only change WHEN tokens are computed, never WHAT they are.
Beyond-parity capability: the reference decodes whole batches in lockstep
(HF generate, reference src/models/trainer.py:942-946).
"""

import threading

import jax
import numpy as np
import pytest

from vietnamese_qa_system_tpu.engine.continuous import ContinuousEngine
from vietnamese_qa_system_tpu.models import ModelConfig
from vietnamese_qa_system_tpu.models.causal_lm import (
    init_causal_lm,
    stack_blocks,
)
from vietnamese_qa_system_tpu.models.generate import generate

BASE = dict(arch="causal", vocab_size=97, d_model=32, n_heads=4,
            n_layers=2, d_ff=64, max_seq_len=256)


def _mk(cfg, seed=0):
    return init_causal_lm(jax.random.key(seed), cfg)


def _prompt(rng, n, vocab_hi=90):
    return [int(x) for x in rng.integers(4, vocab_hi, (n,))]


def _ref_generated(params, cfg, prompt, bucket, max_new, eos):
    """Reference stream: generate() at the engine's padded width, prompt
    stripped, truncated after the first eos (inclusive)."""
    ids = np.zeros((1, bucket), np.int32)
    mask = np.zeros((1, bucket), np.int32)
    ids[0, bucket - len(prompt):] = prompt
    mask[0, bucket - len(prompt):] = 1
    out = np.asarray(
        generate(params, cfg, ids, mask, max_new_tokens=max_new, eos_id=eos)
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


def test_single_request_matches_generate(engine_factory):
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(0), 11)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16, 32), chunk_steps=4)
    out = eng.generate_ids(prompt, max_new_tokens=20)
    ref = _ref_generated(params, cfg, prompt, 16, 20, None)
    assert out == ref


def test_interleaved_requests_match_sequential(engine_factory):
    """6 requests of mixed lengths/budgets through 2 slots: queueing, slot
    reuse, and different per-slot progress must not change any stream."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(7)
    prompts = [_prompt(rng, n) for n in (5, 13, 16, 3, 30, 9)]
    budgets = [8, 20, 5, 16, 12, 20]
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16, 32), chunk_steps=4)
    futs = [eng.submit(p, m) for p, m in zip(prompts, budgets)]
    outs = [f.result(timeout=180)["ids"] for f in futs]
    for p, m, out in zip(prompts, budgets, outs):
        bucket = 16 if len(p) <= 16 else 32
        assert out == _ref_generated(params, cfg, p, bucket, m, None)


def test_eos_terminates_stream(engine_factory):
    """Pick the eos id from the model's own greedy continuation so the
    stream genuinely terminates mid-flight; the engine must stop there."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(3), 10)
    free_run = _ref_generated(params, cfg, prompt, 16, 24, None)
    eos = free_run[2]  # force an eos a few tokens in
    ref = _ref_generated(params, cfg, prompt, 16, 24, eos)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16, 32), chunk_steps=4, eos_id=eos)
    out = eng.generate_ids(prompt, max_new_tokens=24)
    assert out == ref
    assert out[-1] == eos
    assert len(out) < 24


def test_streaming_callback(engine_factory):
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(5), 8)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16,), chunk_steps=4)
    streamed, lock = [], threading.Lock()

    def cb(tok):
        with lock:
            streamed.append(tok)

    out = eng.submit(prompt, 12, stream=cb).result(timeout=120)["ids"]
    with lock:
        assert streamed == out


def test_capacity_budget_truncates(engine_factory):
    """A budget larger than the cache headroom is truncated to it (first
    token + (total - len(prompt)) decode emissions — right padding
    reclaims the bucket's pad columns), never overflows."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(9), 14)
    eng = engine_factory(params, cfg, n_slots=1, total=24,
                         buckets=(16,), chunk_steps=4)
    out = eng.generate_ids(prompt, max_new_tokens=500)
    assert len(out) == 1 + (24 - len(prompt))
    ref = _ref_generated(params, cfg, prompt, 16, len(out), None)
    assert out == ref


def test_validation_errors(engine_factory):
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    eng = engine_factory(params, cfg, n_slots=1, total=64, buckets=(16,))
    with pytest.raises(ValueError, match="empty"):
        eng.submit([])
    with pytest.raises(ValueError, match="largest bucket"):
        eng.submit(list(range(4, 40)))
    with pytest.raises(ValueError, match="max_new_tokens"):
        eng.submit([5, 6], max_new_tokens=0)
    with pytest.raises(ValueError, match="decode room"):
        ContinuousEngine(params, cfg, total=32, buckets=(32,))


def test_stacked_blocks_match_list(engine_factory):
    """Scan-over-layers params (stacked KV cache, leading L dim in
    insert/decode) produce the same streams as the list-blocks pytree."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(11)
    prompts = [_prompt(rng, n) for n in (6, 12, 15)]
    eng_l = engine_factory(params, cfg, n_slots=2, total=64,
                           buckets=(16,), chunk_steps=4)
    eng_s = engine_factory(stack_blocks(params), cfg, n_slots=2, total=64,
                           buckets=(16,), chunk_steps=4)
    for p in prompts:
        assert eng_l.generate_ids(p, 16) == eng_s.generate_ids(p, 16)


def test_gqa_family(engine_factory):
    """Grouped-query attention (llama layout): the slot cache stores kv
    heads only; streams must still match generate()."""
    cfg = ModelConfig(**{**BASE, "n_kv_heads": 2, "norm": "rmsnorm",
                         "mlp_gated": True})
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(13), 12)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16,), chunk_steps=4)
    out = eng.generate_ids(prompt, 16)
    assert out == _ref_generated(params, cfg, prompt, 16, 16, None)


def test_stats_surface(engine_factory):
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16,), chunk_steps=4)
    futs = [eng.submit(_prompt(np.random.default_rng(i), 8), 8)
            for i in range(3)]
    for f in futs:
        f.result(timeout=120)
    s = eng.snapshot_stats()
    assert s["requests"] == 3 and s["completed"] == 3
    assert s["tokens"] >= 3 * 8
    assert s["chunks"] >= 1 and s["prefills"] == 3
    assert s["active_slots"] == 0 and s["pending"] == 0


def test_per_request_sampling_isolation(engine_factory):
    """A greedy request must stay bit-identical to generate() while a
    sampled request shares the decode batch (per-slot dynamic knobs)."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(17)
    p_greedy, p_sampled = _prompt(rng, 10), _prompt(rng, 12)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16,), chunk_steps=4)
    f1 = eng.submit(p_greedy, 16)  # engine default: greedy
    f2 = eng.submit(p_sampled, 16, temperature=1.0, top_p=0.9)
    out1 = f1.result(timeout=120)["ids"]
    out2 = f2.result(timeout=120)["ids"]
    assert out1 == _ref_generated(params, cfg, p_greedy, 16, 16, None)
    assert len(out2) == 16
    assert all(0 <= t < cfg.vocab_size for t in out2)


def test_top_k_1_equals_greedy(engine_factory):
    """temperature > 0 with top_k=1 keeps only the argmax — the sampled
    path must reproduce the greedy stream exactly."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(19), 9)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16,), chunk_steps=4)
    out = eng.submit(prompt, 14, temperature=2.0, top_k=1).result(
        timeout=120)["ids"]
    assert out == _ref_generated(params, cfg, prompt, 16, 14, None)


def test_sampling_validation(engine_factory):
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    eng = engine_factory(params, cfg, n_slots=1, total=64, buckets=(16,))
    with pytest.raises(ValueError, match="temperature"):
        eng.submit([5, 6], 4, temperature=-1.0)
    with pytest.raises(ValueError, match="top_k"):
        eng.submit([5, 6], 4, top_k=100000)
    with pytest.raises(ValueError, match="top_p"):
        eng.submit([5, 6], 4, top_p=0.0)
    with pytest.raises(ValueError, match="temperature"):
        ContinuousEngine(params, cfg, total=64, buckets=(16,),
                         temperature=-0.5)


def test_raising_stream_callback_is_contained(engine_factory):
    """A user stream callback that raises must not doom the scheduler or
    any other in-flight request (it is disabled for that request only)."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(23)
    p1, p2 = _prompt(rng, 8), _prompt(rng, 10)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16,), chunk_steps=4)

    def bad_cb(tok):
        raise RuntimeError("client went away")

    f_bad = eng.submit(p1, 12, stream=bad_cb)
    f_ok = eng.submit(p2, 12)
    out_bad = f_bad.result(timeout=120)["ids"]
    out_ok = f_ok.result(timeout=120)["ids"]
    assert len(out_bad) == 12  # its own future still completes
    assert out_ok == _ref_generated(params, cfg, p2, 16, 12, None)


def test_engine_under_tensor_parallel_sharding(engine_factory):
    """Multi-chip serving: the continuous engine over tp-sharded params
    (8-device mesh) must produce streams bit-identical to the unsharded
    engine — the per-slot scatter writes and per-row cursors must compose
    with GSPMD-propagated head sharding."""
    from vietnamese_qa_system_tpu.core.mesh import create_mesh
    from vietnamese_qa_system_tpu.parallel.sharding import (
        param_sharding,
        shard_params,
    )

    cfg = ModelConfig(**{**BASE, "d_model": 64, "n_heads": 8, "d_ff": 128})
    params = _mk(cfg)
    mesh = create_mesh({"model": 8})
    sp = shard_params(params, param_sharding(params, mesh, strategy="tp"))
    rng = np.random.default_rng(29)
    prompts = [_prompt(rng, n) for n in (9, 14, 11)]
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16,), chunk_steps=4)
    eng_tp = engine_factory(sp, cfg, n_slots=2, total=64,
                            buckets=(16,), chunk_steps=4)
    for p in prompts:
        assert eng.generate_ids(p, 12) == eng_tp.generate_ids(p, 12)


def test_spec_chunks_match_plain_chunks(engine_factory):
    """In-engine speculative decoding (prompt-lookup per slot) must be
    token-identical to plain chunks for every request — random tiny
    models fall into n-gram loops, so drafts genuinely accept here."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(31)
    prompts = [_prompt(rng, n) for n in (7, 12, 15, 10)]
    eng_p = engine_factory(params, cfg, n_slots=2, total=64,
                           buckets=(16,), chunk_steps=4, speculative="off")
    eng_s = engine_factory(params, cfg, n_slots=2, total=64,
                           buckets=(16,), chunk_steps=4,
                           speculative="ngram", draft_tokens=5,
                           draft_ngram=2, spec_steps=2)
    for p in prompts:
        assert eng_p.generate_ids(p, 20) == eng_s.generate_ids(p, 20)
    s = eng_s.snapshot_stats()
    assert s["spec_chunks"] > 0
    assert s["drafted_accepted"] > 0  # loops make lookup drafting hit
    assert eng_p.snapshot_stats()["spec_chunks"] == 0


def test_spec_falls_back_with_sampled_co_rider(engine_factory):
    """A sampled request in the batch forces plain chunks (speculation is
    greedy-only); the greedy co-rider must still match its reference."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(37)
    p_greedy, p_sampled = _prompt(rng, 9), _prompt(rng, 11)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16,), chunk_steps=4,
                         speculative="ngram", spec_steps=2)
    f1 = eng.submit(p_greedy, 16)
    f2 = eng.submit(p_sampled, 16, temperature=1.0)
    out1 = f1.result(timeout=180)["ids"]
    f2.result(timeout=180)
    assert out1 == _ref_generated(params, cfg, p_greedy, 16, 16, None)
    s = eng.snapshot_stats()
    assert s["chunks"] > s["spec_chunks"]  # plain chunks happened


def test_spec_eos_and_capacity(engine_factory):
    """eos inside a speculative window stops the stream exactly like
    plain decode, and capacity truncation matches token-for-token."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    prompt = _prompt(np.random.default_rng(41), 10)
    free_run = _ref_generated(params, cfg, prompt, 16, 24, None)
    eos = free_run[3]
    ref = _ref_generated(params, cfg, prompt, 16, 24, eos)
    eng = engine_factory(params, cfg, n_slots=1, total=24, buckets=(16,),
                         chunk_steps=4, eos_id=eos,
                         speculative="ngram", draft_tokens=4,
                         draft_ngram=2, spec_steps=2)
    assert eng.generate_ids(prompt, 24) == ref
    eng2 = engine_factory(params, cfg, n_slots=1, total=24, buckets=(16,),
                          chunk_steps=4, speculative="ngram",
                          draft_tokens=4, draft_ngram=2, spec_steps=2)
    out = eng2.generate_ids(prompt, 500)
    assert len(out) == 1 + (24 - len(prompt))
    assert out == _ref_generated(params, cfg, prompt, 16, len(out), None)


def test_chunked_prefill_matches_whole_prefill(engine_factory):
    """Admitting long prompts in bucket-size pieces (prefill_extend at
    the running cursor) must leave every stream token-identical to the
    whole-prompt engine — chunking changes WHEN prompt KV is computed,
    never the codes/values written."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(43)
    prompts = [_prompt(rng, n) for n in (40, 7, 55, 23)]
    eng = engine_factory(params, cfg, n_slots=2, total=128,
                         buckets=(16, 32, 64), chunk_steps=4,
                         prefill_chunk=16)
    futs = [eng.submit(p, 12) for p in prompts]
    outs = [f.result(timeout=180)["ids"] for f in futs]
    for p, out in zip(prompts, outs):
        b = 16 if len(p) <= 16 else (32 if len(p) <= 32 else 64)
        assert out == _ref_generated(params, cfg, p, b, 12, None)
    s = eng.snapshot_stats()
    # 40 -> 16+16+8 = 3 pieces, 55 -> 16*3+7 = 4, 23 -> 2; 7 goes whole
    assert s["prefill_pieces"] == 9


def test_chunked_prefill_interleaves_decode(engine_factory):
    """While a long prompt admits piece-by-piece, the already-running
    request must receive tokens BETWEEN pieces (chunks dispatched during
    the admission window), and both streams stay exact."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(47)
    p_live = _prompt(rng, 9)
    p_long = _prompt(rng, 60)
    eng = engine_factory(params, cfg, n_slots=2, total=128,
                         buckets=(16, 64), chunk_steps=2,
                         prefill_chunk=16, speculative="off")
    seen_during = []
    f1 = eng.submit(p_live, 40,
                    stream=lambda t: seen_during.append(t))
    while not seen_during:
        pass  # wait until the live request is decoding
    n_before = len(seen_during)
    f2 = eng.submit(p_long, 8)
    out2 = f2.result(timeout=180)["ids"]
    out1 = f1.result(timeout=180)["ids"]
    assert out1 == _ref_generated(params, cfg, p_live, 16, 40, None)
    assert out2 == _ref_generated(params, cfg, p_long, 64, 8, None)
    stats = eng.snapshot_stats()
    assert stats["prefill_pieces"] >= 4  # 60 tokens / 16-token pieces
    assert len(out1) > n_before  # the live stream kept flowing


def test_chunked_prefill_with_prefix_cache(engine_factory):
    """A prefix-cache hit seeds the chunked chain mid-way; streams stay
    identical to cold runs."""
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    rng = np.random.default_rng(53)
    prefix = _prompt(rng, 30)
    p2 = prefix + _prompt(rng, 25)
    eng = engine_factory(params, cfg, n_slots=2, total=128,
                         buckets=(16, 32, 64), chunk_steps=4,
                         prefill_chunk=16, prefix_cache_mb=8,
                         min_cached_prompt=8)
    out1 = eng.generate_ids(prefix, 10)
    out2 = eng.generate_ids(p2, 10)
    s = eng.snapshot_stats()
    assert s["prefix_hits"] >= 1
    assert out1 == _ref_generated(params, cfg, prefix, 32, 10, None)
    assert out2 == _ref_generated(params, cfg, p2, 64, 10, None)


def test_prefill_chunk_must_be_a_bucket():
    cfg = ModelConfig(**BASE)
    params = _mk(cfg)
    with pytest.raises(ValueError, match="prefill_chunk"):
        ContinuousEngine(params, cfg, n_slots=1, total=64,
                         buckets=(16, 32), prefill_chunk=24)


def test_local_window_model_matches_generate(engine_factory):
    """Sliding-window (GPT-Neo local / Mistral SWA) models through the
    slot engine: window masking is slot-space (_window_mask), and the
    engine's right-padded layout keeps slot == position, so streams must
    stay token-identical to generate() — across chunks and slot reuse."""
    cfg = ModelConfig(**{**BASE,
                         "attention_layers": ("global", "local"),
                         "attention_window": 6})
    params = _mk(cfg, seed=5)
    rng = np.random.default_rng(7)
    eng = engine_factory(params, cfg, n_slots=2, total=64,
                         buckets=(16, 32), chunk_steps=4)
    prompts = [_prompt(rng, n) for n in (5, 11, 14, 3)]
    outs = [eng.generate_ids(p, max_new_tokens=18) for p in prompts]
    for p, out in zip(prompts, outs):
        bucket = 16 if len(p) <= 16 else 32
        assert out == _ref_generated(params, cfg, p, bucket, 18, None)


def test_all_local_stacked_model_matches_generate(engine_factory):
    """Mistral-style all-local stack, scan-stacked params, through the
    engine (stacked KV cache + per-row window masks)."""
    import dataclasses

    cfg = ModelConfig(**{**BASE,
                         "attention_layers": ("local", "local"),
                         "attention_window": 6})
    params = _mk(cfg, seed=6)
    stacked = stack_blocks(params)
    cfg_scan = dataclasses.replace(cfg, scan_layers=True)
    rng = np.random.default_rng(9)
    eng = engine_factory(stacked, cfg_scan, n_slots=2, total=64,
                         buckets=(16,), chunk_steps=4)
    prompts = [_prompt(rng, n) for n in (4, 9, 13)]
    outs = [eng.generate_ids(p, max_new_tokens=16) for p in prompts]
    for p, out in zip(prompts, outs):
        assert out == _ref_generated(stacked, cfg_scan, p, 16, 16, None)
