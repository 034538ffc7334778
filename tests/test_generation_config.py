"""GenerationConfig-driven eval (capability of the reference threading its
HF GenerationConfig into eval generation, trainer.py:390-413,942-946)."""

import glob
import os

import jax
import numpy as np
import pytest

from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
from vietnamese_qa_system_tpu.models import generate as gen_mod
from vietnamese_qa_system_tpu.models import tiny_test
from vietnamese_qa_system_tpu.train import generative_eval
from vietnamese_qa_system_tpu.train.trainer import init_model_params


@pytest.fixture(scope="module")
def causal():
    cfg = tiny_test("causal")
    return cfg, init_model_params(cfg, jax.random.key(0))


def _prompt_batches(tok, n=1, b=2, t=12):
    rng = np.random.default_rng(0)
    for _ in range(n):
        ids = rng.integers(4, 260, (b, t)).astype(np.int32)
        mask = np.ones_like(ids)
        ids[0, :3] = tok.pad_id  # left padding on row 0
        mask[0, :3] = 0
        yield {"input_ids": ids, "attention_mask": mask, "reference": ["a", "b"]}


def test_eval_with_beam_config(causal, tmp_path):
    cfg, params = causal
    tok = ByteTokenizer()
    gen = gen_mod.GenerationConfig(max_new_tokens=8, num_beams=3)
    out = generative_eval(
        params, cfg, tok, _prompt_batches(tok),
        gen_config=gen, log_dir=str(tmp_path), epoch=1, run_name="beam",
    )
    assert out["n_examples"] == 2
    assert all("prediction" in r and "reference" in r for r in out["records"])
    logs = glob.glob(os.path.join(tmp_path, "log_dir_e1_beam_*.txt"))
    assert logs and "### prediction:" in open(logs[0]).read()


def test_eval_with_sampling_config(causal, tmp_path):
    cfg, params = causal
    tok = ByteTokenizer()
    gen = gen_mod.GenerationConfig(
        max_new_tokens=8, temperature=0.9, top_k=20, top_p=0.9,
        repetition_penalty=1.3, no_repeat_ngram_size=2, min_new_tokens=2,
        seed=7,
    )
    out = generative_eval(params, cfg, tok, _prompt_batches(tok), gen_config=gen)
    assert out["n_examples"] == 2
    # same seed -> identical records; different seed -> generally different
    out2 = generative_eval(params, cfg, tok, _prompt_batches(tok), gen_config=gen)
    assert [r["prediction"] for r in out["records"]] == [
        r["prediction"] for r in out2["records"]
    ]


def test_eval_seq2seq_config(tmp_path):
    cfg = tiny_test("seq2seq")
    params = init_model_params(cfg, jax.random.key(1))
    tok = ByteTokenizer()
    gen = gen_mod.GenerationConfig(max_new_tokens=6, temperature=0.7, top_k=10)
    out = generative_eval(params, cfg, tok, _prompt_batches(tok), gen_config=gen)
    assert out["n_examples"] == 2
    out_beam = generative_eval(
        params, cfg, tok, _prompt_batches(tok),
        gen_config=gen_mod.GenerationConfig(max_new_tokens=6, num_beams=3),
    )
    assert out_beam["n_examples"] == 2


def test_seq2seq_beam1_equals_greedy():
    """num_beams=1 must reproduce the greedy decode exactly (same argmax
    chain, same eos handling)."""
    cfg = tiny_test("seq2seq")
    params = init_model_params(cfg, jax.random.key(2))
    rng = np.random.default_rng(5)
    ids = rng.integers(4, 260, (3, 10)).astype(np.int32)
    mask = np.ones_like(ids)
    greedy = gen_mod.generate_seq2seq(
        params, cfg, ids, mask, max_new_tokens=8, temperature=0.0, eos_id=2,
        bos_id=1,
    )
    beam1 = gen_mod.beam_search_seq2seq(
        params, cfg, ids, mask, max_new_tokens=8, num_beams=1, eos_id=2,
        bos_id=1,
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))
    beam4 = gen_mod.beam_search_seq2seq(
        params, cfg, ids, mask, max_new_tokens=8, num_beams=4, eos_id=2,
        bos_id=1,
    )
    assert beam4.shape == (3, 8)


def test_dispatch_beam_vs_greedy(causal):
    """generate_with_config must actually route to beam search: on a
    random model beam-3 and greedy agree on argmax step 1 but generally
    diverge later; at minimum the call shapes match and both decode."""
    cfg, params = causal
    rng = np.random.default_rng(3)
    ids = rng.integers(4, 260, (2, 10)).astype(np.int32)
    mask = np.ones_like(ids)
    greedy = gen_mod.generate_with_config(
        params, cfg, ids, mask,
        gen_mod.GenerationConfig(max_new_tokens=8), eos_id=2,
    )
    beam = gen_mod.generate_with_config(
        params, cfg, ids, mask,
        gen_mod.GenerationConfig(max_new_tokens=8, num_beams=4), eos_id=2,
    )
    assert greedy.shape == beam.shape == (2, 18)
    # beam's sequence log-prob can only match or beat greedy's (asserted
    # properly in test_models.py::test_beam_search_beats_greedy)


def test_beam_min_new_tokens_suppresses_eos(causal):
    """min_new_tokens in beam search: no beam may emit eos before the
    minimum (the flag used to be silently ignored on beam paths)."""
    cfg, params = causal
    tok = ByteTokenizer()
    rng = np.random.default_rng(1)
    ids = rng.integers(4, 260, (2, 8)).astype(np.int32)
    mask = np.ones_like(ids)
    out = gen_mod.beam_search(
        params, cfg, ids, mask, max_new_tokens=6, num_beams=3,
        eos_id=tok.eos_id, min_new_tokens=4,
    )
    new = np.asarray(out)[:, 8:]
    assert not (new[:, :4] == tok.eos_id).any()


def test_beam_repetition_penalty_changes_output(causal):
    """A huge repetition penalty must alter beam output on a model whose
    unpenalized beams repeat (tiny untrained models loop immediately)."""
    cfg, params = causal
    rng = np.random.default_rng(2)
    ids = rng.integers(4, 260, (2, 8)).astype(np.int32)
    mask = np.ones_like(ids)
    plain = np.asarray(gen_mod.beam_search(
        params, cfg, ids, mask, max_new_tokens=8, num_beams=2,
    ))[:, 8:]
    pen = np.asarray(gen_mod.beam_search(
        params, cfg, ids, mask, max_new_tokens=8, num_beams=2,
        repetition_penalty=8.0,
    ))[:, 8:]
    # the penalized run may not emit any token twice: every generated id
    # (absent eos/dup padding) must be unique per row and unseen in the
    # prompt — the direct HF-semantics contract, stronger than "differs"
    for r in range(2):
        toks = [t for t in pen[r]]
        assert len(set(toks)) == len(toks), f"row {r} repeated under penalty"
        assert not set(toks) & set(ids[r].tolist())
    assert not np.array_equal(plain, pen)


def test_seq2seq_sampled_respects_penalty_and_min_new():
    cfg = tiny_test("seq2seq")
    params = init_model_params(cfg, jax.random.key(0))
    tok = ByteTokenizer()
    rng = np.random.default_rng(3)
    ids = rng.integers(4, 260, (2, 10)).astype(np.int32)
    mask = np.ones_like(ids)
    out = gen_mod.generate_seq2seq(
        params, cfg, ids, mask, max_new_tokens=8, temperature=0.0,
        repetition_penalty=8.0, min_new_tokens=5, eos_id=tok.eos_id,
        bos_id=0,
    )
    out = np.asarray(out)
    assert not (out[:, :5] == tok.eos_id).any()
    for r in range(2):
        row = [t for t in out[r] if t != tok.eos_id]
        assert len(set(row)) == len(row), f"row {r} repeated under penalty"


def test_ngram_on_beam_raises_clearly(causal):
    cfg, params = causal
    tok = ByteTokenizer()
    rng = np.random.default_rng(4)
    ids = rng.integers(4, 260, (1, 6)).astype(np.int32)
    g = gen_mod.GenerationConfig(num_beams=2, no_repeat_ngram_size=3)
    with pytest.raises(ValueError, match="no_repeat_ngram_size"):
        gen_mod.generate_with_config(
            params, cfg, ids, np.ones_like(ids), g, eos_id=tok.eos_id
        )
