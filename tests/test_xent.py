"""Chunked streaming cross-entropy (ops/xent.py) vs the naive logits path.

The chunked op must match log_softmax + take_along_axis on loss AND
gradients (dH, dW) — it replaces the training losses for real vocabularies.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vietnamese_qa_system_tpu.ops.xent import chunked_xent, masked_mean_xent


def _naive_nll(h, w, targets):
    logits = jnp.dot(
        h.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, targets[:, None], axis=1)[:, 0]


@pytest.mark.parametrize("v,chunk", [(300, 128), (512, 128), (512, 512), (129, 128), (100, 128)])
def test_chunked_matches_naive_forward(rng, v, chunk):
    m, d = 24, 64
    h = jnp.asarray(rng.standard_normal((m, d), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((d, v), dtype=np.float32) * 0.2)
    t = jnp.asarray(rng.integers(0, v, (m,)).astype(np.int32))
    got = chunked_xent(h, w, t, chunk)
    want = _naive_nll(h, w, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_chunked_matches_naive_grads(rng):
    m, d, v, chunk = 16, 32, 300, 128
    h = jnp.asarray(rng.standard_normal((m, d), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((d, v), dtype=np.float32) * 0.2)
    t = jnp.asarray(rng.integers(0, v, (m,)).astype(np.int32))

    def loss_chunked(h, w):
        return jnp.mean(chunked_xent(h, w, t, chunk))

    def loss_naive(h, w):
        return jnp.mean(_naive_nll(h, w, t))

    (lc, (dhc, dwc)) = jax.value_and_grad(loss_chunked, argnums=(0, 1))(h, w)
    (ln, (dhn, dwn)) = jax.value_and_grad(loss_naive, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(float(lc), float(ln), atol=1e-5, rtol=1e-5)
    # the chunked backward rounds d_logits to bf16 before its two matmuls
    # (standard mixed precision; the naive path's cotangent stays f32) —
    # differences are bf16-rounding-sized
    np.testing.assert_allclose(np.asarray(dhc), np.asarray(dhn), atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(dwc), np.asarray(dwn), atol=2e-3, rtol=2e-2)


def test_masked_mean_matches_model_convention(rng):
    b, t_len, d, v = 2, 6, 16, 200
    h = jnp.asarray(rng.standard_normal((b, t_len, d), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((d, v), dtype=np.float32) * 0.3)
    labels = rng.integers(0, v, (b, t_len)).astype(np.int32)
    labels[0, :3] = -100
    labels[1, -1] = -100
    loss, n = masked_mean_xent(h, w, jnp.asarray(labels), chunk=128)
    valid = labels != -100
    assert int(n) == int(valid.sum())
    want = _naive_nll(
        h.reshape(-1, d), w,
        jnp.asarray(np.where(valid, labels, 0).reshape(-1)),
    )
    want = float(jnp.sum(jnp.where(jnp.asarray(valid.reshape(-1)), want, 0.0)) / int(n))
    np.testing.assert_allclose(float(loss), want, atol=1e-5, rtol=1e-5)


def test_causal_lm_chunked_loss_equals_naive(rng, monkeypatch):
    """Force the chunked path on a tiny model and compare loss+grads to
    the naive path end-to-end through loss_fn."""
    from vietnamese_qa_system_tpu.models import causal_lm
    from vietnamese_qa_system_tpu.models.config import tiny_test

    cfg = tiny_test("causal")  # vocab 512
    params = causal_lm.init_causal_lm(jax.random.key(0), cfg)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 512, (2, 16)).astype(np.int32)),
        "attention_mask": jnp.ones((2, 16), jnp.int32),
        "labels": jnp.asarray(
            np.where(
                rng.random((2, 16)) < 0.2, -100,
                rng.integers(0, 512, (2, 16)),
            ).astype(np.int32)
        ),
    }

    def loss_of(p):
        loss, _ = causal_lm.loss_fn(p, cfg, batch)
        return loss

    l_naive, g_naive = jax.value_and_grad(loss_of)(params)
    monkeypatch.setattr(causal_lm, "CHUNKED_XENT_MIN_VOCAB", 1)
    l_chunk, g_chunk = jax.value_and_grad(loss_of)(params)
    np.testing.assert_allclose(float(l_chunk), float(l_naive), atol=1e-5, rtol=1e-5)
    for a, b2 in zip(jax.tree.leaves(g_chunk), jax.tree.leaves(g_naive)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), atol=2e-3, rtol=2e-2
        )


@pytest.mark.parametrize("family", ["native", "t5"])
def test_seq2seq_chunked_loss_equals_naive(rng, monkeypatch, family):
    from vietnamese_qa_system_tpu.models import causal_lm, seq2seq, t5
    from vietnamese_qa_system_tpu.models.config import ModelConfig

    if family == "t5":
        cfg = ModelConfig(
            arch="seq2seq", seq2seq_family="t5", vocab_size=256, d_model=32,
            n_heads=2, d_kv=8, n_layers=1, n_decoder_layers=1, d_ff=64,
            mlp_gated=True, tie_embeddings=True, relative_attention_buckets=8,
            attention_bias=False,
        )
        params = t5.init_t5(jax.random.key(0), cfg)
        mod = t5
    else:
        cfg = ModelConfig(
            arch="seq2seq", vocab_size=256, d_model=32, n_heads=2,
            n_layers=1, n_decoder_layers=1, d_ff=64, max_seq_len=64,
        )
        params = seq2seq.init_seq2seq(jax.random.key(0), cfg)
        mod = seq2seq
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 256, (2, 10)).astype(np.int32)),
        "attention_mask": jnp.ones((2, 10), jnp.int32),
        "labels": jnp.asarray(
            np.where(rng.random((2, 8)) < 0.25, -100,
                     rng.integers(2, 256, (2, 8))).astype(np.int32)),
    }

    def loss_of(p):
        loss, _ = mod.loss_fn(p, cfg, batch)
        return loss

    l_naive, g_naive = jax.value_and_grad(loss_of)(params)
    monkeypatch.setattr(causal_lm, "CHUNKED_XENT_MIN_VOCAB", 1)
    l_chunk, g_chunk = jax.value_and_grad(loss_of)(params)
    np.testing.assert_allclose(float(l_chunk), float(l_naive), atol=1e-5, rtol=1e-5)
    for a, b2 in zip(jax.tree.leaves(g_chunk), jax.tree.leaves(g_naive)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), atol=2e-3, rtol=2e-2
        )


@pytest.mark.parametrize(
    "strategy,axes",
    [("fsdp", {"data": 8}), ("tp", {"model": 8})],
)
def test_chunked_loss_sharded_train_step(tmp_path, strategy, axes, monkeypatch):
    """Chunked xent under GSPMD: the vocab-chunk dynamic_slice runs over a
    SHARDED classifier (tp shards tok_embed on the vocab dim) — one real
    train step per strategy on the 8-device mesh."""
    from vietnamese_qa_system_tpu.models import causal_lm
    from vietnamese_qa_system_tpu.models.config import tiny_test
    from vietnamese_qa_system_tpu.train import TrainConfig, Trainer

    monkeypatch.setattr(causal_lm, "CHUNKED_XENT_MIN_VOCAB", 1)
    cfg = TrainConfig(
        model=tiny_test("causal"), lr=1e-3, epochs=1, strategy=strategy,
        mesh_axes=axes, grad_accum=1, log_dir=str(tmp_path),
    )
    trainer = Trainer(cfg, total_steps=2)
    rng_np = np.random.default_rng(0)

    def batches():
        for _ in range(2):
            ids = rng_np.integers(0, 512, (8, 32)).astype(np.int32)
            yield {
                "input_ids": ids,
                "attention_mask": np.ones((8, 32), np.int32),
                "labels": ids,
            }

    state = trainer.fit(batches)
    assert int(state["step"]) == 2
    assert all(
        np.isfinite(np.asarray(x)).all()
        for x in jax.tree.leaves(state["params"])
    )
