import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.models import (
    LoraConfig,
    causal_lm,
    encoder,
    generate,
    init_lora,
    merge_lora,
    seq2seq,
    tiny_test,
)
from vietnamese_qa_system_tpu.models.causal_lm import IGNORE_INDEX


@pytest.fixture(scope="module")
def causal_setup():
    cfg = tiny_test("causal")
    params = causal_lm.init_causal_lm(jax.random.key(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def enc_setup():
    cfg = tiny_test("encoder")
    params = encoder.init_encoder(jax.random.key(0), cfg)
    return cfg, params


def _batch(cfg, b=2, t=16, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    return ids, mask


def test_causal_forward_shape(causal_setup):
    cfg, params = causal_setup
    ids, mask = _batch(cfg)
    logits = causal_lm.forward(params, cfg, ids, mask)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert logits.dtype == jnp.float32


def test_causal_is_causal(causal_setup):
    """Changing a later token must not affect earlier logits."""
    cfg, params = causal_setup
    ids, mask = _batch(cfg)
    l1 = causal_lm.forward(params, cfg, ids, mask)
    ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % cfg.vocab_size)
    l2 = causal_lm.forward(params, cfg, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]), atol=1e-5
    )


def test_loss_ignores_masked_labels(causal_setup):
    cfg, params = causal_setup
    ids, mask = _batch(cfg)
    labels_full = ids
    batch1 = {"input_ids": ids, "attention_mask": mask, "labels": labels_full}
    # mask out the first half of the labels: loss must change and the
    # number of counted tokens must drop accordingly
    labels_half = jnp.where(
        jnp.arange(16)[None, :] < 8, IGNORE_INDEX, labels_full
    )
    batch2 = {"input_ids": ids, "attention_mask": mask, "labels": labels_half}
    loss1, n1 = causal_lm.loss_fn(params, cfg, batch1)
    loss2, n2 = causal_lm.loss_fn(params, cfg, batch2)
    assert int(n1) == 2 * 15  # labels shift by one
    assert int(n2) == 2 * 8
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))


def test_encoder_embeddings_unit_norm(enc_setup):
    cfg, params = enc_setup
    ids, mask = _batch(cfg, b=3, t=12)
    emb = encoder.sentence_embed(params, cfg, ids, mask)
    assert emb.shape == (3, cfg.d_model)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5
    )


def test_encoder_padding_invariance(enc_setup):
    """Padding tokens must not change the sentence embedding."""
    cfg, params = enc_setup
    ids, _ = _batch(cfg, b=2, t=8)
    mask = jnp.ones((2, 8), jnp.int32)
    emb1 = encoder.sentence_embed(params, cfg, ids, mask)
    ids_pad = jnp.pad(ids, ((0, 0), (0, 4)), constant_values=0)
    mask_pad = jnp.pad(mask, ((0, 0), (0, 4)))
    emb2 = encoder.sentence_embed(params, cfg, ids_pad, mask_pad)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2), atol=1e-4)


def test_seq2seq_loss_runs():
    cfg = tiny_test("seq2seq")
    params = seq2seq.init_seq2seq(jax.random.key(0), cfg)
    ids, mask = _batch(cfg, b=2, t=10)
    labels = jnp.where(jnp.arange(10)[None, :] < 6, ids, IGNORE_INDEX)
    loss, n = seq2seq.loss_fn(
        params, cfg, {"input_ids": ids, "attention_mask": mask, "labels": labels}
    )
    assert np.isfinite(float(loss))
    assert int(n) == 12


def test_lora_init_is_identity(causal_setup):
    cfg, params = causal_setup
    lcfg = LoraConfig(r=4)
    adapter = init_lora(jax.random.key(1), params, lcfg)
    merged = merge_lora(params, adapter, lcfg)
    ids, mask = _batch(cfg)
    l1 = causal_lm.forward(params, cfg, ids, mask)
    l2 = causal_lm.forward(merged, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_lora_changes_output_after_update(causal_setup):
    cfg, params = causal_setup
    lcfg = LoraConfig(r=4)
    adapter = init_lora(jax.random.key(1), params, lcfg)
    # simulate an update: add noise to B factors
    adapter = jax.tree.map(lambda x: x + 0.1, adapter)
    merged = merge_lora(params, adapter, lcfg)
    ids, mask = _batch(cfg)
    l1 = causal_lm.forward(params, cfg, ids, mask)
    l2 = causal_lm.forward(merged, cfg, ids, mask)
    assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 1e-3


def test_lora_targets_only_selected(causal_setup):
    _, params = causal_setup
    lcfg = LoraConfig(r=4, targets=("wq",))
    adapter = init_lora(jax.random.key(1), params, lcfg)
    leaves = jax.tree.leaves(adapter)
    cfg = tiny_test("causal")
    # one (a, b) pair per layer
    assert len(leaves) == 2 * cfg.n_layers


def test_generate_greedy_matches_full_forward(causal_setup):
    """KV-cache decode must agree with running the full forward each step."""
    cfg, params = causal_setup
    ids, mask = _batch(cfg, b=2, t=8, seed=3)
    out = generate.generate(
        params, cfg, ids, mask, max_new_tokens=4, temperature=0.0
    )
    assert out.shape == (2, 12)
    # naive reference decode
    cur = ids
    for _ in range(4):
        logits = causal_lm.forward(params, cfg, cur, jnp.ones_like(cur))
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(cur))


def test_generate_left_padded(causal_setup):
    """Left-padded prompts produce the same continuations as unpadded."""
    cfg, params = causal_setup
    ids, _ = _batch(cfg, b=1, t=6, seed=5)
    mask = jnp.ones_like(ids)
    out1 = generate.generate(params, cfg, ids, mask, max_new_tokens=3)
    ids_pad = jnp.pad(ids, ((0, 0), (4, 0)), constant_values=0)
    mask_pad = jnp.pad(mask, ((0, 0), (4, 0)))
    out2 = generate.generate(params, cfg, ids_pad, mask_pad, max_new_tokens=3)
    np.testing.assert_array_equal(
        np.asarray(out1[:, 6:]), np.asarray(out2[:, 10:])
    )


def test_generate_eos_stops(causal_setup):
    cfg, params = causal_setup
    ids, mask = _batch(cfg, b=1, t=4, seed=7)
    logits = causal_lm.forward(params, cfg, ids, mask)
    eos = int(jnp.argmax(logits[0, -1]))  # force first generated token = eos
    out = generate.generate(
        params, cfg, ids, mask, max_new_tokens=5, eos_id=eos
    )
    gen = np.asarray(out[0, 4:])
    assert gen[0] == eos
    assert (gen == eos).all()  # everything after first eos stays eos


def test_generate_seq2seq_matches_stepwise():
    """Cached seq2seq decode must match naive full decoder re-runs."""
    from vietnamese_qa_system_tpu.models import generate as gen_mod

    cfg = tiny_test("seq2seq")
    params = seq2seq.init_seq2seq(jax.random.key(0), cfg)
    ids, mask = _batch(cfg, b=2, t=10, seed=11)
    out = gen_mod.generate_seq2seq(
        params, cfg, ids, mask, max_new_tokens=4, temperature=0.0, bos_id=0
    )
    assert out.shape == (2, 4)

    # naive reference: grow the decoder input each step
    enc_out = seq2seq.encode(params, cfg, ids, mask)
    dec = jnp.zeros((2, 1), jnp.int32)
    for _ in range(4):
        logits = seq2seq.decode(params, cfg, dec, enc_out, mask)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        dec = jnp.concatenate([dec, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(dec[:, 1:]))


def test_tracing_utilities(tmp_path):
    from vietnamese_qa_system_tpu.core.tracing import (
        StepTimer,
        record_errors,
        roofline,
    )

    t = StepTimer(total_steps=10)
    m = t.update(100)
    assert m["tokens_per_s"] > 0 and "eta_s" in m

    r = roofline(flops=1e12, bytes_accessed=1e9, seconds=0.01)
    assert r["bound"] == "compute"
    r2 = roofline(flops=1e9, bytes_accessed=1e10, seconds=0.01)
    assert r2["bound"] == "memory"

    err_file = str(tmp_path / "err.json")

    @record_errors(error_file=err_file)
    def boom():
        raise RuntimeError("xảy ra lỗi")

    import json as _json

    with pytest.raises(RuntimeError):
        boom()
    rec = _json.load(open(err_file))
    assert rec["type"] == "RuntimeError" and "xảy ra lỗi" in rec["message"]


def test_resize_embeddings(causal_setup):
    from vietnamese_qa_system_tpu.models import resize_embeddings

    cfg, params = causal_setup
    bigger = resize_embeddings(params, cfg.vocab_size + 7)
    assert bigger["tok_embed"].shape[0] == cfg.vocab_size + 7
    # old rows untouched, new rows = mean of old
    np.testing.assert_array_equal(
        np.asarray(bigger["tok_embed"][: cfg.vocab_size]),
        np.asarray(params["tok_embed"]),
    )
    np.testing.assert_allclose(
        np.asarray(bigger["tok_embed"][-1]),
        np.asarray(params["tok_embed"]).mean(0),
        atol=1e-6,  # fp32 reduction-order differences
    )
    smaller = resize_embeddings(params, cfg.vocab_size - 5)
    assert smaller["tok_embed"].shape[0] == cfg.vocab_size - 5


def test_generate_topk_topp(causal_setup):
    """top-k=1 must equal greedy; top-p sampling stays in-vocab and
    deterministic under a fixed key."""
    cfg, params = causal_setup
    ids, mask = _batch(cfg, b=2, t=8, seed=9)
    greedy = generate.generate(params, cfg, ids, mask, max_new_tokens=4)
    k1 = generate.generate(
        params, cfg, ids, mask, max_new_tokens=4,
        temperature=1.0, top_k=1,
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(k1))
    p1 = generate.generate(
        params, cfg, ids, mask, max_new_tokens=4,
        temperature=0.8, top_p=0.9, key=jax.random.key(5),
    )
    p2 = generate.generate(
        params, cfg, ids, mask, max_new_tokens=4,
        temperature=0.8, top_p=0.9, key=jax.random.key(5),
    )
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert np.asarray(p1)[:, 8:].max() < cfg.vocab_size


def test_generate_repetition_penalty_and_min_tokens(causal_setup):
    cfg, params = causal_setup
    ids, mask = _batch(cfg, b=1, t=6, seed=13)
    # find the greedy eos-equivalent: force it to be banned by min_new_tokens
    logits = causal_lm.forward(params, cfg, ids, mask)
    fake_eos = int(jnp.argmax(logits[0, -1]))
    out = generate.generate(
        params, cfg, ids, mask, max_new_tokens=5,
        eos_id=fake_eos, min_new_tokens=3,
    )
    gen = np.asarray(out[0, 6:])
    assert gen[0] != fake_eos  # eos suppressed before min_new_tokens
    # strong repetition penalty changes the greedy continuation
    base = generate.generate(params, cfg, ids, mask, max_new_tokens=6)
    pen = generate.generate(
        params, cfg, ids, mask, max_new_tokens=6, repetition_penalty=1e6
    )
    assert not np.array_equal(np.asarray(base), np.asarray(pen))


def test_beam_search_w1_equals_greedy(causal_setup):
    cfg, params = causal_setup
    ids, mask = _batch(cfg, b=2, t=8, seed=17)
    greedy = generate.generate(params, cfg, ids, mask, max_new_tokens=5)
    beam1 = generate.beam_search(
        params, cfg, ids, mask, max_new_tokens=5, num_beams=1
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))


def test_beam_search_improves_sequence_logprob(causal_setup):
    """The W=4 beam must score at least as high (sum log-prob) as greedy."""
    cfg, params = causal_setup
    ids, mask = _batch(cfg, b=1, t=8, seed=19)
    n_new = 5

    def seq_logprob(full):
        lp = 0.0
        cur = full[:, :8]
        for i in range(n_new):
            logits = causal_lm.forward(params, cfg, cur, jnp.ones_like(cur))
            logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), -1)
            tok = full[:, 8 + i]
            lp += float(logp[0, int(tok[0])])
            cur = jnp.concatenate([cur, tok[:, None]], axis=1)
        return lp

    greedy = generate.generate(params, cfg, ids, mask, max_new_tokens=n_new)
    beam = generate.beam_search(
        params, cfg, ids, mask, max_new_tokens=n_new, num_beams=4
    )
    assert seq_logprob(np.asarray(beam)) >= seq_logprob(np.asarray(greedy)) - 1e-4


def test_generate_no_repeat_ngram_size_1(causal_setup):
    """n=1 (HF supports it: every token may appear at most once) must trace
    and produce a continuation with no token repeated, prompt included."""
    cfg, params = causal_setup
    ids, mask = _batch(cfg, b=2, t=8, seed=29)
    out = generate.generate(
        params, cfg, ids, mask, max_new_tokens=8, no_repeat_ngram_size=1
    )
    seq = np.asarray(out)
    for r in range(seq.shape[0]):
        row = seq[r].tolist()
        gen = row[8:]
        prior = set(row[:8])
        for i, tok in enumerate(gen):
            assert tok not in prior, f"repeated token {tok} in row {r}: {row}"
            prior.add(tok)


def test_generate_no_repeat_ngram(causal_setup):
    """With no_repeat_ngram_size=2, no bigram may appear twice in the
    generated continuation (including bigrams crossing the prompt)."""
    cfg, params = causal_setup
    ids, mask = _batch(cfg, b=2, t=8, seed=23)
    out = generate.generate(
        params, cfg, ids, mask, max_new_tokens=12, no_repeat_ngram_size=2
    )
    seq = np.asarray(out)
    for r in range(seq.shape[0]):
        bigrams = set()
        row = seq[r].tolist()
        ok = True
        for i in range(len(row) - 1):
            bg = (row[i], row[i + 1])
            if bg in bigrams and i + 1 >= 8:  # only generated region enforced
                ok = False
            bigrams.add(bg)
        assert ok, f"repeated bigram in row {r}: {row}"
    # without the constraint this tiny random model loops -> verifies the
    # test has teeth
    base = np.asarray(
        generate.generate(params, cfg, ids, mask, max_new_tokens=12)
    )
    def has_repeat(row):
        bgs = [(row[i], row[i+1]) for i in range(len(row)-1)]
        return len(bgs) != len(set(bgs))
    assert any(has_repeat(base[r].tolist()) for r in range(2))


def test_llama_tp_sharding_rules():
    """TP rules must column-shard the SwiGLU gate (wg) like wi, shard GQA
    kv projections only when divisible, and replicate RMSNorm scales."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    import numpy as np

    from vietnamese_qa_system_tpu.models.config import ModelConfig
    from vietnamese_qa_system_tpu.models.causal_lm import init_causal_lm
    from vietnamese_qa_system_tpu.parallel.sharding import param_sharding

    cfg = ModelConfig(
        arch="causal", vocab_size=256, d_model=64, n_heads=8, n_layers=1,
        d_ff=128, max_seq_len=64, norm="rmsnorm", mlp_gated=True,
        n_kv_heads=2, attention_bias=False, tie_embeddings=False,
    )
    params = init_causal_lm(jax.random.key(0), cfg)
    devs = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "model"))
    sh = param_sharding(params, mesh, "tp")
    blk = sh["blocks"][0]
    assert blk["mlp"]["wg"]["w"].spec == P(None, "model")
    assert blk["mlp"]["wi"]["w"].spec == P(None, "model")
    assert blk["mlp"]["wo"]["w"].spec == P("model", None)
    assert blk["attn"]["wq"]["w"].spec == P(None, "model")
    # kv_dim = 2 heads * 8 = 16: divisible by 4 -> sharded
    assert blk["attn"]["wk"]["w"].spec == P(None, "model")
    # RMSNorm scale replicated
    assert blk["ln1"]["scale"].spec == P(None)


def test_causal_bf16_activation_policy_parity():
    """activations_bf16 (bf16 residual stream, fp32 norm/softmax math) must
    track the fp32-activation loss and grads closely on every causal
    family layout (rope, alibi, rmsnorm/swiglu)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vietnamese_qa_system_tpu.models import causal_lm
    from vietnamese_qa_system_tpu.models import config as mcfg

    rng = np.random.default_rng(0)
    layouts = [
        mcfg.tiny_test("causal"),
        dataclasses.replace(
            mcfg.tiny_test("causal"), positional="alibi",
            embed_layernorm=True,
        ),
        dataclasses.replace(
            mcfg.tiny_test("causal"), norm="rmsnorm", mlp_gated=True,
        ),
    ]
    for base in layouts:
        params = causal_lm.init_causal_lm(jax.random.key(0), base)
        ids = jnp.asarray(rng.integers(1, 512, (4, 32)), jnp.int32)
        batch = {
            "input_ids": ids,
            "attention_mask": jnp.ones((4, 32), jnp.int32),
            "labels": ids,
        }
        cfg_b = dataclasses.replace(base, activations_bf16=True)
        l0, _ = causal_lm.loss_fn(params, base, batch)
        l1, _ = causal_lm.loss_fn(params, cfg_b, batch)
        assert abs(float(l0) - float(l1)) < 5e-3
        g0 = jax.grad(lambda p: causal_lm.loss_fn(p, base, batch)[0])(params)
        g1 = jax.grad(lambda p: causal_lm.loss_fn(p, cfg_b, batch)[0])(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3
            )
