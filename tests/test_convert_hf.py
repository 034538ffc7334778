"""HF GPT-NeoX weight-import faithfulness: a randomly initialized tiny
GPTNeoXForCausalLM (torch, local, no downloads) must produce the same
logits through this framework's converted pytree."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vietnamese_qa_system_tpu.models import causal_lm, generate
from vietnamese_qa_system_tpu.models.convert_hf import (
    convert_gpt_neox,
    neox_config,
)


@pytest.fixture(scope="module")
def tiny_neox():
    cfg = transformers.GPTNeoXConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=256,
        max_position_embeddings=64,
        rotary_pct=0.25,
        use_parallel_residual=True,
        tie_word_embeddings=False,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    model = transformers.GPTNeoXForCausalLM(cfg).eval()
    return model, cfg


def test_logits_match_transformers(tiny_neox):
    model, hf_cfg = tiny_neox
    cfg = neox_config(hf_cfg)
    assert cfg.parallel_residual and cfg.rope_pct == 0.25
    params = convert_gpt_neox(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 16)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()

    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.ones((2, 16), jnp.int32)
        ),
        np.float32,
    )
    # bf16 matmuls vs torch fp32: compare top-1 agreement + loose values
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


def test_generation_matches_transformers_greedy(tiny_neox):
    model, hf_cfg = tiny_neox
    cfg = neox_config(hf_cfg)
    params = convert_gpt_neox(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, hf_cfg.vocab_size, (1, 8)).astype(np.int64)
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(ids), max_new_tokens=6, do_sample=False
        ).numpy()
    ours = np.asarray(
        generate.generate(
            params,
            cfg,
            jnp.asarray(ids, jnp.int32),
            jnp.ones((1, 8), jnp.int32),
            max_new_tokens=6,
            temperature=0.0,
        )
    )
    # greedy chains can diverge after one low-margin step; require the
    # first steps to agree exactly
    np.testing.assert_array_equal(ours[0, 8:11], hf_out[0, 8:11])


def test_missing_weight_raises(tiny_neox):
    model, hf_cfg = tiny_neox
    cfg = neox_config(hf_cfg)
    sd = dict(model.state_dict())
    sd.pop("gpt_neox.embed_in.weight")
    with pytest.raises(KeyError, match="embed_in"):
        convert_gpt_neox(sd, cfg)


def test_export_roundtrip(tiny_neox, tmp_path):
    """our params -> HF export dir -> reload via transformers -> logits
    match the original HF model (full round trip)."""
    model, hf_cfg = tiny_neox
    cfg = neox_config(hf_cfg)
    params = convert_gpt_neox(model.state_dict(), cfg)

    from vietnamese_qa_system_tpu.models.convert_hf import export_gpt_neox

    out_dir = str(tmp_path / "exported")
    export_gpt_neox(params, cfg, out_dir)
    reloaded = transformers.AutoModelForCausalLM.from_pretrained(out_dir).eval()

    rng = np.random.default_rng(3)
    ids = torch.from_numpy(rng.integers(0, hf_cfg.vocab_size, (2, 12)).astype("int64"))
    with torch.no_grad():
        l1 = model(ids).logits.numpy()
        l2 = reloaded(ids).logits.numpy()
    np.testing.assert_allclose(l1, l2, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_gpt_neo():
    """2 layers alternating [global, local] with a window SMALLER than the
    test sequence, so the sliding-window mask actually binds."""
    cfg = transformers.GPTNeoConfig(
        vocab_size=128,
        hidden_size=64,
        num_layers=2,
        attention_types=[[["global", "local"], 1]],
        num_heads=4,
        intermediate_size=256,
        max_position_embeddings=64,
        window_size=8,
        activation_function="gelu_new",
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(4)
    model = transformers.GPTNeoForCausalLM(cfg).eval()
    return model, cfg


def test_gpt_neo_logits_match_transformers(tiny_gpt_neo):
    """EleutherAI/gpt-neo-125m is the reference's canonical model
    (reference scripts/train.sh:7): unscaled attention + local windows +
    learned positions + gelu_new must reproduce HF logits."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_gpt_neo,
        gpt_neo_config,
    )

    model, hf_cfg = tiny_gpt_neo
    cfg = gpt_neo_config(hf_cfg)
    assert cfg.attention_scale == 1.0
    assert cfg.attention_layers == ("global", "local")
    assert cfg.attention_window == 8 and cfg.positional == "learned"
    params = convert_gpt_neo(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 24)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.ones((2, 24), jnp.int32)
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


def test_gpt_neo_generation_matches_transformers(tiny_gpt_neo):
    """Decode path: the cached local-window mask (slot-space) must agree
    with the uncached forward during generation past the window size, and
    the first greedy token must match HF.  (Later greedy steps on a RANDOM
    tiny model have near-zero top-2 margins, where bf16 matmuls routinely
    flip the argmax vs torch f32 — the logits test above bounds the actual
    numerical agreement.)"""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_gpt_neo,
        gpt_neo_config,
    )

    model, hf_cfg = tiny_gpt_neo
    cfg = gpt_neo_config(hf_cfg)
    params = convert_gpt_neo(model.state_dict(), cfg)

    rng = np.random.default_rng(5)
    ids = rng.integers(0, hf_cfg.vocab_size, (1, 12)).astype(np.int64)
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(ids), max_new_tokens=6, do_sample=False
        ).numpy()
    ours = np.asarray(
        generate.generate(
            params,
            cfg,
            jnp.asarray(ids, jnp.int32),
            jnp.ones((1, 12), jnp.int32),
            max_new_tokens=6,
            temperature=0.0,
        )
    )
    assert ours[0, 12] == hf_out[0, 12]

    # cached decode (sliding-window mask over cache slots) must replay the
    # uncached forward exactly — 12-token prompt + 6 generated crosses the
    # window_size=8 boundary, so local masking is exercised both ways
    cur = ids.astype(np.int32)
    for _ in range(6):
        lg = causal_lm.forward(
            params, cfg, jnp.asarray(cur), jnp.ones_like(jnp.asarray(cur))
        )
        cur = np.concatenate(
            [cur, [[int(jnp.argmax(lg[0, -1]))]]], axis=1
        ).astype(np.int32)
    np.testing.assert_array_equal(ours[0], cur[0])


def test_gpt2_logits_match_transformers():
    """GPT-2 (special-cased by the reference at trainer.py:529): fused
    Conv1D c_attn split + learned positions reproduce HF logits."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_gpt2,
        gpt2_config,
    )

    hf_cfg = transformers.GPT2Config(
        vocab_size=128,
        n_embd=64,
        n_layer=2,
        n_head=4,
        n_inner=256,
        n_positions=64,
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(6)
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg = gpt2_config(hf_cfg)
    assert cfg.attention_scale is None and cfg.activation == "gelu_new"
    params = convert_gpt2(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 16)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.ones((2, 16), jnp.int32)
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


def test_causal_auto_dispatch(tiny_gpt_neo, tmp_path):
    """load_causal_auto resolves model_type=gpt_neo from a local dir and
    the config JSON round-trip keeps attention_layers a hashable tuple."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        gpt_neo_config,
        load_causal_auto,
    )
    from vietnamese_qa_system_tpu.models import ModelConfig

    model, hf_cfg = tiny_gpt_neo
    d = str(tmp_path / "neo")
    model.save_pretrained(d, safe_serialization=False)
    params, cfg = load_causal_auto(d)
    assert cfg == gpt_neo_config(hf_cfg)
    assert "pos_embed" in params

    rt = ModelConfig.from_json(cfg.to_json())
    assert rt == cfg
    hash(rt)  # static jit arg


def test_bert_encoder_matches_transformers():
    """Random tiny BertModel: our converted encoder must reproduce HF's
    token hidden states and mean-pooled embeddings."""
    from vietnamese_qa_system_tpu.models import encoder as enc_mod
    from vietnamese_qa_system_tpu.models.convert_hf import bert_config, convert_bert

    hf_cfg = transformers.BertConfig(
        vocab_size=120,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        layer_norm_eps=1e-12,
    )
    torch.manual_seed(1)
    model = transformers.BertModel(hf_cfg).eval()
    cfg = bert_config(hf_cfg)
    params = convert_bert(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 9:] = 0
    with torch.no_grad():
        hf_out = model(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    ours = np.asarray(
        enc_mod.encode(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
        ),
        np.float32,
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        ours[valid], hf_out[valid], atol=0.03, rtol=0.03
    )

    # mean-pooled sentence embeddings track the HF pooling too
    emb = np.asarray(
        enc_mod.sentence_embed(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
        )
    )
    hf_pool = (hf_out * mask[..., None]).sum(1) / mask.sum(1, keepdims=True)
    hf_pool /= np.linalg.norm(hf_pool, axis=1, keepdims=True)
    cos = (emb * hf_pool).sum(1)
    assert (cos > 0.999).all(), cos


def test_mpnet_encoder_matches_transformers():
    """Random tiny MPNetModel (relative-position attention bias, RoBERTa
    position offset, embedding LN without token types): our converted
    encoder must reproduce HF's hidden states — the reference's second
    index encoder is paraphrase-mpnet-base-v2 (heavy_ranker.py:83-88)."""
    from vietnamese_qa_system_tpu.models import encoder as enc_mod
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_mpnet,
        mpnet_config,
    )

    hf_cfg = transformers.MPNetConfig(
        vocab_size=120,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        relative_attention_num_buckets=32,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(2)
    model = transformers.MPNetModel(hf_cfg).eval()
    cfg = mpnet_config(hf_cfg)
    assert cfg.position_offset == 2 and cfg.relative_attention_buckets == 32
    params = convert_mpnet(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    # MPNet pad id is 1; keep real ids clear of it so HF's position ids
    # (derived from ids != pad) match ours (derived from the mask)
    ids = rng.integers(4, hf_cfg.vocab_size, (2, 24)).astype(np.int64)
    mask = np.ones((2, 24), np.int64)
    mask[1, 17:] = 0
    ids[1, 17:] = hf_cfg.pad_token_id
    with torch.no_grad():
        hf_out = model(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    ours = np.asarray(
        enc_mod.encode(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
        ),
        np.float32,
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], hf_out[valid], atol=0.03, rtol=0.03)

    # long-range bucketing parity: sequences past max_distance buckets
    ids2 = rng.integers(4, hf_cfg.vocab_size, (1, 48)).astype(np.int64)
    mask2 = np.ones((1, 48), np.int64)
    with torch.no_grad():
        hf_out2 = model(torch.from_numpy(ids2)).last_hidden_state.numpy()
    ours2 = np.asarray(
        enc_mod.encode(
            params, cfg, jnp.asarray(ids2, jnp.int32), jnp.asarray(mask2, jnp.int32)
        )
    )
    np.testing.assert_allclose(ours2, hf_out2, atol=0.03, rtol=0.03)


def test_sentence_transformers_stack_end_to_end(tmp_path, rng):
    """Simulates switching from the reference's sentence-transformers
    retrieval to this framework: a LOCAL HF BERT checkpoint + HF tokenizer
    drive ingest and search through HFTokenizer + convert_bert."""
    from vietnamese_qa_system_tpu.data.tokenizer import HFTokenizer
    from vietnamese_qa_system_tpu.engine import (
        DocStore, IngestPipeline, Retriever, VectorStore,
    )
    from vietnamese_qa_system_tpu.models.convert_hf import bert_config, convert_bert

    # build a tiny local wordpiece vocab + BERT checkpoint (no network)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        "tai", "lieu", "so", "0", "1", "2", "3", "4", "5", "6", "7",
        "noi", "dung", "ve", "chu", "de", "cau", "hoi",
    ]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    tok_hf = transformers.BertTokenizerFast(str(vocab_file), do_lower_case=True)
    tok_dir = tmp_path / "tok"
    tok_hf.save_pretrained(str(tok_dir))

    hf_cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(hf_cfg)
    cfg = bert_config(hf_cfg)
    params = convert_bert(model.state_dict(), cfg)

    tok = HFTokenizer(str(tok_dir))
    store = VectorStore(256, cfg.d_model, tile_n=128)
    ds = DocStore()
    docs = [f"tai lieu so {i} noi dung ve chu de {i}" for i in range(8)]
    pipe = IngestPipeline(params, cfg, tok, store, ds, batch_size=8, max_len=32)
    pipe.add_texts(docs)
    retr = Retriever(params, cfg, tok, store, ds, max_len=32, query_batch=8)
    out = retr.search([docs[3]], k=2)[0]
    assert out[0].id == 3 and out[0].doc == docs[3]
    assert out[0].score > 0.99


def test_dual_retriever_true_encoder_pair(tmp_path, rng):
    """The reference's actual index pair is MiniLM (BERT-class) + MPNet
    (heavy_ranker.py:78-88); DualRetriever must run over one of each
    architecture imported from local HF checkpoints."""
    from vietnamese_qa_system_tpu.data.tokenizer import HFTokenizer
    from vietnamese_qa_system_tpu.engine import (
        DocStore, DualRetriever, IngestPipeline, Retriever, VectorStore,
    )
    from vietnamese_qa_system_tpu.models.convert_hf import (
        bert_config, convert_bert, convert_mpnet, mpnet_config,
    )

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        "tai", "lieu", "so", "0", "1", "2", "3", "4", "5", "6", "7",
        "noi", "dung", "ve", "chu", "de",
    ]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    tok_hf = transformers.BertTokenizerFast(str(vocab_file), do_lower_case=True)
    tok_dir = tmp_path / "tok"
    tok_hf.save_pretrained(str(tok_dir))
    tok = HFTokenizer(str(tok_dir))

    torch.manual_seed(3)
    bert_hf = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64,
    )
    mpnet_hf = transformers.MPNetConfig(
        vocab_size=len(vocab), hidden_size=48, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=96,
        max_position_embeddings=64,
    )
    pairs = [
        (bert_config(bert_hf), convert_bert(
            transformers.BertModel(bert_hf).state_dict(), bert_config(bert_hf))),
        (mpnet_config(mpnet_hf), convert_mpnet(
            transformers.MPNetModel(mpnet_hf).state_dict(), mpnet_config(mpnet_hf))),
    ]
    docs = [f"tai lieu so {i} noi dung ve chu de {i}" for i in range(8)]
    retrievers = []
    for cfg, params in pairs:
        store = VectorStore(256, cfg.d_model, tile_n=128)
        ds = DocStore()
        IngestPipeline(params, cfg, tok, store, ds, batch_size=8, max_len=32).add_texts(docs)
        retrievers.append(
            Retriever(params, cfg, tok, store, ds, max_len=32, query_batch=8)
        )
    dual = DualRetriever(*retrievers, threshold=0.4)
    out = dual.search([docs[2], docs[6]])
    assert out[0] is not None and out[0].id == 2
    assert out[1] is not None and out[1].id == 6


def test_llama_logits_match_transformers():
    """Llama family (RMSNorm + SwiGLU + GQA + bias-free projections +
    full-dim RoPE): our converted pytree must reproduce HF logits,
    including grouped-query attention (2 kv heads vs 4 q heads)."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_llama,
        llama_config,
    )

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=160,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    torch.manual_seed(7)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config(hf_cfg)
    assert cfg.norm == "rmsnorm" and cfg.mlp_gated and cfg.n_kv_heads == 2
    params = convert_llama(model.state_dict(), cfg)
    assert "b" not in params["blocks"][0]["attn"]["wq"]
    assert "wg" in params["blocks"][0]["mlp"]

    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 16)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.ones((2, 16), jnp.int32)
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


def test_llama_cached_decode_consistent():
    """The GQA KV cache (stores only kv heads, repeats after the cache
    write) must replay the uncached forward exactly through generate()."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_llama,
        llama_config,
    )

    hf_cfg = transformers.LlamaConfig(
        vocab_size=96,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(8)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config(hf_cfg)
    params = convert_llama(model.state_dict(), cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, hf_cfg.vocab_size, (1, 10)).astype(np.int32)
    ours = np.asarray(
        generate.generate(
            params, cfg, jnp.asarray(ids), jnp.ones((1, 10), jnp.int32),
            max_new_tokens=5, temperature=0.0,
        )
    )
    cur = ids.copy()
    for _ in range(5):
        lg = causal_lm.forward(
            params, cfg, jnp.asarray(cur), jnp.ones_like(jnp.asarray(cur))
        )
        cur = np.concatenate(
            [cur, [[int(jnp.argmax(lg[0, -1]))]]], axis=1
        ).astype(np.int32)
    np.testing.assert_array_equal(ours[0], cur[0])

    # first greedy token also agrees with HF
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(ids.astype(np.int64)), max_new_tokens=1,
            do_sample=False,
        ).numpy()
    assert ours[0, 10] == hf_out[0, 10]


def test_gpt_neo_export_roundtrip(tiny_gpt_neo, tmp_path):
    """HF GPT-Neo -> our pytree -> export_causal_auto -> transformers
    reload: logits match the original (full round trip incl. local
    attention + learned positions)."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_gpt_neo,
        export_causal_auto,
        gpt_neo_config,
    )

    model, hf_cfg = tiny_gpt_neo
    cfg = gpt_neo_config(hf_cfg)
    params = convert_gpt_neo(model.state_dict(), cfg)
    out_dir = str(tmp_path / "neo_exported")
    export_causal_auto(params, cfg, out_dir)
    reloaded = transformers.AutoModelForCausalLM.from_pretrained(out_dir).eval()
    assert reloaded.config.model_type == "gpt_neo"

    rng = np.random.default_rng(3)
    ids = torch.from_numpy(
        rng.integers(0, hf_cfg.vocab_size, (2, 16)).astype("int64")
    )
    with torch.no_grad():
        l1 = model(ids).logits.numpy()
        l2 = reloaded(ids).logits.numpy()
    np.testing.assert_allclose(l1, l2, atol=1e-4)


def test_gpt2_export_roundtrip(tmp_path):
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_gpt2,
        export_causal_auto,
        gpt2_config,
    )

    hf_cfg = transformers.GPT2Config(
        vocab_size=96, n_embd=32, n_layer=2, n_head=4, n_inner=64,
        n_positions=64,
    )
    torch.manual_seed(9)
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()
    cfg = gpt2_config(hf_cfg)
    params = convert_gpt2(model.state_dict(), cfg)
    out_dir = str(tmp_path / "gpt2_exported")
    export_causal_auto(params, cfg, out_dir)
    reloaded = transformers.AutoModelForCausalLM.from_pretrained(out_dir).eval()
    assert reloaded.config.model_type == "gpt2"

    rng = np.random.default_rng(4)
    ids = torch.from_numpy(rng.integers(0, 96, (2, 12)).astype("int64"))
    with torch.no_grad():
        np.testing.assert_allclose(
            model(ids).logits.numpy(), reloaded(ids).logits.numpy(), atol=1e-4
        )


def test_llama_export_roundtrip(tmp_path):
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_llama,
        export_causal_auto,
        llama_config,
    )

    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(10)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_config(hf_cfg)
    params = convert_llama(model.state_dict(), cfg)
    out_dir = str(tmp_path / "llama_exported")
    export_causal_auto(params, cfg, out_dir)
    reloaded = transformers.AutoModelForCausalLM.from_pretrained(out_dir).eval()
    assert reloaded.config.model_type == "llama"
    assert reloaded.config.num_key_value_heads == 2

    rng = np.random.default_rng(5)
    ids = torch.from_numpy(rng.integers(0, 96, (2, 12)).astype("int64"))
    with torch.no_grad():
        np.testing.assert_allclose(
            model(ids).logits.numpy(), reloaded(ids).logits.numpy(), atol=1e-4
        )


def test_bloom_logits_match_transformers():
    """BLOOM family (ALiBi score bias + embedding LayerNorm + fused-QKV
    head-interleaved import + BloomGelu): our converted pytree must
    reproduce HF logits.  n_head=6 exercises the non-power-of-two ALiBi
    slope extension branch."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        bloom_config,
        convert_bloom,
    )

    hf_cfg = transformers.BloomConfig(
        vocab_size=128, hidden_size=48, n_layer=2, n_head=6,
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(11)
    model = transformers.BloomForCausalLM(hf_cfg).eval()
    cfg = bloom_config(hf_cfg)
    assert cfg.positional == "alibi" and cfg.embed_layernorm
    params = convert_bloom(model.state_dict(), cfg)
    assert "emb_ln" in params and "pos_embed" not in params

    rng = np.random.default_rng(6)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 16)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.ones((2, 16), jnp.int32)
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95


def test_bloom_alibi_slopes_match_hf():
    """Our slope sequence equals HF's build_alibi_tensor slopes for both
    power-of-two and non-power-of-two head counts."""
    from transformers.models.bloom.modeling_bloom import build_alibi_tensor

    from vietnamese_qa_system_tpu.models.layers import alibi_slopes

    for n_heads in (4, 6, 8, 12, 16):
        mask = torch.ones((1, 5))
        hf = build_alibi_tensor(mask, n_heads, torch.float32)
        # hf: (n_heads, 1, 5) with value slope * position
        hf_slopes = hf[:, 0, 1].numpy()  # position 1 -> slope itself
        np.testing.assert_allclose(
            np.asarray(alibi_slopes(n_heads)), hf_slopes, rtol=1e-6
        )


def test_bloom_cached_decode_consistent():
    """ALiBi decode through the slot-position KV cache must replay the
    uncached forward exactly, and the first greedy token agrees with HF."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        bloom_config,
        convert_bloom,
    )

    hf_cfg = transformers.BloomConfig(
        vocab_size=96, hidden_size=32, n_layer=2, n_head=4,
    )
    torch.manual_seed(12)
    model = transformers.BloomForCausalLM(hf_cfg).eval()
    cfg = bloom_config(hf_cfg)
    params = convert_bloom(model.state_dict(), cfg)

    rng = np.random.default_rng(7)
    ids = rng.integers(0, hf_cfg.vocab_size, (1, 10)).astype(np.int32)
    ours = np.asarray(
        generate.generate(
            params, cfg, jnp.asarray(ids), jnp.ones((1, 10), jnp.int32),
            max_new_tokens=5, temperature=0.0,
        )
    )
    cur = ids.copy()
    for _ in range(5):
        lg = causal_lm.forward(
            params, cfg, jnp.asarray(cur), jnp.ones_like(jnp.asarray(cur))
        )
        cur = np.concatenate(
            [cur, [[int(jnp.argmax(lg[0, -1]))]]], axis=1
        ).astype(np.int32)
    np.testing.assert_array_equal(ours[0], cur[0])

    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(ids.astype(np.int64)), max_new_tokens=1,
            do_sample=False,
        ).numpy()
    assert ours[0, 10] == hf_out[0, 10]


def test_bloom_export_roundtrip_and_auto_dispatch(tmp_path):
    """HF BLOOM -> our pytree -> export_causal_auto -> transformers reload
    matches; load_causal_auto dispatches a saved BLOOM dir to load_bloom."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        bloom_config,
        convert_bloom,
        export_causal_auto,
        load_causal_auto,
    )

    hf_cfg = transformers.BloomConfig(
        vocab_size=96, hidden_size=32, n_layer=2, n_head=4,
    )
    torch.manual_seed(13)
    model = transformers.BloomForCausalLM(hf_cfg).eval()
    cfg = bloom_config(hf_cfg)
    params = convert_bloom(model.state_dict(), cfg)
    out_dir = str(tmp_path / "bloom_exported")
    export_causal_auto(params, cfg, out_dir)
    reloaded = transformers.AutoModelForCausalLM.from_pretrained(out_dir).eval()
    assert reloaded.config.model_type == "bloom"

    rng = np.random.default_rng(8)
    ids = torch.from_numpy(rng.integers(0, 96, (2, 12)).astype("int64"))
    with torch.no_grad():
        np.testing.assert_allclose(
            model(ids).logits.numpy(), reloaded(ids).logits.numpy(), atol=1e-4
        )

    params2, cfg2 = load_causal_auto(out_dir)
    assert cfg2.positional == "alibi"
    ours = np.asarray(
        causal_lm.forward(
            params2, cfg2, jnp.asarray(ids.numpy(), jnp.int32),
            jnp.ones((2, 12), jnp.int32),
        )
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            ours, model(ids).logits.numpy(), atol=0.05, rtol=0.05
        )


def test_hf_tokenizer_special_token_id_zero(tmp_path):
    """A legitimate special token at id 0 (pythia/GPT-NeoX put
    <|endoftext|> there) must survive HFTokenizer's id resolution — a
    falsy-zero `or` fallback would silently replace it with pad."""
    from vietnamese_qa_system_tpu.data.tokenizer import HFTokenizer

    vocab = ["<|endoftext|>", "[PAD]", "xin", "chao"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    tok_hf = transformers.BertTokenizerFast(
        str(vocab_file),
        eos_token="<|endoftext|>",
        bos_token="<|endoftext|>",
        pad_token="[PAD]",
        unk_token="[PAD]",
        cls_token="[PAD]",
        sep_token="[PAD]",
        mask_token="[PAD]",
    )
    tok_dir = tmp_path / "tok0"
    tok_hf.save_pretrained(str(tok_dir))
    tok = HFTokenizer(str(tok_dir))
    assert tok.eos_id == 0
    assert tok.bos_id == 0
    assert tok.pad_id == 1


def test_export_t5_special_token_ids(tmp_path):
    """export_t5 must write the TRAINING tokenizer's special-token ids into
    the HF config (ByteTokenizer: eos=2) — a hardcoded HF-T5 eos=1 makes HF
    generate() stop on the wrong token for natively trained models."""
    import json
    import jax

    from vietnamese_qa_system_tpu.models import ModelConfig
    from vietnamese_qa_system_tpu.models.convert_hf import export_t5
    from vietnamese_qa_system_tpu.train.trainer import init_model_params

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=64, d_model=32,
        n_heads=2, d_kv=8, n_layers=1, n_decoder_layers=1, d_ff=64,
        mlp_gated=True, tie_embeddings=False, relative_attention_buckets=8,
        relative_attention_max_distance=16, attention_bias=False,
    )
    params = init_model_params(cfg, jax.random.key(0))
    out = tmp_path / "export"
    export_t5(params, cfg, str(out), pad_token_id=0, eos_token_id=2)
    with open(out / "config.json") as f:
        hf_cfg = json.load(f)
    assert hf_cfg["eos_token_id"] == 2
    assert hf_cfg["pad_token_id"] == 0
    assert hf_cfg["decoder_start_token_id"] == 0


def test_qwen2_logits_and_greedy_match_transformers():
    """Qwen2 family (llama layout + q/k/v-only biases, GQA, tied
    embeddings, rope_theta=1e6 — the strongest multilingual open weights
    for Vietnamese): converted pytree must reproduce HF logits and greedy
    decode.  Covers the attention_bias="qkv" init/import contract."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_llama,
        qwen2_config,
    )

    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=6, num_key_value_heads=2,
        intermediate_size=96, max_position_embeddings=64,
        rope_theta=1e6, tie_word_embeddings=True,
        use_sliding_window=False,
    )
    torch.manual_seed(17)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg = qwen2_config(hf_cfg)
    assert cfg.attention_bias == "qkv" and cfg.n_kv_heads == 2
    params = convert_llama(model.state_dict(), cfg)
    blk = params["blocks"][0]["attn"]
    assert "b" in blk["wq"] and "b" in blk["wk"] and "b" in blk["wv"]
    assert "b" not in blk["wo"]

    rng = np.random.default_rng(9)
    ids = rng.integers(0, 128, (2, 16)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.ones((2, 16), jnp.int32),
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.95

    out = np.asarray(generate.generate(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.ones((2, 16), jnp.int32), max_new_tokens=8, eos_id=None,
    ))
    hf_out = model.generate(
        torch.from_numpy(ids), max_new_tokens=8, do_sample=False,
        pad_token_id=0,
    ).numpy()
    np.testing.assert_array_equal(out, hf_out)


def test_qwen2_export_roundtrip_and_auto_dispatch(tmp_path):
    """our pytree -> export_causal_auto (qkv bias -> Qwen2 dir) ->
    transformers reload matches; load_causal_auto dispatches back."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_llama,
        export_causal_auto,
        load_causal_auto,
        qwen2_config,
    )

    hf_cfg = transformers.Qwen2Config(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        tie_word_embeddings=False, use_sliding_window=False,
    )
    torch.manual_seed(19)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg = qwen2_config(hf_cfg)
    params = convert_llama(model.state_dict(), cfg)
    out_dir = str(tmp_path / "qwen2_exported")
    export_causal_auto(params, cfg, out_dir)
    reloaded = transformers.AutoModelForCausalLM.from_pretrained(out_dir).eval()
    assert reloaded.config.model_type == "qwen2"

    rng = np.random.default_rng(10)
    ids = torch.from_numpy(rng.integers(0, 96, (2, 12)).astype("int64"))
    with torch.no_grad():
        np.testing.assert_allclose(
            model(ids).logits.numpy(), reloaded(ids).logits.numpy(), atol=1e-4
        )

    params2, cfg2 = load_causal_auto(out_dir)
    assert cfg2.attention_bias == "qkv"
    ours = np.asarray(
        causal_lm.forward(
            params2, cfg2, jnp.asarray(ids.numpy(), jnp.int32),
            jnp.ones((2, 12), jnp.int32),
        )
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            ours, model(ids).logits.numpy(), atol=0.05, rtol=0.05
        )


def test_qwen2_init_bias_layout_and_training_smoke():
    """attention_bias="qkv" random init matches the import layout (q/k/v
    biased, o/mlp bias-free) and trains a step under LoRA+sharding."""
    import jax

    from vietnamese_qa_system_tpu.models import ModelConfig
    from vietnamese_qa_system_tpu.models.causal_lm import init_causal_lm
    from vietnamese_qa_system_tpu.train.trainer import Trainer, TrainConfig

    cfg = ModelConfig(
        arch="causal", vocab_size=64, d_model=32, n_heads=4, n_kv_heads=2,
        n_layers=2, d_ff=64, norm="rmsnorm", mlp_gated=True,
        attention_bias="qkv", rope_theta=1e6,
    )
    params = init_causal_lm(jax.random.key(0), cfg)
    blk = params["blocks"][0]
    assert "b" in blk["attn"]["wq"] and "b" in blk["attn"]["wv"]
    assert "b" not in blk["attn"]["wo"] and "b" not in blk["mlp"]["wi"]

    tr = Trainer(TrainConfig(model=cfg, lr=1e-3, epochs=1, log_every=100),
                 total_steps=2)
    rng = np.random.default_rng(0)

    def batches(epoch=0):
        for _ in range(2):
            ids = rng.integers(4, 60, (8, 16)).astype(np.int32)
            yield {"input_ids": ids, "attention_mask": np.ones_like(ids),
                   "labels": ids.copy()}

    state = tr.fit(batches)
    assert np.isfinite(float(np.asarray(
        state["params"]["blocks"][0]["attn"]["wq"]["b"]).sum()))


def test_mistral_sliding_window_logits_match_transformers():
    """Mistral = llama layout + sliding-window attention on every layer
    (config.sliding_window).  Our import maps it to an all-"local"
    attention_layers tuple riding the flash kernel's window mode; logits
    must match HF (T=16 > window=8, so the band actually truncates)."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_llama,
        llama_config,
    )

    hf_cfg = transformers.MistralConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=160,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        sliding_window=8,
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    model = transformers.MistralForCausalLM(hf_cfg).eval()
    cfg = llama_config(hf_cfg)
    assert cfg.attention_layers == ("local", "local")
    assert cfg.attention_window == 8
    params = convert_llama(model.state_dict(), cfg)

    rng = np.random.default_rng(3)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 16)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.ones((2, 16), jnp.int32),
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)
    # tiny random 128-vocab model: near-ties flip a few argmaxes in bf16
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.9


def test_qwen2_sliding_window_layer_map():
    """HF Qwen2 applies SWA only to layers >= max_window_layers
    (modeling_qwen2); the importer must reproduce that per-layer split."""
    from vietnamese_qa_system_tpu.models.convert_hf import qwen2_config

    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=160, max_position_embeddings=64,
        use_sliding_window=True, sliding_window=8, max_window_layers=1,
    )
    cfg = qwen2_config(hf_cfg)
    assert cfg.attention_layers == ("global", "local", "local")
    assert cfg.attention_window == 8
    # without the flag the family stays all-global
    hf_cfg2 = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=160, max_position_embeddings=64,
        use_sliding_window=False, sliding_window=8,
    )
    assert qwen2_config(hf_cfg2).attention_layers is None


# ---------------------------------------------------------------------------
# MPT family (MosaicML MPT — vinai/PhoGPT-4B, the strongest Vietnamese-first
# open LLM, is model_type "mpt")
# ---------------------------------------------------------------------------


def _tiny_mpt_cfg(**kw):
    base = dict(
        vocab_size=128, d_model=48, n_heads=6, n_layers=2,
        expansion_ratio=4, max_seq_len=64,
    )
    base.update(kw)
    return transformers.MptConfig(**base)


def test_mpt_logits_match_transformers():
    """MPT family (bias-free pre-LN LayerNorms, feature-major fused Wqkv,
    MPT-variant ALiBi, exact-GELU MLP): our converted pytree must reproduce
    HF logits.  n_heads=6 exercises MPT's non-power-of-two slope
    interleave (PhoGPT-4B has 24 heads — also non-power-of-two)."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_mpt,
        mpt_config,
    )

    hf_cfg = _tiny_mpt_cfg()
    torch.manual_seed(21)
    model = transformers.MptForCausalLM(hf_cfg).eval()
    cfg = mpt_config(hf_cfg)
    assert cfg.positional == "alibi" and cfg.alibi_mode == "mpt"
    assert cfg.attention_bias is False and cfg.clip_qkv is None
    params = convert_mpt(model.state_dict(), cfg)
    assert "pos_embed" not in params and "emb_ln" not in params
    assert "b" not in params["blocks"][0]["attn"]["wq"]

    rng = np.random.default_rng(21)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 16)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.ones((2, 16), jnp.int32),
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.9

    # greedy decode through the slot-position KV cache agrees with HF
    one = ids[:1].astype(np.int32)
    dec = np.asarray(
        generate.generate(
            params, cfg, jnp.asarray(one), jnp.ones((1, 16), jnp.int32),
            max_new_tokens=1, temperature=0.0,
        )
    )
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(one.astype(np.int64)), max_new_tokens=1,
            do_sample=False,
        ).numpy()
    assert dec[0, 16] == hf_out[0, 16]


def test_mpt_alibi_slopes_match_hf():
    """Our mode="mpt" slopes equal HF's build_mpt_alibi_tensor for
    power-of-two and non-power-of-two head counts (24 = PhoGPT-4B).

    At the default alibi_bias_max=8 MPT's higher-power-of-two interleave
    reproduces BLOOM's lower-power-of-two extension EXACTLY (verified here
    across head counts) — the mode knob matters only for configs with a
    nonstandard alibi_bias_max, which the MPT recipe honors and the BLOOM
    formula pins to 8."""
    from transformers.models.mpt.modeling_mpt import build_mpt_alibi_tensor

    from vietnamese_qa_system_tpu.models.layers import alibi_slopes

    for n_heads in (4, 6, 8, 12, 16, 24):
        hf = build_mpt_alibi_tensor(n_heads, 5)  # (H, 1, 5), slope * (k-4)
        hf_slopes = (hf[:, 0, 4] - hf[:, 0, 3]).numpy()
        ours = np.asarray(alibi_slopes(n_heads, mode="mpt"))
        np.testing.assert_allclose(ours, hf_slopes, rtol=1e-6)
        # the two published recipes coincide at bias_max=8 ...
        np.testing.assert_allclose(
            ours, np.asarray(alibi_slopes(n_heads, mode="bloom")), rtol=1e-6
        )
    # ... and mode="mpt" honors a nonstandard alibi_bias_max
    assert not np.allclose(
        np.asarray(alibi_slopes(6, mode="mpt", bias_max=4.0)),
        np.asarray(alibi_slopes(6, mode="mpt")),
    )


def test_mpt_clip_qkv():
    """attn_config.clip_qkv clamps the fused Wqkv output in HF; our
    per-projection clamp must be equivalent — and must actually bind at
    this scale (parity vs an unclipped run differs)."""
    import dataclasses

    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_mpt,
        mpt_config,
    )

    hf_cfg = _tiny_mpt_cfg(attn_config={"alibi": True, "clip_qkv": 0.02})
    torch.manual_seed(22)
    model = transformers.MptForCausalLM(hf_cfg).eval()
    cfg = mpt_config(hf_cfg)
    assert cfg.clip_qkv == 0.02
    params = convert_mpt(model.state_dict(), cfg)

    rng = np.random.default_rng(22)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 12)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.ones((2, 12), jnp.int32),
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)

    unclipped = np.asarray(
        causal_lm.forward(
            params, dataclasses.replace(cfg, clip_qkv=None),
            jnp.asarray(ids, jnp.int32), jnp.ones((2, 12), jnp.int32),
        ),
        np.float32,
    )
    assert np.abs(ours - unclipped).max() > 1e-4


def test_mpt_export_roundtrip_and_auto_dispatch(tmp_path):
    """HF MPT -> our pytree -> export_causal_auto -> transformers reload
    matches; load_causal_auto dispatches a saved MPT dir to load_mpt."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_mpt,
        export_causal_auto,
        load_causal_auto,
        mpt_config,
    )

    hf_cfg = _tiny_mpt_cfg(n_heads=4)
    torch.manual_seed(23)
    model = transformers.MptForCausalLM(hf_cfg).eval()
    cfg = mpt_config(hf_cfg)
    params = convert_mpt(model.state_dict(), cfg)
    out_dir = str(tmp_path / "mpt_exported")
    export_causal_auto(params, cfg, out_dir)
    reloaded = transformers.AutoModelForCausalLM.from_pretrained(out_dir).eval()
    assert reloaded.config.model_type == "mpt"

    rng = np.random.default_rng(23)
    ids = torch.from_numpy(rng.integers(0, 128, (2, 12)).astype("int64"))
    with torch.no_grad():
        np.testing.assert_allclose(
            model(ids).logits.numpy(), reloaded(ids).logits.numpy(), atol=1e-4
        )

    params2, cfg2 = load_causal_auto(out_dir)
    assert cfg2.alibi_mode == "mpt"
    ours = np.asarray(
        causal_lm.forward(
            params2, cfg2, jnp.asarray(ids.numpy(), jnp.int32),
            jnp.ones((2, 12), jnp.int32),
        )
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            ours, model(ids).logits.numpy(), atol=0.05, rtol=0.05
        )


# ---------------------------------------------------------------------------
# Gemma family (Google's multilingual open weights — GeGLU, (1+w) RMSNorm
# fold, sqrt(d) embedding scaling, decoupled head_dim)
# ---------------------------------------------------------------------------


def _tiny_gemma_cfg(**kw):
    base = dict(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=1, head_dim=16,
        intermediate_size=96, max_position_embeddings=64,
        hidden_act="gelu_pytorch_tanh", tie_word_embeddings=True,
    )
    base.update(kw)
    return transformers.GemmaConfig(**base)


def test_gemma_logits_match_transformers():
    """Gemma family: (1+w) RMSNorm folded into the imported scales, GeGLU
    gate (tanh), sqrt(d_model) embedding scaling, head_dim=16 decoupled
    from d/h=12, MQA (1 kv head): our converted pytree must reproduce HF
    logits, uncached and through greedy KV-cached decode."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_gemma,
        gemma_config,
    )

    hf_cfg = _tiny_gemma_cfg()
    torch.manual_seed(31)
    model = transformers.GemmaForCausalLM(hf_cfg).eval()
    cfg = gemma_config(hf_cfg)
    assert cfg.scale_embedding and cfg.activation == "gelu_new"
    assert cfg.d_kv == 16 and cfg.head_dim == 16 and cfg.n_kv_heads == 1
    params = convert_gemma(model.state_dict(), cfg)
    # HF init zeros the RMSNorm weights -> folded scales are exactly 1
    assert np.allclose(np.asarray(params["ln_f"]["scale"]), 1.0)

    rng = np.random.default_rng(31)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 16)).astype(np.int64)
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(
        causal_lm.forward(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.ones((2, 16), jnp.int32),
        ),
        np.float32,
    )
    np.testing.assert_allclose(ours, hf_logits, atol=0.05, rtol=0.05)
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.9

    one = ids[:1].astype(np.int32)
    dec = np.asarray(
        generate.generate(
            params, cfg, jnp.asarray(one), jnp.ones((1, 16), jnp.int32),
            max_new_tokens=1, temperature=0.0,
        )
    )
    with torch.no_grad():
        hf_out = model.generate(
            torch.from_numpy(one.astype(np.int64)), max_new_tokens=1,
            do_sample=False,
        ).numpy()
    assert dec[0, 16] == hf_out[0, 16]


def test_gemma_export_roundtrip_and_auto_dispatch(tmp_path):
    """HF Gemma -> our pytree -> export_causal_auto (scale_embedding
    fingerprint -> export_gemma, norm fold inverted) -> transformers
    reload matches; load_causal_auto dispatches model_type gemma."""
    from vietnamese_qa_system_tpu.models.convert_hf import (
        convert_gemma,
        export_causal_auto,
        gemma_config,
        load_causal_auto,
    )

    hf_cfg = _tiny_gemma_cfg()
    torch.manual_seed(32)
    model = transformers.GemmaForCausalLM(hf_cfg).eval()
    cfg = gemma_config(hf_cfg)
    params = convert_gemma(model.state_dict(), cfg)
    out_dir = str(tmp_path / "gemma_exported")
    export_causal_auto(params, cfg, out_dir)
    reloaded = transformers.AutoModelForCausalLM.from_pretrained(out_dir).eval()
    assert reloaded.config.model_type == "gemma"

    rng = np.random.default_rng(32)
    ids = torch.from_numpy(rng.integers(0, 128, (2, 12)).astype("int64"))
    with torch.no_grad():
        np.testing.assert_allclose(
            model(ids).logits.numpy(), reloaded(ids).logits.numpy(), atol=1e-4
        )

    params2, cfg2 = load_causal_auto(out_dir)
    assert cfg2.scale_embedding and cfg2.d_kv == 16
    ours = np.asarray(
        causal_lm.forward(
            params2, cfg2, jnp.asarray(ids.numpy(), jnp.int32),
            jnp.ones((2, 12), jnp.int32),
        )
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            ours, model(ids).logits.numpy(), atol=0.05, rtol=0.05
        )
