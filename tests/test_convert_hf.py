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
