"""mBART family: HF import parity + generation + training plumbing.

The reference's offline en→vi translation model is
``vinai/vinai-translate-en2vi`` — an mBART-architecture seq2seq loaded
4-bit at reference src/data/features/final_storge_converted/
data_parser.py:75-93 (and driven manually in reference src/test.py:27-38).
These tests check models/bart.py reproduces transformers MBart outputs
from randomly initialized local checkpoints (no network, same harness as
the t5/llama parity tests), including mBART's two generation quirks:
decoder start at eos and the forced target-language first token.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from vietnamese_qa_system_tpu.models import bart
from vietnamese_qa_system_tpu.models import generate as gen_mod
from vietnamese_qa_system_tpu.models.convert_hf import (
    convert_mbart,
    mbart_config,
)

EOS, PAD, LANG = 2, 1, 7  # HF mBART convention: pad=1, eos=2; 7 = lang id


def _mk_hf(scale_embedding: bool = True, seed: int = 0):
    cfg = transformers.MBartConfig(
        vocab_size=99,
        d_model=32,
        encoder_layers=2,
        decoder_layers=3,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=64,
        decoder_ffn_dim=64,
        max_position_embeddings=64,
        activation_function="gelu",
        scale_embedding=scale_embedding,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        pad_token_id=PAD,
        bos_token_id=0,
        eos_token_id=EOS,
        decoder_start_token_id=EOS,
    )
    torch.manual_seed(seed)
    model = transformers.MBartForConditionalGeneration(cfg)
    model.eval()
    return model, cfg


def _batch(rng, b=3, te=10, td=6, vocab=99):
    enc = rng.integers(3, vocab, (b, te)).astype(np.int32)
    enc_mask = np.ones((b, te), np.int32)
    enc_mask[0, -4:] = 0  # padded row
    dec = rng.integers(3, vocab, (b, td)).astype(np.int32)
    dec[:, 0] = EOS  # decoder start
    dec[:, 1] = LANG
    return enc, enc_mask, dec


@pytest.mark.parametrize("scale_embedding", [True, False])
def test_mbart_logits_match_transformers(rng, scale_embedding):
    model, hf_cfg = _mk_hf(scale_embedding)
    cfg = mbart_config(hf_cfg)
    assert cfg.seq2seq_family == "bart"
    assert cfg.scale_embedding == scale_embedding
    assert cfg.n_layers == 2 and cfg.decoder_layers == 3
    params = convert_mbart(model.state_dict(), cfg)
    assert "logits_bias" not in params  # zeros buffer is dropped

    enc, enc_mask, dec = _batch(rng)
    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(enc.astype(np.int64)),
            attention_mask=torch.tensor(enc_mask.astype(np.int64)),
            decoder_input_ids=torch.tensor(dec.astype(np.int64)),
        ).logits.numpy()
    ours = np.asarray(
        bart.forward(
            params,
            cfg,
            {
                "input_ids": jnp.asarray(enc),
                "attention_mask": jnp.asarray(enc_mask),
                "decoder_input_ids": jnp.asarray(dec),
            },
        )
    )
    diff = np.abs(ours - hf_logits)
    assert diff.max() < 0.05, diff.max()  # bf16 matmul envelope


def test_mbart_conversion_exact_in_f32(rng, monkeypatch):
    """With bf16 matmuls disabled the converted model must reproduce HF
    logits to float rounding — the strict weight-layout gate."""
    from vietnamese_qa_system_tpu.models import layers

    monkeypatch.setattr(layers, "COMPUTE_DTYPE", jnp.float32)
    model, hf_cfg = _mk_hf()
    cfg = mbart_config(hf_cfg)
    params = convert_mbart(model.state_dict(), cfg)
    enc, enc_mask, dec = _batch(rng)
    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(enc.astype(np.int64)),
            attention_mask=torch.tensor(enc_mask.astype(np.int64)),
            decoder_input_ids=torch.tensor(dec.astype(np.int64)),
        ).logits.numpy()
    ours = np.asarray(
        bart.forward(
            params,
            cfg,
            {
                "input_ids": jnp.asarray(enc),
                "attention_mask": jnp.asarray(enc_mask),
                "decoder_input_ids": jnp.asarray(dec),
            },
        )
    )
    np.testing.assert_allclose(ours, hf_logits, atol=2e-3, rtol=1e-3)


def test_mbart_nonzero_logits_bias_imported(rng):
    """final_logits_bias is zeros in published checkpoints (and dropped);
    a genuinely nonzero buffer must be imported and applied."""
    model, hf_cfg = _mk_hf()
    with torch.no_grad():
        model.final_logits_bias.add_(
            torch.arange(hf_cfg.vocab_size, dtype=torch.float32)[None] * 0.01
        )
    cfg = mbart_config(hf_cfg)
    params = convert_mbart(model.state_dict(), cfg)
    assert "logits_bias" in params
    enc, enc_mask, dec = _batch(rng, b=2)
    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(enc.astype(np.int64)),
            attention_mask=torch.tensor(enc_mask.astype(np.int64)),
            decoder_input_ids=torch.tensor(dec.astype(np.int64)),
        ).logits.numpy()
    ours = np.asarray(
        bart.forward(
            params,
            cfg,
            {
                "input_ids": jnp.asarray(enc),
                "attention_mask": jnp.asarray(enc_mask),
                "decoder_input_ids": jnp.asarray(dec),
            },
        )
    )
    assert np.abs(ours - hf_logits).max() < 0.05


def test_mbart_cached_decode_matches_full(rng):
    """Step-by-step KV-cache decode must equal the full (uncached) pass —
    the learned-position +2 offset has to hold at per-step cursors."""
    model, hf_cfg = _mk_hf()
    cfg = mbart_config(hf_cfg)
    params = convert_mbart(model.state_dict(), cfg)
    enc, enc_mask, dec = _batch(rng, b=2)

    enc_out = bart.encode(params, cfg, jnp.asarray(enc), jnp.asarray(enc_mask))
    full = bart.decode(
        params, cfg, jnp.asarray(dec), enc_out, jnp.asarray(enc_mask)
    )

    total = dec.shape[1]
    cache = gen_mod._make_cache(cfg, 2, total, cfg.decoder_layers)
    cross_kv = bart.precompute_cross_kv(params, cfg, enc_out)
    jj = jnp.arange(total)[None, None, :]
    stepped = []
    for i in range(total):
        dec_mask = jnp.broadcast_to((jj <= i), (2, 1, total))
        logits, cache = bart.decode(
            params, cfg, jnp.asarray(dec[:, i : i + 1]), None,
            jnp.asarray(enc_mask), dec_mask,
            positions=jnp.full((2, 1), i, jnp.int32),
            cache=cache, cache_index=jnp.int32(i), cross_kv=cross_kv,
        )
        stepped.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(
        np.stack(stepped, axis=1), np.asarray(full), atol=0.05, rtol=0.05
    )


def test_mbart_greedy_generation_matches_transformers(rng):
    """Greedy decode with mBART's start convention: decoder starts at eos,
    the first produced token is FORCED to the language id (HF
    forced_bos_token_id) — stepwise logits must track HF's, and every
    HF-chosen token must be our argmax too (up to bf16 near-ties)."""
    model, hf_cfg = _mk_hf()
    cfg = mbart_config(hf_cfg)
    params = convert_mbart(model.state_dict(), cfg)
    enc, enc_mask, _ = _batch(rng, b=2)

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(enc.astype(np.int64)),
            attention_mask=torch.tensor(enc_mask.astype(np.int64)),
            max_new_tokens=8,
            do_sample=False,
            num_beams=1,
            forced_bos_token_id=LANG,
        ).numpy()

    # MBartConfig defaults forced_eos_token_id=2 — HF forces eos at the
    # last step; mirror it (GenerationConfig.forced_eos_token_id)
    ours = np.asarray(
        gen_mod.generate_seq2seq(
            params, cfg, jnp.asarray(enc), jnp.asarray(enc_mask),
            max_new_tokens=8, eos_id=EOS, bos_id=EOS, forced_bos_id=LANG,
            forced_eos_id=EOS,
        )
    )
    assert (ours[:, 0] == LANG).all()
    # hf_out[:, 0] is the decoder start (eos); compare generated streams
    # up to and including each row's first eos
    hf_gen = hf_out[:, 1:]
    for r in range(2):
        n = min(hf_gen.shape[1], ours.shape[1])
        for j in range(n):
            assert ours[r, j] == hf_gen[r, j], (r, j, hf_gen, ours)
            if hf_gen[r, j] == EOS:
                break


def test_mbart_beam_forced_bos(rng):
    """Beam search honours the forced language id on every beam."""
    model, hf_cfg = _mk_hf()
    cfg = mbart_config(hf_cfg)
    params = convert_mbart(model.state_dict(), cfg)
    enc, enc_mask, _ = _batch(rng, b=2)
    out = np.asarray(
        gen_mod.beam_search_seq2seq(
            params, cfg, jnp.asarray(enc), jnp.asarray(enc_mask),
            max_new_tokens=6, num_beams=3, eos_id=EOS, bos_id=EOS,
            forced_bos_id=LANG,
        )
    )
    assert (out[:, 0] == LANG).all()


def test_mbart_shift_matches_hf():
    """Our label rotation equals HF's mBART shift_tokens_right (the last
    non-pad token — the language id — wraps to decoder position 0)."""
    from transformers.models.mbart.modeling_mbart import shift_tokens_right

    labels = np.array(
        [[5, 6, 7, EOS, LANG, -100], [8, 9, EOS, LANG, -100, -100]],
        np.int64,
    )
    hf_in = np.where(labels == -100, PAD, labels)
    hf_shift = shift_tokens_right(torch.tensor(hf_in), PAD).numpy()
    ours = np.asarray(bart.shift_labels_mbart(jnp.asarray(labels), PAD))
    # HF wraps the last non-PAD token; ours wraps the last non-IGNORE
    # token — identical whenever -100 marks exactly the padding (the
    # collator convention, reference src/data/dataloader.py:397,406)
    np.testing.assert_array_equal(ours, hf_shift)


def test_mbart_loss_and_train_dispatch():
    """model_loss_fn + init_model_params dispatch on seq2seq_family='bart';
    loss is finite and grads flow to every leaf."""
    from vietnamese_qa_system_tpu.models.config import ModelConfig
    from vietnamese_qa_system_tpu.train.trainer import (
        init_model_params,
        model_loss_fn,
    )

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="bart", vocab_size=64, d_model=32,
        n_heads=4, n_layers=1, n_decoder_layers=1, d_ff=64,
        max_seq_len=32, positional="learned", scale_embedding=True,
        norm_eps=1e-5,
    )
    params = init_model_params(cfg, jax.random.key(0))
    assert "dec_pos_embed" in params  # bart family, not native/t5
    loss_fn = model_loss_fn(cfg)
    batch = {
        "input_ids": jnp.ones((2, 8), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "labels": jnp.where(
            jnp.arange(6)[None, :] < 4, jnp.ones((2, 6), jnp.int32), -100
        ),
    }
    (loss, n), grads = jax.value_and_grad(
        lambda p: loss_fn(p, batch=batch), has_aux=True
    )(params)
    assert np.isfinite(float(loss)) and int(n) == 8
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_mbart_lora_targets_apply():
    """LoRA pytree surgery reaches the bart dense leaves (q/v of self- and
    cross-attention) — the QLoRA-on-translator capability."""
    from vietnamese_qa_system_tpu.models.config import ModelConfig
    from vietnamese_qa_system_tpu.models.lora import (
        LoraConfig, init_lora, merge_lora,
    )

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="bart", vocab_size=64, d_model=32,
        n_heads=4, n_layers=1, n_decoder_layers=1, d_ff=64,
        max_seq_len=32, positional="learned", norm_eps=1e-5,
    )
    params = bart.init_bart(jax.random.key(0), cfg)
    lcfg = LoraConfig(r=2, targets=("wq", "wv"))
    adapter = init_lora(jax.random.key(1), params, lcfg)
    assert "a" in adapter["dec_blocks"][0]["attn"]["wq"]
    assert "a" in adapter["dec_blocks"][0]["cross_attn"]["wv"]
    merged = merge_lora(params, adapter, lcfg)
    np.testing.assert_allclose(
        np.asarray(merged["enc_blocks"][0]["attn"]["wq"]["w"]),
        np.asarray(params["enc_blocks"][0]["attn"]["wq"]["w"]),
    )


def test_mbart_load_seq2seq_auto(tmp_path):
    """load_seq2seq_auto dispatches model_type 'mbart' (the vinai model's
    architecture) next to t5/mt5."""
    from vietnamese_qa_system_tpu.models.convert_hf import load_seq2seq_auto

    model, _ = _mk_hf()
    d = str(tmp_path / "mbart")
    model.save_pretrained(d, safe_serialization=False)
    params, cfg = load_seq2seq_auto(d)
    assert cfg.seq2seq_family == "bart"
    assert cfg.max_seq_len == 64
    assert params["enc_pos_embed"].shape[0] == 64 + bart.POS_OFFSET


def test_mbart_scan_layers_rejected():
    from vietnamese_qa_system_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="bart", vocab_size=64, d_model=32,
        n_heads=4, n_layers=1, d_ff=64, max_seq_len=32, scan_layers=True,
    )
    with pytest.raises(ValueError, match="scan-over-layers"):
        bart.init_bart(jax.random.key(0), cfg)


def test_mbart_translator_backend():
    """Seq2SeqTranslator drives a bart-family model with mBART's start
    convention (bos=eos, forced language id), and strips the language tag
    from the decoded text — the reference's vinai en→vi path
    (data_parser.py:75-93) end to end on this framework."""
    from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
    from vietnamese_qa_system_tpu.etl.translate import (
        Seq2SeqTranslator, translate_texts,
    )
    from vietnamese_qa_system_tpu.models.config import ModelConfig

    tok = ByteTokenizer()
    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="bart", vocab_size=tok.vocab_size,
        d_model=32, n_heads=4, n_layers=1, n_decoder_layers=1, d_ff=64,
        max_seq_len=64, positional="learned", norm_eps=1e-5,
    )
    params = bart.init_bart(jax.random.key(0), cfg)
    lang_id = 3  # ByteTokenizer unk slot stands in for the language tag
    tr = Seq2SeqTranslator(
        params, cfg, tok, max_len=16, max_new_tokens=8,
        bos_id=tok.eos_id, forced_bos_id=lang_id,
    )
    out = translate_texts(
        ["hello", "world", "xin chao"], tr, chunk_size=2, max_workers=2
    )
    assert len(out) == 3
    assert all(isinstance(s, str) for s in out)
