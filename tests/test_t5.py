"""T5/mT5 family: HF import parity + generation + training plumbing.

The reference fine-tunes mt5 with LoRA (reference src/test.py:106-147) and
loads any AutoModelForSeq2SeqLM (reference src/models/trainer.py:536-544);
these tests check our models/t5.py reproduces transformers outputs from
randomly initialized local checkpoints (no network, same harness as the
BERT/MPNet/llama parity tests).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from vietnamese_qa_system_tpu.models import generate as gen_mod
from vietnamese_qa_system_tpu.models import t5
from vietnamese_qa_system_tpu.models.convert_hf import convert_t5, t5_config


def _mk_hf(gated: bool, tied: bool):
    cfg = transformers.T5Config(
        vocab_size=99,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_decoder_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=32,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tied,
        dropout_rate=0.0,
        decoder_start_token_id=0,
        pad_token_id=0,
        eos_token_id=1,
    )
    torch.manual_seed(0)
    model = transformers.T5ForConditionalGeneration(cfg)
    model.eval()
    return model, cfg


def _batch(rng, b=3, te=12, td=7, vocab=99):
    enc = rng.integers(2, vocab, (b, te)).astype(np.int32)
    enc_mask = np.ones((b, te), np.int32)
    enc_mask[0, -4:] = 0  # padded row
    dec = rng.integers(2, vocab, (b, td)).astype(np.int32)
    dec[:, 0] = 0  # decoder start token
    return enc, enc_mask, dec


@pytest.mark.parametrize("gated,tied", [(True, False), (False, True)])
def test_t5_logits_match_transformers(rng, gated, tied):
    """mt5-style (gated-gelu, untied, d_kv != d_model/heads) and t5-v1.0
    style (relu, tied head with the d_model**-0.5 logit scaling)."""
    model, hf_cfg = _mk_hf(gated, tied)
    cfg = t5_config(hf_cfg)
    assert cfg.mlp_gated == gated and cfg.tie_embeddings == tied
    assert cfg.head_dim == 16  # d_kv, not d_model // n_heads
    params = convert_t5(model.state_dict(), cfg)

    enc, enc_mask, dec = _batch(rng)
    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(enc.astype(np.int64)),
            attention_mask=torch.tensor(enc_mask.astype(np.int64)),
            decoder_input_ids=torch.tensor(dec.astype(np.int64)),
        ).logits.numpy()

    ours = np.asarray(
        t5.forward(
            params,
            cfg,
            {
                "input_ids": jnp.asarray(enc),
                "attention_mask": jnp.asarray(enc_mask),
                "decoder_input_ids": jnp.asarray(dec),
            },
        )
    )
    # T5 attention is UNSCALED, so score magnitudes (and bf16 matmul noise)
    # run larger than in the scaled families; a handful of tail elements
    # can drift ~0.2 on logits of magnitude ~15.  The STRICT layout gate is
    # test_t5_conversion_exact_in_f32; here gate the bf16 noise envelope.
    diff = np.abs(ours - hf_logits)
    assert np.quantile(diff, 0.995) < 0.3, np.quantile(diff, 0.995)
    assert diff.max() < 1.0, diff.max()


@pytest.mark.parametrize("gated,tied", [(True, False), (False, True)])
def test_t5_conversion_exact_in_f32(rng, monkeypatch, gated, tied):
    """With bf16 matmuls disabled the converted model must reproduce HF
    logits to float rounding — this is the strict weight-layout gate."""
    from vietnamese_qa_system_tpu.models import layers

    monkeypatch.setattr(layers, "COMPUTE_DTYPE", jnp.float32)
    model, hf_cfg = _mk_hf(gated, tied)
    cfg = t5_config(hf_cfg)
    params = convert_t5(model.state_dict(), cfg)
    enc, enc_mask, dec = _batch(rng)
    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(enc.astype(np.int64)),
            attention_mask=torch.tensor(enc_mask.astype(np.int64)),
            decoder_input_ids=torch.tensor(dec.astype(np.int64)),
        ).logits.numpy()
    ours = np.asarray(
        t5.forward(
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


def test_t5_cached_decode_matches_full(rng):
    """Step-by-step KV-cache decode must equal the full (uncached) pass —
    the relative bias row per step has to match the full (T, T) table."""
    model, hf_cfg = _mk_hf(True, False)
    cfg = t5_config(hf_cfg)
    params = convert_t5(model.state_dict(), cfg)
    enc, enc_mask, dec = _batch(rng, b=2, td=6)

    enc_out = t5.encode(params, cfg, jnp.asarray(enc), jnp.asarray(enc_mask))
    full = t5.decode(
        params, cfg, jnp.asarray(dec), enc_out, jnp.asarray(enc_mask)
    )

    total = dec.shape[1]
    cache = gen_mod._make_cache(cfg, 2, total, cfg.decoder_layers)
    jj = jnp.arange(total)[None, None, :]
    stepped = []
    for i in range(total):
        dec_mask = jnp.broadcast_to((jj <= i), (2, 1, total))
        logits, cache = t5.decode(
            params, cfg, jnp.asarray(dec[:, i : i + 1]), enc_out,
            jnp.asarray(enc_mask), dec_mask,
            cache=cache, cache_index=jnp.int32(i),
        )
        stepped.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(
        np.stack(stepped, axis=1), np.asarray(full), atol=0.1, rtol=0.05
    )


def test_t5_greedy_generation_matches_transformers(rng):
    model, hf_cfg = _mk_hf(True, False)
    cfg = t5_config(hf_cfg)
    params = convert_t5(model.state_dict(), cfg)
    enc, enc_mask, _ = _batch(rng, b=2)

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(enc.astype(np.int64)),
            attention_mask=torch.tensor(enc_mask.astype(np.int64)),
            max_new_tokens=8,
            do_sample=False,
            num_beams=1,
        ).numpy()

    ours = np.asarray(
        gen_mod.generate_seq2seq(
            params, cfg, jnp.asarray(enc), jnp.asarray(enc_mask),
            max_new_tokens=8, eos_id=1,
        )
    )
    # HF prepends the decoder start token; compare generated tokens.
    # After HF stops at EOS it pads; our convention repeats eos_id — compare
    # up to and including the first EOS per row.
    for r in range(2):
        hf_row = hf_out[r, 1:]
        our_row = ours[r]
        n = min(len(hf_row), len(our_row))
        for j in range(n):
            assert our_row[j] == hf_row[j]
            if hf_row[j] == 1:
                break


def test_t5_loss_and_train_dispatch():
    """model_loss_fn + init_model dispatch on seq2seq_family; loss is
    finite and grads flow to every leaf."""
    from vietnamese_qa_system_tpu.models.config import ModelConfig
    from vietnamese_qa_system_tpu.train.trainer import (
        init_model_params,
        model_loss_fn,
    )

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=64, d_model=32,
        n_heads=2, d_kv=8, n_layers=1, n_decoder_layers=1, d_ff=64,
        mlp_gated=True, tie_embeddings=False, relative_attention_buckets=8,
        relative_attention_max_distance=16, attention_bias=False,
    )
    params = init_model_params(cfg, jax.random.key(0))
    assert "dec_rel_bias" in params  # t5 family, not the native stack
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


def test_t5_lora_targets_apply(rng):
    """LoRA pytree surgery reaches the t5 dense leaves (q/v of self- and
    cross-attention, FFN) — the reference's mt5+LoRA capability."""
    from vietnamese_qa_system_tpu.models.config import ModelConfig
    from vietnamese_qa_system_tpu.models.lora import (
        LoraConfig, init_lora, merge_lora,
    )

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=64, d_model=32,
        n_heads=2, d_kv=8, n_layers=1, n_decoder_layers=1, d_ff=64,
        mlp_gated=True, tie_embeddings=False, relative_attention_buckets=8,
        attention_bias=False,
    )
    params = t5.init_t5(jax.random.key(0), cfg)
    lcfg = LoraConfig(r=2, targets=("wq", "wv"))
    adapter = init_lora(jax.random.key(1), params, lcfg)
    assert "a" in adapter["dec_blocks"][0]["attn"]["wq"]
    assert "a" in adapter["dec_blocks"][0]["cross_attn"]["wv"]
    merged = merge_lora(params, adapter, lcfg)
    # B=0 init => merged == base
    np.testing.assert_allclose(
        np.asarray(merged["enc_blocks"][0]["attn"]["wq"]["w"]),
        np.asarray(params["enc_blocks"][0]["attn"]["wq"]["w"]),
    )


def test_t5_export_roundtrip(tmp_path):
    """params -> HF dir -> transformers load -> logits match the source
    model (seq2seq side of the --convert_cpkt capability)."""
    model, hf_cfg = _mk_hf(True, False)
    cfg = t5_config(hf_cfg)
    params = convert_t5(model.state_dict(), cfg)

    from vietnamese_qa_system_tpu.models.convert_hf import export_t5

    d = str(tmp_path / "exported")
    export_t5(params, cfg, d)
    reloaded = transformers.T5ForConditionalGeneration.from_pretrained(d)
    reloaded.eval()

    ids = torch.arange(10).remainder(98).reshape(2, 5) + 1
    dec = torch.zeros((2, 3), dtype=torch.long)
    with torch.no_grad():
        l1 = model(input_ids=ids, decoder_input_ids=dec).logits.numpy()
        l2 = reloaded(input_ids=ids, decoder_input_ids=dec).logits.numpy()
    np.testing.assert_allclose(l1, l2, atol=1e-4)


@pytest.mark.parametrize(
    "strategy,axes",
    [("fsdp", {"data": 8}), ("tp", {"model": 8})],
)
def test_t5_sharded_train_step(tmp_path, strategy, axes):
    """T5-family training under the sharded strategies on the fake
    8-device mesh (the reference's mt5 fine-tune ran under accelerate
    strategies; here the same pytree rules cover the t5 leaf names)."""
    from vietnamese_qa_system_tpu.models.config import ModelConfig
    from vietnamese_qa_system_tpu.train import TrainConfig, Trainer

    mcfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=64, d_model=32,
        n_heads=2, d_kv=16, n_layers=1, n_decoder_layers=1, d_ff=64,
        mlp_gated=True, tie_embeddings=False, relative_attention_buckets=8,
        attention_bias=False,
    )
    cfg = TrainConfig(
        model=mcfg, lr=1e-3, epochs=1, strategy=strategy, mesh_axes=axes,
        grad_accum=1, log_dir=str(tmp_path),
    )
    trainer = Trainer(cfg, total_steps=2)
    rng_np = np.random.default_rng(0)

    def batches():
        for _ in range(2):
            yield {
                "input_ids": rng_np.integers(2, 64, (8, 12)).astype(np.int32),
                "attention_mask": np.ones((8, 12), np.int32),
                "labels": rng_np.integers(2, 64, (8, 8)).astype(np.int32),
            }

    state = trainer.fit(batches)
    assert int(state["step"]) == 2
    assert all(
        np.isfinite(np.asarray(x)).all()
        for x in jax.tree.leaves(state["params"])
    )


def test_t5_quantized_base(rng):
    """QLoRA-style int8 base over the t5 pytree: quantized forward stays
    close to the f32 base (the reference quantizes whatever model the
    task loads, including its mt5 experiments)."""
    from vietnamese_qa_system_tpu.models.quantize import quantize_dense_tree

    model, hf_cfg = _mk_hf(True, False)
    cfg = t5_config(hf_cfg)
    params = convert_t5(model.state_dict(), cfg)
    qparams = quantize_dense_tree(params, mode="int8")
    enc, enc_mask, dec = _batch(rng, b=2)
    batch = {
        "input_ids": jnp.asarray(enc),
        "attention_mask": jnp.asarray(enc_mask),
        "decoder_input_ids": jnp.asarray(dec),
    }
    base = np.asarray(t5.forward(params, cfg, batch))
    quant = np.asarray(t5.forward(qparams, cfg, batch))
    # int8 block quant noise on top of bf16; logits magnitude ~15
    assert np.quantile(np.abs(base - quant), 0.99) < 1.0
    # ranking preserved for the argmax token on most positions
    agree = np.mean(base.argmax(-1) == quant.argmax(-1))
    assert agree > 0.9, agree


def test_t5_flash_matches_dense():
    """Flash-enabled T5 (fused relative-bias attention in encoder and
    decoder self-attention) must match the dense path at T >= 256, with
    right padding on both sides."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vietnamese_qa_system_tpu.models import t5
    from vietnamese_qa_system_tpu.models.config import ModelConfig

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=128, d_model=64,
        n_heads=4, d_kv=16, n_layers=2, n_decoder_layers=2, d_ff=128,
        max_seq_len=512, mlp_gated=True, tie_embeddings=False,
        relative_attention_buckets=8, relative_attention_max_distance=32,
        attention_bias=False,
    )
    params = t5.init_t5(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    B, TE, TD = 2, 256, 256
    enc_ids = jnp.asarray(rng.integers(1, 128, (B, TE)), jnp.int32)
    enc_mask = jnp.ones((B, TE), jnp.int32).at[1, 200:].set(0)
    dec_ids = jnp.asarray(rng.integers(1, 128, (B, TD)), jnp.int32)
    dec_mask = jnp.ones((B, TD), jnp.int32).at[1, 180:].set(0)

    batch = {
        "input_ids": enc_ids, "attention_mask": enc_mask,
        "decoder_input_ids": dec_ids, "decoder_attention_mask": dec_mask,
    }
    l_dense = t5.forward(params, cfg, batch)
    cfg_f = dataclasses.replace(cfg, use_flash_attention=True)
    l_flash = t5.forward(params, cfg_f, batch)
    # compare only valid decoder positions (padded rows differ under mask)
    np.testing.assert_allclose(
        np.asarray(l_dense[:, :180]), np.asarray(l_flash[:, :180]),
        atol=0.1, rtol=0.05,
    )

    # grads w.r.t. attention projections agree (bias tables excluded: the
    # fused path deliberately zeroes their cotangent)
    def loss(w, cfg):
        p = jax.tree_util.tree_map(lambda x: x, params)
        p["dec_blocks"][0]["attn"]["wq"]["w"] = w
        batch2 = dict(batch, labels=dec_ids)
        return t5.loss_fn(p, cfg, batch2)[0]

    w0 = params["dec_blocks"][0]["attn"]["wq"]["w"]
    g_dense = jax.grad(loss)(w0, cfg)
    g_flash = jax.grad(loss)(w0, cfg_f)
    np.testing.assert_allclose(
        np.asarray(g_dense), np.asarray(g_flash), atol=5e-3, rtol=5e-2
    )


def test_full_ft_flash_bias_guard():
    """Trainer refuses full fine-tuning of a relative-bias family with
    flash attention on (the fused kernel freezes the bias tables)."""
    import dataclasses

    import pytest

    from vietnamese_qa_system_tpu.models.config import ModelConfig
    from vietnamese_qa_system_tpu.train.trainer import Trainer, TrainConfig

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=64, d_model=32,
        n_heads=2, d_kv=16, n_layers=1, n_decoder_layers=1, d_ff=64,
        max_seq_len=128, relative_attention_buckets=8,
        use_flash_attention=True,
    )
    with pytest.raises(ValueError, match="bias"):
        Trainer(TrainConfig(model=cfg))
