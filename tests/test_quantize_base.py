"""Quantized-base (QLoRA-class) tests: round-trip accuracy, dequant-in-dense,
LoRA-over-quantized convergence vs the bf16 base, sharded step, export.

Parity target: the reference's BitsAndBytesConfig QLoRA path
(reference src/models/trainer.py:470-487,590-605).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.models import (
    LoraConfig,
    dequantize_tree,
    dequantize_weight,
    init_lora,
    merge_lora,
    quantize_dense_tree,
    quantize_weight,
    tiny_test,
    tree_bytes,
    causal_lm,
)
from vietnamese_qa_system_tpu.models.layers import dense, init_dense
from vietnamese_qa_system_tpu.train import TrainConfig, Trainer, perplexity_eval


@pytest.mark.parametrize("mode,tol", [("int8", 0.01), ("nf4", 0.15)])
def test_weight_roundtrip(rng, mode, tol):
    w = rng.standard_normal((128, 96)).astype(np.float32) * 0.05
    q = quantize_weight(jnp.asarray(w), mode)
    w2 = np.asarray(dequantize_weight(q, jnp.float32))
    assert w2.shape == w.shape
    err = np.abs(w2 - w).max() / np.abs(w).max()
    assert err <= tol, f"{mode} relative error {err}"


def test_nf4_packs_two_codes_per_byte(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    q = quantize_weight(jnp.asarray(w), "nf4")
    assert q["w_q"].dtype == jnp.uint8 and q["w_q"].shape == (32, 32)


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_dense_matches_float_base(rng, mode):
    p = init_dense(jax.random.key(0), 64, 48)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    y_ref = np.asarray(dense(p, x))
    qp = {"b": p["b"], **quantize_weight(p["w"], mode)}
    y_q = np.asarray(dense(qp, x))
    tol = 0.02 if mode == "int8" else 0.12
    denom = np.abs(y_ref).max()
    assert np.abs(y_q - y_ref).max() / denom <= tol


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_qlora_converges_close_to_bf16_base(tmp_path, mode):
    """LoRA over a quantized base must reach an eval loss close to LoRA
    over the bf16 base on the tiny memorization task, with the dense
    weights at least 2x (int8) / 3.5x (nf4) smaller than f32."""
    from tests.test_trainer import _toy_batches

    model = tiny_test("causal")
    base = dict(
        model=model,
        lora=LoraConfig(r=8),
        lr=5e-3,
        epochs=8,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
    )
    batches = _toy_batches(model.vocab_size)

    t_f = Trainer(TrainConfig(**base), total_steps=48)
    t_f.fit(batches)
    loss_f = perplexity_eval(t_f.merged_params(), model, batches())["eval_loss"]

    t_q = Trainer(TrainConfig(**base, quantize_base=mode), total_steps=48)
    # memory win on the quantized dense weights
    f32_bytes = tree_bytes(t_f.state["params"])
    q_bytes = tree_bytes(t_q.state["params"])
    min_ratio = 1.7 if mode == "int8" else 2.2  # embeddings stay float
    assert f32_bytes / q_bytes >= min_ratio, (f32_bytes, q_bytes)
    t_q.fit(batches)
    loss_q = perplexity_eval(t_q.merged_params(), model, batches())["eval_loss"]
    assert loss_q <= loss_f + 0.35, (loss_q, loss_f)
    # and training actually helped over the untrained quantized base
    t_0 = Trainer(TrainConfig(**base, quantize_base=mode), total_steps=48)
    loss_0 = perplexity_eval(t_0.merged_params(), model, batches())["eval_loss"]
    assert loss_q < loss_0 - 0.3, (loss_q, loss_0)


@pytest.mark.parametrize("dequant", ["once", "once_folded"])
def test_qlora_dequant_once_matches_fused(tmp_path, dequant):
    """qlora_dequant="once"/"once_folded" (dequantize the base before
    the forward, trainer.py) must train to the same place as the default
    fused per-matmul dequant: same math, different schedule — the only
    numeric difference is where the LoRA delta meets bf16 rounding."""
    from tests.test_trainer import _toy_batches

    model = tiny_test("causal")
    base = dict(
        model=model,
        lora=LoraConfig(r=8),
        lr=5e-3,
        epochs=4,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
        quantize_base="nf4",
    )
    batches = _toy_batches(model.vocab_size)

    t_fused = Trainer(TrainConfig(**base), total_steps=24)
    t_fused.fit(batches)
    t_once = Trainer(TrainConfig(**base, qlora_dequant=dequant), total_steps=24)
    t_once.fit(batches)

    loss_fused = perplexity_eval(
        t_fused.merged_params(), model, batches()
    )["eval_loss"]
    loss_once = perplexity_eval(
        t_once.merged_params(), model, batches()
    )["eval_loss"]
    assert abs(loss_once - loss_fused) <= 0.1, (loss_once, loss_fused)
    # adapters follow the same trajectory leaf-by-leaf
    for a, b in zip(
        jax.tree.leaves(t_fused.state["adapter"]),
        jax.tree.leaves(t_once.state["adapter"]),
    ):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom <= 0.25


def test_quantize_base_requires_lora(tmp_path):
    with pytest.raises(ValueError, match="quantize_base requires LoRA"):
        Trainer(
            TrainConfig(
                model=tiny_test("causal"),
                quantize_base="nf4",
                log_dir=str(tmp_path),
                mesh_axes={"data": 1},
            ),
            total_steps=1,
        )


@pytest.mark.parametrize("mode", ["int8", "nf4-dq"])
def test_qlora_sharded_step_fsdp_tp(tmp_path, mode):
    """One real QLoRA train step with a quantized base sharded over the
    2x4 mesh (column/row-parallel w_q/w_s/s_q TP rules + auto-fsdp)."""
    model = tiny_test("causal")
    cfg = TrainConfig(
        model=model,
        lora=LoraConfig(r=4),
        quantize_base=mode,
        strategy="fsdp_tp",
        mesh_axes={"data": 2, "model": 4},
        log_dir=str(tmp_path),
    )
    trainer = Trainer(cfg, total_steps=2)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, model.vocab_size, (4, 16)).astype(np.int32)

    def batches():
        for _ in range(2):
            yield {
                "input_ids": ids,
                "attention_mask": np.ones_like(ids),
                "labels": ids,
            }

    state = trainer.fit(batches)
    assert int(state["step"]) == 2
    for leaf in jax.tree.leaves(state["adapter"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_dequantize_tree_export(rng):
    """Export path: dequantize_tree folds the adapter back into float
    weights; logits match the quantized+lazy-LoRA forward."""
    model = tiny_test("causal")
    params = causal_lm.init_causal_lm(jax.random.key(0), model)
    qparams = quantize_dense_tree(params, "int8")
    lcfg = LoraConfig(r=4)
    adapter = init_lora(jax.random.key(1), qparams, lcfg)
    # nudge the adapter off its zero init so the fold is non-trivial
    adapter = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.key(2), x.shape),
        adapter,
    )
    merged_q = merge_lora(qparams, adapter, lcfg)
    exported = dequantize_tree(merged_q)
    for leaf in jax.tree.leaves(exported):
        assert leaf.dtype != jnp.int8 and leaf.dtype != jnp.uint8
    ids = jnp.asarray(rng.integers(1, model.vocab_size, (2, 12)), jnp.int32)
    mask = jnp.ones_like(ids)
    lq = np.asarray(causal_lm.forward(merged_q, model, ids, mask))
    le = np.asarray(causal_lm.forward(exported, model, ids, mask))
    np.testing.assert_allclose(lq, le, atol=0.05, rtol=0.05)


def test_nf4_searchsorted_codes_match_argmin(rng):
    """The O(1)-memory midpoint-searchsorted nf4 coder must agree with the
    naive argmin-over-levels assignment (the definitionally-nearest code)."""
    from vietnamese_qa_system_tpu.models.quantize import NF4_LEVELS

    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.07
    q = quantize_weight(jnp.asarray(w), "nf4", block=32)
    lo = np.asarray(q["w_q"] & 0xF)
    hi = np.asarray(q["w_q"] >> 4)
    codes = np.stack([lo, hi], axis=1).reshape(64, 32)
    wb = w.reshape(2, 32, 32)
    absmax = np.maximum(np.abs(wb).max(axis=1), 1e-12)
    normed = (wb / absmax[:, None, :]).reshape(64, 32)
    ref = np.argmin(
        np.abs(normed[..., None] - np.asarray(NF4_LEVELS)), axis=-1
    )
    np.testing.assert_array_equal(codes, ref)


@pytest.mark.parametrize("mode", ["int8", "nf4", "nf4-dq"])
def test_dequantize_stacked_leaf_matches_per_layer(rng, mode):
    """The flat-reshape stacked dequant must reconstruct each layer
    identically to the 2-D per-layer path (pack-pairs and scale blocks
    align with layer boundaries; tolerance only for XLA fusion-order
    float noise, measured ~1e-8)."""
    w = rng.standard_normal((3, 64, 32)).astype(np.float32) * 0.05
    q3 = quantize_weight(jnp.asarray(w), mode, block=32)
    w3 = np.asarray(dequantize_weight(q3, jnp.float32))
    assert w3.shape == w.shape
    for layer in range(3):
        q2 = quantize_weight(jnp.asarray(w[layer]), mode, block=32)
        w2 = np.asarray(dequantize_weight(q2, jnp.float32))
        np.testing.assert_allclose(w3[layer], w2, atol=1e-7)


def test_quantize_stacked_leaf_matches_per_layer(rng):
    """A 3-D scan-stacked leaf must quantize each layer exactly as the 2-D
    path would (lax.map over layers, not a transient-hungry vmap)."""
    w = rng.standard_normal((3, 64, 32)).astype(np.float32) * 0.05
    q3 = quantize_weight(jnp.asarray(w), "nf4", block=32)
    for layer in range(3):
        q2 = quantize_weight(jnp.asarray(w[layer]), "nf4", block=32)
        np.testing.assert_array_equal(np.asarray(q3["w_q"][layer]), np.asarray(q2["w_q"]))
        np.testing.assert_allclose(np.asarray(q3["w_s"][layer]), np.asarray(q2["w_s"]))


@pytest.mark.parametrize("mode,tol", [("int8", 0.05), ("nf4", 0.35)])
def test_quantized_inference_generate(rng, mode, tol):
    """Serving with a quantized base (cli chat/serve --quantize): forward
    logits stay close to the float base and scan-based generation runs —
    dequant-at-use halves (int8) / quarters (nf4) the weight bytes streamed
    per decoded token, the decode bottleneck at small batch."""
    from vietnamese_qa_system_tpu.models import generate as gen_mod

    cfg = tiny_test("causal")
    params = causal_lm.init_causal_lm(jax.random.key(0), cfg)
    q = quantize_dense_tree(params, mode)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    lf = np.asarray(causal_lm.forward(params, cfg, ids, mask))
    lq = np.asarray(causal_lm.forward(q, cfg, ids, mask))
    assert np.abs(lq - lf).max() / np.abs(lf).max() <= tol
    out = np.asarray(gen_mod.generate(q, cfg, ids, mask, max_new_tokens=4))
    assert out.shape == (2, 12)
    assert tree_bytes(q) < tree_bytes(params)


def test_double_quant_roundtrip_and_bytes(rng):
    """nf4-dq (bnb_4bit_use_double_quant capability): reconstruction stays
    close to plain nf4 while the stored scale plane shrinks ~4x (int8
    codes + one (offset, step) f32 pair per block-row)."""
    w = rng.standard_normal((256, 96)).astype(np.float32) * 0.05
    q = quantize_weight(jnp.asarray(w), "nf4")
    qd = quantize_weight(jnp.asarray(w), "nf4-dq")
    assert "w_s" not in qd and qd["s_q"].dtype == jnp.int8
    w_nf4 = np.asarray(dequantize_weight(q, jnp.float32))
    w_dq = np.asarray(dequantize_weight(qd, jnp.float32))
    # second-level quantization noise must be small vs first-level noise
    assert np.abs(w_dq - w_nf4).max() <= 0.05 * np.abs(w).max()
    err = np.abs(w_dq - w).max() / np.abs(w).max()
    assert err <= 0.2
    scale_bytes = lambda leaf: sum(
        np.asarray(v).size * np.asarray(v).dtype.itemsize
        for k, v in leaf.items() if k != "w_q"
    )
    assert scale_bytes(qd) < 0.5 * scale_bytes(q)


def test_double_quant_tree_and_generate(rng):
    """A full nf4-dq model forwards, generates, and is smaller than nf4."""
    from vietnamese_qa_system_tpu.models import generate as gen_mod

    cfg = tiny_test("causal")
    params = causal_lm.init_causal_lm(jax.random.key(0), cfg)
    q = quantize_dense_tree(params, "nf4")
    qd = quantize_dense_tree(params, "nf4-dq")
    assert tree_bytes(qd) < tree_bytes(q) < tree_bytes(params)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    lq = np.asarray(causal_lm.forward(q, cfg, ids, mask))
    ld = np.asarray(causal_lm.forward(qd, cfg, ids, mask))
    assert np.abs(ld - lq).max() / max(np.abs(lq).max(), 1e-9) <= 0.1
    out = np.asarray(gen_mod.generate(qd, cfg, ids, mask, max_new_tokens=4))
    assert out.shape == (2, 12)
    # export folds both quantization levels back to float
    exported = dequantize_tree(qd)
    le = np.asarray(causal_lm.forward(exported, cfg, ids, mask))
    np.testing.assert_allclose(ld, le, atol=0.05, rtol=0.05)


def test_double_quant_stacked_matches_per_layer(rng):
    """3-D scan-stacked nf4-dq leaves quantize layer-by-layer identically
    to the 2-D path (same guarantee as plain nf4)."""
    w = rng.standard_normal((3, 64, 32)).astype(np.float32) * 0.05
    q3 = quantize_weight(jnp.asarray(w), "nf4-dq", block=32)
    for layer in range(3):
        q2 = quantize_weight(jnp.asarray(w[layer]), "nf4-dq", block=32)
        for k in ("w_q", "s_q", "s_s", "s_m"):
            np.testing.assert_array_equal(
                np.asarray(q3[k][layer]), np.asarray(q2[k])
            )
    w3 = np.asarray(dequantize_weight(q3, jnp.float32))
    assert w3.shape == w.shape


def test_pick_block_never_degenerates_to_one():
    """A non-power-of-two block request (96 on d_in=128) used to walk
    96->48->24->12->6->3->1 and return 1 — one scale per ELEMENT, nf4
    codes collapsed to sign bits.  It must land on 64 instead."""
    from vietnamese_qa_system_tpu.models.quantize import (
        _pick_block, dequantize_weight, quantize_weight,
    )

    assert _pick_block(128, 96) == 64
    assert _pick_block(128, 64) == 64
    assert _pick_block(6, 64) == 2
    with pytest.raises(ValueError):
        _pick_block(127, 64)  # odd d_in: nf4 packs pairs along d_in

    w = jax.random.normal(jax.random.key(0), (128, 32), jnp.float32)
    q = quantize_weight(w, "nf4", block=96)
    deq = dequantize_weight(q, w.dtype)
    # nf4 at block 64 reconstructs to a few percent; the degenerate
    # per-element path had ~40% error (sign * absmax only)
    rel = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
    assert rel < 0.1


def test_int8c_outlier_channel_tradeoff(rng):
    """int8c carries ONE scale per output channel spanning all of d_in —
    an outlier INPUT channel (large row, the LLM.int8 failure mode that
    bitsandbytes handles with a fp16 outlier split) inflates every
    column's absmax and coarsens the whole weight.  Blockwise int8
    confines the damage to the 64-row block holding the outlier.  This
    pins the tradeoff the CLI help warns about: int8c error grows on
    outlier weights but stays bounded; blockwise int8 barely moves."""
    w = rng.normal(size=(256, 128)).astype(np.float32)
    w_out = w.copy()
    w_out[17] *= 12.0  # one outlier input channel, 12x typical magnitude
    errs = {}
    for mode in ("int8", "int8c"):
        for name, arr in (("clean", w), ("outlier", w_out)):
            q = quantize_weight(jnp.asarray(arr), mode)
            deq = np.asarray(dequantize_weight(q, jnp.float32))
            mask = np.ones(256, bool)
            mask[17] = False  # error on the NON-outlier entries
            num = np.linalg.norm(deq[mask] - arr[mask])
            errs[mode, name] = num / np.linalg.norm(arr[mask])
    # clean Gaussian weights: both modes reconstruct to well under 1%
    assert errs["int8", "clean"] < 0.01
    assert errs["int8c", "clean"] < 0.01
    # outlier row: blockwise int8 is insulated — only the one 64-row
    # block holding row 17 quantizes at the 12x-coarser step, so rms
    # error grows by ~sqrt(block/d_in) = 1/2 of int8c's...
    assert errs["int8", "outlier"] < 0.02
    # ...while int8c's single scale coarsens EVERY row: error is
    # ~sqrt(d_in/block) = 2x blockwise int8 (the documented tradeoff),
    # bounded by outlier_mag/127 ~ 9%
    assert errs["int8c", "outlier"] > 1.5 * errs["int8", "outlier"]
    assert errs["int8c", "outlier"] < 0.09


def test_flagship_proj_bf16_int8_matches_full(tmp_path):
    """The round-5 flagship training config (int8 base + scan-layers +
    remat_policy="proj_bf16", 68% MFU on PhoGPT-4B) must train to the
    same place as the same model under classic full per-layer remat:
    the policy changes WHAT the backward saves (bf16-rounded projection
    outputs), not the math beyond bf16 rounding."""
    import dataclasses

    from tests.test_trainer import _toy_batches

    model = dataclasses.replace(
        tiny_test("causal"), scan_layers=True, remat_policy="full"
    )
    base = dict(
        lora=LoraConfig(r=8),
        lr=5e-3,
        epochs=4,
        log_dir=str(tmp_path),
        mesh_axes={"data": 1},
        quantize_base="int8",
    )
    batches = _toy_batches(model.vocab_size)

    t_full = Trainer(TrainConfig(model=model, **base), total_steps=24)
    t_full.fit(batches)
    model_pb = dataclasses.replace(model, remat_policy="proj_bf16")
    t_pb = Trainer(TrainConfig(model=model_pb, **base), total_steps=24)
    t_pb.fit(batches)

    loss_full = perplexity_eval(
        t_full.merged_params(), model, batches()
    )["eval_loss"]
    loss_pb = perplexity_eval(
        t_pb.merged_params(), model_pb, batches()
    )["eval_loss"]
    assert abs(loss_pb - loss_full) <= 0.1, (loss_pb, loss_full)
    for a, b in zip(
        jax.tree.leaves(t_full.state["adapter"]),
        jax.tree.leaves(t_pb.state["adapter"]),
    ):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom <= 0.25
