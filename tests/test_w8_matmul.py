"""w8 GEMM kernel (ops/w8_matmul.py) + int8c quantization mode: the
weight-only-quant serving path.  Parity target: bitsandbytes
load_in_8bit serving (reference src/models/trainer.py:470-487) — here
the int8 weight streams from HBM at byte rate with the per-column scale
folded after the MXU contraction, instead of materializing a dequantized
copy per step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.models import causal_lm, quantize_dense_tree
from vietnamese_qa_system_tpu.models.config import ModelConfig
from vietnamese_qa_system_tpu.models.layers import dense, init_dense
from vietnamese_qa_system_tpu.models.quantize import (
    dequantize_weight, quantize_weight,
)
from vietnamese_qa_system_tpu.ops.w8_matmul import (
    supports, w8_matmul, w8_matmul_reference,
)


def _mk(rng, k, n):
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    s = (np.abs(w).max(axis=0) / 127.0).astype(np.float32)
    q = np.clip(np.round(w / s[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s)


@pytest.mark.parametrize("m,k,n", [(8, 512, 640), (1, 256, 128),
                                   (37, 384, 1280), (256, 128, 256)])
def test_kernel_matches_oracle(rng, m, k, n):
    q, s = _mk(rng, k, n)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    y = np.asarray(w8_matmul(x, q, s, out_dtype=jnp.float32))
    yr = np.asarray(w8_matmul_reference(x, q, s, jnp.float32))
    assert y.shape == (m, n)
    denom = np.abs(yr).max()
    assert np.abs(y - yr).max() / denom <= 0.01


def test_supports_gating():
    assert supports(8, 512, 640)
    assert not supports(512, 512, 640)     # too many rows
    assert not supports(8, 100, 640)       # K not 128-divisible
    assert not supports(8, 512, 200)       # N not 128-divisible
    with pytest.raises(ValueError, match="divisible"):
        w8_matmul(jnp.zeros((8, 100), jnp.bfloat16),
                  jnp.zeros((100, 640), jnp.int8), jnp.ones((640,)))


def test_int8c_quantize_layout(rng):
    """mode="int8c" -> ONE scale row per output channel, any d_in (5632
    = 512*11 has no power-of-two block of its own size)."""
    for d_in in (256, 5632):
        w = rng.standard_normal((d_in, 96)).astype(np.float32) * 0.05
        leaf = quantize_weight(jnp.asarray(w), "int8c")
        assert leaf["w_s"].shape == (1, 96)
        w2 = np.asarray(dequantize_weight(leaf, jnp.float32))
        err = np.abs(w2 - w).max() / np.abs(w).max()
        assert err <= 0.02, err


def test_dense_routes_to_kernel_and_matches(rng):
    """dense() on an int8c leaf must take the kernel at decode row
    counts and the XLA path at training row counts — both close to the
    float result."""
    p = init_dense(jax.random.key(0), 256, 384)
    leaf = {"b": p["b"], **quantize_weight(p["w"], "int8c")}
    for rows in (4, 300):  # kernel path / fallback path
        x = jnp.asarray(rng.standard_normal((rows, 256)), jnp.float32)
        y_ref = np.asarray(dense(p, x))
        y_q = np.asarray(dense(leaf, x))
        assert np.abs(y_q - y_ref).max() / np.abs(y_ref).max() <= 0.03


def test_dense_int8c_batched_shape(rng):
    p = init_dense(jax.random.key(1), 128, 256)
    leaf = quantize_weight(p["w"], "int8c")
    x = jnp.asarray(rng.standard_normal((2, 3, 128)), jnp.float32)
    y = dense(leaf, x)
    assert y.shape == (2, 3, 256)


def test_grad_flows_through_kernel(rng):
    q, s = _mk(rng, 256, 384)
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    g = jax.grad(
        lambda x: w8_matmul(x, q, s, out_dtype=jnp.float32).sum()
    )(x)
    gr = jax.grad(
        lambda x: w8_matmul_reference(x, q, s, jnp.float32).sum()
    )(x)
    assert np.abs(np.asarray(g) - np.asarray(gr)).max() <= 0.02 * (
        np.abs(np.asarray(gr)).max() + 1e-9
    )


def test_int8c_model_forward_and_generate(rng):
    """A small causal LM quantized with int8c forwards close to the
    float model and generates through the kernel decode path (dims
    chosen 128-divisible so dense() actually routes to the kernel)."""
    from vietnamese_qa_system_tpu.models import generate as gen_mod

    cfg = ModelConfig(
        arch="causal", vocab_size=512, d_model=128, n_heads=4,
        n_layers=2, d_ff=256, max_seq_len=64,
    )
    params = causal_lm.init_causal_lm(jax.random.key(0), cfg)
    qp = quantize_dense_tree(params, "int8c")
    # every quantized leaf is per-column
    def check(node):
        if isinstance(node, dict):
            if "w_q" in node:
                assert node["w_s"].shape[-2] == 1
            else:
                for v in node.values():
                    check(v)
        elif isinstance(node, list):
            for v in node:
                check(v)
    check(qp)
    ids = jnp.asarray(rng.integers(4, cfg.vocab_size, (2, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    lf = np.asarray(causal_lm.forward(params, cfg, ids, mask))
    lq = np.asarray(causal_lm.forward(qp, cfg, ids, mask))
    assert np.abs(lq - lf).max() / np.abs(lf).max() <= 0.05
    out = np.asarray(gen_mod.generate(qp, cfg, ids, mask, max_new_tokens=4))
    assert out.shape == (2, 12)
