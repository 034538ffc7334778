"""Flash attention kernel vs XLA oracle: forward parity (causal, padding),
gradients through the custom VJP, and shape handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.ops.attention import (
    flash_attention,
    flash_attention_reference,
)


def _qkv(rng, b=2, t=128, h=4, d=64, tk=None):
    tk = tk or t
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_reference(rng, causal):
    q, k, v = _qkv(rng)
    out = flash_attention(q, k, v, causal=causal)
    ref = flash_attention_reference(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        causal=causal,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_key_padding_mask(rng):
    q, k, v = _qkv(rng, b=3, t=128)
    lens = jnp.asarray([128, 70, 1], jnp.int32)
    out = flash_attention(q, k, v, kv_lens=lens, causal=False)
    ref = flash_attention_reference(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        kv_lens=lens, causal=False,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    # padded keys must not affect output: change them, output unchanged
    k2 = k.at[1, 70:].set(99.0)
    v2 = v.at[1, 70:].set(-99.0)
    out2 = flash_attention(q, k2, v2, kv_lens=lens, causal=False)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(out2[1]), atol=1e-6
    )


def test_non_multiple_lengths_padded(rng):
    q, k, v = _qkv(rng, t=100)
    out = flash_attention(q, k, v, causal=True)
    assert out.shape == q.shape
    ref = flash_attention_reference(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        causal=True,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_gradients_match_reference(rng):
    q, k, v = _qkv(rng, b=1, t=64, h=2, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v, causal=True)))

    def loss_ref(q, k, v):
        return jnp.sum(
            jnp.square(
                flash_attention_reference(
                    q.astype(jnp.bfloat16),
                    k.astype(jnp.bfloat16),
                    v.astype(jnp.bfloat16),
                    causal=True,
                ).astype(jnp.float32)
            )
        )

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2,
        )


def test_causal_lm_flash_matches_einsum(rng):
    """The flash-enabled causal LM must match the einsum path."""
    import dataclasses

    from vietnamese_qa_system_tpu.models import causal_lm, tiny_test

    cfg = tiny_test("causal")
    params = causal_lm.init_causal_lm(jax.random.key(0), cfg)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), jnp.int32)
    mask = mask.at[1, 20:].set(0)  # right padding
    l_ref = causal_lm.forward(params, cfg, ids, mask)
    cfg_flash = dataclasses.replace(cfg, use_flash_attention=True)
    l_flash = causal_lm.forward(params, cfg_flash, ids, mask)
    np.testing.assert_allclose(
        np.asarray(l_ref[:, :20]), np.asarray(l_flash[:, :20]),
        atol=0.15, rtol=0.05,
    )


def _dense_bias_reference(q, k, v, bias, kv_lens=None, causal=True, scale=None):
    """f32 einsum oracle with the same (post-scale) additive-bias and mask
    semantics as the fused kernel."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = scale or 1.0 / d ** 0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    s = s + bias[None]  # (H, Tq|1, Tk) broadcast over batch (and queries)
    k_pos = jnp.arange(tk)[None, None, None, :]
    mask = jnp.ones((b, 1, tq, tk), bool)
    if kv_lens is not None:
        mask &= k_pos < kv_lens[:, None, None, None]
    if causal:
        mask &= k_pos <= jnp.arange(tq)[None, None, :, None]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("bias_q", ["full", "keyonly"])
@pytest.mark.parametrize("causal", [True, False])
def test_bias_forward_matches_reference(rng, causal, bias_q):
    """Additive score bias (full (H,Tq,Tk) and ALiBi-style (H,1,Tk)) in the
    fused forward matches the dense oracle, including key padding."""
    b, t, h, d = 3, 128, 4, 64
    q, k, v = _qkv(rng, b=b, t=t, h=h, d=d)
    shape = (h, t, t) if bias_q == "full" else (h, 1, t)
    bias = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    lens = jnp.asarray([t, 70, 33], jnp.int32)
    out = flash_attention(q, k, v, kv_lens=lens, causal=causal, bias=bias)
    ref = _dense_bias_reference(q, k, v, bias, kv_lens=lens, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


@pytest.mark.parametrize("bias_q", ["full", "keyonly"])
def test_bias_gradients_match_reference(rng, bias_q):
    """q/k/v grads flow through the fused bias path and match the dense
    oracle; the bias cotangent is zero by design (constant-bias/frozen-
    table semantics, see flash_attention docstring)."""
    b, t, h, d = 1, 64, 2, 32
    q, k, v = _qkv(rng, b=b, t=t, h=h, d=d)
    shape = (h, t, t) if bias_q == "full" else (h, 1, t)
    bias = jnp.asarray(0.3 * rng.standard_normal(shape), jnp.float32)

    def loss_flash(q, k, v, bias):
        return jnp.sum(jnp.square(flash_attention(q, k, v, causal=True, bias=bias)))

    def loss_ref(q, k, v, bias):
        return jnp.sum(jnp.square(_dense_bias_reference(q, k, v, bias, causal=True)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, bb in zip(g1[:3], g2[:3]):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            atol=5e-2, rtol=5e-2,
        )
    assert float(jnp.max(jnp.abs(g1[3]))) == 0.0  # documented zero cotangent


def test_alibi_causal_lm_flash_matches_dense(rng):
    """BLOOM-style ALiBi model: flash path (key-only fused bias) must match
    the dense einsum path."""
    import dataclasses

    from vietnamese_qa_system_tpu.models import causal_lm, tiny_test

    cfg = dataclasses.replace(
        tiny_test("causal"), positional="alibi", embed_layernorm=True,
        activation="gelu_new",
    )
    params = causal_lm.init_causal_lm(jax.random.key(1), cfg)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), jnp.int32)
    mask = mask.at[1, 20:].set(0)
    l_ref = causal_lm.forward(params, cfg, ids, mask)
    cfg_flash = dataclasses.replace(cfg, use_flash_attention=True)
    l_flash = causal_lm.forward(params, cfg_flash, ids, mask)
    np.testing.assert_allclose(
        np.asarray(l_ref[:, :20]), np.asarray(l_flash[:, :20]),
        atol=0.15, rtol=0.05,
    )


# ---------------------------------------------------------------------------
# Sliding-window (local) attention: GPT-Neo local layers / Mistral SWA
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("window", [64, 300])
def test_window_forward_matches_reference(rng, window):
    """Sliding-window mode must match the banded dense oracle.  No block
    cap is applied for windows (deliberate — see the comment in
    flash_attention / docs/BENCHMARKS.md), so t=512 is a single 512-wide
    k-block here: this is a mask-only parity check; genuine block skipping
    is exercised by test_window_band_skip below."""
    q, k, v = _qkv(rng, b=2, t=512, h=2, d=32)
    out = flash_attention(q, k, v, causal=True, window=window)
    ref = flash_attention_reference(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), causal=True, window=window,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_window_multi_qblock(rng):
    """t=2048 spans two 1024-wide blocks on each grid axis.  With w=200 the
    1024x1024 geometry keeps every in-causal block (block (1,0) retains
    k=1023 >= 2048-199), so this checks windowed masking across block
    boundaries — NOT the band skip; see test_window_band_skip for that."""
    q, k, v = _qkv(rng, b=1, t=2048, h=1, d=32)
    out = flash_attention(q, k, v, causal=True, window=200)
    ref = flash_attention_reference(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), causal=True, window=200,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_window_with_key_padding(rng):
    q, k, v = _qkv(rng, b=3, t=512, h=2, d=32)
    lens = jnp.asarray([512, 300, 17], jnp.int32)
    out = flash_attention(q, k, v, kv_lens=lens, causal=True, window=128)
    ref = flash_attention_reference(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), kv_lens=lens, causal=True, window=128,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_window_band_skip(rng, monkeypatch):
    """Genuine whole-block band skipping in fwd AND both bwd kernels:
    with 128x128 blocks, t=512, w=100, block (iq=3, ik=0) has its newest
    key (127) older than the band start (384-99=285), so the O(T*window)
    skip conditions fire (several (q,k) pairs are skipped in each
    direction).  Advisor round-2 finding: the default 1024-block geometry
    never skipped at the suite's shapes."""
    from vietnamese_qa_system_tpu.ops import attention as A

    monkeypatch.setattr(A, "_BLKQ", 128)
    monkeypatch.setattr(A, "_BLKK", 128)
    q, k, v = _qkv(rng, b=2, t=512, h=2, d=32)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, window=100) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(
            flash_attention_reference(q, k, v, causal=True, window=100) ** 2
        )

    out = flash_attention(q, k, v, causal=True, window=100)
    ref = flash_attention_reference(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), causal=True, window=100,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2,
        )


def test_maskless_loss_exact(rng):
    """loss_fn drops the attention mask (lens-free fast kernel): with right
    padding + IGNORE_INDEX labels at pads, loss AND grads must equal the
    masked forward's — causal queries never see padded keys."""
    from vietnamese_qa_system_tpu.models import causal_lm, tiny_test

    cfg = tiny_test("causal")
    params = causal_lm.init_causal_lm(jax.random.key(3), cfg)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), jnp.int32).at[1, 20:].set(0)
    labels = jnp.where(mask == 1, ids, causal_lm.IGNORE_INDEX)
    batch = {"input_ids": ids, "attention_mask": mask, "labels": labels}

    def masked_loss(params):
        logits = causal_lm.forward(params, cfg, ids, mask)[:, :-1]
        lab = labels[:, 1:]
        valid = lab != causal_lm.IGNORE_INDEX
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(
            logp, jnp.where(valid, lab, 0)[..., None], axis=-1
        )[..., 0]
        return -jnp.sum(jnp.where(valid, ll, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1
        )

    l1, _ = causal_lm.loss_fn(params, cfg=cfg, batch=batch)
    l2 = masked_loss(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    g1 = jax.grad(lambda p: causal_lm.loss_fn(p, cfg=cfg, batch=batch)[0])(
        params
    )
    g2 = jax.grad(masked_loss)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_split_bwd_fallback_matches(rng, monkeypatch):
    """Long sequences fall back to the two-kernel backward (the fused
    single-pass kernel caps its full-length VMEM accumulators); force the
    fallback and check grads against the fused path."""
    from vietnamese_qa_system_tpu.ops import attention as A

    q, k, v = _qkv(rng, b=1, t=256, h=2, d=32)

    def loss(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v, causal=True)))

    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setattr(A, "_FUSED_BWD_MAX_BYTES", 0)
    A._flash_bwd_impl.clear_cache()
    g_split = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    A._flash_bwd_impl.clear_cache()
    for a, b in zip(g_fused, g_split):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_window_requires_causal(rng):
    q, k, v = _qkv(rng, b=1, t=128, h=1, d=32)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, causal=False, window=64)


def test_window_grads_match_reference(rng):
    q, k, v = _qkv(rng, b=2, t=512, h=2, d=32)

    def f_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True, window=100) ** 2
        )

    def f_ref(q, k, v):
        return jnp.sum(
            flash_attention_reference(
                q, k, v, causal=True, window=100
            ) ** 2
        )

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2,
        )


def test_local_causal_lm_flash_matches_dense(rng):
    """GPT-Neo-style alternating local/global layers: the flash path (local
    layers on the kernel's sliding-window mode) must match the dense masked
    path, including right padding."""
    import dataclasses

    from vietnamese_qa_system_tpu.models import causal_lm, tiny_test

    cfg = dataclasses.replace(
        tiny_test("causal"),
        attention_layers=("global", "local"), attention_window=8,
        positional="learned",
    )
    params = causal_lm.init_causal_lm(jax.random.key(2), cfg)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), jnp.int32)
    mask = mask.at[1, 20:].set(0)
    l_ref = causal_lm.forward(params, cfg, ids, mask)
    cfg_flash = dataclasses.replace(cfg, use_flash_attention=True)
    l_flash = causal_lm.forward(params, cfg_flash, ids, mask)
    np.testing.assert_allclose(
        np.asarray(l_ref[:, :20]), np.asarray(l_flash[:, :20]),
        atol=0.15, rtol=0.05,
    )
