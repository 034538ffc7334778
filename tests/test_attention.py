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
