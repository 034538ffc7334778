import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.ops import (
    dequantize_int8,
    quantize_int8,
    quantize_int8_reference,
)


def test_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((512, 256), dtype=np.float32))
    q, s = quantize_int8(x)
    q_ref, s_ref = quantize_int8_reference(x)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)


def test_roundtrip_error_bounded(rng):
    x = jnp.asarray(rng.standard_normal((256, 128), dtype=np.float32))
    q, s = quantize_int8(x)
    x_hat = dequantize_int8(q, s)
    # max error per element is scale/2 = absmax/254
    absmax = np.abs(np.asarray(x)).max(axis=1, keepdims=True)
    err = np.abs(np.asarray(x_hat) - np.asarray(x))
    assert (err <= absmax / 254.0 + 1e-6).all()


def test_ragged_rows(rng):
    x = jnp.asarray(rng.standard_normal((37, 128), dtype=np.float32))
    q, s = quantize_int8(x)
    q_ref, s_ref = quantize_int8_reference(x)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))


def test_zero_row_safe():
    x = jnp.zeros((8, 128), dtype=jnp.float32)
    q, s = quantize_int8(x)
    assert np.isfinite(np.asarray(s)).all()
    assert (np.asarray(q) == 0).all()


def test_quantize_int8_ragged_rows_matches_reference(rng):
    """Row counts that aren't tile multiples are padded+sliced — the old
    tile_rows=1 fallback violated Mosaic's block rules on real TPU."""
    from vietnamese_qa_system_tpu.ops import quantize_int8
    from vietnamese_qa_system_tpu.ops.quant import quantize_int8_reference

    for n in (1, 7, 100, 257, 1000):
        x = jnp.asarray(rng.standard_normal((n, 64)), jnp.float32)
        q, s = quantize_int8(x)
        q_ref, s_ref = quantize_int8_reference(x)
        assert q.shape == (n, 64) and s.shape == (n,)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
