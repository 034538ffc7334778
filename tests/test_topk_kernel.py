"""Unit tests for the fused matmul+top-k kernel vs the XLA reference.

Strategy per SURVEY.md §7.4: Pallas kernel (interpreter mode on CPU)
against jax.lax.top_k over the materialized score matrix, including tie
and padding edge cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.ops import (
    matmul_topk,
    matmul_topk_reference,
    quantize_int8,
)


def _make(rng, b, n, d):
    q = rng.standard_normal((b, d), dtype=np.float32)
    c = rng.standard_normal((n, d), dtype=np.float32)
    return jnp.asarray(q), jnp.asarray(c)


@pytest.mark.parametrize("mode", ["fast", "exact"])
@pytest.mark.parametrize("b,n,d,k", [(8, 512, 128, 10), (16, 1024, 256, 4)])
def test_matches_reference_indices(rng, b, n, d, k, mode):
    q, c = _make(rng, b, n, d)
    # Compare in bf16 on both sides so rounding is identical.
    qb, cb = q.astype(jnp.bfloat16), c.astype(jnp.bfloat16)
    s, i = matmul_topk(qb, cb, k, tile_n=256, mode=mode)
    s_ref, i_ref = matmul_topk_reference(qb, cb, k)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5)


def test_single_tile(rng):
    q, c = _make(rng, 8, 256, 128)
    s, i = matmul_topk(q, c, 10, tile_n=256)
    s_ref, i_ref = matmul_topk_reference(
        q.astype(jnp.bfloat16), c.astype(jnp.bfloat16), 10
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_padding_mask(rng):
    """Rows beyond valid_n (zero padding) must never be returned."""
    b, n, d, valid = 8, 512, 128, 300
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    c_np = np.zeros((n, d), dtype=np.float32)
    c_np[:valid] = rng.standard_normal((valid, d))
    # Make padded rows attractive if unmasked:
    c_np[valid:] = 100.0
    c = jnp.asarray(c_np)
    s, i = matmul_topk(q, c, 10, tile_n=256, valid_n=valid)
    assert np.asarray(i).max() < valid
    s_ref, i_ref = matmul_topk_reference(
        q.astype(jnp.bfloat16), c.astype(jnp.bfloat16), 10, valid_n=valid
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.parametrize("mode", ["fast", "exact"])
@pytest.mark.parametrize("tile_n", [128, 256])
def test_ties_resolve_to_lowest_index(rng, mode, tile_n):
    """Duplicate corpus rows: lowest index wins, same as lax.top_k.

    tile_n=256 puts duplicates 128 columns apart in the same lane bucket,
    exercising the second-max restoration path of the fast kernel."""
    d = 128
    row = rng.standard_normal((1, d), dtype=np.float32)
    c_np = np.tile(row, (256, 1)).astype(np.float32)
    q = jnp.asarray(row.copy())
    c = jnp.asarray(c_np)
    s, i = matmul_topk(q, c, 5, tile_n=tile_n, mode=mode)
    np.testing.assert_array_equal(np.asarray(i)[0], np.arange(5))


def test_scores_sorted_descending(rng):
    q, c = _make(rng, 8, 512, 128)
    s, _ = matmul_topk(q, c, 10, tile_n=256)
    s = np.asarray(s)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_int8_path_recall(rng):
    """int8-compressed corpus must hold recall@10 >= 0.9 vs fp32 brute force
    on random data (BASELINE config 3 gate is recall parity at 1M scale;
    this is the small smoke version)."""
    b, n, d, k = 16, 2048, 256, 10
    q, c = _make(rng, b, n, d)
    # L2-normalize like real embeddings.
    c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    cq, cs = quantize_int8(c)
    s, i = matmul_topk(q, cq, k, corpus_scales=cs, tile_n=512)
    _, i_ref = matmul_topk_reference(q, c, k)
    i, i_ref = np.asarray(i), np.asarray(i_ref)
    recall = np.mean(
        [
            len(set(i[r]) & set(i_ref[r])) / k
            for r in range(b)
        ]
    )
    assert recall >= 0.9, f"int8 recall@10 too low: {recall}"


def test_int8_requires_scales(rng):
    q, c = _make(rng, 4, 256, 128)
    cq, _ = quantize_int8(c)
    with pytest.raises(ValueError):
        matmul_topk(q, cq, 5, tile_n=256)


def test_misaligned_corpus_auto_pads(rng):
    """N not a multiple of tile_n: the wrapper pads and masks internally."""
    q, c = _make(rng, 4, 300, 128)
    s, i = matmul_topk(q, c, 5, tile_n=256)
    _, i_ref = matmul_topk_reference(
        q.astype(jnp.bfloat16), c.astype(jnp.bfloat16), 5
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    assert np.asarray(i).max() < 300


def test_odd_batch_auto_pads(rng):
    """B not a sublane multiple: padded internally, outputs sliced back."""
    q, c = _make(rng, 5, 512, 128)
    s, i = matmul_topk(q, c, 7, tile_n=256)
    assert s.shape == (5, 7) and i.shape == (5, 7)
    _, i_ref = matmul_topk_reference(
        q.astype(jnp.bfloat16), c.astype(jnp.bfloat16), 7
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_int8_global_scale_recall(rng):
    """Global-scale int8 (deferred scaling, raw int32 kernel compare) must
    hold recall on L2-normalized embeddings."""
    from vietnamese_qa_system_tpu.ops.quant import quantize_int8_global

    b, n, d, k = 16, 2048, 256, 10
    q, c = _make(rng, b, n, d)
    c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    cq, gscale = quantize_int8_global(c)
    s, i = matmul_topk(q, cq, k, corpus_scales=gscale, tile_n=512)
    _, i_ref = matmul_topk_reference(q, c, k)
    i, i_ref = np.asarray(i), np.asarray(i_ref)
    recall = np.mean([len(set(i[r]) & set(i_ref[r])) / k for r in range(b)])
    assert recall >= 0.9, f"int8-global recall@10 too low: {recall}"
    # scores approximate the true inner products
    s_ref, _ = matmul_topk_reference(q, c, k)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=0.05)


def test_bucket_collisions_within_guarantee_exact(rng):
    """Adversarial lane-bucket collisions INSIDE the documented guarantee:
    up to 2 of the top-k share a (tile, lane-bucket) and up to 4 share a
    global lane bucket (index mod 128) — fast mode must stay exact.

    Construction: corpus rows are multiples of one unit vector u, so the
    score against query u is exactly the per-row coefficient."""
    n, d, k, tile_n = 4 * 512, 32, 10, 512
    u = np.zeros((d,), np.float32)
    u[0] = 1.0
    coefs = np.linspace(0.1, 0.2, n).astype(np.float32)
    # top-10 winners: 4 in global bucket 7 (2 per tile: tiles 0 and 1),
    # 6 spread over unique buckets in tiles 2-3
    winners = [
        7, 7 + 128,              # tile 0, bucket 7 (2 in one tile bucket)
        512 + 7, 512 + 7 + 128,  # tile 1, bucket 7 (4 in global bucket 7)
        1024 + 1, 1024 + 2, 1024 + 3,
        1536 + 4, 1536 + 5, 1536 + 6,
    ]
    for rank, idx in enumerate(winners):
        coefs[idx] = 10.0 - rank  # distinct, descending
    c = np.outer(coefs, u)
    q = u[None, :]
    s, i = matmul_topk(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(c, jnp.bfloat16), k,
        tile_n=tile_n,
    )
    np.testing.assert_array_equal(np.asarray(i)[0], np.asarray(winners))
    np.testing.assert_allclose(
        np.asarray(s)[0], [10.0 - r for r in range(k)], rtol=1e-2
    )


def test_bucket_collision_beyond_guarantee_recall_bounded(rng):
    """5+ of the top-k in ONE global lane bucket exceeds the fast-mode
    guarantee: the top-4 of that bucket must still be returned (graceful
    recall), and mode="exact" must be fully exact on the same corpus."""
    n, d, k, tile_n = 4 * 512, 32, 10, 512
    u = np.zeros((d,), np.float32)
    u[0] = 1.0
    coefs = np.linspace(0.1, 0.2, n).astype(np.float32)
    # 6 winners all in global bucket 3, one per tile-slice (no per-tile
    # violation: one per (tile, slice) pair)
    bucket3 = [3, 512 + 3, 1024 + 3, 1536 + 3, 3 + 128, 512 + 3 + 128]
    others = [256 + 10, 256 + 11, 768 + 12, 768 + 13]
    winners = bucket3 + others
    for rank, idx in enumerate(winners):
        coefs[idx] = 10.0 - rank
    c = np.outer(coefs, u)
    q = u[None, :]
    s, i = matmul_topk(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(c, jnp.bfloat16), k,
        tile_n=tile_n,
    )
    got = set(np.asarray(i)[0].tolist())
    # graceful degradation: the 4 best of bucket 3 plus every
    # non-colliding winner are present
    assert set(bucket3[:4]) <= got
    assert set(others) <= got
    # exact mode has no bucket structure: fully exact
    _, ie = matmul_topk(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(c, jnp.bfloat16), k,
        tile_n=tile_n, mode="exact",
    )
    np.testing.assert_array_equal(np.asarray(ie)[0], np.asarray(winners))


@pytest.mark.parametrize("quant", ["bf16", "int8"])
def test_turbo_mode_recall(rng, quant):
    """mode="turbo" (top-1 scan + global top-4 buckets) holds high recall
    on random corpora and returns sorted scores."""
    b, n, d, k = 32, 8192, 128, 10
    q, c = _make(rng, b, n, d)
    if quant == "int8":
        cq, cs = quantize_int8(c)
        s, i = matmul_topk(q, cq, k, corpus_scales=cs, tile_n=512,
                           mode="turbo")
    else:
        s, i = matmul_topk(q.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                           k, tile_n=512, mode="turbo")
    _, i_ref = matmul_topk_reference(
        q.astype(jnp.bfloat16), c.astype(jnp.bfloat16), k
    )
    i, i_ref = np.asarray(i), np.asarray(i_ref)
    recall = np.mean([len(set(i[r]) & set(i_ref[r])) / k for r in range(b)])
    assert recall >= 0.95, f"turbo recall@10 too low: {recall}"
    s = np.asarray(s)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_turbo_tile_bucket_pair_collision_graceful(rng):
    """Two top-k items in ONE (tile, lane) bucket: turbo keeps only the
    bucket max (documented trade); fast keeps both."""
    n, d, k, tile_n = 2 * 512, 16, 4, 512
    u = np.zeros((d,), np.float32)
    u[0] = 1.0
    coefs = np.linspace(0.1, 0.2, n).astype(np.float32)
    winners = [5, 5 + 128, 600, 700]  # first two share tile-0 bucket 5
    for rank, idx in enumerate(winners):
        coefs[idx] = 10.0 - rank
    c = np.outer(coefs, u)
    q = u[None, :]
    args = (jnp.asarray(q, jnp.bfloat16), jnp.asarray(c, jnp.bfloat16), k)
    _, i_fast = matmul_topk(*args, tile_n=tile_n, mode="fast")
    np.testing.assert_array_equal(np.asarray(i_fast)[0], winners)
    _, i_turbo = matmul_topk(*args, tile_n=tile_n, mode="turbo")
    got = set(np.asarray(i_turbo)[0].tolist())
    assert 5 in got and 600 in got and 700 in got  # bucket max + the rest
    assert 5 + 128 not in got  # the documented turbo loss


def test_i32_index_fallback_matches_reference(rng, monkeypatch):
    """Corpora above _F32_EXACT_N use i32 index registers; force the
    fallback on a small corpus and check it is still exact."""
    from vietnamese_qa_system_tpu.ops import topk as topk_mod

    monkeypatch.setattr(topk_mod, "_F32_EXACT_N", 64)
    q, c = _make(rng, 8, 1024, 64)
    qb, cb = q.astype(jnp.bfloat16), c.astype(jnp.bfloat16)
    for mode in ("fast", "turbo"):
        s, i = matmul_topk(qb, cb, 10, tile_n=256, mode=mode)
        rs, ri = matmul_topk_reference(qb, cb, 10)
        assert i.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


@pytest.mark.parametrize("mode", ["fast", "turbo"])
def test_partial_tile_mask_large_tile(rng, mode):
    """tile_n > 2048 uses the per-slice partial-tile mask (the old path
    materialized a full-width masked copy); padding rows must never win."""
    b, n, d, k = 8, 5000, 64, 10  # pads to 8192 with tile_n=4096
    q = rng.standard_normal((b, d), dtype=np.float32)
    c = rng.standard_normal((n, d), dtype=np.float32)
    # make padding adversarial: huge-norm rows just past valid_n would win
    # any unmasked comparison
    c[n - 1] *= 50.0
    qb = jnp.asarray(q, jnp.bfloat16)
    cb = jnp.asarray(c, jnp.bfloat16)
    s, i = matmul_topk(qb, cb, k, tile_n=4096, mode=mode)
    assert int(jnp.max(i)) < n
    rs, ri = matmul_topk_reference(qb, cb, k)
    if mode == "fast":
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    else:
        overlap = np.mean(
            [len(set(np.asarray(i)[r]) & set(np.asarray(ri)[r])) / k
             for r in range(b)]
        )
        assert overlap >= 0.9


def test_dynamic_valid_n_partial_large_tile(rng):
    """Traced valid_n with a tile_n=4096 partial tile (streaming-ingest
    shape: store capacity fixed, fill level dynamic)."""
    import jax

    b, cap, d, k = 8, 4096, 64, 5
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32), jnp.bfloat16)
    c = np.zeros((cap, d), dtype=np.float32)
    valid = 2500
    c[:valid] = rng.standard_normal((valid, d))
    c[valid:] = 100.0  # adversarial padding
    cb = jnp.asarray(c, jnp.bfloat16)

    @jax.jit
    def run(q, c, vn):
        return matmul_topk(q, c, k, tile_n=4096, valid_n=vn)

    s, i = run(q, cb, jnp.int32(valid))
    assert int(jnp.max(i)) < valid
    rs, ri = matmul_topk_reference(q, cb, k, valid_n=valid)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))


def test_int8_exact_mode_is_a_true_oracle(rng):
    """mode="exact" on an int8 corpus must return the TRUE top-k under
    the quantized scoring function (it used to silently run the bucketed
    fast kernel).  Verified against a numpy double-precision recompute of
    the same int8 arithmetic."""
    b, n, d, k = 8, 1024, 128, 10
    q, c = _make(rng, b, n, d)
    cq, cs = quantize_int8(c)
    s, i = matmul_topk(q, cq, k, corpus_scales=cs, mode="exact", tile_n=256)

    # independent recompute: same per-row query quantization, int32 dot
    qf = np.asarray(q, np.float64)
    qscale = np.maximum(np.abs(qf).max(axis=1, keepdims=True), 1e-12) / 127.0
    q_i8 = np.clip(np.round(qf / qscale), -127, 127)
    raw = q_i8 @ np.asarray(cq, np.float64).T  # exact integers in f64
    full = raw * np.asarray(cs, np.float64)[None, :] * qscale
    i_np = np.argsort(-full, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(i), i_np)

    # and with a dynamic valid_n masking the tail
    s2, i2 = matmul_topk(
        q, cq, k, corpus_scales=cs, mode="exact", valid_n=700, tile_n=256
    )
    i2_np = np.argsort(-full[:, :700], axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(i2), i2_np)


def test_int8_global_exact_mode(rng):
    from vietnamese_qa_system_tpu.ops.quant import quantize_int8_global

    b, n, d, k = 4, 512, 64, 5
    q, c = _make(rng, b, n, d)
    cq, gscale = quantize_int8_global(c)
    s, i = matmul_topk(q, cq, k, corpus_scales=gscale, mode="exact")
    qf = np.asarray(q, np.float64)
    qscale = np.maximum(np.abs(qf).max(axis=1, keepdims=True), 1e-12) / 127.0
    q_i8 = np.clip(np.round(qf / qscale), -127, 127)
    full = (q_i8 @ np.asarray(cq, np.float64).T) * float(gscale) * qscale
    i_np = np.argsort(-full, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(i), i_np)
