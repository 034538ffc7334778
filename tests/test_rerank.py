"""Two-stage retrieval: int8_res residual quantization + candidate
re-rank (engine/store.py ``rerank=K'``).

Capability context: the reference's index is faiss-backed txtai
(inference_pipeline/db_utils/heavy_ranker.py:78-101) — flat fp32.  The
two-stage path here delivers bf16-equal index memory with HALF the
first-pass scan bytes (primary int8 slab only) and an exact f32 re-score
of K' candidates per shard, so recall matches or beats the single-pass
bf16 scan.  Oracle strategy per SURVEY §7.4: brute force on the 8-device
CPU mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.core.mesh import SHARD_AXIS, create_mesh
from vietnamese_qa_system_tpu.engine import VectorStore
from vietnamese_qa_system_tpu.ops import (
    quantize_int8_reference,
    quantize_int8_residual,
)


def _recall(ids, ref_ids):
    k = ids.shape[1]
    return np.mean(
        [len(set(ids[r]) & set(ref_ids[r])) / k for r in range(len(ids))]
    )


def _oracle_ids(q, vecs, k):
    return np.asarray(
        jax.lax.top_k(
            jnp.asarray(q, jnp.float32) @ jnp.asarray(vecs, jnp.float32).T, k
        )[1]
    )


def test_residual_quant_reconstruction(rng):
    """Residual int8 must reconstruct far tighter than plain int8 — the
    residual level quantizes the primary's rounding error (~15.7 bits)."""
    x = rng.standard_normal((256, 64)).astype(np.float32)
    q1, s1, q2, s2 = quantize_int8_residual(jnp.asarray(x))
    recon1 = np.asarray(q1, np.float32) * np.asarray(s1)[:, None]
    recon2 = recon1 + np.asarray(q2, np.float32) * np.asarray(s2)[:, None]
    err1 = np.abs(x - recon1).max()
    err2 = np.abs(x - recon2).max()
    assert err2 < err1 / 50, (err1, err2)
    # and tighter than bf16 rounding of the same data
    bf = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    assert err2 < np.abs(x - bf).max()
    # residual level matches re-quantizing the explicit error
    r = x - recon1
    q2_ref, s2_ref = quantize_int8_reference(jnp.asarray(r))
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(q2_ref))


@pytest.mark.parametrize("n_shards", [1, 4])
def test_int8_res_recall_matches_f32_oracle(rng, n_shards):
    """int8_res + auto re-rank must reach f32-oracle recall on data where
    plain int8 visibly loses items (spread row norms)."""
    mesh = create_mesh({SHARD_AXIS: n_shards}, devices=jax.devices()[:n_shards])
    vecs = rng.standard_normal((2000, 128)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q = rng.standard_normal((16, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ref = _oracle_ids(q, vecs, 10)

    store = VectorStore(2048, 128, mesh=mesh, dtype="int8_res", tile_n=256)
    store.add(vecs)
    _, ids = store.topk(q, 10)  # rerank defaults to 4*k on int8_res
    assert _recall(np.asarray(ids), ref) >= 0.99

    # plain int8 on the same data is measurably worse than the re-ranked
    # two-stage result (sanity that the residual is doing work)
    store8 = VectorStore(2048, 128, mesh=mesh, dtype="int8", tile_n=256)
    store8.add(vecs)
    _, ids8 = store8.topk(q, 10)
    assert _recall(np.asarray(ids), ref) >= _recall(np.asarray(ids8), ref)


def test_rerank_fixes_turbo_losses_bf16(rng):
    """rerank on a bf16 store re-scores in f32, so turbo-mode bucket
    losses are recovered for any candidate that survives the scan."""
    mesh = create_mesh({SHARD_AXIS: 1}, devices=jax.devices()[:1])
    vecs = rng.standard_normal((3000, 64)).astype(np.float32)
    store = VectorStore(4096, 64, mesh=mesh, dtype="bf16", tile_n=256)
    store.add(vecs)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    vb = np.asarray(
        jnp.asarray(vecs).astype(jnp.bfloat16).astype(jnp.float32)
    )
    ref = _oracle_ids(q, vb, 10)
    _, ids = store.topk(q, 10, mode="turbo", rerank=64)
    assert _recall(np.asarray(ids), ref) >= 0.99
    # re-ranked scores come from the f32 gather, ordered descending
    s, _ = store.topk(q, 10, mode="turbo", rerank=64)
    s = np.asarray(s)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_rerank_validation():
    mesh = create_mesh({SHARD_AXIS: 1}, devices=jax.devices()[:1])
    store = VectorStore(512, 32, mesh=mesh, tile_n=128)
    store.add(np.random.default_rng(0).standard_normal((64, 32)).astype(np.float32))
    with pytest.raises(ValueError, match="rerank"):
        store.topk(np.zeros((4, 32), np.float32), 10, rerank=5)
    # an EXPLICIT over-lane-cap rerank raises instead of silently
    # clamping to 128 candidates (round-3 advisor finding)
    with pytest.raises(ValueError, match="lane cap"):
        store.topk(np.zeros((4, 32), np.float32), 10, rerank=512)
    # ... but exact mode has no lane cap, and the int8_res auto-default
    # is clamped quietly (no explicit ask to betray)
    store.topk(np.zeros((4, 32), np.float32), 10, mode="exact", rerank=512)


def test_exact_rerank_small_store_no_padding_resurrection(rng):
    """Exact-mode matmul_topk pads short shards with real indices >= valid
    at -inf; the rerank re-score must NOT resurrect those zero rows as
    score-0.0 hits (round-3 advisor high finding: size=24, 4 shards, k=8
    returned out-of-range ids [24..52] and get_vectors raised)."""
    mesh = create_mesh({SHARD_AXIS: 4}, devices=jax.devices()[:4])
    vecs = rng.standard_normal((24, 32)).astype(np.float32)
    # make every true score NEGATIVE so a fabricated 0.0 would win
    q = -np.abs(rng.standard_normal((4, 32))).astype(np.float32)
    vecs = np.abs(vecs)
    ref = _oracle_ids(q, vecs, 8)
    store = VectorStore(256, 32, mesh=mesh, dtype="int8_res", tile_n=128)
    store.add(vecs)
    scores, ids = store.topk(q, 8, mode="exact")  # auto rerank = 4*k
    ids = np.asarray(ids)
    assert ids.min() >= 0 and ids.max() < 24, ids
    assert _recall(ids, ref) == 1.0
    store.get_vectors(ids.ravel().tolist())  # must not raise


def test_int8_res_residual_saved_as_int8(rng, tmp_path):
    """res_vectors.npy stays int8 on disk (4x smaller than the old f32
    convention); load() must round-trip it regardless."""
    mesh = create_mesh({SHARD_AXIS: 1}, devices=jax.devices()[:1])
    store = VectorStore(256, 32, mesh=mesh, dtype="int8_res", tile_n=128)
    store.add(rng.standard_normal((64, 32)).astype(np.float32))
    path = os.path.join(tmp_path, "idx8")
    store.save(path)
    on_disk = np.load(os.path.join(path, "res_vectors.npy"))
    assert on_disk.dtype == np.int8, on_disk.dtype


def test_int8_res_save_load_roundtrip(rng, tmp_path):
    """Same-mesh load restores BOTH quantization levels bit-exactly."""
    mesh = create_mesh({SHARD_AXIS: 2}, devices=jax.devices()[:2])
    store = VectorStore(512, 64, mesh=mesh, dtype="int8_res", tile_n=128)
    vecs = rng.standard_normal((100, 64)).astype(np.float32)
    vecs *= np.logspace(-2, 2, 100)[:, None]
    store.add(vecs)
    path = os.path.join(tmp_path, "idx")
    store.save(path)
    loaded = VectorStore.load(path, mesh=mesh)
    used = -(-store.size // store.n_shards)  # unused slab rows are only
    # zero-padded on load (add() leaves epsilon scales there)
    np.testing.assert_array_equal(
        np.asarray(store.res_vectors[:, :used]),
        np.asarray(loaded.res_vectors[:, :used]),
    )
    np.testing.assert_array_equal(
        np.asarray(store.res_scales[:, :used]),
        np.asarray(loaded.res_scales[:, :used]),
    )
    q = vecs[:4]
    s0, i0 = store.topk(q, 5)
    s1, i1 = loaded.topk(q, 5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)


def test_int8_res_get_vectors_precision(rng):
    """get_vectors applies the residual: reconstruction ≪ plain int8."""
    mesh = create_mesh({SHARD_AXIS: 2}, devices=jax.devices()[:2])
    vecs = rng.standard_normal((64, 32)).astype(np.float32)
    res = VectorStore(256, 32, mesh=mesh, dtype="int8_res", tile_n=128)
    res.add(vecs)
    plain = VectorStore(256, 32, mesh=mesh, dtype="int8", tile_n=128)
    plain.add(vecs)
    ids = np.arange(64)
    err_res = np.abs(res.get_vectors(ids) - vecs).max()
    err_plain = np.abs(plain.get_vectors(ids) - vecs).max()
    assert err_res < err_plain / 50, (err_res, err_plain)
