"""Retrieval-engine tests: sharded store vs brute-force oracle on the
8-device CPU mesh (SURVEY §7.4 mesh-testing strategy), doc store CRUD,
chunking, and the end-to-end ingest→query slice (BASELINE config 1 smoke).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vietnamese_qa_system_tpu.core.mesh import SHARD_AXIS, create_mesh
from vietnamese_qa_system_tpu.engine import (
    DocStore,
    IngestPipeline,
    Retriever,
    VectorStore,
    chunk_text,
    dual_agreement,
)
from vietnamese_qa_system_tpu.engine.query import SearchResult
from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
from vietnamese_qa_system_tpu.models import encoder, tiny_test


def _recall(ids, ref_ids):
    k = ids.shape[1]
    return np.mean(
        [len(set(ids[r]) & set(ref_ids[r])) / k for r in range(len(ids))]
    )


@pytest.mark.parametrize("n_shards", [1, 4])
@pytest.mark.parametrize("dtype", ["bf16", "int8", "int8_global", "int8_res"])
def test_store_topk_matches_bruteforce(rng, n_shards, dtype):
    mesh = create_mesh({SHARD_AXIS: n_shards}, devices=jax.devices()[:n_shards])
    store = VectorStore(2048, 128, mesh=mesh, dtype=dtype, tile_n=256)
    vecs = rng.standard_normal((1000, 128)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    store.add(vecs)
    assert store.size == 1000

    q = rng.standard_normal((16, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    scores, ids = store.topk(q, 10)
    # oracle over the same precision the store holds (bf16-rounded)
    vb = jnp.asarray(vecs).astype(jnp.bfloat16).astype(jnp.float32)
    qb = jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32)
    ref = np.asarray(jax.lax.top_k(qb @ vb.T, 10)[1])
    rec = _recall(np.asarray(ids), ref)
    if dtype == "bf16":
        assert rec >= 0.99, f"bf16 sharded recall {rec}"
    else:
        assert rec >= 0.9, f"{dtype} sharded recall {rec}"


def test_store_streaming_adds_arbitrary_sizes(rng):
    """Partial (non-multiple-of-S) adds must stay exact via tail rewrite."""
    mesh = create_mesh({SHARD_AXIS: 4}, devices=jax.devices()[:4])
    store = VectorStore(1024, 64, mesh=mesh, tile_n=128)
    all_vecs = rng.standard_normal((150, 64)).astype(np.float32)
    sizes = [3, 50, 1, 96]  # deliberately misaligned with S=4
    off = 0
    for sz in sizes:
        got = store.add(all_vecs[off : off + sz])
        np.testing.assert_array_equal(got, np.arange(off, off + sz))
        off += sz
    assert store.size == 150

    q = all_vecs[:8]  # querying with stored vectors: top-1 must be itself
    scores, ids = store.topk(q, 5)
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], np.arange(8))


def test_store_capacity_guard(rng):
    store = VectorStore(256, 32, tile_n=128)
    with pytest.raises(ValueError):
        store.add(rng.standard_normal((store.capacity + 1, 32)))


def test_store_size_lt_k_guard(rng):
    store = VectorStore(256, 32, tile_n=128)
    store.add(rng.standard_normal((5, 32)))
    with pytest.raises(ValueError):
        store.topk(rng.standard_normal((2, 32)), 10)


def test_store_save_load_roundtrip(rng, tmp_path):
    mesh = create_mesh({SHARD_AXIS: 2}, devices=jax.devices()[:2])
    store = VectorStore(512, 64, mesh=mesh, tile_n=128)
    vecs = rng.standard_normal((100, 64)).astype(np.float32)
    store.add(vecs)
    path = os.path.join(tmp_path, "index")
    store.save(path)
    loaded = VectorStore.load(path, mesh=mesh)
    assert loaded.size == 100
    q = vecs[:4]
    _, ids1 = store.topk(q, 5)
    _, ids2 = loaded.topk(q, 5)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


@pytest.mark.parametrize("dtype", ["bf16", "int8", "int8_global", "int8_res"])
def test_store_save_compact_and_capacity_override(rng, tmp_path, dtype):
    """save() writes only used rows (a tiny corpus in a huge-capacity
    store must not checkpoint the whole slab), and load(capacity=0)
    shrinks the serving slab to fit while ranking identically."""
    mesh = create_mesh({SHARD_AXIS: 2}, devices=jax.devices()[:2])
    store = VectorStore(1 << 15, 64, mesh=mesh, dtype=dtype, tile_n=128)
    vecs = rng.standard_normal((100, 64)).astype(np.float32)
    vecs *= np.logspace(-2, 2, 100)[:, None]
    store.add(vecs)
    path = os.path.join(tmp_path, "index")
    store.save(path)
    # 50 used rows/shard x 2 shards x 64 dims x 4 B ≈ 26 KB, not 16 MB
    assert os.path.getsize(os.path.join(path, "vectors.npy")) < 100_000
    fit = VectorStore.load(path, mesh=mesh, capacity=0)
    assert fit.size == 100
    assert fit.capacity == 2 * 128  # one tile per shard
    kept = VectorStore.load(path, mesh=mesh)
    assert kept.capacity == store.capacity  # default keeps ingest headroom
    grow = VectorStore.load(path, mesh=mesh, capacity=1000)
    assert grow.capacity >= 1000
    q = vecs[:8]
    s0, ids0 = store.topk(q, 5)
    for other in (fit, kept, grow):
        s1, ids1 = other.topk(q, 5)
        np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=0.05, atol=1e-3
        )
        more = rng.standard_normal((7, 64)).astype(np.float32)
        other.add(more)  # growth after a compact load still works
        assert other.size == 107


@pytest.mark.parametrize("dtype", ["bf16", "int8", "int8_global", "int8_res"])
def test_store_load_cross_mesh_size(rng, tmp_path, dtype):
    """Loading onto a different mesh size must dequantize before re-adding:
    raw int8 codes re-added as floats get re-quantized per-row, silently
    corrupting the scales (rankings diverge)."""
    mesh4 = create_mesh({SHARD_AXIS: 4}, devices=jax.devices()[:4])
    store = VectorStore(512, 64, mesh=mesh4, dtype=dtype, tile_n=128)
    # widely varying row magnitudes make scale corruption visible
    vecs = rng.standard_normal((100, 64)).astype(np.float32)
    vecs *= np.logspace(-2, 2, 100)[:, None]
    store.add(vecs)
    path = os.path.join(tmp_path, "index")
    store.save(path)
    mesh2 = create_mesh({SHARD_AXIS: 2}, devices=jax.devices()[:2])
    loaded = VectorStore.load(path, mesh=mesh2)
    assert loaded.size == 100
    if dtype == "int8_global":
        assert loaded.global_scale == store.global_scale
    q = vecs[:8]
    s1, ids1 = store.topk(q, 5)
    s2, ids2 = loaded.topk(q, 5)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=0.05, atol=1e-3
    )


def test_docstore_crud(tmp_path):
    with DocStore(os.path.join(tmp_path, "docs.db")) as ds:
        ds.insert([0, 1, 2], ["tài liệu một", "doc two", "ba"], ["wiki", None, "x"])
        assert ds.count() == 3
        assert ds.get([1]) == ["doc two"]
        assert ds.get([99]) == [None]
        rows = ds.fetch(limit=2)
        assert rows[0][1] == "tài liệu một"
        ds.drop()
        assert ds.count() == 0


def test_chunking_bounds_and_coverage():
    text = ("Câu một. " * 40 + "\n\n") * 5  # ~1.8k chars
    chunks = chunk_text(text, chunk_size=200, overlap=0.1)
    assert all(len(c) <= 200 for c in chunks)
    assert sum(len(c) for c in chunks) >= len(text.replace("\n", "").strip()) * 0.9
    # content preserved in order
    joined = "".join(chunks)
    assert "Câu một" in joined


def test_chunking_short_text_single_chunk():
    assert chunk_text("ngắn", chunk_size=100) == ["ngắn"]


def test_e2e_ingest_query_recall(rng):
    """Minimum end-to-end slice (SURVEY §7.2): encoder embeds passages →
    store → query with the same encoder → recall@1 of self-retrieval."""
    cfg = tiny_test("encoder")
    params = encoder.init_encoder(jax.random.key(0), cfg)
    tok = ByteTokenizer()
    mesh = create_mesh({SHARD_AXIS: 2}, devices=jax.devices()[:2])
    store = VectorStore(1024, cfg.d_model, mesh=mesh, tile_n=128)
    docstore = DocStore()
    pipe = IngestPipeline(
        params, cfg, tok, store, docstore, batch_size=16, max_len=32
    )
    passages = [f"đoạn văn số {i} nói về chủ đề {i % 7}" for i in range(40)]
    ids = pipe.add_texts(passages)
    assert store.size == 40 and docstore.count() == 40

    retr = Retriever(params, cfg, tok, store, docstore, max_len=32, query_batch=16)
    results = retr.search(passages[:10], k=3)
    # self-retrieval: identical text must be the top hit with its own doc
    for i, row in enumerate(results):
        assert row[0].id == i
        assert row[0].doc == passages[i]
    # scores are cosine (unit vectors): top-1 ~ 1.0
    assert results[0][0].score > 0.99


def test_search_large_k_falls_back_to_exact(rng):
    """k above the fast kernel's lane cap (ops/topk.py LANES=128) must fall
    back to the exact full-score path instead of raising inside
    matmul_topk (the hybrid path had this guard; the dense path lacked it)."""
    cfg = tiny_test("encoder")
    params = encoder.init_encoder(jax.random.key(0), cfg)
    tok = ByteTokenizer()
    store = VectorStore(512, cfg.d_model, tile_n=128)
    docstore = DocStore()
    pipe = IngestPipeline(params, cfg, tok, store, docstore,
                          batch_size=32, max_len=16)
    pipe.add_texts([f"tài liệu {i}" for i in range(300)])
    retr = Retriever(params, cfg, tok, store, docstore,
                     max_len=16, query_batch=4)
    rows = retr.search(["tài liệu 7"], k=200, fetch_docs=False)
    assert len(rows[0]) == 200
    ids = [r.id for r in rows[0]]
    assert len(set(ids)) == 200  # distinct, real candidates


def test_dual_agreement_threshold():
    a = [[SearchResult(1, 0.3, "d")], [SearchResult(2, 0.1)]]
    b = [[SearchResult(1, 0.2, "d")], [SearchResult(3, 0.9)]]
    out = dual_agreement(a, b, threshold=0.4)
    assert out[0] is not None and out[0].id == 1
    assert abs(out[0].score - 0.5) < 1e-9
    assert out[1] is None  # id mismatch

    # same id but sum below threshold -> rejected
    a2 = [[SearchResult(5, 0.1)]]
    b2 = [[SearchResult(5, 0.2)]]
    assert dual_agreement(a2, b2, threshold=0.4) == [None]


def test_qa_pipeline_end_to_end(rng):
    """Full system: ingest docs -> retrieve -> RAG prompt -> reader
    generation; low-score queries get a refusal."""
    from vietnamese_qa_system_tpu.engine import IngestPipeline, QAPipeline
    from vietnamese_qa_system_tpu.models import causal_lm

    enc_cfg = tiny_test("encoder")
    enc_params = encoder.init_encoder(jax.random.key(0), enc_cfg)
    tok = ByteTokenizer()
    store = VectorStore(1024, enc_cfg.d_model, tile_n=128)
    docstore = DocStore()
    pipe = IngestPipeline(enc_params, enc_cfg, tok, store, docstore,
                          batch_size=8, max_len=48)
    docs = [f"tài liệu {i}: thông tin về chủ đề {i}" for i in range(16)]
    pipe.add_texts(docs)
    retriever = Retriever(enc_params, enc_cfg, tok, store, docstore,
                          max_len=48, query_batch=8)

    reader_cfg = tiny_test("causal")
    reader_params = causal_lm.init_causal_lm(jax.random.key(1), reader_cfg)
    qa = QAPipeline(retriever, reader_params, reader_cfg, tok,
                    k=2, min_score=0.2, max_prompt_len=256, max_new_tokens=4)
    out = qa.answer([docs[3], docs[9]])
    assert len(out) == 2
    for ans in out:
        assert not ans.refused
        assert ans.contexts and ans.answer is not None
    # exact self-match retrieves itself as the top context
    assert out[0].contexts[0] == docs[3]

    # refusal path: impossible threshold
    qa_strict = QAPipeline(retriever, reader_params, reader_cfg, tok,
                           k=2, min_score=10.0, max_new_tokens=4)
    refused = qa_strict.answer(["câu hỏi nào đó"])[0]
    assert refused.refused and refused.contexts == []
    assert "câu hỏi nào đó" in refused.answer  # refusal names the question


def test_dual_retriever_end_to_end(rng):
    """Two independent encoders over the same corpus: identical queries
    must agree on the top document (the reference's two-index loop)."""
    from vietnamese_qa_system_tpu.engine import DualRetriever, IngestPipeline

    tok = ByteTokenizer()
    docs = [f"văn bản {i} về đề tài {i}" for i in range(12)]
    retrievers = []
    for seed in (0, 1):
        cfg = tiny_test("encoder")
        params = encoder.init_encoder(jax.random.key(seed), cfg)
        store = VectorStore(512, cfg.d_model, tile_n=128)
        ds = DocStore()
        IngestPipeline(params, cfg, tok, store, ds, batch_size=8, max_len=48).add_texts(docs)
        retrievers.append(Retriever(params, cfg, tok, store, ds, max_len=48, query_batch=8))
    dual = DualRetriever(*retrievers, threshold=0.4)
    out = dual.search([docs[5], docs[8]])
    assert out[0] is not None and out[0].id == 5
    assert out[1] is not None and out[1].id == 8
    # both encoders score self-retrieval ~1.0 -> sum ~2.0 > threshold
    assert out[0].score > 1.5


def test_qa_pipeline_seq2seq_reader(rng):
    """QAPipeline with a T5-family encoder-decoder reader (the reference's
    mt5 reader experiments, src/test.py:106-147): right-padded encoder
    input, decoder-side-only answers."""
    from vietnamese_qa_system_tpu.engine import IngestPipeline, QAPipeline
    from vietnamese_qa_system_tpu.models import t5
    from vietnamese_qa_system_tpu.models.config import ModelConfig

    enc_cfg = tiny_test("encoder")
    enc_params = encoder.init_encoder(jax.random.key(0), enc_cfg)
    tok = ByteTokenizer()
    store = VectorStore(512, enc_cfg.d_model, tile_n=128)
    docstore = DocStore()
    pipe = IngestPipeline(enc_params, enc_cfg, tok, store, docstore,
                          batch_size=8, max_len=48)
    docs = [f"tài liệu {i}: nội dung {i}" for i in range(8)]
    pipe.add_texts(docs)
    retriever = Retriever(enc_params, enc_cfg, tok, store, docstore,
                          max_len=48, query_batch=8)

    reader_cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=512, d_model=32,
        n_heads=2, d_kv=8, n_layers=1, n_decoder_layers=1, d_ff=64,
        mlp_gated=True, tie_embeddings=False, relative_attention_buckets=8,
        attention_bias=False,
    )
    reader_params = t5.init_t5(jax.random.key(1), reader_cfg)
    qa = QAPipeline(retriever, reader_params, reader_cfg, tok,
                    k=2, min_score=0.2, max_prompt_len=128, max_new_tokens=4)
    out = qa.answer([docs[3]])
    assert len(out) == 1 and not out[0].refused
    assert out[0].answer is not None


def test_dual_agreement_handles_empty_rows():
    """An empty index (online-ingest warmup) yields empty result rows;
    the agreement rule must answer None, not IndexError."""
    from vietnamese_qa_system_tpu.engine.query import (
        SearchResult, dual_agreement,
    )

    assert dual_agreement([[]], [[]]) == [None]
    hit = [SearchResult(0, 0.9)]
    assert dual_agreement([hit], [[]]) == [None]
    assert dual_agreement([[]], [hit]) == [None]


@pytest.mark.parametrize("dtype", ["bf16", "int8", "int8_global", "int8_res"])
def test_store_load_empty_across_mesh_sizes(rng, tmp_path, dtype):
    """An empty saved store must load onto a different mesh size without
    crashing (int8_global has no calibrated scale yet — the reshard
    branch used to evaluate `codes * None`)."""
    mesh2 = create_mesh({SHARD_AXIS: 2}, devices=jax.devices()[:2])
    store = VectorStore(512, 64, mesh=mesh2, dtype=dtype, tile_n=128)
    path = str(tmp_path / "idx")
    store.save(path)
    mesh4 = create_mesh({SHARD_AXIS: 4}, devices=jax.devices()[:4])
    loaded = VectorStore.load(path, mesh=mesh4)
    assert loaded.size == 0
    # and it must be usable: add then query
    vecs = np.asarray(rng.standard_normal((32, 64)), np.float32)
    loaded.add(vecs)
    s, i = loaded.topk(vecs[:8], k=3)
    assert np.asarray(i).shape == (8, 3)


def test_store_add_bucketed_rows_do_not_corrupt(rng):
    """Streaming adds with varying batch sizes (the pow-2 row bucketing
    that bounds _write_block recompiles) must leave the index exactly
    equal to a one-shot build."""
    mesh = create_mesh({SHARD_AXIS: 2}, devices=jax.devices()[:2])
    a = VectorStore(1024, 64, mesh=mesh, tile_n=128)
    b = VectorStore(1024, 64, mesh=mesh, tile_n=128)
    vecs = np.asarray(rng.standard_normal((200, 64)), np.float32)
    a.add(vecs)
    off = 0
    for sz in (1, 7, 32, 3, 64, 93):  # varying sizes incl. partial tails
        b.add(vecs[off : off + sz])
        off += sz
    assert off == 200 and a.size == b.size == 200
    q = vecs[:16]
    sa, ia = a.topk(q, k=5)
    sb, ib = b.topk(q, k=5)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=1e-6)
