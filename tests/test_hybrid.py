"""Hybrid sparse+dense retrieval tests (capability of the reference's
txtai.Embeddings(hybrid=True) indexes, heavy_ranker.py:78-88)."""

import os

import jax
import numpy as np
import pytest

from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
from vietnamese_qa_system_tpu.engine import (
    BM25Index,
    DocStore,
    IngestPipeline,
    Retriever,
    VectorStore,
    fuse_scores,
)
from vietnamese_qa_system_tpu.models import encoder, tiny_test


def test_bm25_ranks_keyword_matches_first():
    idx = BM25Index()
    docs = [
        "mèo thích cá và sữa",
        "chó thích xương và thịt",
        "vịnh hạ long là di sản thiên nhiên",
        "cá sống dưới nước cá bơi nhanh",
    ]
    idx.add(range(len(docs)), docs)
    top = idx.search("cá bơi", k=3)
    assert top[0][0] == 3  # two matching terms, higher tf
    assert top[0][1] == 1.0  # max-normalized
    ids = [g for g, _ in top]
    assert 0 in ids and 1 not in ids  # "cá" matches doc 0; doc 1 never


def test_bm25_idf_downweights_common_terms():
    idx = BM25Index()
    # "chung" appears everywhere; "hiếm" only in doc 2
    docs = [f"từ chung số {i}" for i in range(6)] + ["từ chung hiếm"]
    idx.add(range(len(docs)), docs)
    top = idx.search("hiếm chung", k=2)
    assert top[0][0] == 6


def test_bm25_save_load_roundtrip(tmp_path):
    idx = BM25Index()
    docs = ["một hai ba", "ba bốn năm", "năm sáu bảy"]
    idx.add([10, 20, 30], docs)
    path = os.path.join(tmp_path, "bm25.json")
    idx.save(path)
    idx2 = BM25Index.load(path)
    assert idx2.n_docs == 3
    assert idx.search("năm", k=3) == idx2.search("năm", k=3)
    # incremental add after load keeps working
    idx2.add([40], ["bảy tám chín"])
    assert idx2.search("tám", k=1)[0][0] == 40


def test_bm25_duplicate_id_rejected():
    idx = BM25Index()
    idx.add([1], ["văn bản"])
    with pytest.raises(ValueError, match="already indexed"):
        idx.add([1], ["văn bản khác"])


def test_fuse_scores_weighting():
    dense = {1: 1.0, 2: 0.5}
    sparse = {2: 1.0, 3: 0.8}
    fused = fuse_scores(dense, sparse, 0.5)
    assert fused[2] == pytest.approx(0.75)
    assert fused[1] == pytest.approx(0.5)
    assert fused[3] == pytest.approx(0.4)
    assert fuse_scores(dense, sparse, 1.0)[3] == 0.0


@pytest.mark.parametrize("dtype", ["bf16", "int8", "int8_global"])
def test_store_get_vectors_dequantized(rng, dtype):
    from vietnamese_qa_system_tpu.core.mesh import SHARD_AXIS, create_mesh

    mesh = create_mesh({SHARD_AXIS: 4}, devices=jax.devices()[:4])
    store = VectorStore(512, 32, mesh=mesh, dtype=dtype, tile_n=128)
    vecs = rng.standard_normal((50, 32)).astype(np.float32)
    store.add(vecs)
    got = store.get_vectors([0, 7, 49])
    tol = 0.02 if dtype == "bf16" else 0.03
    np.testing.assert_allclose(got, vecs[[0, 7, 49]], atol=tol, rtol=tol)
    with pytest.raises(ValueError, match="out of range"):
        store.get_vectors([50])


def _build(docs, *, lexical, hybrid_weight=0.5, seed=0):
    cfg = tiny_test("encoder")
    params = encoder.init_encoder(jax.random.key(seed), cfg)
    tok = ByteTokenizer()
    store = VectorStore(512, cfg.d_model, tile_n=128)
    ds = DocStore()
    pipe = IngestPipeline(
        params, cfg, tok, store, ds, batch_size=8, max_len=48, lexical=lexical
    )
    pipe.add_texts(docs)
    return Retriever(
        params, cfg, tok, store, ds, max_len=48, query_batch=8,
        lexical=lexical, hybrid_weight=hybrid_weight,
    )


def test_hybrid_beats_dense_on_keyword_queries():
    """The done-criterion scenario: an untrained encoder retrieves rare
    keywords poorly; BM25 nails them; hybrid recall@1 must beat
    dense-only.  Queries are exact rare keywords from each doc."""
    keywords = [
        "zirconium", "quasar", "mitochondria", "byzantine", "fjord",
        "algorithmic", "petrichor", "obsidian", "zephyr", "labyrinth",
        "quartz", "nebula",
    ]
    docs = [
        f"tài liệu chung về chủ đề thường gặp có từ khoá {kw} ở giữa"
        for kw in keywords
    ]
    queries = [f"tìm từ khoá {kw}" for kw in keywords]

    dense_only = _build(docs, lexical=None)
    lex = BM25Index()
    hybrid = _build(docs, lexical=lex, hybrid_weight=0.5)

    def recall_at_1(retr):
        res = retr.search(queries, k=3)
        return np.mean([r[0].id == i for i, r in enumerate(res)])

    r_dense = recall_at_1(dense_only)
    r_hybrid = recall_at_1(hybrid)
    assert r_hybrid == 1.0, f"hybrid recall {r_hybrid}"
    assert r_hybrid > r_dense, (r_hybrid, r_dense)


def test_hybrid_fetches_docs_and_obeys_weight_1():
    docs = [f"văn bản số {i} nói về điều {i}" for i in range(8)]
    lex = BM25Index()
    retr = _build(docs, lexical=lex, hybrid_weight=0.5)
    out = retr.search([docs[4]], k=2)[0]
    assert out[0].id == 4 and out[0].doc == docs[4]
    # weight 1.0 short-circuits to the pure dense path
    retr.hybrid_weight = 1.0
    out2 = retr.search([docs[4]], k=2)[0]
    assert out2[0].id == 4


def test_native_bm25_matches_python(rng):
    """native/bm25.cpp vs the pure-Python scoring loop: same doubles
    term-for-term, accumulation order aside (~1e-12)."""
    import numpy as np

    from vietnamese_qa_system_tpu.engine.lexical import BM25Index
    from vietnamese_qa_system_tpu.native.build import get_bm25_lib

    if get_bm25_lib() is None:
        import pytest

        pytest.skip("native bm25 unavailable")

    words = [f"tu{i}" for i in range(50)] + ["chung"] * 10
    idx = BM25Index()
    docs = [
        " ".join(rng.choice(words, size=rng.integers(3, 30)))
        for _ in range(200)
    ]
    idx.add(list(range(100, 300)), docs)

    for q in ["chung tu1 tu2", "tu49", "khongco", "tu3 tu3 chung"]:
        native = idx.scores(q)

        # force the python path by hiding the lib
        import vietnamese_qa_system_tpu.native.build as nb

        lib = nb._bm25_lib
        nb._bm25_lib, nb._bm25_tried = None, True
        try:
            pure = idx.scores(q)
        finally:
            nb._bm25_lib = lib
        assert set(native) == set(pure)
        for gid in pure:
            np.testing.assert_allclose(native[gid], pure[gid], rtol=1e-9)


def test_native_bm25_speedup_sanity(rng):
    """The frozen+native path answers many queries quickly (smoke, not a
    strict perf gate — CI hosts vary)."""
    import time

    from vietnamese_qa_system_tpu.engine.lexical import BM25Index
    from vietnamese_qa_system_tpu.native.build import get_bm25_lib

    if get_bm25_lib() is None:
        import pytest

        pytest.skip("native bm25 unavailable")
    words = [f"w{i}" for i in range(500)]
    idx = BM25Index()
    docs = [
        " ".join(rng.choice(words, size=20)) for _ in range(2000)
    ]
    idx.add(list(range(2000)), docs)
    idx.scores("w1 w2")  # freeze + warm
    t0 = time.perf_counter()
    for i in range(50):
        idx.scores(f"w{i} w{i+1} w{i+2}")
    dt = time.perf_counter() - t0
    assert dt < 2.0, dt


def test_bm25_incremental_add_matches_fresh_index():
    """Streaming ingest alternating with searches (the serving pattern)
    must score identically to a one-shot build: the frozen posting arrays
    are extended incrementally (per-term segment lists), never rebuilt."""
    from vietnamese_qa_system_tpu.engine.lexical import BM25Index

    docs = [
        "hà nội là thủ đô của việt nam",
        "phở là món ăn nổi tiếng",
        "thành phố hồ chí minh lớn nhất việt nam",
        "bánh mì việt nam nổi tiếng thế giới",
        "vịnh hạ long là di sản thiên nhiên",
    ]
    inc = BM25Index()
    inc.add([0, 1], docs[:2])
    _ = inc.search("việt nam", k=5)  # freeze #1
    inc.add([2, 3], docs[2:4])
    _ = inc.search("nổi tiếng", k=5)  # incremental freeze #2
    inc.add([4], docs[4:])

    fresh = BM25Index()
    fresh.add(list(range(len(docs))), docs)

    for q in ("việt nam", "nổi tiếng", "thủ đô", "di sản", "phở bánh mì"):
        assert inc.scores(q) == pytest.approx(fresh.scores(q))
        assert inc.search(q, k=5) == pytest.approx(fresh.search(q, k=5))


def test_hybrid_large_k_respects_kernel_cap():
    """Hybrid candidate fan-out (4*k) must clamp to the fast-kernel lane
    cap (128) instead of crashing every search for k > 32."""
    docs = [f"tài liệu {i} về chủ đề {i % 9}" for i in range(200)]
    r = _build(docs, lexical=None)
    bm = BM25Index()
    bm.add(list(range(len(docs))), docs)
    r.lexical = bm
    rows = r.search(["chủ đề"], k=40)
    assert len(rows[0]) == 40
    assert len({x.id for x in rows[0]}) == 40
