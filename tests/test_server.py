"""HTTP serving layer tests: micro-batcher semantics, end-to-end JSON API
over a real (tiny) index, and error paths.

Parity/extension target: the reference serves retrieval one query at a
time (reference inference_pipeline/db_utils/heavy_ranker.py:97-115) and
generation from a REPL (ds_inference.py:52-60); engine/server.py replaces
both with a batched HTTP surface.
"""

import json
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np
import pytest

from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
from vietnamese_qa_system_tpu.engine import (
    DocStore,
    IngestPipeline,
    MicroBatcher,
    Retriever,
    ServingApp,
    VectorStore,
    make_server,
)
from vietnamese_qa_system_tpu.models import encoder, tiny_test


# ------------------------------------------------------------ MicroBatcher


def test_microbatcher_batches_under_load():
    """While the fn is busy with the first item, later submissions must
    coalesce into ONE following batch (the whole point of the design)."""
    calls = []
    gate = threading.Event()

    def fn(items):
        calls.append(len(items))
        if len(calls) == 1:
            gate.wait(timeout=5.0)  # hold batch 1 until the others queue up
        return [x * 2 for x in items]

    b = MicroBatcher(fn, max_batch=8, max_wait_s=0.01)
    try:
        first = b.submit(1)
        time.sleep(0.05)  # let the worker pick up batch 1 and block
        rest = [b.submit(x) for x in (2, 3, 4)]
        time.sleep(0.05)  # all three are queued before the gate opens
        gate.set()
        assert first.result(timeout=5.0) == 2
        assert [f.result(timeout=5.0) for f in rest] == [4, 6, 8]
        assert calls[0] == 1 and calls[1] == 3  # coalesced
        assert b.stats["requests"] == 4 and b.stats["max_batch"] == 3
    finally:
        b.close()


def test_microbatcher_respects_max_batch():
    done = threading.Event()

    def fn(items):
        if not done.is_set():
            done.wait(timeout=5.0)
        return list(items)

    b = MicroBatcher(fn, max_batch=2, max_wait_s=0.01)
    try:
        futs = [b.submit(i) for i in range(5)]
        time.sleep(0.05)
        done.set()
        assert [f.result(timeout=5.0) for f in futs] == list(range(5))
        assert b.stats["max_batch"] <= 2
    finally:
        b.close()


def test_microbatcher_propagates_errors_and_survives():
    def fn(items):
        if any(x < 0 for x in items):
            raise ValueError("negative")
        return items

    b = MicroBatcher(fn, max_batch=1, max_wait_s=0.0)
    try:
        with pytest.raises(ValueError):
            b.submit(-1).result(timeout=5.0)
        # the worker must keep serving after a failed batch
        assert b.submit(7).result(timeout=5.0) == 7
    finally:
        b.close()


# ------------------------------------------------------------- HTTP server


def _post(url, payload, timeout=30):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope="module")
def serving():
    """Tiny encoder + 40-passage index behind a live ephemeral-port
    server (the cli serve --port path minus argparse)."""
    cfg = tiny_test("encoder")
    params = encoder.init_encoder(jax.random.key(0), cfg)
    tok = ByteTokenizer()
    store = VectorStore(1024, cfg.d_model, tile_n=128)
    docstore = DocStore()
    pipe = IngestPipeline(
        params, cfg, tok, store, docstore, batch_size=16, max_len=32
    )
    passages = [f"đoạn văn số {i} nói về chủ đề {i % 7}" for i in range(40)]
    pipe.add_texts(passages)
    retr = Retriever(
        params, cfg, tok, store, docstore, max_len=32, query_batch=16
    )
    app = ServingApp(
        retr, ingest=pipe, k=3, max_batch=16, max_wait_s=0.02,
        max_ingest_texts=8,
    )
    httpd = make_server(app, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://{httpd.server_address[0]}:{httpd.server_address[1]}"
    yield base, passages, app
    httpd.shutdown()
    httpd.server_close()
    app.close()


def test_healthz(serving):
    base, _, _ = serving
    with urllib.request.urlopen(base + "/healthz", timeout=10) as resp:
        got = json.loads(resp.read())
    assert got["ok"] and got["index_size"] >= 40 and got["qa"] is False
    assert got["ingest"] is True


def test_search_self_retrieval(serving):
    base, passages, _ = serving
    got = _post(base + "/search", {"query": passages[5]})
    assert got["results"][0]["id"] == 5
    assert got["results"][0]["doc"] == passages[5]
    assert got["results"][0]["score"] > 0.99
    assert len(got["results"]) == 3  # server default k


def test_search_respects_per_request_k(serving):
    base, passages, _ = serving
    got = _post(base + "/search", {"query": passages[0], "k": 1})
    assert len(got["results"]) == 1


def test_concurrent_requests_batch_and_answer(serving):
    """16 concurrent clients: every answer correct, and the batcher must
    have fused at least some requests (fewer batches than requests)."""
    base, passages, app = serving
    before = dict(app._search_batcher.stats)
    with ThreadPoolExecutor(max_workers=16) as pool:
        results = list(
            pool.map(
                lambda i: _post(base + "/search", {"query": passages[i]}),
                range(16),
            )
        )
    for i, got in enumerate(results):
        assert got["results"][0]["id"] == i, f"query {i} mis-routed"
    made = app._search_batcher.stats["batches"] - before["batches"]
    assert made < 16, "no micro-batching happened under concurrent load"


def test_online_ingest_then_search(serving):
    """POST /ingest grows the live index (no rebuild/restart — beyond the
    reference's offline one-shot index build) and the new passage is
    immediately retrievable."""
    base, _, app = serving
    new_text = "văn bản trực tuyến hoàn toàn mới về chủ đề đặc biệt"
    got = _post(base + "/ingest", {"texts": [new_text], "sources": ["api"]})
    assert got["ids"] == [40] and got["index_size"] == 41
    found = _post(base + "/search", {"query": new_text, "k": 1})
    assert found["results"][0]["id"] == 40
    assert found["results"][0]["doc"] == new_text
    assert found["results"][0]["source"] == "api"
    with urllib.request.urlopen(base + "/healthz", timeout=10) as resp:
        assert json.loads(resp.read())["index_size"] == 41


def test_ingest_request_validation(serving):
    base, _, _ = serving
    for payload in ({}, {"texts": "not a list"}, {"texts": [1, 2]},
                    {"texts": []}, {"texts": ["x"] * 9}):
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(base + "/ingest", payload)
        assert err.value.code == 400


def test_qa_endpoint_without_reader_is_400(serving):
    base, _, _ = serving
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base + "/qa", {"question": "có gì?"})
    assert err.value.code == 400


def test_bad_requests_are_400(serving):
    base, _, _ = serving
    for payload in ({}, {"query": ""}, {"query": 42}):
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(base + "/search", payload)
        assert err.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(base + "/nope", {"query": "x"})
    assert err.value.code == 404


def test_non_dict_body_is_400(serving):
    base, _, _ = serving
    for body in ([1, 2], "hello", 7):
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(base + "/search", body)
        assert err.value.code == 400


def test_invalid_k_rejected_without_failing_the_batch(serving):
    """A malformed k must 400 its own request only — it is validated
    before submit, so co-batched requests never see it."""
    base, passages, _ = serving
    for bad_k in (0, -1, "10", True, 99):  # max_k == server k == 3
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(base + "/search", {"query": passages[0], "k": bad_k})
        assert err.value.code == 400, f"k={bad_k!r}"
    # a valid request right after is untouched
    got = _post(base + "/search", {"query": passages[0], "k": 2})
    assert got["results"][0]["id"] == 0 and len(got["results"]) == 2


def test_microbatcher_close_fails_queued_items():
    gate = threading.Event()

    def fn(items):
        gate.wait(timeout=5.0)
        return list(items)

    b = MicroBatcher(fn, max_batch=1, max_wait_s=0.0)
    first = b.submit(1)
    time.sleep(0.05)  # worker picks up item 1 and blocks on the gate
    stranded = b.submit(2)  # stays queued behind the blocked batch
    # close while the worker is still wedged in batch 1: the queued item
    # must be failed fast, not left to hang its waiter
    b.close()
    with pytest.raises(RuntimeError):
        stranded.result(timeout=5.0)
    with pytest.raises(RuntimeError):
        b.submit(3)
    gate.set()  # release the wedged batch; its own waiter still succeeds
    assert first.result(timeout=5.0) == 1


# ------------------------------------------- round-2 review regression tests


def test_microbatcher_submit_after_close_raises():
    b = MicroBatcher(lambda items: list(items), max_batch=2, max_wait_s=0.0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(1)


def test_search_on_index_smaller_than_k():
    """Online-ingest-from-empty serving: a store smaller than max_k must
    return the rows that exist, not fail the whole micro-batch with
    store.topk's size<k ValueError."""
    cfg = tiny_test("encoder")
    params = encoder.init_encoder(jax.random.key(0), cfg)
    tok = ByteTokenizer()
    store = VectorStore(256, cfg.d_model, tile_n=128)
    pipe = IngestPipeline(
        params, cfg, tok, store, DocStore(), batch_size=8, max_len=32
    )
    retr = Retriever(
        params, cfg, tok, store, pipe.docstore, max_len=32, query_batch=8
    )
    app = ServingApp(retr, ingest=pipe, k=5, max_k=10, max_batch=4)
    try:
        # empty index: valid request, zero results
        assert app.search("xin chào", 5) == {"results": []}
        app.add_texts(["một", "hai"])
        out = app.search("một", 5)
        assert len(out["results"]) == 2
        # grow past k: full rows return
        app.add_texts([f"đoạn {i}" for i in range(8)])
        assert len(app.search("đoạn", 5)["results"]) == 5
    finally:
        app.close()


def test_ingest_sources_validation(serving):
    base, _, app = serving
    size_before = app.retriever.store.size
    for bad in (
        {"texts": ["a", "b"], "sources": ["only-one"]},
        {"texts": ["a", "b"], "sources": "ab"},
        {"texts": ["a", "b"], "sources": [1, 2]},
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/ingest", bad)
        assert e.value.code == 400
    # nothing was indexed by any failed request
    assert app.retriever.store.size == size_before


def test_index_vectors_failure_leaves_store_unchanged():
    """index_vectors validates (and writes the docstore) BEFORE mutating
    the vector store, so a failed ingest cannot strand doc-less vectors
    that every later search would surface."""
    cfg = tiny_test("encoder")
    params = encoder.init_encoder(jax.random.key(0), cfg)
    tok = ByteTokenizer()
    store = VectorStore(64, cfg.d_model, tile_n=128)
    pipe = IngestPipeline(
        params, cfg, tok, store, DocStore(), batch_size=8, max_len=32
    )
    vecs = np.ones((2, cfg.d_model), np.float32)
    with pytest.raises(ValueError, match="sources length"):
        pipe.index_vectors(vecs, ["a", "b"], sources=["s"])
    with pytest.raises(ValueError, match="vector count"):
        pipe.index_vectors(vecs, ["a"])
    over = store.capacity + 1  # capacity rounds up to tile-aligned shards
    with pytest.raises(ValueError, match="store full"):
        pipe.index_vectors(np.ones((over, cfg.d_model), np.float32),
                           ["x"] * over)
    assert store.size == 0


def test_oversized_content_length_is_413(serving):
    import socket

    base, _, _ = serving
    host, port = base.replace("http://", "").split(":")
    with socket.create_connection((host, int(port)), timeout=10) as s:
        s.sendall(
            b"POST /ingest HTTP/1.1\r\n"
            b"Host: x\r\nContent-Type: application/json\r\n"
            b"Content-Length: 999999999999\r\n\r\n"
        )
        reply = s.recv(4096).decode()
    assert "413" in reply.split("\r\n")[0]


def test_serving_max_k_over_kernel_cap_fails_at_startup():
    cfg = tiny_test("encoder")
    params = encoder.init_encoder(jax.random.key(0), cfg)
    tok = ByteTokenizer()
    store = VectorStore(256, cfg.d_model, tile_n=128)
    retr = Retriever(params, cfg, tok, store, max_len=32, query_batch=8)
    with pytest.raises(ValueError, match="128"):
        ServingApp(retr, k=10, max_k=200)


# ------------------------------------------------------- /generate endpoint


@pytest.fixture(scope="module")
def serving_gen():
    """Retrieval app + a continuous-batching causal reader behind
    /generate (the cli serve --continuous-slots path minus argparse)."""
    from vietnamese_qa_system_tpu.engine import ContinuousEngine
    from vietnamese_qa_system_tpu.models import ModelConfig
    from vietnamese_qa_system_tpu.models.causal_lm import init_causal_lm

    cfg = tiny_test("encoder")
    params = encoder.init_encoder(jax.random.key(0), cfg)
    tok = ByteTokenizer()
    store = VectorStore(256, cfg.d_model, tile_n=128)
    docstore = DocStore()
    pipe = IngestPipeline(
        params, cfg, tok, store, docstore, batch_size=16, max_len=32
    )
    pipe.add_texts([f"tài liệu {i}" for i in range(8)])
    retr = Retriever(
        params, cfg, tok, store, docstore, max_len=32, query_batch=16
    )
    gcfg = ModelConfig(arch="causal", vocab_size=tok.vocab_size, d_model=32,
                       n_heads=4, n_layers=2, d_ff=64, max_seq_len=256)
    gp = init_causal_lm(jax.random.key(1), gcfg)
    # one LoRA adapter with a non-zero B so /generate?adapter=vi differs
    from vietnamese_qa_system_tpu.models.lora import LoraConfig, init_lora

    lcfg = LoraConfig(r=4, alpha=8)
    ad = init_lora(jax.random.key(2), gp, lcfg)
    leaves, tree = jax.tree_util.tree_flatten(ad)
    ks = jax.random.split(jax.random.key(3), len(leaves))
    ad = jax.tree_util.tree_unflatten(
        tree, [jax.random.normal(k, l.shape, l.dtype) * 0.3
               for k, l in zip(ks, leaves)]
    )
    gen = ContinuousEngine(gp, gcfg, n_slots=2, total=96, buckets=(32, 64),
                           chunk_steps=4, eos_id=tok.eos_id,
                           default_max_new=16,
                           adapters={"vi": ad}, lora_config=lcfg)
    app = ServingApp(retr, ingest=pipe, gen=gen, tokenizer=tok, k=3,
                     max_batch=16, max_wait_s=0.02)
    httpd = make_server(app, port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://{httpd.server_address[0]}:{httpd.server_address[1]}"
    yield base, app
    httpd.shutdown()
    httpd.server_close()
    app.close()  # closes the engine too (ownership)


def test_generate_endpoint(serving_gen):
    base, _ = serving_gen
    out = _post(base + "/generate",
                {"prompt": "xin chào", "max_new_tokens": 8}, timeout=120)
    assert 1 <= out["n_new"] <= 8
    assert len(out["ids"]) == out["n_new"]
    assert isinstance(out["text"], str)
    # per-request sampling rides the same compiled program; top_k=1 at
    # temperature > 0 keeps only the argmax, so it matches the greedy run
    sampled = _post(base + "/generate",
                    {"prompt": "xin chào", "max_new_tokens": 8,
                     "temperature": 1.5, "top_k": 1}, timeout=120)
    assert sampled["ids"] == out["ids"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/generate", {"prompt": "a", "temperature": -2})
    assert e.value.code == 400
    assert "temperature" in json.loads(e.value.read())["error"]


def test_generate_concurrent_requests(serving_gen):
    base, app = serving_gen
    with ThreadPoolExecutor(max_workers=5) as ex:
        outs = list(ex.map(
            lambda i: _post(base + "/generate",
                            {"prompt": f"câu hỏi số {i}",
                             "max_new_tokens": 6}, timeout=120),
            range(5),
        ))
    assert all(1 <= o["n_new"] <= 6 for o in outs)
    health = json.loads(
        urllib.request.urlopen(base + "/healthz", timeout=10).read()
    )
    gstats = health["stats"]["generate"]
    assert health["generate"] is True
    assert gstats["completed"] >= 6 and "latency_ms" in gstats


def test_generate_validation(serving_gen):
    base, _ = serving_gen
    for payload, frag in [
        ({}, "missing 'prompt'"),
        ({"prompt": "a", "max_new_tokens": 0}, "max_new_tokens"),
        ({"prompt": "a", "max_new_tokens": "x"}, "max_new_tokens"),
        ({"prompt": "y" * 200}, "largest bucket"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/generate", payload)
        assert e.value.code == 400
        assert frag in json.loads(e.value.read())["error"]


def test_generate_without_engine_is_400(serving):
    base, _, _ = serving
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/generate", {"prompt": "hi"})
    assert e.value.code == 400
    assert "no generation engine" in json.loads(e.value.read())["error"]


def test_gen_engine_requires_tokenizer():
    with pytest.raises(ValueError, match="tokenizer"):
        ServingApp(object(), gen=object(), tokenizer=None)


def test_generate_with_adapter(serving_gen):
    """Multi-LoRA serving over HTTP: the adapter route answers, is listed
    in /healthz, and an unknown name fails only its own request."""
    base, _ = serving_gen
    out_base = _post(base + "/generate",
                     {"prompt": "việt nam", "max_new_tokens": 8},
                     timeout=120)
    out_vi = _post(base + "/generate",
                   {"prompt": "việt nam", "max_new_tokens": 8,
                    "adapter": "vi"}, timeout=120)
    assert 1 <= out_vi["n_new"] <= 8
    # a random non-zero adapter virtually always changes the greedy path
    assert out_vi["ids"] != out_base["ids"]
    health = json.loads(
        urllib.request.urlopen(base + "/healthz", timeout=10).read()
    )
    assert health["stats"]["generate"]["adapters"] == ["vi"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/generate", {"prompt": "a", "adapter": "nope"})
    assert e.value.code == 400
    assert "unknown adapter" in json.loads(e.value.read())["error"]
