"""Serving-layer throughput probe: sequential vs micro-batched QPS.

Drives the REAL serving stack (HTTP server -> MicroBatcher -> Retriever:
tokenize -> encoder forward -> fused top-k -> sqlite doc fetch) on a
synthetic index, comparing the reference's request shape (one query, one
dispatch — heavy_ranker.py:97-115) against concurrent clients whose
requests coalesce into one batched TPU dispatch (engine/server.py).

The index vectors are generated ON DEVICE (host->device ~23 MB/s under
axon; see CLAUDE.md) and only doc ids come back.

Usage:
  python scripts/probe_serve.py --n-vecs 100000 --clients 64 --requests 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vecs", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--encoder", default="minilm", choices=["minilm", "tiny"])
    ap.add_argument("--dtype", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--sequential", type=int, default=32,
                    help="requests for the one-by-one baseline arm")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_serve.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from vietnamese_qa_system_tpu.data.tokenizer import ByteTokenizer
    from vietnamese_qa_system_tpu.engine import (
        DocStore, Retriever, ServingApp, VectorStore, make_server,
    )
    from vietnamese_qa_system_tpu.models import config as mcfg, encoder

    cfg = (mcfg.minilm_class() if args.encoder == "minilm"
           else mcfg.tiny_test("encoder"))
    dim = cfg.d_model
    params = encoder.init_encoder(jax.random.key(0), cfg)
    tok = ByteTokenizer()

    store = VectorStore(args.n_vecs, dim, dtype=args.dtype)
    # on-device corpus: random unit vectors, added in store-shaped slabs
    slab = min(args.n_vecs, 65536)
    for off in range(0, args.n_vecs, slab):
        n = min(slab, args.n_vecs - off)
        v = jax.random.normal(jax.random.key(off + 1), (n, dim), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        store.add(np.asarray(v))
    docstore = DocStore()
    ids = list(range(args.n_vecs))
    # doc rows only for the ids we can hit (all of them; text is cheap)
    docstore.insert(ids, [f"doc {i}" for i in ids])

    retr = Retriever(params, cfg, tok, store, docstore, max_len=64,
                     query_batch=args.max_batch)
    app = ServingApp(retr, k=args.k, max_batch=args.max_batch,
                     max_wait_s=0.01)
    httpd = make_server(app, port=0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://{httpd.server_address[0]}:{httpd.server_address[1]}"

    queries = [f"truy vấn số {i} về chủ đề {i % 97}" for i in range(args.requests)]
    _post(base + "/search", {"query": "khởi động"})  # warm compile

    # arm 1: the reference's shape — one query at a time
    t0 = time.perf_counter()
    for q in queries[: args.sequential]:
        _post(base + "/search", {"query": q})
    seq_s = time.perf_counter() - t0
    seq_qps = args.sequential / seq_s

    # arm 2: concurrent clients, micro-batched dispatches
    before = dict(app._search_batcher.stats)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.clients) as pool:
        list(pool.map(lambda q: _post(base + "/search", {"query": q}), queries))
    conc_s = time.perf_counter() - t0
    conc_qps = args.requests / conc_s
    stats = app._search_batcher.stats
    batches = stats["batches"] - before["batches"]

    rec = {
        "encoder": args.encoder, "dtype": args.dtype,
        "n_vecs": args.n_vecs, "k": args.k,
        "sequential_qps": round(seq_qps, 1),
        "concurrent_qps": round(conc_qps, 1),
        "speedup": round(conc_qps / seq_qps, 2),
        "clients": args.clients,
        "requests": args.requests,
        "batches": batches,
        "mean_batch": round(args.requests / max(batches, 1), 1),
        "max_batch_seen": stats["max_batch"],
    }
    print(json.dumps(rec), flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    httpd.shutdown()
    app.close()


if __name__ == "__main__":
    main()
