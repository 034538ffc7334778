"""On-chip ivf+int8_res: the round-5 composition, measured (latency + recall).

Round 5 carried the int8_res residual level through the IVF bucket
layout (engine/ivf.py) so the recommended serving dtype (int8_res +
auto f32 rerank) composes with the recommended interactive index (IVF
at B=1).  The CPU clustered gate pins recall; this probe measures the
composition on the real chip at 1M x 768:

  - recall@10 vs a f32 rank-counting oracle: ivf+int8_res with the
    auto rerank (4k) vs rerank=0, at nprobe 8/16/32
  - B=1 latency: rerank-auto vs rerank-off (the two-stage gather cost
    at interactive batch), with the session dispatch floor printed

Corpus: the clustered random-order layout of
scripts/probe_recall_clustered.py (the realistic one).

Run: python scripts/probe_ivf_res.py > /tmp/ivf_res.log 2>&1
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vietnamese_qa_system_tpu.engine.ivf import IVFIndex
    from vietnamese_qa_system_tpu.engine.store import VectorStore

    n, d, k = 1 << 20, 768, 10
    n_centers, sigma, qnoise = 2048, 0.35, 0.05
    n_q = 64
    print(f"backend={jax.default_backend()} n={n} d={d}", flush=True)

    # session dispatch floor (CLAUDE.md: B=1 latencies are floor+kernel)
    @jax.jit
    def _bump(a):
        return a + 1.0

    xs = jnp.ones((8,), jnp.float32)
    np.asarray(_bump(xs))
    t0 = time.time()
    for _ in range(20):
        np.asarray(_bump(xs))
    floor_ms = (time.time() - t0) / 20 * 1e3
    print(f"session dispatch floor: {floor_ms:.2f} ms", flush=True)

    @jax.jit
    def gen(key):
        kc, ka, kn = jax.random.split(key, 3)
        cents = jax.random.normal(kc, (n_centers, d), jnp.float32)
        cents = cents / jnp.linalg.norm(cents, axis=1, keepdims=True)
        idx = jax.random.randint(ka, (n,), 0, n_centers)
        pts = cents[idx] + (sigma / np.sqrt(d)) * jax.random.normal(
            kn, (n, d), jnp.float32
        )
        return pts / jnp.linalg.norm(pts, axis=1, keepdims=True)

    pts = gen(jax.random.key(0))
    np.asarray(pts[0, 0])
    print("corpus generated", flush=True)

    rng = np.random.default_rng(1)
    q_ids = jnp.asarray(np.sort(rng.choice(n, n_q, replace=False)))

    @jax.jit
    def make_queries(pts, key):
        base = pts[q_ids]
        q = base + (qnoise / np.sqrt(d)) * jax.random.normal(
            key, (n_q, d), jnp.float32
        )
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    q = make_queries(pts, jax.random.key(7))
    np.asarray(q[0, 0])

    # f32 oracle ids (top-k by brute force, on device, chunked over n)
    @jax.jit
    def oracle(q, pts):
        s = q @ pts.T  # (n_q, n) — 4 GB f32 transient is fine at n_q=64
        return jax.lax.top_k(s, k)[1]

    ref = np.asarray(oracle(q, pts))
    print("oracle done", flush=True)

    store = VectorStore(n, d, dtype="int8_res")
    # add in host chunks (store.add takes host arrays)
    chunk = 1 << 17
    pts_host = np.asarray(pts)
    for lo in range(0, n, chunk):
        store.add(pts_host[lo:lo + chunk])
    print("store built", flush=True)

    idx = IVFIndex.build(store, nprobe=8)
    print(f"ivf built: {idx.n_clusters} clusters", flush=True)

    def recall(ids):
        ids = np.asarray(ids)
        return float(np.mean([
            len(set(ids[r].tolist()) & set(ref[r].tolist())) / k
            for r in range(n_q)
        ]))

    for nprobe in (8, 16, 32):
        for rr, tag in ((None, "rerank_auto"), (0, "rerank_off")):
            _s, ids = idx.topk(q, k, nprobe=nprobe, rerank=rr)
            rec = {"nprobe": nprobe, "arm": tag,
                   "recall_at_10": round(recall(ids), 4)}
            print(json.dumps(rec), flush=True)

    # B=1 latency, rerank auto vs off (median of 30 calls, floor noted)
    q1 = q[:1]
    for rr, tag in ((None, "rerank_auto"), (0, "rerank_off")):
        _ = idx.topk(q1, k, rerank=rr)  # warm
        ts = []
        for _i in range(30):
            t0 = time.time()
            s, i1 = idx.topk(q1, k, rerank=rr)
            np.asarray(i1)
            ts.append(time.time() - t0)
        med = float(np.median(ts)) * 1e3
        print(json.dumps({"arm": f"b1_{tag}",
                          "median_ms": round(med, 3),
                          "minus_floor_ms": round(med - floor_ms, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
