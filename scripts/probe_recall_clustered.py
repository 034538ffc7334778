"""Real-chip recall-by-corpus-type probe at 1M x 768 (VERDICT r3 task 5).

Generates a REALISTICALLY-ORDERED clustered corpus on device (random
cluster assignment — NOT probe_ivf.py's round-robin layout, whose
stride ≡ 0 (mod 128) collides cluster-mates into one selection lane
bucket and caused round 3's "flat turbo = 0.40" reading), builds
bf16 / int8 / int8_res stores over the same vectors, and measures
recall@10 vs a rank-counting f32 oracle for fast/turbo x rerank
default/off, plus the rerank QPS cost on int8_res at B=256.

Run: python scripts/probe_recall_clustered.py > /tmp/recall_clustered.log 2>&1
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vietnamese_qa_system_tpu.engine.store import VectorStore
    from vietnamese_qa_system_tpu.ops.quant import (
        quantize_int8_reference,
        quantize_int8_residual,
    )

    n, d, k = 1 << 20, 768, 10
    n_centers, sigma, qnoise = 2048, 0.35, 0.05
    n_q = 64
    print(f"backend={jax.default_backend()} n={n} d={d}", flush=True)

    @jax.jit
    def gen(key):
        kc, ka, kn = jax.random.split(key, 3)
        cents = jax.random.normal(kc, (n_centers, d), jnp.float32)
        cents = cents / jnp.linalg.norm(cents, axis=1, keepdims=True)
        idx = jax.random.randint(ka, (n,), 0, n_centers)  # realistic order
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

    q = make_queries(pts, jax.random.key(9))

    @jax.jit
    def rank_counts(q, pts, ids):
        scores = jnp.einsum("bd,nd->bn", q, pts)  # f32 oracle
        true_s = jnp.take_along_axis(scores, ids.astype(jnp.int32), axis=1)
        return jnp.sum(scores[:, :, None] > true_s[:, None, :], axis=1)

    def recall(ids):
        counts = np.asarray(rank_counts(q, pts, jnp.asarray(ids)))
        return float(np.mean(counts < k))

    def build(dtype):
        st = VectorStore(n, d, dtype=dtype, tile_n=2048)
        if dtype == "bf16":
            st.vectors = jax.device_put(
                pts[None].astype(jnp.bfloat16), st._vec_sharding)
        elif dtype == "int8":
            qv, qs = quantize_int8_reference(pts)
            st.vectors = jax.device_put(qv[None], st._vec_sharding)
            st.scales = jax.device_put(qs[None], st._scale_sharding)
        else:  # int8_res
            q1, s1, q2, s2 = quantize_int8_residual(pts)
            st.vectors = jax.device_put(q1[None], st._vec_sharding)
            st.scales = jax.device_put(s1[None], st._scale_sharding)
            st.res_vectors = jax.device_put(q2[None], st._vec_sharding)
            st.res_scales = jax.device_put(s2[None], st._scale_sharding)
        st.size = n
        return st

    qnp = np.asarray(q)
    for dtype in ("bf16", "int8", "int8_res"):
        st = build(dtype)
        for mode in ("fast", "turbo"):
            r_def = recall(np.asarray(st.topk(qnp, k, mode=mode)[1]))
            r_off = recall(
                np.asarray(st.topk(qnp, k, mode=mode, rerank=0)[1]))
            print(f"{dtype:9s} {mode:6s} default={r_def:.4f} "
                  f"rerank-off={r_off:.4f}", flush=True)
        del st

    # ---- rerank QPS cost on int8_res at serving batch (single-dispatch
    # scan over distinct query batches per CLAUDE.md timing rules)
    st = build("int8_res")
    B, reps = 256, 8
    qb = jax.random.normal(jax.random.key(3), (reps, B, d), jnp.float32)
    qb = qb / jnp.linalg.norm(qb, axis=-1, keepdims=True)

    def timed(rr):
        fn = st._query_cache.get(("scan", rr))
        if fn is None:
            def one(carry, qx):
                s, i = st.topk(qx, k, mode="turbo", rerank=rr)
                return carry, (s[0, 0], i[0, 0])

            # store.topk jits internally; wrap the scan outside
            def run(qs):
                import jax as _j
                return _j.lax.scan(one, 0, qs)[1]

            fn = jax.jit(run)
            st._query_cache[("scan", rr)] = fn
        np.asarray(fn(qb)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(qb)[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    t_def = timed(None)
    t_off = timed(0)
    print(f"int8_res turbo B={B}: rerank-default {t_def*1e3:.2f} ms/batch "
          f"({B/t_def:.0f} QPS), rerank-off {t_off*1e3:.2f} ms/batch "
          f"({B/t_off:.0f} QPS), cost {t_def/t_off:.3f}x", flush=True)


if __name__ == "__main__":
    main()
