"""Follow-up to probe_recall_clustered.py: int8_res rerank POOL SIZE
sweep (does K'=80/128 close the 0.978 -> 1.0 gap at 1M?) and the rerank
QPS cost at serving batch.  Run on the real chip.

Run: python scripts/probe_rerank_pool.py > /tmp/rerank_pool.log 2>&1
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
    from vietnamese_qa_system_tpu.ops.quant import quantize_int8_residual

    n, d, k = 1 << 20, 768, 10
    n_centers, sigma, qnoise = 2048, 0.35, 0.05
    n_q = 64
    print(f"backend={jax.default_backend()}", flush=True)

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

    q = make_queries(pts, jax.random.key(9))

    @jax.jit
    def rank_counts(q, pts, ids):
        scores = jnp.einsum("bd,nd->bn", q, pts)
        true_s = jnp.take_along_axis(scores, ids.astype(jnp.int32), axis=1)
        return jnp.sum(scores[:, :, None] > true_s[:, None, :], axis=1)

    def recall(ids):
        counts = np.asarray(rank_counts(q, pts, jnp.asarray(ids)))
        return float(np.mean(counts < k))

    st = VectorStore(n, d, dtype="int8_res", tile_n=2048)
    q1, s1, q2, s2 = quantize_int8_residual(pts)
    st.vectors = jax.device_put(q1[None], st._vec_sharding)
    st.scales = jax.device_put(s1[None], st._scale_sharding)
    st.res_vectors = jax.device_put(q2[None], st._vec_sharding)
    st.res_scales = jax.device_put(s2[None], st._scale_sharding)
    st.size = n

    qnp = np.asarray(q)
    for rr in (40, 80, 128):
        r = recall(np.asarray(st.topk(qnp, k, mode="turbo", rerank=rr)[1]))
        print(f"int8_res turbo rerank={rr}: recall={r:.4f}", flush=True)

    # ---- QPS cost: turbo B=256, rerank 40 vs off, one lax.scan dispatch
    B, reps = 256, 8
    qb = jax.random.normal(jax.random.key(3), (reps, B, d), jnp.float32)
    qb = qb / jnp.linalg.norm(qb, axis=-1, keepdims=True)

    def make_run(rr):
        def one(c, qx):
            s, i = st.topk(qx, k, mode="turbo", rerank=rr)
            return c, (s[0, 0], i[0, 0])

        return jax.jit(lambda qs: jax.lax.scan(one, 0, qs)[1])

    for name, rr in (("rerank40", 40), ("off", 0)):
        fn = make_run(rr)
        np.asarray(fn(qb)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(qb)[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"int8_res turbo B={B} {name}: {best*1e3:.2f} ms/batch "
              f"({B/best:.0f} QPS)", flush=True)


if __name__ == "__main__":
    main()
