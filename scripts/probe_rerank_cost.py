"""Rerank QPS cost on int8_res at 1M: direct store.topk dispatch timing
with the session tunnel floor measured in-process and subtracted
(CLAUDE.md timing rules; ratios of (time - floor) reported).

Run: python scripts/probe_rerank_cost.py > /tmp/rerank_cost.log 2>&1
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

    n, d, k, B = 1 << 20, 768, 10, 256
    print(f"backend={jax.default_backend()}", flush=True)

    @jax.jit
    def tiny(x):
        return x + 1.0

    np.asarray(tiny(jnp.zeros((8, 8))))
    floor = min(
        _t(lambda: np.asarray(tiny(jnp.zeros((8, 8))))) for _ in range(20)
    )
    print(f"tunnel floor: {floor*1e3:.2f} ms", flush=True)

    pts = jax.random.normal(jax.random.key(0), (n, d), jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=1, keepdims=True)
    st = VectorStore(n, d, dtype="int8_res", tile_n=2048)
    q1, s1, q2, s2 = quantize_int8_residual(pts)
    st.vectors = jax.device_put(q1[None], st._vec_sharding)
    st.scales = jax.device_put(s1[None], st._scale_sharding)
    st.res_vectors = jax.device_put(q2[None], st._vec_sharding)
    st.res_scales = jax.device_put(s2[None], st._scale_sharding)
    st.size = n
    del pts, q1, s1, q2, s2
    print("store built", flush=True)

    q = np.random.default_rng(0).standard_normal((B, d)).astype(np.float32)
    res = {}
    for name, rr in (("rerank40", 40), ("off", 0)):
        np.asarray(st.topk(q, k, mode="turbo", rerank=rr)[0])  # compile
        best = float("inf")
        for _ in range(12):
            t0 = time.perf_counter()
            np.asarray(st.topk(q, k, mode="turbo", rerank=rr)[0])
            best = min(best, time.perf_counter() - t0)
        res[name] = best - floor
        print(f"int8_res turbo B={B} {name}: {best*1e3:.2f} ms raw, "
              f"{(best-floor)*1e3:.2f} ms -floor "
              f"({B/(best-floor):.0f} QPS)", flush=True)
    print(f"rerank cost: {res['rerank40']/res['off']:.3f}x", flush=True)


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
