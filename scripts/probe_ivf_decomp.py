"""Decompose the IVF query's per-batch cost on the real chip.

probe_ivf.py (1M x 768, int8, C=4096, nprobe=8) measured IVF at 5.2 ms
per B=1 batch while the bytes it touches (~128 MB, mostly the spill
region) predict ~0.4 ms at DMA rate.  This probe times each stage of
engine/ivf.py::_build_query_fn in isolation (in-dispatch scan timing,
carry-dependent queries per CLAUDE.md's LICM rule) to find the hot spot:

  a) centroid scan + lax.top_k(C)            -- route selection
  b) a + bucket gather (B,P,cap,D)           -- the XLA gather
  c) b + bucket einsum + scale fold          -- probed scoring
  d) spill-region matmul alone               -- the always-scanned tail
  e) full query fn (reference point)

Run: python scripts/probe_ivf_decomp.py > /tmp/ivf_decomp.log 2>&1
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vietnamese_qa_system_tpu.engine.store import VectorStore
from vietnamese_qa_system_tpu.engine.ivf import IVFIndex
from vietnamese_qa_system_tpu.ops.quant import quantize_int8_reference


def scan_time(run, reps, rounds=3):
    """Best-of-rounds wall time of a pre-jitted thunk; caller bakes reps
    inside one dispatch."""
    np.asarray(run()[0])
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = run()
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--clusters", type=int, default=4096)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    n, d, b = args.n, args.d, args.batch
    print(f"backend={jax.default_backend()} n={n} d={d} "
          f"C={args.clusters} p={args.nprobe} B={b}", flush=True)

    # -- tunnel floor ----------------------------------------------------
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(tiny(z))
    floor = min(
        (lambda t0: (np.asarray(tiny(z)), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(8)
    )
    print(f"tunnel floor: {floor*1e3:.2f} ms", flush=True)

    # -- clustered corpus (same generator as probe_ivf) -------------------
    n_centers, sigma = 4096, 2.0

    @jax.jit
    def gen(key):
        kc, kn = jax.random.split(key)
        cents = jax.random.normal(kc, (n_centers, d), jnp.float32)
        cents = cents / jnp.linalg.norm(cents, axis=1, keepdims=True)
        idx = jnp.arange(n) % n_centers
        pts = cents[idx] + (sigma / np.sqrt(d)) * jax.random.normal(
            kn, (n, d), jnp.float32
        )
        return pts / jnp.linalg.norm(pts, axis=1, keepdims=True)

    pts = gen(jax.random.key(0))
    np.asarray(pts[0, 0])
    print("corpus generated", flush=True)

    store = VectorStore(n, d, dtype="int8")
    qv, qs = quantize_int8_reference(pts)
    store.vectors = jax.device_put(qv[None], store._vec_sharding)
    store.scales = jax.device_put(qs[None], store._scale_sharding)
    store.size = n
    qall = np.asarray(pts[:b], np.float32)
    del pts

    ivf = IVFIndex.build(
        store, n_clusters=args.clusters, nprobe=args.nprobe,
        kmeans_iters=10, sample_n=131072, seed=0,
    )
    spill = int(ivf._spill_counts.sum())
    print(f"built: cap={ivf.cap} spill={spill} "
          f"({100.0*spill/n:.1f}%) spill_cap={ivf.spill_vecs.shape[1]}",
          flush=True)

    cents = ivf.centroids
    buckets, bscales, bgids = ivf.buckets, ivf.bucket_scales, ivf.bucket_gids
    spv, sps = ivf.spill_vecs, ivf.spill_scales
    p, cap = args.nprobe, ivf.cap
    reps = args.reps

    qbase = jnp.asarray(qall, jnp.float32)

    def staged(stage):
        @jax.jit
        def run(qb, cents, buckets, bscales, bgids, spv, sps):
            def body(c, i):
                # carry-dependent input: no LICM hoist
                q = qb + 1e-6 * c
                bq = q.astype(jnp.bfloat16)
                cscores = jnp.dot(
                    bq, cents.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                _, probe = jax.lax.top_k(cscores, p)
                out = cscores[0, 0]
                if stage >= 1:
                    bv = buckets[0][probe]
                    out = out + bv[0, 0, 0, 0].astype(jnp.float32)
                if stage >= 2:
                    sc = jnp.einsum(
                        "bd,bpcd->bpc", bq, bv.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ) * bscales[0][probe]
                    out = out + sc[0, 0, 0]
                if stage >= 3:
                    ssc = jnp.dot(
                        bq, spv[0].astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32,
                    ) * sps[0][None, :]
                    out = out + ssc[0, 0]
                return c + out * 0.0 + 1.0, out

            c, outs = jax.lax.scan(body, 0.0, jnp.arange(reps))
            return outs, c

        return lambda: run(qbase, cents, buckets, bscales, bgids, spv, sps)

    names = ["a) centroid+topk", "b) +bucket gather", "c) +bucket einsum",
             "d) +spill matmul"]
    times = []
    for st, name in enumerate(names):
        t = scan_time(staged(st), reps)
        per = max(t - floor, 1e-9) / reps * 1e3
        times.append(per)
        print(f"{name:22s}: {per:7.3f} ms/iter", flush=True)

    # full query fn, same timing scheme
    np.asarray(ivf.topk(qall, 10)[0])
    fn = ivf._query_cache[(b, 10, p)]

    @jax.jit
    def run_full(qb, *ops):
        def body(c, i):
            s, ids = fn(qb + 1e-6 * c, *ops)
            return c + s[0, 0] * 0.0 + 1.0, s[0, 0]

        c, outs = jax.lax.scan(body, 0.0, jnp.arange(reps))
        return outs, c

    ops = (cents, buckets, bscales, bgids, spv, sps, ivf.spill_gids)
    t = scan_time(lambda: run_full(qbase, *ops), reps)
    print(f"e) full query fn      : {max(t-floor,1e-9)/reps*1e3:7.3f} "
          f"ms/iter", flush=True)
    print("deltas: gather={:.3f} einsum={:.3f} spill={:.3f}".format(
        times[1] - times[0], times[2] - times[1], times[3] - times[2]),
        flush=True)


if __name__ == "__main__":
    main()
