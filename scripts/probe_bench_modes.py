"""Same-process A/B of the headline-bench kernel mode (VERDICT r4 #6).

bench.py pins mode="turbo" bf16 while the documented default serving
contract is mode="fast" + dtype-appropriate auto-rerank (bf16 stores
never rerank — their recall is 1.000 measured, so on the bench corpus
the two configs differ ONLY in kernel mode).  This probe measures the
turbo-vs-fast delta in one process at the exact bench geometry so the
recorded justification for benching turbo is a number, not an opinion.

Usage:  python scripts/probe_bench_modes.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="turbo,fast")
    ap.add_argument("--n", type=int, default=1024 * 1024)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_bench_modes.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from vietnamese_qa_system_tpu.ops import matmul_topk

    B, D, N, K, TILE = args.b, args.d, args.n, args.k, args.tile
    kq, kc = jax.random.split(jax.random.key(0))
    corpus = jax.random.normal(kc, (N, D), jnp.bfloat16)
    np.asarray(jnp.sum(corpus[::4096, 0]))  # materialize
    qs = jax.random.normal(kq, (args.reps, B, D), jnp.bfloat16)
    out_f = open(args.out, "a")

    for mode in args.modes.split(","):
        @jax.jit
        def run_many(qs, corpus, _mode=mode):
            def body(_, qb):
                s, i = matmul_topk(qb, corpus, K, tile_n=TILE,
                                   mode=_mode)
                return 0, (s[0, 0], i[0, 0])

            _, outs = jax.lax.scan(body, 0, qs)
            return outs

        np.asarray(run_many(qs, corpus)[0])  # compile + settle
        dt = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            np.asarray(run_many(qs, corpus)[0])
            dt = min(dt, (time.perf_counter() - t0) / args.reps)
        rec = {"mode": mode, "B": B, "N": N,
               "ms_per_batch": round(dt * 1e3, 2),
               "qps": round(B / dt, 1)}
        print(json.dumps(rec), flush=True)
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()
    out_f.close()


if __name__ == "__main__":
    main()
