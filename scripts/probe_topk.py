"""Same-process A/B probe for the fused top-k kernel on the real chip.

One config per process (remote Mosaic compiles of the big kernels take
minutes; see CLAUDE.md).  Appends one JSON line per run to --out.

Usage:
  python scripts/probe_topk.py --quant int8 --mode turbo --tile 4096 --out /tmp/p.jsonl
  python scripts/probe_topk.py --quant int8 --matmul-only --tile 4096 --out /tmp/p.jsonl
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

# `python scripts/probe_topk.py` puts scripts/ (not the repo root) on
# sys.path; add the root so the package imports (see CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", choices=["bf16", "int8", "int8g"], default="bf16")
    ap.add_argument("--mode", choices=["fast", "turbo", "exact"], default="fast")
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--n", type=int, default=1024 * 1024)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--matmul-only", action="store_true",
                    help="DMA/MXU floor kernel: dot + 1-op/slice reduce, no selection")
    ap.add_argument("--skip-recall", action="store_true")
    ap.add_argument("--out", default="/tmp/probe_topk.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vietnamese_qa_system_tpu.ops import matmul_topk
    from vietnamese_qa_system_tpu.ops.quant import quantize_int8, quantize_int8_global

    B, D, N, K, TILE = args.b, args.d, args.n, args.k, args.tile
    kq, kc = jax.random.split(jax.random.key(0))
    q = jax.random.normal(kq, (B, D), jnp.bfloat16)
    corpus_f = jax.random.normal(kc, (N, D), jnp.bfloat16)

    scales = None
    if args.quant == "int8":
        codes, scales = quantize_int8(corpus_f.astype(jnp.float32))
        corpus = codes
    elif args.quant == "int8g":
        codes, gscale = quantize_int8_global(corpus_f.astype(jnp.float32))
        corpus, scales = codes, gscale
    else:
        corpus = corpus_f
    np.asarray(jnp.sum(corpus[::4096, 0]))  # materialize

    if args.matmul_only:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        acc_t = jnp.int32 if args.quant.startswith("int8") else jnp.float32

        def mm_kernel(q_ref, c_ref, out_ref, *, tile_n):
            t = pl.program_id(0)
            acc = jax.lax.dot_general(
                q_ref[:], c_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc_t,
            )
            red = acc[:, :128]
            for c in range(1, tile_n // 128):
                red = jnp.maximum(red, acc[:, c * 128:(c + 1) * 128])

            @pl.when(t == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            out_ref[:] = jnp.maximum(out_ref[:], red.astype(jnp.float32))

        def call(qb, corpus_in, scales_in):
            qq = qb if args.quant == "bf16" else jnp.clip(
                jnp.round(qb.astype(jnp.float32) * 16), -127, 127
            ).astype(jnp.int8)
            o = pl.pallas_call(
                functools.partial(mm_kernel, tile_n=TILE),
                grid=(N // TILE,),
                in_specs=[
                    pl.BlockSpec((B, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
            )(qq, corpus_in)
            return o[0, 0], o[0, 0]
    else:
        def call(qb, corpus_in, scales_in):
            s, i = matmul_topk(qb, corpus_in, K, corpus_scales=scales_in,
                               tile_n=TILE, mode=args.mode)
            return s[0, 0], i[0, 0]

    reps = args.reps
    qs = jax.random.normal(jax.random.key(7), (reps, B, D), jnp.bfloat16)

    # corpus/scales MUST be jit ARGUMENTS: a closed-over jax array is baked
    # into the program as a constant and ships the whole index through the
    # remote-compile request (HTTP 413 / multi-minute uploads).
    @jax.jit
    def run_many(qs, corpus_in, scales_in):
        def body(_, qb):
            return 0, call(qb, corpus_in, scales_in)

        _, outs = jax.lax.scan(body, 0, qs)
        return outs

    t0 = time.perf_counter()
    np.asarray(run_many(qs, corpus, scales)[0])
    compile_s = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        out = run_many(qs, corpus, scales)
        np.asarray(out[0])
        dt = min(dt, (time.perf_counter() - t0) / reps)

    rec = {
        "quant": args.quant,
        "mode": "matmul_only" if args.matmul_only else args.mode,
        "tile": TILE, "n": N, "b": B,
        "ms_per_batch": round(dt * 1e3, 3),
        "qps": round(B / dt, 1),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }

    if not args.matmul_only and not args.skip_recall:
        n_oracle = 64
        _, ids = matmul_topk(q[:n_oracle], corpus, K, corpus_scales=scales,
                             tile_n=TILE, mode=args.mode)

        @jax.jit
        def rank_counts(q_o, ids, corpus_in):
            scores = jnp.einsum("bd,nd->bn", q_o.astype(jnp.float32),
                                corpus_in.astype(jnp.float32))
            true_s = jnp.take_along_axis(scores, ids, axis=1)
            return jnp.sum(scores[:, :, None] > true_s[:, None, :], axis=1)

        counts = np.asarray(rank_counts(q[:n_oracle], ids, corpus_f))
        rec["recall_at_k"] = round(float(np.mean(counts < K)), 4)

    line = json.dumps(rec)
    print(line)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
