"""One-process top-k A/B matrix on the real chip.

Runs every (quant, mode) config in a single device claim, sharing the
on-device corpora — one tunnel claim, one data-generation pass per dtype,
fast compiles (the index rides as a jit argument, never a baked constant).
Appends one JSON line per config to --out.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024 * 1024)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tile-int8", type=int, default=4096)
    ap.add_argument("--tile-bf16", type=int, default=2048)
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--quants", default="int8,bf16",
                    help="comma list: int8,bf16 (bf16 at 10M exceeds HBM)")
    ap.add_argument("--out", default="/tmp/probe_matrix.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vietnamese_qa_system_tpu.ops import matmul_topk
    from vietnamese_qa_system_tpu.ops.quant import quantize_int8

    B, D, N, K = args.b, args.d, args.n, args.k
    t_start = time.time()

    def log(s):
        print(f"[{time.time()-t_start:7.1f}s] {s}", flush=True)

    wanted = set(args.quants.split(","))
    kq, kc = jax.random.split(jax.random.key(0))
    q = jax.random.normal(kq, (B, D), jnp.bfloat16)
    if "int8" in wanted and "bf16" not in wanted and args.skip_oracle:
        # 10M case: int8 only — quantize in row blocks so the full bf16
        # corpus (15 GB at 10M) never lives in HBM
        blk = 1 << 20
        parts = []
        sparts = []
        for r0 in range(0, N, blk):
            cb = jax.random.normal(
                jax.random.fold_in(kc, r0), (min(blk, N - r0), D), jnp.float32
            )
            cq, cs = quantize_int8(cb)
            parts.append(cq)
            sparts.append(cs)
            del cb
        codes = jnp.concatenate(parts)
        scales = jnp.concatenate(sparts)
        del parts, sparts
        corpus_bf16 = None
    else:
        corpus_bf16 = jax.random.normal(kc, (N, D), jnp.bfloat16)
        codes, scales = quantize_int8(corpus_bf16.astype(jnp.float32))
    np.asarray(jnp.sum(codes[::4096, 0]))
    log("corpora materialized")

    qs = jax.random.normal(jax.random.key(7), (args.reps, B, D), jnp.bfloat16)

    def make_runner(mode, tile):
        @jax.jit
        def run_many(qs, corpus_in, scales_in):
            def body(_, qb):
                s, i = matmul_topk(
                    qb, corpus_in, K, corpus_scales=scales_in,
                    tile_n=tile, mode=mode,
                )
                return 0, (s[0, 0], i[0, 0])

            _, outs = jax.lax.scan(body, 0, qs)
            return outs

        return run_many

    def mm_floor_runner(tile, int8: bool):
        acc_t = jnp.int32 if int8 else jnp.float32

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

        @jax.jit
        def run_many(qs, corpus_in, scales_in):
            def body(_, qb):
                qq = (
                    jnp.clip(
                        jnp.round(qb.astype(jnp.float32) * 16), -127, 127
                    ).astype(jnp.int8)
                    if int8
                    else qb
                )
                o = pl.pallas_call(
                    functools.partial(mm_kernel, tile_n=tile),
                    grid=(N // tile,),
                    in_specs=[
                        pl.BlockSpec((B, D), lambda t: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((tile, D), lambda t: (t, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((B, 128), lambda t: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
                )(qq, corpus_in)
                return 0, (o[0, 0], o[0, 0])

            _, outs = jax.lax.scan(body, 0, qs)
            return outs

        return run_many

    @jax.jit
    def rank_counts(q_o, ids, corpus_in):
        scores = jnp.einsum("bd,nd->bn", q_o.astype(jnp.float32),
                            corpus_in.astype(jnp.float32))
        true_s = jnp.take_along_axis(scores, ids, axis=1)
        return jnp.sum(scores[:, :, None] > true_s[:, None, :], axis=1)

    configs = [
        (q, m)
        for q in ("int8", "bf16")
        if q in wanted
        for m in ("turbo", "fast", "matmul_only")
    ]
    for quant, mode in configs:
        tile = args.tile_int8 if quant == "int8" else args.tile_bf16
        corpus_in = codes if quant == "int8" else corpus_bf16
        scales_in = scales if quant == "int8" else None
        if mode == "matmul_only":
            runner = mm_floor_runner(tile, quant == "int8")
        else:
            runner = make_runner(mode, tile)
        t0 = time.perf_counter()
        np.asarray(runner(qs, corpus_in, scales_in)[0])
        compile_s = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            out = runner(qs, corpus_in, scales_in)
            np.asarray(out[0])
            dt = min(dt, (time.perf_counter() - t0) / args.reps)
        rec = {
            "quant": quant, "mode": mode, "tile": tile, "n": N, "b": B,
            "ms_per_batch": round(dt * 1e3, 3),
            "qps": round(B / dt, 1),
            "compile_s": round(compile_s, 1),
        }
        if mode != "matmul_only" and not args.skip_oracle:
            n_o = 64
            _, ids = matmul_topk(
                q[:n_o], corpus_in, K, corpus_scales=scales_in,
                tile_n=tile, mode=mode,
            )
            counts = np.asarray(rank_counts(q[:n_o], ids, corpus_bf16))
            rec["recall_at_k"] = round(float(np.mean(counts < K)), 4)
        line = json.dumps(rec)
        log(line)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
