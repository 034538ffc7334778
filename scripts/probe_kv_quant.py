"""int8 vs bf16 KV cache: same-process decode-chunk A/B on the real chip.

Decode reads the whole resident KV cache once per generated token, so at
serving batch sizes the cache stream dominates the step: quantizing K/V
to int8 (layers.kv_quantize, per-(token, head) scales) halves that
stream and doubles the requests a chip can hold.  This probe measures
the per-chunk latency of models/decode_engine.py::decode_chunk with all
slots live at long contexts, bf16 vs int8, in ONE process (CLAUDE.md:
absolute ms swing ±70% across sessions; trust within-process ratios).

Usage:
  python scripts/probe_kv_quant.py --size gpt125m --slots 16 --total 1024
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="gpt125m", choices=["tiny", "gpt125m"])
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--slots-int8", type=int, default=0,
                    help="slot count for the int8 arm (0 = same as "
                    "--slots); set 2x for the matched-HBM capacity story")
    ap.add_argument("--total", type=int, default=1024)
    ap.add_argument("--prompt", type=int, default=448,
                    help="per-slot prompt length (bucketed to 512)")
    ap.add_argument("--chunk-steps", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_kv_quant.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models import decode_engine as de
    from vietnamese_qa_system_tpu.models.causal_lm import (
        blocks_stacked,
        init_causal_lm,
    )

    cfg = (mcfg.tiny_test("causal") if args.size == "tiny"
           else mcfg.gpt_125m_class())
    params = init_causal_lm(jax.random.key(7), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    stacked = blocks_stacked(params)
    S, total = args.slots, args.total
    bucket = 1
    while bucket < args.prompt:
        bucket *= 2
    rng = np.random.default_rng(0)
    samp = (
        jnp.zeros((1,), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), jnp.float32),
    )
    results = {}
    for kvd in ("bf16", "int8"):
        S = args.slots if kvd == "bf16" or not args.slots_int8 \
            else args.slots_int8
        state = de.make_decode_state(cfg, S, total, stacked=stacked,
                                     kv_dtype=kvd)
        cache_gb = sum(
            l.size * l.dtype.itemsize for l in jax.tree.leaves(state["cache"])
        ) / 1e9
        for s in range(S):
            n = args.prompt
            ids = np.zeros((1, bucket), np.int32)
            mask = np.zeros((1, bucket), np.int32)
            ids[0, :n] = rng.integers(4, cfg.vocab_size - 4, (n,))
            mask[0, :n] = 1
            kv, first, n_prompt = de.prefill(
                params, cfg, jnp.asarray(ids), jnp.asarray(mask),
                jax.random.key(s), *samp, kv_dtype=kvd,
            )
            state = de.insert(
                state, kv, jnp.asarray(ids),
                jnp.asarray(mask), first, n_prompt, jnp.int32(s), *samp,
            )
        key = jax.random.key(1)
        # warm the chunk compile
        state, toks = de.decode_chunk(
            params, state, key, cfg, n_steps=args.chunk_steps, eos_id=None
        )
        np.asarray(toks)
        times = []
        for r in range(args.rounds):
            t0 = time.perf_counter()
            state, toks = de.decode_chunk(
                params, state, jax.random.fold_in(key, r), cfg,
                n_steps=args.chunk_steps, eos_id=None,
            )
            np.asarray(toks)  # force completion (axon-safe)
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[kvd] = {
            "cache_gb": round(cache_gb, 6),
            "chunk_ms_best": round(best * 1e3, 2),
            "chunk_ms_median": round(float(np.median(times)) * 1e3, 2),
            "tokens_per_s": round(S * args.chunk_steps / best, 1),
        }
        print(kvd, json.dumps(results[kvd]), flush=True)
    results["speedup_best"] = round(
        results["bf16"]["chunk_ms_best"] / results["int8"]["chunk_ms_best"], 3
    )
    results["cache_ratio"] = round(
        results["int8"]["cache_gb"] / results["bf16"]["cache_gb"], 3
    )
    print(f"SPEEDUP {results['speedup_best']}x at "
          f"{results['cache_ratio']}x the cache bytes", flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps({"args": vars(args), "results": results}) + "\n")


if __name__ == "__main__":
    main()
