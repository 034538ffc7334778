"""Seq2seq continuous batching vs lockstep batched generate_seq2seq,
on-chip (the encoder-decoder counterpart of scripts/probe_continuous.py).

Workload: a burst of R requests with heterogeneous encoder lengths and
decoder budgets.  The lockstep arm mirrors the reference's only seq2seq
serving shape (whole-batch generate, reference src/models/trainer.py:
928-949): groups of `slots` requests at the max encoder bucket and max
budget.  The continuous arm admits between chunks with per-request
budgets.  Random weights (throughput only — streams pinned in
tests/test_continuous_seq2seq.py).

Usage:
  python scripts/probe_s2s_continuous.py --requests 16 --slots 8
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
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk-steps", type=int, default=16)
    ap.add_argument("--total", type=int, default=256, help="decoder cache")
    ap.add_argument("--min-prompt", type=int, default=64)
    ap.add_argument("--max-prompt", type=int, default=480)
    ap.add_argument("--min-new", type=int, default=32)
    ap.add_argument("--max-new", type=int, default=192)
    ap.add_argument("--vocab", type=int, default=32128,
                    help="mt5-small dims with a reduced vocab (engine "
                    "mechanics, not model identity)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_s2s_continuous.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vietnamese_qa_system_tpu.engine.continuous import ContinuousEngine
    from vietnamese_qa_system_tpu.models import ModelConfig
    from vietnamese_qa_system_tpu.models.generate import generate_seq2seq
    from vietnamese_qa_system_tpu.models.t5 import init_t5

    cfg = ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=args.vocab,
        d_model=512, n_heads=6, d_kv=64, n_layers=8, n_decoder_layers=8,
        d_ff=1024, max_seq_len=1024, mlp_gated=True, tie_embeddings=False,
        relative_attention_buckets=32, relative_attention_max_distance=128,
        attention_bias=False,
    )
    params = init_t5(jax.random.key(7), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    rng = np.random.default_rng(args.seed)
    R, S = args.requests, args.slots
    prompts = [
        [int(x) for x in rng.integers(4, args.vocab - 4, (n,))]
        for n in rng.integers(args.min_prompt, args.max_prompt + 1, (R,))
    ]
    budgets = [int(b) for b in
               rng.integers(args.min_new, args.max_new + 1, (R,))]
    useful = sum(budgets)
    width = 1
    while width < max(len(p) for p in prompts):
        width *= 2
    results = {}

    # ---- lockstep batched generate_seq2seq -------------------------------
    max_budget = max(budgets)
    ids = np.zeros((S, width), np.int32)
    mask = np.zeros((S, width), np.int32)

    def run_group(group):
        ids[:] = 0
        mask[:] = 0
        for r, i in enumerate(group):
            p = prompts[i]
            ids[r, : len(p)] = p
            mask[r, : len(p)] = 1
        out = generate_seq2seq(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            max_new_tokens=max_budget, eos_id=None, bos_id=0,
        )
        np.asarray(out[:, -1])  # force completion (axon-safe)

    run_group(list(range(min(S, R))))  # warm
    t0 = time.time()
    n_groups = 0
    for lo in range(0, R, S):
        run_group(list(range(lo, min(lo + S, R))))
        n_groups += 1
    mk_lock = time.time() - t0
    results["lockstep"] = {
        "makespan_s": round(mk_lock, 2),
        "useful_tokens_per_s": round(useful / mk_lock, 1),
        "decoded_tokens_per_s": round(n_groups * S * max_budget / mk_lock, 1),
    }
    print("lockstep:", json.dumps(results["lockstep"]), flush=True)

    # ---- continuous -------------------------------------------------------
    buckets = []
    b = 64
    while b <= width:
        buckets.append(b)
        b *= 2
    eng = ContinuousEngine(
        params, cfg, n_slots=S, total=args.total, buckets=buckets,
        chunk_steps=args.chunk_steps, eos_id=None,
    )
    for bb in eng.buckets:  # warm each prefill bucket + chunk
        eng.generate_ids(prompts[0][: min(len(prompts[0]), bb)], 2)
    t0 = time.time()
    futs = [eng.submit(p, m) for p, m in zip(prompts, budgets)]
    emitted = sum(len(f.result(timeout=3600)["ids"]) for f in futs)
    mk_cont = time.time() - t0
    stats = eng.snapshot_stats()
    eng.close()
    results["continuous"] = {
        "makespan_s": round(mk_cont, 2),
        "useful_tokens_per_s": round(emitted / mk_cont, 1),
        "avg_occupancy": stats.get("avg_occupancy"),
        "chunks": stats["chunks"],
    }
    print("continuous:", json.dumps(results["continuous"]), flush=True)
    results["speedup_useful"] = round(
        results["continuous"]["useful_tokens_per_s"]
        / results["lockstep"]["useful_tokens_per_s"], 2)
    print(f"SPEEDUP useful tokens/s {results['speedup_useful']}x", flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps({"args": vars(args), "results": results}) + "\n")


if __name__ == "__main__":
    main()
