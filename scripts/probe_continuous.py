"""Continuous batching vs lockstep batched generate, on-chip.

Workload: a burst of R requests with heterogeneous prompt lengths and
completion budgets (the serving reality the reference's lockstep HF
`generate` shape — reference src/models/trainer.py:942-946 — handles
worst: every row pays the batch's longest budget, and arrivals wait for
a slot-batch to fully drain).

Arms (both warmed, both measured after compile):
  lockstep    — ONE compiled generate() at (slots, max-prompt-bucket,
                max-budget): requests are processed in groups of
                ``slots``; every group pays the full width and budget.
                This is what serving through batched generate() does.
  continuous  — the same burst through ContinuousEngine: per-request
                budgets, slots free early, admissions between chunks.

``--quantize`` accepts a COMMA LIST (e.g. ``none,int8c``): every config
runs in ONE process over the same request set, because the axon-tunnel
dispatch floor is SESSION-dependent (measured 1.3-30 ms across
sessions, CLAUDE.md) and the continuous arm pays it per chunk — two
configs from different processes are not comparable.  The measured
per-dispatch floor is recorded alongside the results.

Reports makespan, useful tokens/s (sum of requested budgets / makespan),
and mean/p95 per-request latency.  Random weights (throughput only —
streams were pinned token-identical to generate() in
tests/test_continuous.py).

Usage:
  python scripts/probe_continuous.py --size gpt125m --requests 32 --slots 8
  python scripts/probe_continuous.py --size phogpt4b --no-scan-layers \
      --quantize none,int8c --requests 16 --slots 8
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
    ap.add_argument("--size", default="gpt125m",
                    choices=["tiny", "gpt125m", "llama1b", "phogpt4b"])
    ap.add_argument("--quantize", default=None,
                    help="comma list of weight configs to run in one "
                    "process: none|int8|int8c|nf4 (nf4 ~2.3 GB for "
                    "phogpt4b — the v5e-fits config).  Append '+kv8' to "
                    "a config to also quantize the decode KV cache "
                    "(models/layers.py::kv_quantize scale-folding), "
                    "e.g. 'none,int8c,int8c+kv8'")
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk-steps", type=int, default=16)
    ap.add_argument("--total", type=int, default=1024)
    ap.add_argument("--min-prompt", type=int, default=16)
    ap.add_argument("--max-prompt", type=int, default=480)
    ap.add_argument("--min-new", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arrival-rate", type=float, default=0.0,
                    help="requests/second Poisson arrivals (0 = one burst). "
                    "With arrivals, the lockstep arm batches whatever has "
                    "arrived when the previous batch finishes (classic "
                    "dynamic batching) — the realistic serving comparison")
    ap.add_argument("--speculative", default="ngram",
                    choices=["ngram", "off"],
                    help="in-engine prompt-lookup drafting.  NOTE: this "
                    "probe's prompts are RANDOM tokens, so ngram drafts "
                    "accept ~nothing and chunks degrade to (gamma+1)-row "
                    "verify forwards — 'off' measures the plain "
                    "8-row-per-step decode path (weight-stream-bound, "
                    "the shape real QA traffic is NOT in only because "
                    "its drafts accept ~85%)")
    ap.add_argument("--no-scan-layers", action="store_true",
                    help="unstack the layer scan: per-layer weights are "
                    "standalone arrays so the w8 kernel (int8c) streams "
                    "at full byte rate (scripts/probe_decode.py finding)")
    ap.add_argument("--skip-lockstep", action="store_true",
                    help="continuous arm only (lockstep is insensitive "
                    "to the engine options being A/B'd)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_continuous.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vietnamese_qa_system_tpu.engine.continuous import ContinuousEngine
    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models.causal_lm import init_causal_lm
    from vietnamese_qa_system_tpu.models.generate import generate

    cfg = {
        "tiny": lambda: mcfg.tiny_test("causal"),
        "gpt125m": mcfg.gpt_125m_class,
        "llama1b": mcfg.llama_1b_class,
        "phogpt4b": mcfg.phogpt_4b_class,
    }[args.size]()
    if args.no_scan_layers and cfg.scan_layers:
        import dataclasses

        cfg = dataclasses.replace(cfg, scan_layers=False)

    # session dispatch floor: a trivial jitted op round-trip (CLAUDE.md —
    # interpret per-chunk costs relative to THIS, not across sessions)
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

    # init + cast in ONE jit so a 4B model never materializes its f32
    # tree (~15 GB) — see probe_train.py
    params_bf16 = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_causal_lm(k, cfg)
        )
    )(jax.random.key(7))

    rng = np.random.default_rng(args.seed)
    R, S = args.requests, args.slots
    prompts = [
        [int(x) for x in rng.integers(4, cfg.vocab_size - 4, (n,))]
        for n in rng.integers(args.min_prompt, args.max_prompt + 1, (R,))
    ]
    budgets = [int(b) for b in
               rng.integers(args.min_new, args.max_new + 1, (R,))]
    useful = sum(budgets)
    print(f"{R} requests, prompts {args.min_prompt}-{args.max_prompt}, "
          f"budgets {args.min_new}-{args.max_new} (sum {useful} useful "
          f"tokens), slots {S}", flush=True)

    arrive0 = np.zeros(R)
    if args.arrival_rate > 0:
        arrive0 = np.cumsum(
            rng.exponential(1.0 / args.arrival_rate, size=R)
        )

    def run_config(params, tag, kv_dtype=None):
        results = {}
        arrive = arrive0

        # ---- arm 1: lockstep batched generate ---------------------------
        # one static shape: width = smallest power-of-two bucket >= max
        # prompt, budget = max budget (each group decodes the full budget
        # — lockstep cannot stop early without abandoning other rows)
        width = 1
        while width < max(len(p) for p in prompts):
            width *= 2
        max_budget = max(budgets)
        ids = np.zeros((S, width), np.int32)
        mask = np.zeros((S, width), np.int32)

        def run_group(group):
            ids[:] = 0
            mask[:] = 0
            for r, i in enumerate(group):
                p = prompts[i]
                ids[r, width - len(p):] = p
                mask[r, width - len(p):] = 1
            out = generate(params, cfg, jnp.asarray(ids),
                           jnp.asarray(mask),
                           max_new_tokens=max_budget, eos_id=None)
            np.asarray(out[:, -1])  # force completion (axon-safe)

        mk_lock = None
        if not args.skip_lockstep:
            run_group(list(range(min(S, R))))  # warm the one compile
        lat_lock = [0.0] * R
        n_groups = 0
        t0 = time.time()
        if args.skip_lockstep:
            pass
        elif args.arrival_rate > 0:
            # dynamic batching: when the previous batch finishes, take up
            # to `slots` of whatever has arrived (wait for first arrival)
            nxt = 0
            while nxt < R:
                now = time.time() - t0
                if arrive[nxt] > now:
                    time.sleep(arrive[nxt] - now)
                now = time.time() - t0
                group = []
                while nxt < R and len(group) < S and arrive[nxt] <= now:
                    group.append(nxt)
                    nxt += 1
                run_group(group)
                n_groups += 1
                done = time.time() - t0
                for i in group:
                    lat_lock[i] = done - arrive[i]
        else:
            for lo in range(0, R, S):
                group = list(range(lo, min(lo + S, R)))
                run_group(group)
                n_groups += 1
                done = time.time() - t0
                for i in group:
                    lat_lock[i] = done  # the whole group returns together
        if not args.skip_lockstep:
            mk_lock = time.time() - t0
            results["lockstep"] = {
                "makespan_s": round(mk_lock, 2),
                "useful_tokens_per_s": round(useful / mk_lock, 1),
                "decoded_tokens_per_s": round(
                    n_groups * S * max_budget / mk_lock, 1),
                "lat_mean_s": round(float(np.mean(lat_lock)), 2),
                "lat_p95_s": round(
                    float(np.percentile(lat_lock, 95)), 2),
            }
            print(f"[{tag}] lockstep:", json.dumps(results["lockstep"]),
                  flush=True)

        # ---- arm 2: continuous batching ---------------------------------
        eng = ContinuousEngine(
            params, cfg, n_slots=S, total=args.total,
            chunk_steps=args.chunk_steps, eos_id=None,
            speculative=args.speculative,
            **({"kv_dtype": kv_dtype} if kv_dtype else {}),
        )
        # warm every prefill bucket + insert + decode chunk out of timing
        # (generous timeout: first compiles of a quantized+kv-quant
        # engine measured >300 s on slow tunnel sessions)
        for b in eng.buckets:
            eng.generate_ids(prompts[0][: min(len(prompts[0]), b)], 2,
                             timeout=1800.0)
        done_at = [0.0] * R

        def stamp(i):
            def cb(_fut):
                done_at[i] = time.time()
            return cb

        t0 = time.time()
        futs = []
        for i, (p, m) in enumerate(zip(prompts, budgets)):
            if args.arrival_rate > 0:
                now = time.time() - t0
                if arrive[i] > now:
                    time.sleep(arrive[i] - now)
            f = eng.submit(p, m)
            f.add_done_callback(stamp(i))
            futs.append(f)
        emitted = sum(len(f.result(timeout=3600)["ids"]) for f in futs)
        mk_cont = max(done_at) - t0
        lat_cont = [d - t0 - a for d, a in zip(done_at, arrive)]
        stats = eng.snapshot_stats()
        eng.close()
        results["continuous"] = {
            "makespan_s": round(mk_cont, 2),
            "useful_tokens_per_s": round(emitted / mk_cont, 1),
            "lat_mean_s": round(float(np.mean(lat_cont)), 2),
            "lat_p95_s": round(float(np.percentile(lat_cont, 95)), 2),
            "avg_occupancy": stats.get("avg_occupancy"),
            "chunks": stats["chunks"],
        }
        print(f"[{tag}] continuous:", json.dumps(results["continuous"]),
              flush=True)
        if mk_lock is not None:
            results["speedup_makespan"] = round(mk_lock / mk_cont, 2)
            results["speedup_mean_latency"] = round(
                results["lockstep"]["lat_mean_s"]
                / max(results["continuous"]["lat_mean_s"], 1e-9), 2)
            print(f"[{tag}] SPEEDUP makespan "
                  f"{results['speedup_makespan']}x, mean latency "
                  f"{results['speedup_mean_latency']}x", flush=True)
        return results

    modes = [m.strip() for m in (args.quantize or "none").split(",")]
    all_results = {"floor_ms": round(floor_ms, 2)}
    for i, mode in enumerate(modes):
        wmode, _, kvtag = mode.partition("+")
        kv_dtype = "int8" if kvtag == "kv8" else None
        if wmode in ("none", "bf16"):
            p_run = params_bf16
        else:
            from vietnamese_qa_system_tpu.models.quantize import (
                quantize_dense_tree,
            )

            p_run = quantize_dense_tree(params_bf16, mode=wmode)
            if i == len(modes) - 1:
                # free the bf16 tree before the engine allocates KV: at
                # 4B, bf16 (7.4 G) + int8 (3.7 G) + KV (~3 G) crowds v5e
                del params_bf16
        all_results[mode] = run_config(p_run, mode, kv_dtype=kv_dtype)
        del p_run
    with open(args.out, "a") as f:
        f.write(json.dumps({"args": vars(args),
                            "results": all_results}) + "\n")


if __name__ == "__main__":
    main()
