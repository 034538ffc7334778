"""Chunked prefill: live-stream stall during long admissions, on-chip.

A decoding request's inter-token gap spikes whenever a long prompt
admits (the engine runs the whole prompt's prefill between decode
chunks).  Chunked prefill (engine/continuous.py, prefill_chunk=N)
splits admission into bucket-size prefill_extend pieces, one per
scheduler turn, bounding the stall at ~one piece + one chunk.

This probe timestamps every streamed token of one live request while a
burst of long prompts admits, for prefill_chunk=0 (whole) vs a piece
size — same process, same prompts.  Streams are pinned token-identical
either way (tests/test_continuous.py chunked tests).

Usage:
  python scripts/probe_chunked_prefill.py --size gpt125m --piece 128
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
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--total", type=int, default=2048)
    ap.add_argument("--piece", type=int, default=128)
    ap.add_argument("--long-prompt", type=int, default=900)
    ap.add_argument("--n-long", type=int, default=3)
    ap.add_argument("--budget", type=int, default=256)
    ap.add_argument("--chunk-steps", type=int, default=8)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_chunked_prefill.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vietnamese_qa_system_tpu.engine.continuous import ContinuousEngine
    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models.causal_lm import init_causal_lm

    cfg = (mcfg.tiny_test("causal") if args.size == "tiny"
           else mcfg.gpt_125m_class())
    params = init_causal_lm(jax.random.key(7), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    rng = np.random.default_rng(0)
    buckets = []
    b = args.piece
    while b < args.total:
        buckets.append(b)
        b *= 2
    live_prompt = [int(x) for x in
                   rng.integers(4, cfg.vocab_size - 4, (buckets[0] - 2,))]
    long_prompts = [
        [int(x) for x in rng.integers(4, cfg.vocab_size - 4,
                                      (args.long_prompt,))]
        for _ in range(args.n_long)
    ]
    results = {}
    for label, piece in (("whole", 0), ("chunked", args.piece)):
        eng = ContinuousEngine(
            params, cfg, n_slots=args.slots, total=args.total,
            buckets=buckets, chunk_steps=args.chunk_steps, eos_id=None,
            speculative="off", prefill_chunk=piece,
        )
        # warm every compile out of the timing: the live bucket, the long
        # bucket (whole-prefill arm) / piece chain (chunked arm), a chunk
        eng.generate_ids(live_prompt, 2)
        eng.generate_ids(long_prompts[0], 2)
        stamps = []
        t0 = time.time()
        f_live = eng.submit(live_prompt, args.budget,
                            stream=lambda t: stamps.append(time.time()))
        while len(stamps) < 5:
            time.sleep(0.001)  # live request is decoding
        for p in long_prompts:
            eng.submit(p, 8)
        f_live.result(timeout=600)
        makespan = time.time() - t0
        stats = eng.snapshot_stats()
        eng.close()
        gaps = np.diff(np.asarray(stamps)) * 1e3
        results[label] = {
            "max_gap_ms": round(float(gaps.max()), 1),
            "p95_gap_ms": round(float(np.percentile(gaps, 95)), 1),
            "median_gap_ms": round(float(np.median(gaps)), 1),
            "live_makespan_s": round(makespan, 2),
            "prefill_pieces": stats["prefill_pieces"],
        }
        print(label, json.dumps(results[label]), flush=True)
    results["stall_reduction"] = round(
        results["whole"]["max_gap_ms"] / results["chunked"]["max_gap_ms"], 2
    )
    print(f"MAX-STALL reduction {results['stall_reduction']}x", flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps({"args": vars(args), "results": results}) + "\n")


if __name__ == "__main__":
    main()
