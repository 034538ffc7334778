"""Decode (serving) throughput probe — tokens/s per chip, float vs
quantized base.

Small-batch autoregressive decode is weight-HBM-bandwidth-bound: every
generated token streams the full dense-weight working set once.  int8
halves and nf4/nf4-dq quarters those bytes (models/quantize.py), so the
probe A/Bs the same decode loop over the same prompts with each base
encoding in ONE process (tunnel variance is +-70% across sessions; see
CLAUDE.md).  The whole decode is one lax.scan dispatch, so tunnel latency
amortizes over max_new_tokens steps.

Usage:
  python scripts/probe_decode.py --preset gpt125m --batch 1 --new-tokens 64
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
    ap.add_argument("--preset", default="gpt125m",
                    choices=["tiny", "gpt125m", "pythia410m", "llama1b",
                             "phogpt4b"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--modes", default="f32,bf16,int8,nf4,nf4-dq")
    ap.add_argument("--no-scan-layers", action="store_true",
                    help="unstack the layer scan for decode: per-layer "
                    "weights become standalone arrays, so the w8 kernel "
                    "streams them at full byte rate (in-scan operand "
                    "slicing measured 408 vs 741 GB/s standalone)")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_decode.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models import causal_lm, quantize
    from vietnamese_qa_system_tpu.models.generate import generate

    cfg = {
        "tiny": lambda: mcfg.tiny_test("causal"),
        "gpt125m": mcfg.gpt_125m_class,
        "pythia410m": mcfg.pythia_410m_class,
        "llama1b": mcfg.llama_1b_class,
        "phogpt4b": mcfg.phogpt_4b_class,
    }[args.preset]()
    if args.no_scan_layers and cfg.scan_layers:
        import dataclasses

        cfg = dataclasses.replace(cfg, scan_layers=False)
    B, T, N = args.batch, args.prompt_len, args.new_tokens
    if args.preset in ("llama1b", "phogpt4b"):
        # big models: one-jit bf16 init (see probe_train.py) and no f32
        # arm (an f32 4B tree is 15 GB)
        params = jax.jit(
            lambda k: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16),
                causal_lm.init_causal_lm(k, cfg),
            )
        )(jax.random.key(0))
        if "f32" in args.modes:
            args.modes = ",".join(
                m for m in args.modes.split(",") if m != "f32"
            )
    else:
        params = causal_lm.init_causal_lm(jax.random.key(0), cfg)
    ids = jax.random.randint(jax.random.key(1), (B, T), 4,
                             cfg.vocab_size - 4, jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)

    run = jax.jit(
        lambda p: generate(p, cfg, ids, mask, max_new_tokens=N)
    )
    results = []
    p = None
    for mode in args.modes.split(","):
        p = None  # free the previous mode's tree before building the next
        if mode == "f32":
            p = params
        elif mode == "bf16":
            p = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        else:
            p = quantize.quantize_dense_tree(params, mode)
        gb = quantize.tree_bytes(p) / 1e9
        out = run(p)
        np.asarray(out[:, -1])  # warmup + compile; force through tunnel
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            out = run(p)
            np.asarray(out[:, -1])
            best = min(best, time.perf_counter() - t0)
        rec = {
            "preset": args.preset, "mode": mode, "batch": B,
            "prompt_len": T, "new_tokens": N,
            "weights_gb": round(gb, 3),
            "best_s": round(best, 4),
            "tokens_per_s": round(B * N / best, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(args.out, "a") as f:
        for rec in results:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
