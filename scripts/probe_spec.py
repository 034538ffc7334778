"""On-chip A/B: prompt-lookup speculative decoding vs plain greedy decode.

Decode at serving batch sizes is weight-streaming-bound (docs/BENCHMARKS.md
"Greedy decode": ~0.82 ms/step at B=8 = the 250 MB bf16 weight stream for a
gpt-125m-class model), so each accepted draft token is one fewer weight
stream.  Speculative decoding is LOSSLESS — tests/test_speculative.py pins
token-identical output — so the only question is throughput, which depends
on the draft acceptance rate:

- high-acceptance regime: the output stream contains repeated n-grams (RAG
  answers quoting retrieved [CTX i] passages, lists, boilerplate; a random
  model's greedy output loops, which exercises the same path);
- zero-acceptance floor: no n-gram ever matches (forced here with a large
  --floor-ngram over random text), measuring pure speculation overhead —
  each (gamma+1)-token verify pass that accepts nothing still costs about
  one plain step (weight-bound), plus the drafting gathers.

Usage: python scripts/probe_spec.py [--platform cpu] [--batch 1] ...
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, rounds=5):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0] if isinstance(out, tuple) else out)  # force (axon)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--new-tokens", type=int, default=128)
    ap.add_argument("--gamma", type=int, default=8)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--floor-ngram", type=int, default=8,
                    help="ngram size that never matches random text "
                    "(zero-acceptance overhead floor)")
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models.causal_lm import init_causal_lm
    from vietnamese_qa_system_tpu.models.generate import (
        generate, generate_speculative,
    )

    cfg = mcfg.gpt_125m_class()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        init_causal_lm(jax.random.key(0), cfg),
    )
    b, t, n = args.batch, args.prompt_len, args.new_tokens
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 50000, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32)

    print(f"gpt-125m-class bf16  B={b} T={t} new={n} "
          f"gamma={args.gamma} ngram={args.ngram} "
          f"backend={jax.default_backend()}")

    dt_ref = bench(
        lambda: generate(params, cfg, ids, mask, max_new_tokens=n, eos_id=None),
        args.rounds,
    )
    print(f"plain greedy      : {dt_ref*1e3:8.1f} ms  "
          f"{b*n/dt_ref:8.0f} tok/s")

    out, stats = generate_speculative(
        params, cfg, ids, mask, max_new_tokens=n, eos_id=None,
        draft_tokens=args.gamma, draft_ngram=args.ngram, return_stats=True,
    )
    ref = generate(params, cfg, ids, mask, max_new_tokens=n, eos_id=None)
    out_np, ref_np = np.asarray(out), np.asarray(ref)
    if not np.array_equal(out_np, ref_np):
        # losslessness holds modulo floating-point argmax ties: the t=1
        # step and the (gamma+1)-token verify window reduce matmuls in
        # different orders, so a near-zero top-2 margin can flip the pick
        # (HF assisted generation carries the same caveat).  Verify every
        # divergence IS such a tie: clean-forward margin at the first
        # differing position must be tiny, else it's a real bug.
        from vietnamese_qa_system_tpu.models.causal_lm import forward
        for r in np.unique(np.argwhere(out_np != ref_np)[:, 0]):
            c = int(np.argwhere(out_np[r] != ref_np[r])[0, 0])
            pm = np.concatenate(
                [np.asarray(mask[r:r+1]), np.ones((1, c - t), np.int32)], 1
            )
            lg = np.asarray(
                forward(params, cfg, ref_np[r:r+1, :c], jnp.asarray(pm))
            )[0, -1]
            top2 = np.sort(lg)[-2:]
            margin = float(top2[1] - top2[0])
            print(f"  row {r}: diverges at +{c-t} "
                  f"(top-2 margin {margin:.2e} — "
                  f"{'fp tie, OK' if margin < 1e-2 else 'REAL BUG'})")
            assert margin < 1e-2, "divergence with a decisive margin"
    it = int(stats["iterations"])
    acc = int(stats["drafted_accepted"])
    dt_spec = bench(
        lambda: generate_speculative(
            params, cfg, ids, mask, max_new_tokens=n, eos_id=None,
            draft_tokens=args.gamma, draft_ngram=args.ngram,
        ),
        args.rounds,
    )
    print(f"speculative       : {dt_spec*1e3:8.1f} ms  "
          f"{b*n/dt_spec:8.0f} tok/s  ({dt_ref/dt_spec:.2f}x)  "
          f"passes={it} accepted={acc} "
          f"({acc/max(b*n,1)*100:.0f}% of output drafted)")

    # true zero-acceptance floor: stub the drafter with constant garbage so
    # EVERY draft is rejected — one (gamma+1)-token verify pass per output
    # token, measuring pure speculation overhead vs a 1-token step
    from vietnamese_qa_system_tpu.models import generate as gen_mod

    real_draft = gen_mod._ngram_draft
    gen_mod._ngram_draft = (
        lambda seq_buf, cur_end, pad_start, gamma, ngram:
        jnp.full((seq_buf.shape[0], gamma), 3, jnp.int32)
    )
    try:
        floor_fn = gen_mod.generate_speculative.__wrapped__  # unjitted
        floor_jit = jax.jit(
            lambda p, i, m: floor_fn(
                p, cfg, i, m, max_new_tokens=n, eos_id=None,
                draft_tokens=args.gamma, draft_ngram=args.ngram,
                return_stats=True,
            )
        )
        _, fstats = floor_jit(params, ids, mask)
        dt_floor = bench(lambda: floor_jit(params, ids, mask)[0], args.rounds)
        print(f"zero-accept floor : {dt_floor*1e3:8.1f} ms  "
              f"{b*n/dt_floor:8.0f} tok/s  ({dt_ref/dt_floor:.2f}x)  "
              f"passes={int(fstats['iterations'])} "
              f"accepted={int(fstats['drafted_accepted'])}")
    finally:
        gen_mod._ngram_draft = real_draft


if __name__ == "__main__":
    main()
