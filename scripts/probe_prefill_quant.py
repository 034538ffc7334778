"""int8c prefill A/B: does the w8 supports() row cap matter at prefill?

Round-4 VERDICT #8: layers.dense routes int8c through the w8 GEMM
kernel only for m <= 256 rows, so long-prompt PREFILL of an int8c model
falls back to the XLA dequantize-then-matmul path — the exact path that
measured 1.7x slower than bf16 at decode.  Decode is HBM-bound (the
kernel's 741 GB/s win); prefill at large M is MXU-bound, so the dequant
copy may or may not matter.  This probe measures, same-process on-chip:

  arm bf16        — unquantized forward (the baseline)
  arm int8c_xla   — int8c weights, dense's fallback (dequant + matmul)
  arm int8c_w8    — int8c weights with the kernel forced at all M
                    (supports() max_rows patched)

at B=1, T in {512, 1024, 2048} on the PhoGPT-4B-class config
(scan_layers off — the serving default after round-5 unstacking).

Timing: slope method (two scan lengths, difference cancels the
session-dependent dispatch floor); each iteration's input depends on
the scan carry so XLA LICM cannot hoist the forward (CLAUDE.md timing
trap).  Writes one JSON line per (T, arm) to --out.

Usage:  python scripts/probe_prefill_quant.py --size phogpt4b
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
    ap.add_argument("--size", default="phogpt4b",
                    choices=["tiny", "gpt125m", "llama1b", "phogpt4b"])
    ap.add_argument("--seqs", default="512,1024,2048")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=8,
                    help="short scan length (long = 3x)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_prefill_quant.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models.causal_lm import (
        forward,
        init_causal_lm,
    )

    cfg = {
        "tiny": lambda: mcfg.tiny_test("causal"),
        "gpt125m": mcfg.gpt_125m_class,
        "llama1b": mcfg.llama_1b_class,
        "phogpt4b": mcfg.phogpt_4b_class,
    }[args.size]()
    if cfg.scan_layers:
        import dataclasses

        cfg = dataclasses.replace(cfg, scan_layers=False)

    params = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_causal_lm(k, cfg)
        )
    )(jax.random.key(7))

    from vietnamese_qa_system_tpu.models.quantize import quantize_dense_tree

    params_q = quantize_dense_tree(params, mode="int8c")

    B = args.batch
    seqs = [int(t) for t in args.seqs.split(",")]
    out_f = open(args.out, "a")

    def measure(p, cfg, T, label):
        # fresh jit per arm: params dtype differs anyway
        import functools as _ft

        @_ft.partial(jax.jit, static_argnames=("n_iter",))
        def run(p, n_iter, ids0):
            def body(ids, _):
                lg = forward(p, cfg, ids, jnp.ones_like(ids))
                # feed the argmax back so the next iteration's input
                # depends on the previous forward (defeats LICM)
                nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
                ids = jnp.concatenate(
                    [ids[:, 1:], nxt[:, None]], axis=1)
                return ids, lg[0, 0, 0]

            ids, outs = jax.lax.scan(body, ids0, None, length=n_iter)
            return outs[-1]

        ids0 = jnp.asarray(
            np.random.default_rng(0).integers(4, cfg.vocab_size - 4,
                                              (B, T), dtype=np.int64),
            jnp.int32)
        r1, r2 = args.reps, args.reps * 3
        # compile + settle both lengths
        np.asarray(run(p, r1, ids0))
        np.asarray(run(p, r2, ids0))
        best = None
        for _ in range(3):
            t0 = time.time()
            np.asarray(run(p, r1, ids0))
            t1 = time.time()
            np.asarray(run(p, r2, ids0))
            t2 = time.time()
            per = ((t2 - t1) - (t1 - t0)) / (r2 - r1) * 1000.0
            best = per if best is None else min(best, per)
        rec = {"arm": label, "T": T, "B": B, "ms_per_prefill": round(best, 2),
               "prefill_tokens_per_s": round(B * T / (best / 1000.0), 1)}
        print(json.dumps(rec), flush=True)
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()

    import functools

    import vietnamese_qa_system_tpu.ops.w8_matmul as w8mod

    orig_supports = w8mod.supports

    for T in seqs:
        measure(params, cfg, T, "bf16")
        # fallback path: cap forces XLA dequant+matmul at these M
        w8mod.supports = orig_supports
        measure(params_q, cfg, T, "int8c_xla")
        # kernel forced at all M
        w8mod.supports = functools.partial(
            orig_supports, max_rows=1 << 30)
        measure(params_q, cfg, T, "int8c_w8")
        w8mod.supports = orig_supports

    out_f.close()


if __name__ == "__main__":
    main()
