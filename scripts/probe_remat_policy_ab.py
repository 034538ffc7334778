"""Same-process A/B of scan-over-layers remat policies on the flagship
QLoRA step (round-5 VERDICT #3: name and take the next MFU step).

Round 4 left PhoGPT-4B at 49% MFU with the MLP at 65% of step time and
an unquantified split between irreducible fwd+bwd FLOPs and the `full`
per-layer-remat recompute.  This probe measures that split directly:
arms share one process (same tunnel floor, same base, same data; the
CLAUDE.md same-session A/B rule) and differ only in
(remat_policy, qlora_dequant):

  full:once       — the round-4 record arm (reproduction anchor)
  proj_bf16:fused — bf16 projection saves, dequant at point of use
                    (the backward neither recomputes the matmuls NOR
                    re-gathers the nf4 dequant — both skipped by the
                    saved bf16 projection outputs)
  proj_bf16:once  — bf16 saves + one-shot dequant (may OOM at B=4:
                    bf16 weight copy + saves)

t(full) - t(proj_bf16) at equal dequant placement ≈ the recompute cost
the policy buys back; an arm that OOMs is reported as {"oom": true}.

Usage:
  python scripts/probe_remat_policy_ab.py --preset phogpt4b --batch 4
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="phogpt4b",
                    choices=["gpt125m", "llama1b", "phogpt4b", "tiny"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--lora-r", type=int, default=16)
    ap.add_argument("--quantize-base", default="nf4",
                    choices=["int8", "nf4", "nf4-dq"])
    ap.add_argument("--arms",
                    default="full:once,proj_bf16:fused,proj_bf16:once")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_remat_policy_ab.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vietnamese_qa_system_tpu.models import causal_lm
    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models.lora import (
        LoraConfig,
        init_lora,
        merge_lora,
    )
    from vietnamese_qa_system_tpu.models.quantize import (
        dequantize_tree,
        quantize_dense_tree,
    )

    base_cfg = {
        "gpt125m": mcfg.gpt_125m_class,
        "llama1b": mcfg.llama_1b_class,
        "phogpt4b": mcfg.phogpt_4b_class,
        "tiny": lambda: mcfg.tiny_test("causal"),
    }[args.preset]()
    base_cfg = dataclasses.replace(base_cfg, scan_layers=True)

    B, T = args.batch, args.seq
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            causal_lm.init_causal_lm(k, base_cfg),
        )
    )(jax.random.key(0))
    params = quantize_dense_tree(params, mode=args.quantize_base)

    lora_cfg = LoraConfig(r=args.lora_r, alpha=2 * args.lora_r)
    adapter0 = init_lora(jax.random.key(2), params, lora_cfg)
    tx = optax.adamw(1e-4)
    opt0 = tx.init(adapter0)

    ids = jax.random.randint(
        jax.random.key(1), (args.steps, B, T), 0, base_cfg.vocab_size,
        jnp.int32,
    )
    out_f = open(args.out, "a")

    def run_arm(policy: str, dequant: str):
        cfg = dataclasses.replace(base_cfg, remat_policy=policy)

        def loss_fn(base, tr, batch):
            p = merge_lora(jax.lax.stop_gradient(base), tr, lora_cfg)
            if dequant == "once":
                p = dequantize_tree(p, dtype=jnp.bfloat16,
                                    fold_lora=False)
            loss, _n = causal_lm.loss_fn(p, cfg, batch)
            return loss

        def one_step(base, carry, batch):
            p, o = carry
            loss, g = jax.value_and_grad(loss_fn, argnums=1)(
                base, p, batch)
            upd, o = tx.update(g, o, p)
            p = optax.apply_updates(p, upd)
            return (p, o), loss

        @jax.jit
        def run_steps(base, p, o, ids):
            batches = {
                "input_ids": ids,
                "attention_mask": jnp.ones_like(ids),
                "labels": ids,
            }
            (p, o), losses = jax.lax.scan(
                functools.partial(one_step, base), (p, o), batches)
            return p, o, losses[-1]

        t0 = time.perf_counter()
        tr, opt, last = run_steps(params, adapter0, opt0, ids)
        np.asarray(last)
        compile_s = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            tr, opt, last = run_steps(params, tr, opt, ids)
            np.asarray(last)
            dt = min(dt, (time.perf_counter() - t0) / args.steps)
        return {
            "arm": f"{policy}:{dequant}", "batch": B, "seq": T,
            "ms_per_step": round(dt * 1e3, 2),
            "tokens_per_s": round(B * T / dt, 1),
            "compile_s": round(compile_s, 1),
            "loss": float(np.asarray(last)),
        }

    for arm in args.arms.split(","):
        policy, dequant = arm.split(":")
        try:
            rec = run_arm(policy, dequant)
        except Exception as e:  # report OOM / lowering failures per-arm
            rec = {"arm": arm, "batch": B, "seq": T, "oom": True,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps(rec), flush=True)
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()
    out_f.close()


if __name__ == "__main__":
    main()
