"""Per-component step-time decomposition for the flagship QLoRA step
(VERDICT r3 task 4): where do the milliseconds go at 42% MFU?

Method: same one-dispatch scan-of-steps timing as probe_train.py, but
run VARIANTS of the step in ONE process (same tunnel floor, same-session
A/B per CLAUDE.md) with one component ablated each:

  full      — the shipped step (nf4 base + LoRA, scan-layers, remat)
  no_attn   — flash_attention patched to identity-on-v (removes the
              attention kernel fwd + remat recompute + bwd; the q/k/v/o
              projections remain)
  no_mlp    — mlp patched to identity (removes both MLP matmuls)
  no_head   — masked_mean_xent patched to a scalar reduce (removes the
              head matmul + streaming xent fwd/bwd)
  bf16_base — unquantized bf16 base (removes every nf4 dequant, but
              doubles weight HBM bytes — the difference is a LOWER bound
              on dequant compute cost)

component cost ~= t(full) - t(variant).  Ablation changes XLA's fusion
opportunities, so treat the table as ±few-ms attribution, not an exact
roofline; the caveat is printed with the results.

Usage:
  python scripts/probe_mfu_decomp.py --preset llama1b --batch 8 --seq 1024
  python scripts/probe_mfu_decomp.py --preset phogpt4b --batch 4 --seq 1024
"""

from __future__ import annotations

import argparse
import contextlib
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@contextlib.contextmanager
def patched(obj, name, repl):
    orig = getattr(obj, name)
    setattr(obj, name, repl)
    try:
        yield
    finally:
        setattr(obj, name, orig)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama1b",
                    choices=["gpt125m", "llama1b", "phogpt4b", "tiny"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--lora-r", type=int, default=16)
    ap.add_argument("--quantize-base", default="nf4",
                    choices=["int8", "nf4", "nf4-dq"])
    ap.add_argument("--variants", default="full,no_attn,no_mlp,no_head,bf16_base",
                    help="comma list; order is run order")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="/tmp/probe_mfu_decomp.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models import causal_lm
    from vietnamese_qa_system_tpu.models.lora import (
        LoraConfig, init_lora, merge_lora,
    )
    from vietnamese_qa_system_tpu.models.quantize import quantize_dense_tree
    import vietnamese_qa_system_tpu.ops.attention as ops_attn
    import vietnamese_qa_system_tpu.ops.xent as ops_xent
    import vietnamese_qa_system_tpu.models.layers as mlayers

    cfg = {
        "gpt125m": mcfg.gpt_125m_class,
        "llama1b": mcfg.llama_1b_class,
        "phogpt4b": mcfg.phogpt_4b_class,
        "tiny": mcfg.tiny_test,
    }[args.preset]()
    import dataclasses

    cfg = dataclasses.replace(cfg, scan_layers=True, remat_policy="full")

    B, T = args.batch, args.seq
    variants_requested = args.variants.split(",")
    key = jax.random.key(0)
    # one-jit bf16 init so a 4B model never materializes its f32 tree
    params_bf16 = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            causal_lm.init_causal_lm(k, cfg),
        )
    )(key)
    params_q = quantize_dense_tree(params_bf16, mode=args.quantize_base)
    if "bf16_base" not in variants_requested:
        # free the bf16 dense weights (~2N bytes of HBM) — non-quantized
        # leaves (embeddings/norms) stay alive via params_q's shared refs
        params_bf16 = None

    lora_cfg = LoraConfig(r=args.lora_r, alpha=2 * args.lora_r)
    adapter = init_lora(jax.random.key(2), params_q, lora_cfg)
    tx = optax.adamw(1e-4)

    ids = jax.random.randint(
        jax.random.key(1), (args.steps, B, T), 0, cfg.vocab_size, jnp.int32
    )

    def build_run(base_example, dequant_once=False):
        def loss_fn(base, tr, batch):
            p = merge_lora(jax.lax.stop_gradient(base), tr, lora_cfg)
            if dequant_once:
                from vietnamese_qa_system_tpu.models.quantize import (
                    dequantize_tree,
                )

                p = dequantize_tree(p, dtype=jnp.bfloat16, fold_lora=False)
            loss, n = causal_lm.loss_fn(p, cfg, batch)
            return loss

        def one_step(base, carry, batch):
            p, o = carry
            loss, g = jax.value_and_grad(loss_fn, argnums=1)(base, p, batch)
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
                functools.partial(one_step, base), (p, o), batches
            )
            return p, o, losses[-1]

        return run_steps

    def fake_flash(q, k, v, **kw):
        # identity-on-v with a q/k touch so all three cotangents exist
        return v + (q * 1e-30) + (k * 1e-30)

    def fake_xent(h, w, labels, ignore_index=-100, chunk=4096):
        loss = (h.astype(jnp.float32).mean()
                * w.reshape(-1)[0].astype(jnp.float32))
        return loss, jnp.int32(1)

    def fake_mlp(p, x, activation="gelu"):
        return x * jnp.float32(1.0).astype(x.dtype)

    VARIANTS = {
        "full": (contextlib.nullcontext, params_q),
        "no_attn": (lambda: patched(ops_attn, "flash_attention", fake_flash),
                    params_q),
        "no_mlp": (lambda: patched(mlayers, "mlp", fake_mlp), params_q),
        "no_head": (lambda: patched(ops_xent, "masked_mean_xent", fake_xent),
                    params_q),
        "bf16_base": (contextlib.nullcontext, params_bf16),
        # not an ablation: the shipped qlora_dequant="once" optimization
        # (trainer.py) — dequantize the merged base ONCE before the
        # forward instead of at every matmul (x2 under remat)
        "dequant_once": (contextlib.nullcontext, params_q),
    }

    results = {}
    for name in variants_requested:
        ctx, base = VARIANTS[name]
        with ctx():
            run = build_run(base, dequant_once=(name == "dequant_once"))
            opt = tx.init(adapter)
            t0 = time.perf_counter()
            tr, opt, last = run(base, adapter, opt, ids)
            np.asarray(last)
            compile_s = time.perf_counter() - t0
            dt = float("inf")
            for _ in range(args.rounds):
                t0 = time.perf_counter()
                tr, opt, last = run(base, tr, opt, ids)
                np.asarray(last)
                dt = min(dt, (time.perf_counter() - t0) / args.steps)
        results[name] = dt * 1e3
        print(f"{name:10s} {dt*1e3:8.1f} ms/step  (compile {compile_s:.0f}s, "
              f"loss {float(np.asarray(last)):.3f})", flush=True)

    full = results.get("full")
    if full:
        print("\n# attribution (t_full - t_variant); ablation shifts XLA "
              "fusion so read as ±few-ms, not exact", flush=True)
        for name, t in results.items():
            if name == "full":
                continue
            comp = {"no_attn": "attention (kernel fwd+remat+bwd)",
                    "no_mlp": "mlp matmuls",
                    "no_head": "head matmul + xent",
                    "bf16_base": "nf4 dequant (lower bound)",
                    "dequant_once": "qlora_dequant=once speedup"}[name]
            print(f"{comp:36s} {full - t:8.1f} ms  "
                  f"({(full - t) / full * 100:5.1f}%)", flush=True)
    rec = {"preset": args.preset, "batch": B, "seq": T,
           "results_ms": {k: round(v, 2) for k, v in results.items()},
           "backend": jax.default_backend()}
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
