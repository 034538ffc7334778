"""Training-step throughput probe on the real chip (tokens/s headline).

One config per process. Steps run inside ONE lax.scan dispatch over a
static batch (the tunnel adds ~1.3-1.8 ms per separate dispatch); data is
generated on device; only a scalar loss is fetched.

Usage:
  python scripts/probe_train.py --preset gpt125m --batch 8 --seq 1024
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
                    choices=["gpt125m", "gptneo125m", "pythia410m",
                             "llama1b", "phogpt4b", "tiny"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--scan-layers", action="store_true",
                    help="stacked blocks under lax.scan — O(1)-in-depth "
                    "compile for deep flash models on the remote tunnel")
    ap.add_argument("--remat-policy", default=None,
                    choices=["full", "dots", "proj_bf16", "none"],
                    help="scan-over-layers remat granularity "
                         "(models/layers.py::remat_wrap)")
    ap.add_argument("--lora-r", type=int, default=0,
                    help="train a LoRA adapter of this rank (0 = full FT)")
    ap.add_argument("--quantize-base", choices=["int8", "nf4", "nf4-dq"], default=None)
    ap.add_argument("--dequant", choices=["fused", "once", "once_folded"], default="fused",
                    help="QLoRA dequant placement (TrainConfig.qlora_dequant)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) — the env var "
                         "is overridden by sitecustomize, see CLAUDE.md")
    ap.add_argument("--out", default="/tmp/probe_train.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models import causal_lm

    cfg = {
        "gpt125m": mcfg.gpt_125m_class,
        "gptneo125m": mcfg.gpt_neo_125m,
        "pythia410m": mcfg.pythia_410m_class,
        "llama1b": mcfg.llama_1b_class,
        "phogpt4b": mcfg.phogpt_4b_class,
        "tiny": mcfg.tiny_test,
    }[args.preset]()
    if args.scan_layers or args.remat_policy:
        import dataclasses

        repl = {}
        if args.scan_layers:
            repl["scan_layers"] = True
        if args.remat_policy:
            repl["remat_policy"] = args.remat_policy
        cfg = dataclasses.replace(cfg, **repl)

    B, T = args.batch, args.seq
    key = jax.random.key(0)
    dtype = jnp.bfloat16 if args.quantize_base else jnp.float32
    if dtype == jnp.bfloat16:
        # init + cast in ONE jit so each f32 leaf dies right after its
        # bf16 cast (eager init of a 4B model materializes the full f32
        # tree — ~15 GB — before the cast can free anything; inside one
        # program XLA's liveness keeps peak ~= bf16 total + one f32 leaf)
        params = jax.jit(
            lambda k: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16),
                causal_lm.init_causal_lm(k, cfg),
            )
        )(key)
    else:
        params = causal_lm.init_causal_lm(key, cfg)
    if args.quantize_base:
        from vietnamese_qa_system_tpu.models.quantize import quantize_dense_tree

        params = quantize_dense_tree(params, mode=args.quantize_base)

    lora_cfg = None
    if args.lora_r:
        from vietnamese_qa_system_tpu.models.lora import (
            LoraConfig, init_lora, merge_lora,
        )

        lora_cfg = LoraConfig(r=args.lora_r, alpha=2 * args.lora_r)
        adapter = init_lora(jax.random.key(2), params, lora_cfg)
        trainable = adapter
    else:
        trainable = params
    tx = optax.adamw(1e-4)
    opt = tx.init(trainable)

    # The (frozen, possibly quantized) base must be a jit ARGUMENT, not a
    # closure capture: captured arrays are baked into the program as
    # constants and shipped inside the tunnel's remote_compile request
    # (minutes of upload / HTTP 413 for a 1B base — see CLAUDE.md).
    base_arg = params if lora_cfg is not None else 0

    def loss_fn(base, tr, batch):
        if lora_cfg is not None:
            from vietnamese_qa_system_tpu.models.lora import merge_lora

            p = merge_lora(jax.lax.stop_gradient(base), tr, lora_cfg)
            if args.dequant == "once" and args.quantize_base:
                from vietnamese_qa_system_tpu.models.quantize import (
                    dequantize_tree,
                )

                p = dequantize_tree(p, dtype=jnp.bfloat16, fold_lora=False)
        else:
            p = tr
        loss, n = causal_lm.loss_fn(p, cfg, batch)
        return loss

    if not args.no_remat and not (
        cfg.scan_layers and cfg.remat_policy != "none"
    ):
        # outer whole-loss remat is redundant (and costly: an extra full
        # forward recompute) when the scan-over-layers body is already
        # checkpointed — mirror trainer.py's guard
        loss_fn = jax.checkpoint(loss_fn)

    def one_step(base, carry, batch):
        p, o = carry
        loss, g = jax.value_and_grad(loss_fn, argnums=1)(base, p, batch)
        upd, o = tx.update(g, o, p)
        p = optax.apply_updates(p, upd)
        return (p, o), loss

    @jax.jit
    def run_steps(base, p, o, ids):
        import functools

        batches = {
            "input_ids": ids,
            "attention_mask": jnp.ones_like(ids),
            "labels": ids,
        }
        (p, o), losses = jax.lax.scan(
            functools.partial(one_step, base), (p, o), batches
        )
        return p, o, losses[-1]

    ids = jax.random.randint(
        jax.random.key(1), (args.steps, B, T), 0, cfg.vocab_size, jnp.int32
    )
    t0 = time.perf_counter()
    trainable, opt, last = run_steps(base_arg, trainable, opt, ids)
    np.asarray(last)
    compile_s = time.perf_counter() - t0

    dt = float("inf")
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        trainable, opt, last = run_steps(base_arg, trainable, opt, ids)
        np.asarray(last)
        dt = min(dt, (time.perf_counter() - t0) / args.steps)

    tokens = B * T
    rec = {
        "preset": args.preset, "batch": B, "seq": T,
        "remat": not args.no_remat,
        "remat_policy": args.remat_policy or "full",
        "lora_r": args.lora_r, "quantize_base": args.quantize_base,
        "ms_per_step": round(dt * 1e3, 2),
        "tokens_per_s": round(tokens / dt, 1),
        "compile_s": round(compile_s, 1),
        "loss": float(np.asarray(last)),
        "backend": jax.default_backend(),
    }
    line = json.dumps(rec)
    print(line)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
