"""On-chip A/B: local-window attention layers, dense masked path vs the
fused kernel's banded window mode (flash_attention(window=)).

Before round-2's sliding-window kernel mode, GPT-Neo-style local layers
always took the dense masked path — materializing (B, H, T, T) scores —
even under --use-flash-attention.  This probe measures the model-level
grad-step win of the banded flash path at training shapes.

Run (real chip): PYTHONPATH=/root/repo python scripts/probe_window.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--window", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    from vietnamese_qa_system_tpu.models import causal_lm
    from vietnamese_qa_system_tpu.models.config import ModelConfig

    base = ModelConfig(
        arch="causal", vocab_size=32000, d_model=512, n_heads=8,
        n_layers=args.layers, d_ff=2048, max_seq_len=args.t,
        attention_layers=("local",) * args.layers,
        attention_window=args.window, activations_bf16=True,
    )
    params = causal_lm.init_causal_lm(jax.random.key(0), base)
    ids = jax.random.randint(
        jax.random.key(1), (args.b, args.t), 4, base.vocab_size, jnp.int32
    )
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones_like(ids),
        "labels": ids,
    }

    def bench(cfg, label):
        def step(p, batch):
            def body(c, _):
                (loss, _aux), grads = jax.value_and_grad(causal_lm.loss_fn, has_aux=True)(
                    p, cfg, batch
                )
                return c + loss + sum(
                    jnp.sum(g.astype(jnp.float32) ** 2) * 0
                    for g in jax.tree_util.tree_leaves(grads)
                ), None

            s, _ = jax.lax.scan(body, 0.0, None, length=args.steps)
            return s

        f = jax.jit(step)
        t0 = time.perf_counter()
        np.asarray(f(params, batch))  # compile + first run
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(params, batch))
            best = min(best, time.perf_counter() - t0)
        per = best / args.steps * 1000
        tok = args.b * args.t / (per / 1000)
        print(f"{label}: {per:.2f} ms/step ({tok/1e3:.1f}k tokens/s) "
              f"[compile+1st {compile_s:.1f}s]")
        return per

    dense = bench(base, f"dense local mask T={args.t} w={args.window}")
    flash = bench(
        dataclasses.replace(base, use_flash_attention=True),
        f"flash window     T={args.t} w={args.window}",
    )
    print(f"speedup: {dense / flash:.2f}x")


if __name__ == "__main__":
    main()
