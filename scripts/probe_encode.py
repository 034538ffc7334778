"""Encoder-forward (ingest) throughput probe — vecs/s/chip north star.

One process, scan-batched, on-device data.  Usage:
  python scripts/probe_encode.py --preset mpnet --batch 256 --seq 128
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
    ap.add_argument("--preset", default="mpnet", choices=["mpnet", "minilm"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) — the env var "
                         "is overridden by sitecustomize, see CLAUDE.md")
    ap.add_argument("--out", default="/tmp/probe_encode.jsonl")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from vietnamese_qa_system_tpu.models import config as mcfg
    from vietnamese_qa_system_tpu.models import encoder

    cfg = {"mpnet": mcfg.mpnet_class, "minilm": mcfg.minilm_class}[args.preset]()
    B, T = args.batch, args.seq
    params = encoder.init_encoder(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    ids = jax.random.randint(
        jax.random.key(1), (args.reps, B, T), 4, cfg.vocab_size - 4, jnp.int32
    )
    mask = jnp.ones((args.reps, B, T), jnp.int32)

    @jax.jit
    def run_many(params, ids, mask):
        def body(_, xs):
            i, m = xs
            v = encoder.sentence_embed(params, cfg, i, m)
            return 0, v[0, 0]

        _, outs = jax.lax.scan(body, 0, (ids, mask))
        return outs

    t0 = time.perf_counter()
    np.asarray(run_many(params, ids, mask)[0])
    compile_s = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        out = run_many(params, ids, mask)
        np.asarray(out[0])
        dt = min(dt, (time.perf_counter() - t0) / args.reps)

    rec = {
        "preset": args.preset, "batch": B, "seq": T,
        "ms_per_batch": round(dt * 1e3, 2),
        "vecs_per_s": round(B / dt, 1),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    line = json.dumps(rec)
    print(line)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
