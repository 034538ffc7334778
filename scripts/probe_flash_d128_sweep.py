"""Block-geometry sweep for the flash fwd kernel at D=128 (one process,
shared tunnel floor; slope method per probe_flash_honest.py).

Usage: python scripts/probe_flash_d128_sweep.py [--t 4096] [--b 4] [--h 24]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import vietnamese_qa_system_tpu.ops.attention as A


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--h", type=int, default=24)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--grad", action="store_true",
                    help="also sweep the full-grad path per geometry")
    args = ap.parse_args()
    B, H, D, T = args.b, args.h, args.d, args.t
    bh = B * H
    scale = 1.0 / D ** 0.5
    flops_fwd = 2 * 2 * bh * (T * (T + 1) / 2) * D

    assert jax.default_backend() == "tpu", jax.devices()
    print(f"B={B} H={H} T={T} D={D}", flush=True)

    def slope(build, ops, n1=4, n2=12, rounds=5):
        f1 = jax.jit(lambda q, ops: build(q, ops, n1))
        f2 = jax.jit(lambda q, ops: build(q, ops, n2))
        q0 = jax.random.normal(jax.random.key(4), (bh, T, D), jnp.bfloat16)
        np.asarray(f1(q0, ops)[0, 0, :1].astype(jnp.float32))
        np.asarray(f2(q0, ops)[0, 0, :1].astype(jnp.float32))
        best1 = best2 = 1e30
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(f1(q0, ops)[0, 0, :1].astype(jnp.float32))
            best1 = min(best1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(f2(q0, ops)[0, 0, :1].astype(jnp.float32))
            best2 = min(best2, time.perf_counter() - t0)
        return (best2 - best1) / (n2 - n1) * 1e3

    kb = jax.random.normal(jax.random.key(5), (bh, T, D), jnp.bfloat16)
    vb = jax.random.normal(jax.random.key(6), (bh, T, D), jnp.bfloat16)

    def control(q, ops, n):
        def body(q, _):
            return q + q[0, :1, :1].astype(jnp.bfloat16) * 1e-30, None
        return jax.lax.scan(body, q, None, length=n)[0]

    t_ctl = max(slope(control, ()), 0.0)
    print(f"control: {t_ctl:.3f} ms/iter", flush=True)

    GEOMS = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
             (2048, 512), (2048, 1024), (512, 2048), (1024, 2048),
             (2048, 2048), (256, 1024), (1024, 256)]
    for blk_q, blk_k in GEOMS:
        if T % blk_q or T % blk_k:
            continue

        def fwd_free(q, ops, n, bq=blk_q, bk=blk_k):
            kb, vb = ops

            def body(q, _):
                o, _l = A._flash_fwd(q, kb, vb, None, causal=True, blk_q=bq,
                                     blk_k=bk, scale=scale, interpret=False,
                                     static_len=T)
                return q + o[0, :1, :1] * 1e-30, None
            return jax.lax.scan(body, q, None, length=n)[0]

        try:
            t = slope(fwd_free, (kb, vb)) - t_ctl
            print(f"blk_q={blk_q:5d} blk_k={blk_k:5d}  {t:7.3f} ms  "
                  f"{flops_fwd/t/1e9:6.1f} TF/s", flush=True)
        except Exception as e:  # geometry rejected by mosaic/VMEM
            print(f"blk_q={blk_q:5d} blk_k={blk_k:5d}  FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
