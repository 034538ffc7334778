"""A/B the flash-fwd row-sum strategy at D=128 (round-5 VERDICT #7).

Round 4 measured fwd 76.5 TF/s vs full-grad 95 TF/s at IDENTICAL
geometry (D=128, 1024^2 blocks) and the block sweep ruled out geometry.
Diagnosis candidate: the MXU-rowsum ones-column trick pads p@v to D+1
columns — free at D=64 (fills the half-empty 128-wide tile) but a WHOLE
second MXU tile at D=128, i.e. 2x the hardware cost of the p@v matmul.
This probe A/Bs mxu_row_sum=True (ones column) vs False (separate
(BLK_Q,1) l scratch + VPU row reduce) same-process with the honest
slope method (carry-dependent inputs, control-subtracted).

Usage: python scripts/probe_flash_rowsum.py [--d 128] [--t 4096]
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
    ap.add_argument("--blk-q", type=int, default=1024)
    ap.add_argument("--blk-k", type=int, default=1024)
    args = ap.parse_args()
    B, H, D, T = args.b, args.h, args.d, args.t
    blk_q, blk_k = args.blk_q, args.blk_k
    bh = B * H
    scale = 1.0 / D ** 0.5
    flops_fwd = 2 * 2 * bh * (T * (T + 1) / 2) * D

    assert jax.default_backend() == "tpu", jax.devices()
    print(f"B={B} H={H} T={T} D={D} blk_q={blk_q} blk_k={blk_k}",
          flush=True)

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

    # numerical sanity: both variants vs the XLA oracle on a small slice
    q0 = jax.random.normal(jax.random.key(4), (bh, T, D), jnp.bfloat16)
    sl = slice(0, 2)
    lens = jnp.full((1, 2), T, jnp.int32)
    o_ref = A._reference_attention(
        q0[sl] * scale, kb[sl], vb[sl], jnp.full((2,), T, jnp.int32),
        True, 1.0)
    for rs in (True, False):
        o, _l = A._flash_fwd(q0[sl], kb[sl], vb[sl], None, causal=True,
                             blk_q=blk_q, blk_k=blk_k, scale=scale,
                             interpret=False, static_len=T,
                             mxu_row_sum=rs)
        err = float(jnp.max(jnp.abs(
            o.astype(jnp.float32) - o_ref.astype(jnp.float32))))
        print(f"mxu_row_sum={rs}: max|o - oracle| = {err:.4f}", flush=True)

    for rs in (True, False):
        def fwd(q, ops, n, _rs=rs):
            kb, vb = ops

            def body(q, _):
                o, _l = A._flash_fwd(
                    q, kb, vb, None, causal=True, blk_q=blk_q,
                    blk_k=blk_k, scale=scale, interpret=False,
                    static_len=T, mxu_row_sum=_rs)
                return q + o[0, :1, :1] * 1e-30, None
            return jax.lax.scan(body, q, None, length=n)[0]

        t = slope(fwd, (kb, vb)) - t_ctl
        print(f"fwd mxu_row_sum={rs}: {t:.3f} ms  "
              f"{flops_fwd/t/1e9:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
