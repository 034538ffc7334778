"""Flash kernel at head dim D=128 (VERDICT r3 task 4): honest slope-
method timing (see probe_flash_honest.py — same recipe: carry-dependent
inputs so LICM can't hoist, per-iter = (T(n2)-T(n1))/(n2-n1)).

D=128 is the PhoGPT-4B regime (3072 / 24 heads); the round-3 record at
D=64 was 52-54 TF/s fwd, VPU-softmax-bound.  At D=128 the MXU N-dim is
fully fed so the softmax/matmul op ratio halves.

Usage: python scripts/probe_flash_d128.py [--d 128] [--h 24] [--t 4096]
         [--blk-q 1024] [--blk-k 1024] [--b 4]
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
    nq = T // blk_q
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

    def fwd_free(q, ops, n):
        kb, vb = ops

        def body(q, _):
            o, _l = A._flash_fwd(q, kb, vb, None, causal=True, blk_q=blk_q,
                                 blk_k=blk_k, scale=scale, interpret=False,
                                 static_len=T)
            return q + o[0, :1, :1] * 1e-30, None
        return jax.lax.scan(body, q, None, length=n)[0]

    t = slope(fwd_free, (kb, vb)) - t_ctl
    print(f"fwd lens-free: {t:.3f} ms  {flops_fwd/t/1e9:.1f} TF/s",
          flush=True)

    def grad_loop(q, ops, n):
        k4, v4 = ops

        def body(q, _):
            q4 = q.reshape(B, H, T, D).transpose(0, 2, 1, 3)
            dq, dk, dv = jax.grad(
                lambda a, b, c: A.flash_attention(
                    a, b, c, causal=True).astype(jnp.float32).sum(),
                argnums=(0, 1, 2))(q4, k4, v4)
            d = (dq[0, :1, 0, :1] + dk[0, :1, 0, :1] + dv[0, :1, 0, :1])
            return q + d.astype(jnp.bfloat16) * 1e-30, None
        return jax.lax.scan(body, q, None, length=n)[0]

    k4 = kb.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    v4 = vb.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    t = slope(grad_loop, (k4, v4)) - t_ctl
    print(f"full grad: {t:.3f} ms  {3.5*flops_fwd/t/1e9:.1f} TF/s combined",
          flush=True)


if __name__ == "__main__":
    main()
