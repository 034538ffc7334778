"""HONEST flash kernel timing: slope method, no hoisting, no floor.

Previous probes fed loop-invariant inputs to a timing scan; XLA hoists the
(pure) pallas custom call out of the while loop, so 'per-iter' times were
kernel/iters + floor/iters — garbage.  Here the carry IS the q input
(perturbed by each output), so every iteration runs a distinct kernel.
Per-iter cost = (T(n2) - T(n1)) / (n2 - n1)  — the dispatch floor and
compile cancel.  A control loop (same perturb, no kernel) gives the
perturb cost to subtract.  All big arrays are jit ARGUMENTS (closing over
them bakes them into the remote_compile request — CLAUDE.md).

Run: timeout 600 python scripts/probe_flash_honest.py > /tmp/probe_honest.log 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import vietnamese_qa_system_tpu.ops.attention as A

B, T, H, D = 8, 4096, 12, 64
bh = B * H
blk = 1024
nq = T // blk
scale = 1.0 / D ** 0.5
FLOPS_FWD = 2 * 2 * bh * (T * (T + 1) / 2) * D


def slope(build, ops, n1=4, n2=12, rounds=5):
    """build(q, ops, n) -> carry; ops is a tuple of device arrays."""
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


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    kb = jax.random.normal(jax.random.key(5), (bh, T, D), jnp.bfloat16)
    vb = jax.random.normal(jax.random.key(6), (bh, T, D), jnp.bfloat16)
    do = jax.random.normal(jax.random.key(7), (bh, T, D), jnp.bfloat16)
    lens = jnp.full((1, bh), T, jnp.int32)
    lse4 = jnp.full((bh, nq, 8, blk), 10.0, jnp.float32)
    dd4 = jnp.zeros((bh, nq, 8, blk), jnp.float32)

    def control(q, ops, n):
        def body(q, _):
            return q + q[0, :1, :1].astype(jnp.bfloat16) * 1e-30, None
        q, _ = jax.lax.scan(body, q, None, length=n)
        return q

    t_ctl = max(slope(control, ()), 0.0)
    print(f"control (perturb only):     {t_ctl:.3f} ms/iter", flush=True)

    def fwd_free(q, ops, n):
        kb, vb = ops

        def body(q, _):
            o, _l = A._flash_fwd(q, kb, vb, None, causal=True, blk_q=blk,
                                 blk_k=blk, scale=scale, interpret=False,
                                 static_len=T)
            return q + o[0, :1, :1] * 1e-30, None
        q, _ = jax.lax.scan(body, q, None, length=n)
        return q

    t = slope(fwd_free, (kb, vb)) - t_ctl
    print(f"fwd lens-free (3 ops):      {t:.3f} ms  "
          f"{FLOPS_FWD/t/1e9:.1f} TF/s", flush=True)

    def fwd_lens(q, ops, n):
        kb, vb, lens = ops

        def body(q, _):
            o, _l = A._flash_fwd(q, kb, vb, lens, causal=True, blk_q=blk,
                                 blk_k=blk, scale=scale, interpret=False,
                                 static_len=None)
            return q + o[0, :1, :1] * 1e-30, None
        q, _ = jax.lax.scan(body, q, None, length=n)
        return q

    t = slope(fwd_lens, (kb, vb, lens)) - t_ctl
    print(f"fwd with lens (4 ops):      {t:.3f} ms  "
          f"{FLOPS_FWD/t/1e9:.1f} TF/s", flush=True)

    def bwd_free(q, ops, n):
        kb, vb, do, lse4, dd4 = ops

        def body(q, _):
            dq, dk, dv = A._flash_bwd_impl(
                q, kb, vb, None, do, lse4, dd4, causal=True, blk_q=blk,
                blk_k=blk, scale=scale, interpret=False, static_len=T)
            return q + (dq[0, :1, :1] + dk[0, :1, :1]
                        + dv[0, :1, :1]).astype(jnp.bfloat16) * 1e-30, None
        q, _ = jax.lax.scan(body, q, None, length=n)
        return q

    t = slope(bwd_free, (kb, vb, do, lse4, dd4)) - t_ctl
    print(f"bwd impl lens-free:         {t:.3f} ms  "
          f"{2.5*FLOPS_FWD/t/1e9:.1f} TF/s", flush=True)

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
        q, _ = jax.lax.scan(body, q, None, length=n)
        return q

    k4 = kb.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    v4 = vb.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    t = slope(grad_loop, (k4, v4)) - t_ctl
    print(f"full grad (fwd+bwd+wrap):   {t:.3f} ms  "
          f"{3.5*FLOPS_FWD/t/1e9:.1f} TF/s combined", flush=True)


if __name__ == "__main__":
    main()
