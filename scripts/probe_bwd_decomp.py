"""Honest per-iteration decomposition of the flash fwd+bwd path.

Earlier probes fed loop-INVARIANT inputs to the timing scan: XLA hoists
pure ops (transposes, casts, dd) out of the loop but cannot hoist/CSE
pallas custom calls, so 'full grad' timings mixed hoisted and per-iter
work.  Here every input is carry-dependent (q0 + c) so ALL per-step work
runs per iteration:

  A: fwd kernel only        ((bh,T,D) inputs, pallas only)
  B: flash_attention        ((B,T,H,D) inputs, wrapper transposes included)
  C: bwd impl only          (bh inputs)
  D: jax.grad(flash_attention)   (everything)

Run: timeout 600 python scripts/probe_bwd_decomp.py > /tmp/probe_bwd4.log 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import vietnamese_qa_system_tpu.ops.attention as A


def timed(build, iters=10, rounds=5):
    """build(c) -> output pytree, where c is the scan carry scalar."""
    @jax.jit
    def runner(_):
        def body(c, _):
            out = build(c)
            s = sum(x.reshape(-1)[:1].astype(jnp.float32).sum()
                    for x in jax.tree.leaves(out))
            return c + s * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)
        return c

    np.asarray(runner(0))
    best = 1e30
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(runner(0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    B, T, H, D = 8, 4096, 12, 64
    bh = B * H
    blk = 1024
    nq = T // blk
    key = jax.random.key(0)
    q4 = jax.random.normal(jax.random.key(1), (B, T, H, D), jnp.bfloat16)
    k4 = jax.random.normal(jax.random.key(2), (B, T, H, D), jnp.bfloat16)
    v4 = jax.random.normal(jax.random.key(3), (B, T, H, D), jnp.bfloat16)
    qb = jax.random.normal(jax.random.key(4), (bh, T, D), jnp.bfloat16)
    kb = jax.random.normal(jax.random.key(5), (bh, T, D), jnp.bfloat16)
    vb = jax.random.normal(jax.random.key(6), (bh, T, D), jnp.bfloat16)
    do = jax.random.normal(jax.random.key(7), (bh, T, D), jnp.bfloat16)
    lse4 = jnp.full((bh, nq, 8, blk), 10.0, jnp.float32)
    dd4 = jnp.zeros((bh, nq, 8, blk), jnp.float32)
    scale = 1.0 / D ** 0.5
    flops_fwd = 2 * 2 * bh * (T * (T + 1) / 2) * D

    t = timed(lambda c: A._flash_fwd(
        qb + c.astype(jnp.bfloat16), kb, vb, None, causal=True, blk_q=blk,
        blk_k=blk, scale=scale, interpret=False, static_len=T))
    print(f"A fwd kernel only:   {t:.3f} ms  {flops_fwd/t/1e9:.1f} TF/s",
          flush=True)

    t = timed(lambda c: A.flash_attention(
        q4 + c.astype(jnp.bfloat16), k4, v4, causal=True))
    print(f"B fwd wrapper:       {t:.3f} ms", flush=True)

    t = timed(lambda c: A._flash_bwd_impl(
        qb + c.astype(jnp.bfloat16), kb, vb, None, do, lse4, dd4,
        causal=True, blk_q=blk, blk_k=blk, scale=scale, interpret=False,
        static_len=T))
    print(f"C bwd impl only:     {t:.3f} ms", flush=True)

    def g(c):
        qc = q4 + c.astype(jnp.bfloat16)
        return jax.grad(lambda q, k, v: A.flash_attention(
            q, k, v, causal=True).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))(qc, k4, v4)

    t = timed(g)
    print(f"D full grad:         {t:.3f} ms  "
          f"{3.5*flops_fwd/t/1e9:.1f} TF/s (combined)", flush=True)


if __name__ == "__main__":
    main()
