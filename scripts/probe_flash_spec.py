"""On-chip A/B of the lens-specialized flash kernels (ops/attention.py).

Measures the public flash_attention entry at T=4096 causal:
  - fwd:      kv_lens=None (lens-free specialization) vs explicit full lens
  - fwd+bwd:  same A/B through jax.grad
and checks parity between the two paths (same math: every row full length).

Run ON the real chip (one TPU process at a time):
  cd /root/repo && timeout 600 python scripts/probe_flash_spec.py > /tmp/probe_spec.log 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vietnamese_qa_system_tpu.ops.attention import flash_attention


def scan_time(fn, args, iters=20, rounds=5):
    @jax.jit
    def runner(args):
        def body(c, _):
            out = fn(*args)
            return c + out[0, 0, 0, :1].astype(jnp.float32).sum() * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=iters)
        return c

    np.asarray(runner(args))
    best = 1e30
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(runner(args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    B, T, H, D = 8, 4096, 12, 64
    q = jax.random.normal(jax.random.key(0), (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, T, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, T, H, D), jnp.bfloat16)
    full = jnp.full((B,), T, jnp.int32)
    flops_fwd = 2 * 2 * B * H * (T * (T + 1) / 2) * D

    # parity first (tiny fetch)
    o_none = flash_attention(q, k, v, causal=True)
    o_full = flash_attention(q, k, v, kv_lens=full, causal=True)
    err = float(jnp.max(jnp.abs(
        o_none.astype(jnp.float32) - o_full.astype(jnp.float32))))
    print(f"parity lens-free vs full-lens: max|diff| = {err:.2e}", flush=True)

    t = scan_time(lambda q, k, v: flash_attention(q, k, v, causal=True),
                  (q, k, v))
    print(f"fwd lens-free: {t:.3f} ms  {flops_fwd/t/1e9:.1f} TF/s", flush=True)
    t = scan_time(
        lambda q, k, v: flash_attention(q, k, v, kv_lens=full, causal=True),
        (q, k, v))
    print(f"fwd full-lens: {t:.3f} ms  {flops_fwd/t/1e9:.1f} TF/s", flush=True)

    def loss_none(q, k, v):
        return flash_attention(q, k, v, causal=True).astype(jnp.float32).sum()

    def loss_full(q, k, v):
        return flash_attention(
            q, k, v, kv_lens=full, causal=True).astype(jnp.float32).sum()

    g_none = jax.grad(loss_none, argnums=(0, 1, 2))
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))
    # fwd+bwd ~ 3.5x fwd flops (fwd + 2.5x bwd)
    flops_fb = 3.5 * flops_fwd

    def timed(gfn):
        @jax.jit
        def runner(args):
            def body(c, _):
                dq, dk, dv = gfn(*args)
                s = (dq[0, 0, 0, :1] + dk[0, 0, 0, :1] + dv[0, 0, 0, :1])
                return c + s.astype(jnp.float32).sum() * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=10)
            return c
        np.asarray(runner((q, k, v)))
        best = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(runner((q, k, v)))
            best = min(best, (time.perf_counter() - t0) / 10)
        return best * 1e3

    t = timed(g_none)
    print(f"fwd+bwd lens-free: {t:.3f} ms  {flops_fb/t/1e9:.1f} TF/s",
          flush=True)
    t = timed(g_full)
    print(f"fwd+bwd full-lens: {t:.3f} ms  {flops_fb/t/1e9:.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    main()
