"""Where do the shipped backward's milliseconds go?

Times, in ONE process at T=4096 lens-free causal (B=8,H=12,D=64):
  - full fwd+bwd via jax.grad of flash_attention
  - fwd alone
  - _flash_bwd_impl (both kernels, jitted together)
  - dq kernel alone / dkv kernel alone (via monkeypatched single calls)
Run: timeout 600 python scripts/probe_bwd_shipped.py > /tmp/probe_bwd2.log 2>&1
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import vietnamese_qa_system_tpu.ops.attention as A


def timed(fn, args, iters=10, rounds=5):
    @jax.jit
    def runner(args):
        def body(c, _):
            out = fn(*args)
            leaf = jax.tree.leaves(out)[0]
            return c + leaf.reshape(-1)[:1].astype(jnp.float32).sum() * 1e-30, None
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
    bh = B * H
    blk = 1024
    nq = T // blk
    key = jax.random.key(0)
    q4 = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
    k4 = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
    v4 = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
    qb = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    kb = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    vb = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    do = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    lse4 = jnp.full((bh, nq, 8, blk), 10.0, jnp.float32)
    dd4 = jnp.zeros((bh, nq, 8, blk), jnp.float32)
    scale = 1.0 / D ** 0.5

    def loss(q, k, v):
        return A.flash_attention(q, k, v, causal=True).astype(jnp.float32).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))
    t = timed(lambda q, k, v: g(q, k, v), (q4, k4, v4))
    print(f"full fwd+bwd (grad):        {t:.3f} ms", flush=True)

    t = timed(lambda q, k, v: A.flash_attention(q, k, v, causal=True),
              (q4, k4, v4))
    print(f"fwd alone (wrapper):        {t:.3f} ms", flush=True)

    t = timed(
        lambda *a: A._flash_bwd_impl(
            *a, causal=True, blk_q=blk, blk_k=blk, scale=scale,
            interpret=False, static_len=T),
        (qb, kb, vb, None, do, lse4, dd4))
    print(f"_flash_bwd_impl (dq+dkv):   {t:.3f} ms", flush=True)

    # each kernel alone: re-enter the impl with the other call stubbed is
    # invasive; instead call pallas directly through the module helpers
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dq_only(q, k, v, do, lse4, dd4):
        kern = functools.partial(
            A._fa_bwd_q_kernel, blk_q=blk, blk_k=blk, causal=True,
            scale=scale, has_bias=False, window=None, static_len=T)
        qspec = pl.BlockSpec((1, blk, D), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((1, blk, D), lambda b, i, j: (b, j, 0),
                             memory_space=pltpu.VMEM)
        rspec = pl.BlockSpec((1, 1, 8, blk), lambda b, i, j: (b, i, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(bh, T // blk, T // blk),
            in_specs=[qspec, kspec, kspec, qspec, rspec, rspec],
            out_specs=qspec,
            out_shape=jax.ShapeDtypeStruct((bh, T, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((blk, D), jnp.float32)],
        )(q, k, v, do, lse4, dd4)

    def dkv_only(q, k, v, do, lse4, dd4):
        kern = functools.partial(
            A._fa_bwd_kv_kernel, blk_q=blk, blk_k=blk, causal=True,
            scale=scale, has_bias=False, window=None, static_len=T)
        qspec = pl.BlockSpec((1, blk, D), lambda b, j, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((1, blk, D), lambda b, j, i: (b, j, 0),
                             memory_space=pltpu.VMEM)
        rspec = pl.BlockSpec((1, 1, 8, blk), lambda b, j, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(bh, T // blk, T // blk),
            in_specs=[qspec, kspec, kspec, qspec, rspec, rspec],
            out_specs=(kspec, kspec),
            out_shape=(jax.ShapeDtypeStruct((bh, T, D), jnp.float32),
                       jax.ShapeDtypeStruct((bh, T, D), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((blk, D), jnp.float32),
                            pltpu.VMEM((blk, D), jnp.float32)],
        )(q, k, v, do, lse4, dd4)

    t = timed(jax.jit(dq_only), (qb, kb, vb, do, lse4, dd4))
    print(f"dq kernel alone:            {t:.3f} ms", flush=True)
    t = timed(jax.jit(dkv_only), (qb, kb, vb, do, lse4, dd4))
    print(f"dkv kernel alone:           {t:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
