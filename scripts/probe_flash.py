"""Same-process A/B probe: round-3 flash fwd/bwd (interior-block mask
elision + emit-time scale fold) vs the round-2 kernel (frozen copy below).

Run ON THE REAL CHIP:  python scripts/probe_flash.py
Timings use best-of-rounds with repeats inside one dispatch (lax.scan)
per CLAUDE.md tunnel guidance.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from vietnamese_qa_system_tpu.ops.attention import (  # noqa: E402
    NEG_INF, _flash_core, flash_attention,
)

# --------------------------------------------------------------------------
# Frozen round-2 forward kernel (pre mask-split), for same-process A/B
# --------------------------------------------------------------------------


def _old_fa_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                   m_scr, l_scr, acc_scr, *, blk_q, blk_k, causal, scale):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    cur_len = lens_ref[0, pl.program_id(0)]

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    def compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        q_pos = iq * blk_q + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 0)
        k_pos = ik * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1)
        mask = k_pos < cur_len
        if causal:
            mask &= k_pos <= q_pos
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_cur

    if causal:
        @pl.when(ik * blk_k <= (iq + 1) * blk_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ik == nk - 1)
    def _emit():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse = (m_scr[:] + jnp.log(l)).reshape(1, blk_q)
        lse_ref[0, 0] = jnp.broadcast_to(lse, (8, blk_q))


@functools.partial(jax.jit, static_argnames=("causal", "blk_q", "blk_k", "scale"))
def _old_flash_fwd(q, k, v, kv_lens, *, causal, blk_q, blk_k, scale):
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq = tq // blk_q
    grid = (bh, nq, tk // blk_k)
    kernel = functools.partial(
        _old_fa_kernel, blk_q=blk_q, blk_k=blk_k, causal=causal, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bh), lambda b, i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, blk_q), lambda b, i, j: (b, i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq, 8, blk_q), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq * tk * d,
            bytes_accessed=2 * bh * (tq + 2 * tk) * d,
            transcendentals=bh * tq * tk,
        ),
    )(kv_lens, q, k, v)


def scan_time(fn, args, iters=20, rounds=5):
    """Best-of-rounds per-iteration ms with all iterations in ONE dispatch."""
    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*args[:1], c, *args[2:]) if False else fn(*args)
            # fold output back so iterations are not CSE'd away
            return c + out[0, 0, :1].astype(jnp.float32).sum() * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=iters)
        return c

    run(args)  # compile + warm
    np.asarray(run(args))
    best = 1e30
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(run(args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    B, H, D = 8, 12, 64
    for T in (2048, 4096, 8192):
        bh = B * H
        q = jax.random.normal(jax.random.key(0), (bh, T, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (bh, T, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (bh, T, D), jnp.bfloat16)
        lens = jnp.full((1, bh), T, jnp.int32)
        scale = 1.0 / D ** 0.5
        blk = 1024

        def old_fwd(q, k, v):
            o, _ = _old_flash_fwd(q, k, v, lens, causal=True,
                                  blk_q=blk, blk_k=blk, scale=scale)
            return o

        def new_fwd(q, k, v):
            return _flash_core(q, k, v, lens, True, scale, blk, blk, None)

        t_old = scan_time(old_fwd, (q, k, v))
        t_new = scan_time(new_fwd, (q, k, v))
        # causal useful flops: 2 matmuls * T*(T+1)/2 * D * 2
        flops = 2 * 2 * bh * (T * (T + 1) / 2) * D
        print(f"T={T}: old {t_old:.3f} ms ({flops/t_old/1e9:.1f} TF/s)  "
              f"new {t_new:.3f} ms ({flops/t_new/1e9:.1f} TF/s)  "
              f"speedup {t_old/t_new:.2f}x", flush=True)

        # fwd+bwd through the public API (new only; old bwd not frozen)
        q4 = q.reshape(B, H, T, D).transpose(0, 2, 1, 3)
        k4 = k.reshape(B, H, T, D).transpose(0, 2, 1, 3)
        v4 = v.reshape(B, H, T, D).transpose(0, 2, 1, 3)

        def loss(q, k, v):
            return (flash_attention(q, k, v, causal=True)
                    .astype(jnp.float32) ** 2).sum() * 1e-9

        g = jax.grad(loss, argnums=(0, 1, 2))

        def fwdbwd(q, k, v):
            gq, gk, gv = g(q, k, v)
            return gq.transpose(0, 2, 1, 3).reshape(bh, T, D)

        t_fb = scan_time(fwdbwd, (q4, k4, v4), iters=10)
        print(f"      new fwd+bwd {t_fb:.3f} ms "
              f"({5 * flops / 2 / t_fb / 1e9:.1f} TF/s eff)", flush=True)


if __name__ == "__main__":
    main()
