"""Same-process A/B: shipped _flash_bwd_impl vs v2.

v2 changes: (1) lse and dd ride in ONE (bh, nq, 16, blk) operand (rows 0-7
lse, 8-15 dd) — 5 operands instead of 6 per kernel; (2) dq/dk/dv emitted
bf16 (the wrapper casts to q.dtype anyway — halves output DMA);
(3) cost_estimate on both calls (the fwd has one, the bwd never did).

All outputs consumed (earlier probes let XLA DCE the dkv kernel).
Run: timeout 600 python scripts/probe_bwd_v2.py > /tmp/probe_bwd3.log 2>&1
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import vietnamese_qa_system_tpu.ops.attention as A

NEG_INF = -1e30


def _bwd_kv_kernel_v2(q_ref, k_ref, v_ref, do_ref, ldd_ref, dk_ref, dv_ref,
                      dk_acc, dv_acc, *, blk_q, blk_k, scale, static_len):
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros(dk_acc.shape, jnp.float32)
        dv_acc[:] = jnp.zeros(dv_acc.shape, jnp.float32)

    def compute(masked):
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        lse = ldd_ref[0, 0, 0, :].reshape(blk_q, 1)
        dd = ldd_ref[0, 0, 8, :].reshape(blk_q, 1)
        if masked:
            q_col = iq * blk_q + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, 1), 0)
            k_pos = ik * blk_k + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 1)
            limit = jnp.minimum(static_len, q_col + 1)
            p = jnp.where(k_pos < limit, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds0 = p * (dp - dd)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), do_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds0.astype(jnp.bfloat16), q_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    cond = (iq + 1) * blk_q - 1 >= ik * blk_k
    clean = jnp.logical_and((ik + 1) * blk_k <= static_len,
                            (ik + 1) * blk_k - 1 <= iq * blk_q)

    @pl.when(jnp.logical_and(cond, clean))
    def _c():
        compute(False)

    @pl.when(jnp.logical_and(cond, jnp.logical_not(clean)))
    def _m():
        compute(True)

    @pl.when(iq == nq - 1)
    def _emit():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_q_kernel_v2(q_ref, k_ref, v_ref, do_ref, ldd_ref, dq_ref, dq_acc,
                     *, blk_q, blk_k, scale, static_len):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros(dq_acc.shape, jnp.float32)

    def compute(masked):
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        lse = ldd_ref[0, 0, 0, :].reshape(blk_q, 1)
        dd = ldd_ref[0, 0, 8, :].reshape(blk_q, 1)
        if masked:
            q_col = iq * blk_q + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, 1), 0)
            k_pos = ik * blk_k + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 1)
            limit = jnp.minimum(static_len, q_col + 1)
            p = jnp.where(k_pos < limit, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds0 = p * (dp - dd)
        dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
            ds0.astype(jnp.bfloat16), k_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    cond = ik * blk_k <= (iq + 1) * blk_q - 1
    clean = jnp.logical_and((ik + 1) * blk_k <= static_len,
                            (ik + 1) * blk_k - 1 <= iq * blk_q)

    @pl.when(jnp.logical_and(cond, clean))
    def _c():
        compute(False)

    @pl.when(jnp.logical_and(cond, jnp.logical_not(clean)))
    def _m():
        compute(True)

    @pl.when(ik == nk - 1)
    def _emit():
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk", "static_len"))
def bwd_v2(q, k, v, do, ldd, *, blk, static_len):
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq, nk = tq // blk, tk // blk
    scale = 1.0 / d ** 0.5
    qspec_i = pl.BlockSpec((1, blk, d), lambda b, i, j: (b, i, 0),
                           memory_space=pltpu.VMEM)
    kspec_i = pl.BlockSpec((1, blk, d), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    # dkv grid (bh, nk, nq): q varies on the inner axis
    qspec_o = pl.BlockSpec((1, blk, d), lambda b, j, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    kspec_o = pl.BlockSpec((1, blk, d), lambda b, j, i: (b, j, 0),
                           memory_space=pltpu.VMEM)
    r_i = pl.BlockSpec((1, 1, 16, blk), lambda b, i, j: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    r_o = pl.BlockSpec((1, 1, 16, blk), lambda b, j, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=6 * bh * tq * tk * d,
        bytes_accessed=2 * bh * (2 * tq + 2 * tk) * d,
        transcendentals=bh * tq * tk,
    )
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_kv_kernel_v2, blk_q=blk, blk_k=blk,
                          scale=scale, static_len=static_len),
        grid=(bh, nk, nq),
        in_specs=[qspec_o, kspec_o, kspec_o, qspec_o, r_o],
        out_specs=(kspec_o, kspec_o),
        out_shape=(jax.ShapeDtypeStruct((bh, tk, d), jnp.bfloat16),
                   jax.ShapeDtypeStruct((bh, tk, d), jnp.bfloat16)),
        scratch_shapes=[pltpu.VMEM((blk, d), jnp.float32),
                        pltpu.VMEM((blk, d), jnp.float32)],
        cost_estimate=cost,
    )(q, k, v, do, ldd)
    dq = pl.pallas_call(
        functools.partial(_bwd_q_kernel_v2, blk_q=blk, blk_k=blk,
                          scale=scale, static_len=static_len),
        grid=(bh, nq, nk),
        in_specs=[qspec_i, kspec_i, kspec_i, qspec_i, r_i],
        out_specs=qspec_i,
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((blk, d), jnp.float32)],
        cost_estimate=cost,
    )(q, k, v, do, ldd)
    return dq, dk, dv


def timed(fn, args, iters=10, rounds=5):
    @jax.jit
    def runner(args):
        def body(c, _):
            out = fn(*args)
            s = sum(x.reshape(-1)[:1].astype(jnp.float32).sum()
                    for x in jax.tree.leaves(out))
            return c + s * 1e-30, None
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
    qb = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    kb = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    vb = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    do = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    lse4 = jnp.full((bh, nq, 8, blk), 10.0, jnp.float32)
    dd4 = jnp.zeros((bh, nq, 8, blk), jnp.float32)
    ldd = jnp.concatenate([lse4, dd4], axis=2)
    scale = 1.0 / D ** 0.5

    # parity v2 vs shipped
    dq1, dk1, dv1 = A._flash_bwd_impl(
        qb, kb, vb, None, do, lse4, dd4, causal=True, blk_q=blk, blk_k=blk,
        scale=scale, interpret=False, static_len=T)
    dq2, dk2, dv2 = bwd_v2(qb, kb, vb, do, ldd, blk=blk, static_len=T)
    for a, b, n in ((dq1, dq2, "dq"), (dk1, dk2, "dk"), (dv1, dv2, "dv")):
        err = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"parity {n}: max|diff| = {err:.2e}", flush=True)

    t = timed(
        lambda *a: A._flash_bwd_impl(
            *a[:3], None, *a[3:], causal=True, blk_q=blk, blk_k=blk,
            scale=scale, interpret=False, static_len=T),
        (qb, kb, vb, do, lse4, dd4))
    print(f"shipped bwd impl (all outputs): {t:.3f} ms", flush=True)
    t = timed(lambda *a: bwd_v2(*a, blk=blk, static_len=T),
              (qb, kb, vb, do, ldd))
    print(f"v2 bwd impl (all outputs):      {t:.3f} ms", flush=True)

    flops_fwd = 2 * 2 * bh * (T * (T + 1) / 2) * D

    def grad_shipped(q, k, v):
        return jax.grad(lambda q, k, v: A.flash_attention(
            q, k, v, causal=True).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))(q, k, v)

    q4 = qb.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    k4 = kb.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    v4 = vb.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    t = timed(grad_shipped, (q4, k4, v4))
    print(f"full fwd+bwd grad (shipped, all outs): {t:.3f} ms  "
          f"{3.5*flops_fwd/t/1e9:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
