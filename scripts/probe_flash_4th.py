"""Isolate WHY any extra input slows the flash fwd kernel 3.3x.

H: vmem (1,8,128) lens input placed LAST (after v), dead
I: dummy 4th input shaped/indexed exactly like v, dead
J: vmem lens FIRST, dead
K: 3 inputs, but lse output removed (2 out -> 1 out)  [output-count control]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def make_kernel(blk_q, blk_k, scale, *, extra_pos, with_lse=True):
    def kernel(*refs):
        refs = list(refs)
        if extra_pos == "first":
            refs.pop(0)
        elif extra_pos == "last":
            refs.pop(3)
        q_ref, k_ref, v_ref = refs[0:3]
        o_ref = refs[3]
        i = 4
        if with_lse:
            lse_ref = refs[i]; i += 1
        m_scr, l_scr, acc_scr = refs[i:i + 3]
        iq = pl.program_id(1)
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _init():
            m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
            l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

        def compute(masked):
            s = jax.lax.dot_general(
                q_ref[0], k_ref[0],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if masked:
                q_col = iq * blk_q + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_q, 1), 0)
                k_pos = ik * blk_k + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_q, blk_k), 1)
                s = jnp.where(k_pos < q_col + 1, s, NEG_INF)
            m_prev = m_scr[:]
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_cur)
            alpha = jnp.exp(m_prev - m_cur)
            l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_scr[:] = acc_scr[:] * alpha + pv
            m_scr[:] = m_cur

        cond = ik * blk_k <= (iq + 1) * blk_q - 1
        clean = (ik + 1) * blk_k - 1 <= iq * blk_q

        @pl.when(jnp.logical_and(cond, clean))
        def _c():
            compute(False)

        @pl.when(jnp.logical_and(cond, jnp.logical_not(clean)))
        def _m():
            compute(True)

        @pl.when(ik == nk - 1)
        def _emit():
            l = jnp.maximum(l_scr[:], 1e-30)
            o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
            if with_lse:
                v_ = (m_scr[:] + jnp.log(l)).reshape(1, blk_q)
                lse_ref[0, 0] = jnp.broadcast_to(v_, (8, blk_q))

    return kernel


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "extra",
                                             "extra_pos", "with_lse"))
def run(q, k, v, extra_arr, *, blk_q, blk_k, extra, extra_pos, with_lse):
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq = tq // blk_q
    scale = 1.0 / d ** 0.5
    grid = (bh, nq, tk // blk_k)
    qspec = pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [qspec, kspec, kspec]
    inputs = [q, k, v]
    if extra == "lens":
        espec = pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    elif extra == "vlike":
        espec = kspec
    else:
        espec = None
    if espec is not None:
        if extra_pos == "first":
            in_specs.insert(0, espec); inputs.insert(0, extra_arr)
        else:
            in_specs.append(espec); inputs.append(extra_arr)
    out_specs = [pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bh, tq, d), q.dtype)]
    if with_lse:
        out_specs.append(pl.BlockSpec((1, 1, 8, blk_q),
                                      lambda b, i, j: (b, i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bh, nq, 8, blk_q), jnp.float32))
    kernel = make_kernel(blk_q, blk_k, scale,
                         extra_pos=extra_pos if espec is not None else "none",
                         with_lse=with_lse)
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
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
    )(*inputs)


def scan_time(fn, args, iters=20, rounds=5):
    @jax.jit
    def runner(args):
        def body(c, _):
            out = fn(*args)
            if isinstance(out, tuple):
                out = out[0]
            return c + out[0, 0, :1].astype(jnp.float32).sum() * 1e-30, None
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
    B, H, D, T = 8, 12, 64, 4096
    bh = B * H
    q = jax.random.normal(jax.random.key(0), (bh, T, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (bh, T, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (bh, T, D), jnp.bfloat16)
    lens_rep = jnp.ones((bh, 8, 128), jnp.float32) * T
    vlike = jnp.zeros_like(v)
    flops = 2 * 2 * bh * (T * (T + 1) / 2) * D

    cases = [
        ("base 3in 2out",  dict(extra="none", extra_pos="none", with_lse=True), None),
        ("H lens LAST",    dict(extra="lens", extra_pos="last", with_lse=True), lens_rep),
        ("I vlike LAST",   dict(extra="vlike", extra_pos="last", with_lse=True), vlike),
        ("J lens FIRST",   dict(extra="lens", extra_pos="first", with_lse=True), lens_rep),
        ("K 3in 1out",     dict(extra="none", extra_pos="none", with_lse=False), None),
    ]
    for name, c, arr in cases:
        a = arr if arr is not None else vlike
        try:
            t = scan_time(
                lambda q, k, v: run(q, k, v, a, blk_q=1024, blk_k=1024, **c),
                (q, k, v))
            print(f"{name}: {t:.3f} ms  {flops/t/1e9:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
