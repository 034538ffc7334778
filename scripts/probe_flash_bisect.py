"""Bisect the 3.7x gap between the shipped flash fwd (5.79 ms @ T=4096,
B*H=96, D=64, blk 1024) and the stripped probe variant (1.55 ms).

Features toggled, starting from the stripped kernel:
  lse   : second output (bh, nq, 8, blk_q) written at ik == nk-1
  lens  : SMEM (1, bh) kv_lens input + cur_len read (not used in mask)
  mask  : old-style full mask machinery on every computed block
  mask2 : new-style clean/masked dual pl.when branches (cur_len dynamic)
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
NEG_INF = -1e30


def make_kernel(blk_q, blk_k, scale, *, lse, lens, mask, mask2):
    def kernel(*refs):
        idx = 0
        if lens:
            lens_ref = refs[idx]; idx += 1
        q_ref, k_ref, v_ref = refs[idx:idx + 3]; idx += 3
        o_ref = refs[idx]; idx += 1
        if lse:
            lse_ref = refs[idx]; idx += 1
        m_scr, l_scr, acc_scr = refs[idx:idx + 3]
        iq = pl.program_id(1)
        ik = pl.program_id(2)
        nk = pl.num_programs(2)
        cur_len = lens_ref[0, pl.program_id(0)] if lens else None

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
            if masked == "old":
                q_pos = iq * blk_q + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_q, blk_k), 0)
                k_pos = ik * blk_k + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_q, blk_k), 1)
                m = k_pos < (cur_len if lens else blk_k * nk)
                m &= k_pos <= q_pos
                s = jnp.where(m, s, NEG_INF)
            elif masked == "new":
                q_col = iq * blk_q + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_q, 1), 0)
                k_pos = ik * blk_k + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_q, blk_k), 1)
                limit = jnp.minimum(cur_len, q_col + 1)
                s = jnp.where(k_pos < limit, s, NEG_INF)
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
        if mask2:
            clean = jnp.logical_and(
                (ik + 1) * blk_k <= cur_len,
                (ik + 1) * blk_k - 1 <= iq * blk_q)

            @pl.when(jnp.logical_and(cond, clean))
            def _c():
                compute(False)

            @pl.when(jnp.logical_and(cond, jnp.logical_not(clean)))
            def _m():
                compute("new")
        else:
            @pl.when(cond)
            def _():
                compute("old" if mask else False)

        @pl.when(ik == nk - 1)
        def _emit():
            l = jnp.maximum(l_scr[:], 1e-30)
            o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
            if lse:
                v_ = (m_scr[:] + jnp.log(l)).reshape(1, blk_q)
                lse_ref[0, 0] = jnp.broadcast_to(v_, (8, blk_q))

    return kernel


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "lse", "lens",
                                             "mask", "mask2"))
def run(q, k, v, kv_lens, *, blk_q, blk_k, lse, lens, mask, mask2):
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq = tq // blk_q
    scale = 1.0 / d ** 0.5
    grid = (bh, nq, tk // blk_k)
    in_specs = []
    inputs = []
    if lens:
        in_specs.append(pl.BlockSpec((1, bh), lambda b, i, j: (0, 0),
                                     memory_space=pltpu.SMEM))
        inputs.append(kv_lens)
    in_specs += [
        pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [q, k, v]
    out_specs = [pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bh, tq, d), q.dtype)]
    if lse:
        out_specs.append(pl.BlockSpec((1, 1, 8, blk_q),
                                      lambda b, i, j: (b, i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bh, nq, 8, blk_q), jnp.float32))
    return pl.pallas_call(
        make_kernel(blk_q, blk_k, scale, lse=lse, lens=lens, mask=mask,
                    mask2=mask2),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if lse else out_specs[0],
        out_shape=tuple(out_shape) if lse else out_shape[0],
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


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "mask2"))
def run_prefetch(q, k, v, lens1d, *, blk_q, blk_k, mask2):
    """lens via PrefetchScalarGridSpec instead of a per-cell SMEM block."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq = tq // blk_q
    scale = 1.0 / d ** 0.5
    grid = (bh, nq, tk // blk_k)

    def kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
               m_scr, l_scr, acc_scr):
        iq = pl.program_id(1)
        ik = pl.program_id(2)
        nk = pl.num_programs(2)
        cur_len = lens_ref[pl.program_id(0)]

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
                limit = jnp.minimum(cur_len, q_col + 1)
                s = jnp.where(k_pos < limit, s, NEG_INF)
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
        if mask2:
            clean = jnp.logical_and(
                (ik + 1) * blk_k <= cur_len,
                (ik + 1) * blk_k - 1 <= iq * blk_q)

            @pl.when(jnp.logical_and(cond, clean))
            def _c():
                compute(False)

            @pl.when(jnp.logical_and(cond, jnp.logical_not(clean)))
            def _m():
                compute(True)
        else:
            @pl.when(cond)
            def _():
                compute(True)

        @pl.when(ik == nk - 1)
        def _emit():
            l = jnp.maximum(l_scr[:], 1e-30)
            o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
            v_ = (m_scr[:] + jnp.log(l)).reshape(1, blk_q)
            lse_ref[0, 0] = jnp.broadcast_to(v_, (8, blk_q))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b, i, j, L: (b, i, 0)),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j, L: (b, j, 0)),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j, L: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda b, i, j, L: (b, i, 0)),
            pl.BlockSpec((1, 1, 8, blk_q), lambda b, i, j, L: (b, i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq, 8, blk_q), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq * tk * d,
            bytes_accessed=2 * bh * (tq + 2 * tk) * d,
            transcendentals=bh * tq * tk,
        ),
    )(lens1d, q, k, v)


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
    lens_arr = jnp.full((1, bh), T, jnp.int32)
    flops = 2 * 2 * bh * (T * (T + 1) / 2) * D

    cases = [
        dict(lse=False, lens=False, mask=False, mask2=False),  # stripped
        dict(lse=True, lens=False, mask=False, mask2=False),   # +lse
        dict(lse=False, lens=True, mask=False, mask2=False),   # +lens only
        dict(lse=True, lens=True, mask=False, mask2=False),    # +both
        dict(lse=True, lens=True, mask=True, mask2=False),     # old shipped
        dict(lse=True, lens=True, mask=False, mask2=True),     # new shipped
    ]
    for c in cases:
        t = scan_time(
            lambda q, k, v: run(q, k, v, lens_arr, blk_q=1024, blk_k=1024, **c),
            (q, k, v))
        print(f"{c}: {t:.3f} ms  {flops/t/1e9:.1f} TF/s", flush=True)

    lens1d = jnp.full((bh,), T, jnp.int32)
    for mask2 in (False, True):
        t = scan_time(
            lambda q, k, v: run_prefetch(q, k, v, lens1d, blk_q=1024,
                                         blk_k=1024, mask2=mask2)[0],
            (q, k, v))
        print(f"prefetch mask2={mask2}: {t:.3f} ms  {flops/t/1e9:.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
