"""Probe: does dimension_semantics (or a dead scalar) explain the 3.3x
cost of the SMEM kv_lens input in the flash fwd kernel?

Round-3 bisect (probe_flash_bisect.py) measured, at T=4096 B*H=96 D=64
blk 1024x1024 on v5e:
  no lens input:            1.9 ms (108 TF/s)
  SMEM lens (even DEAD):    5.7 ms ( 36 TF/s)
  scalar-prefetch lens:     5.7 ms ( 36 TF/s)

Variants here, all causal with the shipped clean/masked dual branch:
  A  smem lens, no dimension_semantics        (shipped behavior)
  B  smem lens, ds=(parallel, parallel, arbitrary)
  C  smem lens DEAD read, ds=(p, p, a)
  D  no lens, ds=(p, p, a)
  E  no lens, no ds                            (fast bisect baseline)
  F  prefetch lens, ds=(p, p, a)
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


def make_kernel(blk_q, blk_k, scale, *, lens_mode, dead=False):
    """lens_mode: 'none' | 'smem' | 'prefetch'."""

    def kernel(*refs):
        idx = 0
        lens_ref = None
        if lens_mode != "none":
            lens_ref = refs[idx]; idx += 1
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs[idx:idx + 5]
        m_scr, l_scr, acc_scr = refs[idx + 5:idx + 8]
        iq = pl.program_id(1)
        ik = pl.program_id(2)
        nk = pl.num_programs(2)
        if lens_mode == "smem":
            cur_len = lens_ref[0, pl.program_id(0)]
        elif lens_mode == "prefetch":
            cur_len = lens_ref[pl.program_id(0)]
        else:
            cur_len = None
        if dead:
            cur_len = None  # read happened; value unused

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
                limit = q_col + 1
                if cur_len is not None:
                    limit = jnp.minimum(cur_len, limit)
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
        clean = (ik + 1) * blk_k - 1 <= iq * blk_q
        if cur_len is not None:
            clean = jnp.logical_and(clean, (ik + 1) * blk_k <= cur_len)

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
            v_ = (m_scr[:] + jnp.log(l)).reshape(1, blk_q)
            lse_ref[0, 0] = jnp.broadcast_to(v_, (8, blk_q))

    return kernel


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "lens_mode",
                                             "dead", "dimsem"))
def run(q, k, v, kv_lens, *, blk_q, blk_k, lens_mode, dead, dimsem):
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq = tq // blk_q
    scale = 1.0 / d ** 0.5
    grid = (bh, nq, tk // blk_k)
    kernel = make_kernel(blk_q, blk_k, scale, lens_mode=lens_mode, dead=dead)
    params = {}
    if dimsem:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    cost = pl.CostEstimate(
        flops=4 * bh * tq * tk * d,
        bytes_accessed=2 * bh * (tq + 2 * tk) * d,
        transcendentals=bh * tq * tk,
    )
    out_shape = (
        jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        jax.ShapeDtypeStruct((bh, nq, 8, blk_q), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((blk_q, 1), jnp.float32),
        pltpu.VMEM((blk_q, 1), jnp.float32),
        pltpu.VMEM((blk_q, d), jnp.float32),
    ]
    if lens_mode == "prefetch":
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
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            cost_estimate=cost, **params,
        )(kv_lens.reshape(-1), q, k, v)
    in_specs = []
    inputs = []
    if lens_mode == "smem":
        in_specs.append(pl.BlockSpec((1, bh), lambda b, i, j: (0, 0),
                                     memory_space=pltpu.SMEM))
        inputs.append(kv_lens)
    in_specs += [
        pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs += [q, k, v]
    out_specs = (
        pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 8, blk_q), lambda b, i, j: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=scratch, cost_estimate=cost,
        **params,
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
    lens_arr = jnp.full((1, bh), T, jnp.int32)
    flops = 2 * 2 * bh * (T * (T + 1) / 2) * D

    cases = [
        ("A smem, no ds",      dict(lens_mode="smem", dead=False, dimsem=False)),
        ("B smem, ds=ppa",     dict(lens_mode="smem", dead=False, dimsem=True)),
        ("C smem DEAD, ds",    dict(lens_mode="smem", dead=True, dimsem=True)),
        ("D none, ds=ppa",     dict(lens_mode="none", dead=False, dimsem=True)),
        ("E none, no ds",      dict(lens_mode="none", dead=False, dimsem=False)),
        ("F prefetch, ds=ppa", dict(lens_mode="prefetch", dead=False, dimsem=True)),
    ]
    ref = None
    for name, c in cases:
        try:
            out = run(q, k, v, lens_arr, blk_q=1024, blk_k=1024, **c)[0]
            got = np.asarray(out[:2, :8, :4], np.float32)
            if ref is None:
                ref = got
            else:
                err = np.abs(got - ref).max()
                assert err < 2e-2, (name, err)
            t = scan_time(
                lambda q, k, v: run(q, k, v, lens_arr, blk_q=1024,
                                    blk_k=1024, **c),
                (q, k, v))
            print(f"{name}: {t:.3f} ms  {flops/t/1e9:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()


# --- variant G: lens as a replicated f32 VMEM input, vector-only masking ---

@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "always_mask"))
def run_vmem_lens(q, k, v, lens_rep, *, blk_q, blk_k, always_mask=True):
    """lens_rep: (bh, 8, 128) f32 (value replicated). No scalar operands:
    the length mask is pure f32 vector math; pl.when predicates use only
    program ids (causal geometry)."""
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
                cur = lens_ref[0, :1, :1].astype(jnp.int32)  # (1,1) vector
                limit = jnp.minimum(cur, q_col + 1)  # (blk_q, 1)
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
        if always_mask:
            @pl.when(cond)
            def _():
                compute(True)
        else:
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
            v_ = (m_scr[:] + jnp.log(l)).reshape(1, blk_q)
            lse_ref[0, 0] = jnp.broadcast_to(v_, (8, blk_q))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, blk_q), lambda b, i, j: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
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
    )(lens_rep, q, k, v)


def main_g():
    assert jax.default_backend() == "tpu", jax.devices()
    B, H, D, T = 8, 12, 64, 4096
    bh = B * H
    q = jax.random.normal(jax.random.key(0), (bh, T, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (bh, T, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (bh, T, D), jnp.bfloat16)
    flops = 2 * 2 * bh * (T * (T + 1) / 2) * D

    # correctness vs varlen oracle at ragged lens (small shape: the XLA
    # oracle materializes (bh, T, T) f32)
    from vietnamese_qa_system_tpu.ops.attention import _reference_attention
    Ts, bhs = 2048, 8
    qs, ks, vs = q[:bhs, :Ts], k[:bhs, :Ts], v[:bhs, :Ts]
    lens_np = np.full((bhs,), Ts, np.int32)
    lens_np[:2] = 1000
    lens_np[2:4] = 1555
    lens_rep_s = jnp.broadcast_to(
        jnp.asarray(lens_np, jnp.float32)[:, None, None], (bhs, 8, 128))
    out = run_vmem_lens(qs, ks, vs, lens_rep_s, blk_q=1024, blk_k=1024)[0]
    ref = _reference_attention(
        qs, ks, vs, jnp.asarray(lens_np), True, 1.0 / D ** 0.5)
    err = np.abs(np.asarray(out, np.float32)[:, :999]
                 - np.asarray(ref, np.float32)[:, :999]).max()
    print(f"G parity max err (valid region): {err:.4f}", flush=True)
    assert err < 2e-2, err
    lens_rep = jnp.broadcast_to(
        jnp.full((bh,), T, jnp.float32)[:, None, None], (bh, 8, 128))

    for am in (True, False):
        t = scan_time(
            lambda q, k, v: run_vmem_lens(q, k, v, lens_rep, blk_q=1024,
                                          blk_k=1024, always_mask=am),
            (q, k, v))
        print(f"G vmem-lens always_mask={am}: {t:.3f} ms  "
              f"{flops/t/1e9:.1f} TF/s", flush=True)


if __name__ == "__main__" and "--g" in sys.argv:
    main_g()
