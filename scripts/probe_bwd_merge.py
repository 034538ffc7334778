"""Does operand MERGING recover the fast tier for the flash backward?

The fwd probe (probe_flash_4th.py) showed >3 operands costs ~4x.  The bwd
kernels inherently need q, k, v, dO, lse, dd (6 operands).  This probes the
dq-kernel shape with operands progressively merged via a stacked leading
dim (sublane-aligned, no lane slicing):

  P0: 6 ops   q, k, v, do, lse, dd                      (shipped layout)
  P1: 5 ops   q, k, v, do, ldd(lse||dd)
  P2: 4 ops   qdo(q||do), k, v, ldd
  P3: 3 ops   qdo, kv(k||v), ldd

Timing-only (no parity; the math is identical across variants).
Run on-chip: timeout 600 python scripts/probe_bwd_merge.py > /tmp/probe_bwd.log 2>&1
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


def make_kernel(blk_q, blk_k, scale, variant):
    def kernel(*refs):
        refs = list(refs)
        if variant == "p0":
            q_r, k_r, v_r, do_r, lse_r, dd_r, dq_ref, dq_acc = refs
            get = lambda: (q_r[0], k_r[0], v_r[0], do_r[0],
                           lse_r[0, 0, 0, :], dd_r[0, 0, 0, :])
        elif variant == "p1":
            q_r, k_r, v_r, do_r, ldd_r, dq_ref, dq_acc = refs
            get = lambda: (q_r[0], k_r[0], v_r[0], do_r[0],
                           ldd_r[0, 0, 0, :], ldd_r[0, 0, 8, :])
        elif variant == "p2":
            qdo_r, k_r, v_r, ldd_r, dq_ref, dq_acc = refs
            get = lambda: (qdo_r[0, 0], k_r[0], v_r[0], qdo_r[0, 1],
                           ldd_r[0, 0, 0, :], ldd_r[0, 0, 8, :])
        else:  # p3
            qdo_r, kv_r, ldd_r, dq_ref, dq_acc = refs
            get = lambda: (qdo_r[0, 0], kv_r[0, 0], kv_r[0, 1], qdo_r[0, 1],
                           ldd_r[0, 0, 0, :], ldd_r[0, 0, 8, :])

        iq = pl.program_id(1)
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _init():
            dq_acc[:] = jnp.zeros(dq_acc.shape, jnp.float32)

        def compute(masked):
            q, k, v, do, lse, dd = get()
            blkq = q.shape[0]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            lse = lse.reshape(blkq, 1)
            if masked:
                q_col = iq * blk_q + jax.lax.broadcasted_iota(
                    jnp.int32, (blkq, 1), 0)
                k_pos = ik * blk_k + jax.lax.broadcasted_iota(
                    jnp.int32, (blkq, blk_k), 1)
                p = jnp.where(k_pos < q_col + 1, jnp.exp(s - lse), 0.0)
            else:
                p = jnp.exp(s - lse)
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds0 = p * (dp - dd.reshape(blkq, 1))
            dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
                ds0.astype(jnp.bfloat16), k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

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
            dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k", "variant"))
def run(arrs, *, blk_q, blk_k, variant):
    if variant in ("p0", "p1"):
        bh, tq, d = arrs[0].shape
        tk = arrs[1].shape[1]
    else:
        bh, _, tq, d = arrs[0].shape
        tk = arrs[1].shape[-2]
    nq, nk = tq // blk_q, tk // blk_k
    scale = 1.0 / d ** 0.5
    qspec = pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM)
    q2spec = pl.BlockSpec((1, 2, blk_q, d), lambda b, i, j: (b, 0, i, 0),
                          memory_space=pltpu.VMEM)
    k2spec = pl.BlockSpec((1, 2, blk_k, d), lambda b, i, j: (b, 0, j, 0),
                          memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, 1, 8, blk_q), lambda b, i, j: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    r2spec = pl.BlockSpec((1, 1, 16, blk_q), lambda b, i, j: (b, i, 0, 0),
                          memory_space=pltpu.VMEM)
    specs = {
        "p0": [qspec, kspec, kspec, qspec, rspec, rspec],
        "p1": [qspec, kspec, kspec, qspec, r2spec],
        "p2": [q2spec, kspec, kspec, r2spec],
        "p3": [q2spec, k2spec, r2spec],
    }[variant]
    return pl.pallas_call(
        make_kernel(blk_q, blk_k, scale, variant),
        grid=(bh, nq, nk),
        in_specs=specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * tq * tk * d,
            bytes_accessed=2 * bh * (2 * tq + 2 * tk) * d,
            transcendentals=bh * tq * tk,
        ),
    )(*arrs)


def scan_time(fn, args, iters=15, rounds=5):
    @jax.jit
    def runner(args):
        def body(c, _):
            out = fn(args)
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
    nq = T // 1024
    key = jax.random.key(0)
    q = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    k = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    v = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    do = jax.random.normal(key, (bh, T, D), jnp.bfloat16)
    lse = jnp.full((bh, nq, 8, 1024), 10.0, jnp.float32)
    dd = jnp.zeros((bh, nq, 8, 1024), jnp.float32)
    qdo = jnp.stack([q, do], axis=1)
    kv = jnp.stack([k, v], axis=1)
    ldd = jnp.concatenate([lse, dd], axis=2)
    # dq-kernel flops: 3 matmuls per computed block, causal halves them
    flops = 3 * 2 * bh * (T * (T + 1) / 2) * D

    cases = [
        ("P0 6ops", "p0", (q, k, v, do, lse, dd)),
        ("P1 5ops lse||dd", "p1", (q, k, v, do, ldd)),
        ("P2 4ops +q||do", "p2", (qdo, k, v, ldd)),
        ("P3 3ops +k||v", "p3", (qdo, kv, ldd)),
    ]
    for name, variant, arrs in cases:
        try:
            t = scan_time(
                lambda a, variant=variant: run(a, blk_q=1024, blk_k=1024,
                                               variant=variant), arrs)
            print(f"{name}: {t:.3f} ms  {flops/t/1e9:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
