"""Standalone w8 kernel rate at decode shapes (slope method).

Re-measures the ops/w8_matmul.py effective HBM rate after the
round-5 `_pick_blk_k` max-K-block change (pre-fix record: 741 GB/s at
8x3072x12288).  Carry-dependent inputs defeat LICM; per-iter =
(T(n2)-T(n1))/(n2-n1).

Run: python scripts/probe_w8_rate.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vietnamese_qa_system_tpu.ops.w8_matmul import w8_matmul


def main():
    assert jax.default_backend() == "tpu", jax.devices()

    def slope(build, ops, n1=64, n2=256, rounds=5):
        f1 = jax.jit(lambda x, ops: build(x, ops, n1))
        f2 = jax.jit(lambda x, ops: build(x, ops, n2))
        x0 = ops[-1]
        np.asarray(f1(x0, ops)[0, :1].astype(jnp.float32))
        np.asarray(f2(x0, ops)[0, :1].astype(jnp.float32))
        best1 = best2 = 1e30
        for _ in range(rounds):
            t0 = time.perf_counter()
            np.asarray(f1(x0, ops)[0, :1].astype(jnp.float32))
            best1 = min(best1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(f2(x0, ops)[0, :1].astype(jnp.float32))
            best2 = min(best2, time.perf_counter() - t0)
        return (best2 - best1) / (n2 - n1) * 1e3

    for m, k, n in ((8, 3072, 12288), (16, 3072, 12288),
                    (16, 12288, 3072), (16, 3072, 9216)):
        kq = jax.random.key(0)
        w_q = jax.random.randint(kq, (k, n), -127, 127, jnp.int8)
        w_s = jnp.ones((1, n), jnp.float32)
        x0 = jax.random.normal(jax.random.key(1), (m, k), jnp.bfloat16)
        np.asarray(jnp.sum(w_q[::512, 0]).astype(jnp.int32))

        def run(x, ops, nit):
            w_q, w_s, _ = ops

            def body(x, _):
                y = w8_matmul(x, w_q, w_s)
                # feed a sliver of the output back (defeats LICM)
                return x + y[:, :1].astype(jnp.bfloat16) * 1e-30, None
            return jax.lax.scan(body, x, None, length=nit)[0]

        ms = slope(run, (w_q, w_s, x0))
        gbs = k * n / (ms / 1e3) / 1e9
        print(f"m={m} k={k} n={n}: {ms:.4f} ms = {gbs:.0f} GB/s "
              f"effective int8 stream", flush=True)


if __name__ == "__main__":
    main()
