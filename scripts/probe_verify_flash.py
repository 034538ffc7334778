"""Real-chip verify probe: flash fwd+bwd parity vs XLA reference at small T.

Confirms Mosaic accepts the round-3 kernels (MXU row-sum forward, fused
single-pass backward) and that grads match the einsum reference on TPU.
Run: python scripts/probe_verify_flash.py > /tmp/verify_flash.log 2>&1
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from vietnamese_qa_system_tpu.ops.attention import flash_attention


def xla_ref(q, k, v, causal):
    b, t, h, d = q.shape
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(d)
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


def main():
    print("backend:", jax.default_backend())
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    b, t, h, d = 2, 512, 4, 64
    q = jax.random.normal(kq, (b, t, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, t, h, d), jnp.bfloat16)

    for causal in (True, False):
        def loss_f(q, k, v):
            return jnp.sum(jnp.square(flash_attention(q, k, v, causal=causal)))

        def loss_r(q, k, v):
            return jnp.sum(jnp.square(xla_ref(q, k, v, causal)))

        o_f = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=causal))(q, k, v)
        o_r = xla_ref(q, k, v, causal)
        err_o = float(jnp.max(jnp.abs(o_f.astype(jnp.float32) - o_r)))
        g_f = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
        g_r = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
        errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                for a, b in zip(g_f, g_r)]
        scale = [float(jnp.max(jnp.abs(b))) for b in g_r]
        rel = [e / max(s, 1e-6) for e, s in zip(errs, scale)]
        print(f"causal={causal}: |o| err={err_o:.4f} grad rel err "
              f"dq={rel[0]:.4f} dk={rel[1]:.4f} dv={rel[2]:.4f}")
        assert err_o < 0.05, err_o
        assert all(r < 0.05 for r in rel), rel
    print("PASS: flash fwd+bwd parity on", jax.default_backend())


if __name__ == "__main__":
    main()
