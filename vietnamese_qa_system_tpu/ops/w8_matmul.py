"""Weight-only-int8 matmul kernel (w8 GEMM) for serving decode.

Capability of the reference's 8-bit serving path (bitsandbytes
``load_in_8bit``, reference src/models/trainer.py:470-487 /
inference_pipeline usage) — rebuilt as the TPU-idiomatic version: the
int8 weight tile is DMA'd from HBM at BYTE rate and cast to bf16
in-register inside the kernel, so a decode step streams half the bytes
of a bf16 model.  The XLA alternative (``x @ (w_q * w_s)``) materializes
a dequantized copy of the whole weight every step — measured 1.7x
SLOWER than plain bf16 serving on PhoGPT-4B (docs/BENCHMARKS.md,
round-4 serving table), i.e. quantization used to cost throughput; this
kernel is what makes int8 weights pay at decode time.

Scheme: per-OUTPUT-CHANNEL scales (``w ~= w_q * w_s[None, :]``, the
standard weight-only-quant GEMM layout) so the scale folds into the
(M, blk_n) accumulator AFTER the contraction — blockwise-along-K scales
(the training QLoRA layout) cannot fold through the K sum.  Quantize
with ``quantize_weight(w, "int8", block=d_in)`` (nb == 1 row of scales
== per-column); ``models.quantize`` exposes this as mode "int8c".

Grid (N/blk_n, K/blk_k), K innermost: an f32 VMEM accumulator carries
partial sums across K steps (TPU grid order is sequential), the scale
multiplies once at the last K step.  M (decode rows) is padded to the
8-sublane tile; K/N must be divisible by a supported block — callers
(layers.dense) fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _should_interpret(interpret: bool | None) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _w8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 -> bf16 cast happens in VMEM/registers; only int8 bytes ever
    # crossed HBM for this tile
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16),
        w_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _emit():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("blk_k", "blk_n", "out_dtype", "interpret")
)
def _w8_matmul(x, w_q, w_s, *, blk_k, blk_n, out_dtype, interpret):
    m, kk = x.shape
    _, n = w_q.shape
    grid = (n // blk_n, kk // blk_k)
    return pl.pallas_call(
        _w8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, blk_k), lambda nb, kb: (0, kb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_k, blk_n), lambda nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_n), lambda nb, kb: (0, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, blk_n), lambda nb, kb: (0, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((m, blk_n), jnp.float32)],
        interpret=interpret,
    )(x, w_q, w_s)


def _pick_blk(dim: int, candidates=(512, 256, 128)) -> int | None:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def _pick_blk_k(k_dim: int, m_pad: int, blk_n: int) -> int | None:
    """Largest VMEM-safe K block — fewer sequential grid steps.

    Each Mosaic grid step carries a fixed overhead that dominates at
    decode row counts (m <= 16: a (16, 512)@(512, 512) step is ~4 MFLOP
    of MXU work under ~2 us of per-step cost — the 8-slot plain-chunk
    engine measured int8c LOSING to bf16 until the step count dropped,
    docs/BENCHMARKS.md round-5).  Maximizing blk_k minimizes the
    K-innermost grid length (often to 1), bounded by the int8 weight
    tile (blk_k * blk_n bytes) and the bf16 x tile (m_pad * blk_k * 2)
    each staying <= 4 MB of VMEM.
    """
    for c in (4096, 3072, 2048, 1536, 1024, 768, 512, 384, 256, 128):
        if k_dim % c:
            continue
        if c * blk_n > 4 * 1024 * 1024:
            continue
        if m_pad * c * 2 > 4 * 1024 * 1024:
            continue
        return c
    return None


def supports(m: int, k: int, n: int, max_rows: int = 256) -> bool:
    """True if w8_matmul can run this shape (layers.dense gates on it)."""
    return (
        m <= max_rows
        and _pick_blk(k) is not None
        and _pick_blk(n) is not None
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _w8(x, w_q, w_s, out_dtype, interpret):
    m, kk = x.shape
    n = w_q.shape[1]
    # pad M to the 16-sublane bf16 native tile (not 8): v5e's Mosaic
    # accepted an 8-row bf16 block, but sub-native-tile second-minor dims
    # are a rejection/perf hazard on other TPU generations, and the cost
    # at decode shapes is nil (advisor finding, round 4)
    m_pad = -(-m // 16) * 16
    blk_n = _pick_blk(n)
    blk_k = _pick_blk_k(kk, m_pad, blk_n) if blk_n else None
    if blk_k is None or blk_n is None:
        raise ValueError(
            f"w8_matmul needs K/N divisible by 128 (got K={kk}, N={n}); "
            "gate calls with ops.w8_matmul.supports()"
        )
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    y = _w8_matmul(
        x, w_q, w_s, blk_k=blk_k, blk_n=blk_n, out_dtype=out_dtype,
        interpret=_should_interpret(interpret),
    )
    return y[:m]


def _w8_fwd_rule(x, w_q, w_s, out_dtype, interpret):
    return _w8(x, w_q, w_s, out_dtype, interpret), (x, w_q, w_s)


def _w8_bwd_rule(out_dtype, interpret, res, dy):
    # weights are frozen int8 (serving / QLoRA base): only dx flows.
    # dx = (dy * w_s) @ w_q.T — XLA path; the bwd only runs if someone
    # differentiates a model whose int8c base feeds the kernel (tiny
    # microbatches), never in the serving hot loop.
    x, w_q, w_s = res
    dyf = dy.astype(jnp.float32) * w_s
    dx = jnp.dot(
        dyf.astype(jnp.bfloat16),
        w_q.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    dwq = np.zeros(w_q.shape, jax.dtypes.float0)  # int8: no tangent space
    return dx, dwq, jnp.zeros_like(w_s)


_w8.defvjp(_w8_fwd_rule, _w8_bwd_rule)


def w8_matmul(x, w_q, w_s, *, out_dtype=None, interpret=None):
    """``(x @ w_q) * w_s`` with int8 weights streamed at byte rate.

    x (M, K) float; w_q (K, N) int8; w_s per-output-channel scales of
    shape (1, N) or (N,).  Returns (M, N) in ``out_dtype`` (default:
    x.dtype).  M is padded to the 8-row sublane tile internally.
    """
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    w_s = jnp.asarray(w_s, jnp.float32).reshape(1, w_q.shape[1])
    return _w8(x, w_q, w_s, out_dtype, interpret)


def w8_matmul_reference(x, w_q, w_s, out_dtype=None):
    """XLA oracle: dequantize-then-matmul (what the kernel replaces)."""
    out_dtype = out_dtype or x.dtype
    w_s = jnp.asarray(w_s, jnp.float32).reshape(1, -1)
    w = w_q.astype(jnp.float32) * w_s
    return jnp.dot(
        x.astype(jnp.float32), w, preferred_element_type=jnp.float32
    ).astype(out_dtype)
