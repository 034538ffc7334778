"""int8 symmetric quantization kernels (per-row scales).

Capability of the reference's bitsandbytes usage — nf4/int8 weight quant
(reference src/models/trainer.py:470-487) and 8-bit optimizer states
(PagedAdamW8bit / PagedLion8bit in reference scripts/train.sh) — rebuilt as
first-class Pallas TPU kernels.  Used by:

- the retrieval engine for vector compression (BASELINE config 3),
- ``train.optim`` for 8-bit optimizer-state pytrees.

Per-row symmetric scheme: ``x ≈ q * scale`` with ``scale = max|row| / 127``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _should_interpret(interpret: bool | None) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _quant_kernel(x_ref, q_ref, scale_ref):
    x = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # (rows, 1)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q_ref[:] = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    scale_ref[:] = scale


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def _quantize_int8(x, *, tile_rows, interpret):
    n, d = x.shape
    grid = (n // tile_rows,)
    q, scale = pl.pallas_call(
        _quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, d), lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((tile_rows, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    return q, scale


def quantize_int8(x, *, tile_rows: int = 256, interpret: bool | None = None):
    """Quantize (N, D) floats to int8 with per-row scales.

    Returns ``(values (N, D) int8, scales (N,) f32)``.

    Ragged row counts are zero-PADDED to the tile multiple and sliced
    back (per-row scheme: pad rows can't affect real rows).  The old
    tile_rows=1 fallback violated Mosaic's block rules on real TPU (row
    block must be divisible by 8 or span the array) — it only ever ran
    in CPU interpret mode.
    """
    n, d = x.shape
    tile_rows = min(tile_rows, -(-n // 8) * 8)
    n_pad = -(-n // tile_rows) * tile_rows
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    q, scale = _quantize_int8(
        x, tile_rows=tile_rows, interpret=_should_interpret(interpret)
    )
    return q[:n], scale.reshape(n_pad)[:n]


def dequantize_int8(q, scales, dtype=jnp.float32):
    """Inverse of :func:`quantize_int8` (XLA elementwise; fuses trivially)."""
    return q.astype(dtype) * scales.reshape(-1, 1).astype(dtype)


def quantize_int8_reference(x):
    """Pure-XLA reference implementation for parity tests."""
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(-1)


def quantize_int8_residual(x):
    """Two-level residual int8: ``x ≈ q1*s1 + q2*s2`` (per-row scales).

    Same code bytes per element as bf16 (2), but split into two int8
    halves so a first-pass scan can read ONLY the primary half (half the
    HBM traffic of bf16) and a small re-rank restores full precision:
    the residual level quantizes the primary's rounding error, giving
    ~15.7 effective bits — finer than bf16's 8-bit mantissa.  Backs the
    ``int8_res`` :class:`~..engine.store.VectorStore` dtype (two-stage
    retrieval at bf16 index memory; BASELINE config 3 at recall parity).

    Returns ``(q1 (N, D) int8, s1 (N,) f32, q2 (N, D) int8, s2 (N,) f32)``.
    """
    x = x.astype(jnp.float32)
    q1, s1 = quantize_int8_reference(x)
    r = x - q1.astype(jnp.float32) * s1[:, None]
    q2, s2 = quantize_int8_reference(r)
    return q1, s1, q2, s2


def quantize_int8_global(x):
    """Single-scale symmetric quantization: ``x ≈ q * scale`` with one
    scalar scale for the whole matrix.

    For L2-NORMALIZED embeddings per-vector absmax varies little, and a
    global scale lets the top-k kernel compare RAW int32 dot products
    (scaling deferred outside the kernel entirely — no per-column
    broadcast on the hot path).  Returns (q (N, D) int8, scale () f32).
    """
    x = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale
