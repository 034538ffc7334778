"""Fused IVF probe-score kernel: gather + dequant + matvec in one pass.

Why this kernel exists (measured, scripts/probe_ivf_decomp.py on v5e):
the XLA formulation of IVF probing — ``buckets[probe]`` gather followed by
an ``einsum("bd,bpcd->bpc")`` batched matvec — costs **2.1 ms + 2.1 ms at
B=1, nprobe=8** for only ~2.5 MB of probed data (~500x off DMA rate).
Both lowerings are latency-bound: the gather issues per-row descriptors
and the batched matvec reduces on the VPU.  A Pallas kernel makes the
probed-bucket scan what it physically is — ``B * nprobe`` sequential
bucket-slab DMAs, each scored with one MXU matvec:

- the probe ids ride **scalar prefetch** (``PrefetchScalarGridSpec``), so
  each grid step's bucket block is addressed by ``ids[b, p]`` directly in
  the BlockSpec index map — the "gather" becomes the grid's own DMA
  pipeline, overlapped with compute by the Mosaic double-buffer;
- int8 codes are upcast to bf16 **inside the kernel tile** (VPU, fused
  with the DMA pipeline) and the per-row scales multiply the (1, cap)
  score row — never a materialized dequantized slab (CLAUDE.md: fold
  scales into the small factor);
- bucket gids are copied through the same pipeline, so the caller gets
  aligned ``(B, P, cap)`` scores + gids without a second XLA gather.

The IVF data layout this reads is engine/ivf.py's fixed-shape bucket
slab: ``buckets (C, cap, D)`` with ``cap % 32 == 0`` (int8 sublane tile)
and ``D % 128 == 0``; scores last-dim = cap, padded to a lane multiple by
the caller (build rounds cap to 128).

Capability parity: faiss ``IVFFlat.search`` (the reference's txtai
backend, reference inference_pipeline/db_utils/heavy_ranker.py:78-101),
rebuilt as a TPU kernel instead of CPU inverted-list pointer chasing.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _probe_score_kernel(ids_ref, q_ref, bucket_ref, scale_ref, gid_ref,
                        out_ref, gout_ref, *, has_scales: bool):
    """One grid step = one (query b, probe p) bucket.

    Singleton sublane axes below exist for Mosaic's block rule (a block
    dim of 1 must EQUAL the array dim, so the arrays carry an explicit
    1-sized axis rather than slicing 1 out of B/P/C).

    q_ref      (1, 1, D)    f32   — query row b
    bucket_ref (1, cap, D)  int8/bf16 — bucket ids_ref[b, p]
    scale_ref  (1, 1, cap)  f32   — per-row dequant scales (int8 only)
    gid_ref    (1, 1, cap)  int32 — global ids, -1 on pad rows
    out_ref    (1, 1, 1, cap) f32   — scores (pad rows -> -inf)
    gout_ref   (1, 1, 1, cap) int32 — gids aligned with scores
    """
    q = q_ref[0].astype(jnp.bfloat16)                # (1, D)
    codes = bucket_ref[0].astype(jnp.bfloat16)       # (cap, D)
    s = jax.lax.dot_general(
        q, codes, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (1, cap)
    if has_scales:
        s = s * scale_ref[0]
    g = gid_ref[0]                                   # (1, cap)
    s = jnp.where(g >= 0, s, jnp.float32(-jnp.inf))
    out_ref[0, 0] = s
    gout_ref[0, 0] = g


@functools.partial(
    jax.jit,
    static_argnames=("interpret",),
)
def ivf_probe_scores(q, probe_ids, buckets, bucket_scales, bucket_gids,
                     *, interpret: bool | None = None):
    """Score every probed bucket row against its query.

    q             (B, D)  f32 — global scale (int8_global) pre-folded
    probe_ids     (B, P)  int32, each in [0, C)
    buckets       (C, cap, D) int8 | bf16
    bucket_scales (C, cap) f32 or None (bf16 / global-scale corpora)
    bucket_gids   (C, cap) int32, -1 pad

    Returns (scores (B, P, cap) f32 with pads at -inf, gids (B, P, cap)).
    ``P`` is padded to a multiple of 8 internally (probe id 0 re-scored,
    then sliced off) so the f32 output block obeys the (8, 128) tile.
    """
    b, d = q.shape
    _, p = probe_ids.shape
    c, cap, d2 = buckets.shape
    assert d2 == d and cap % 128 == 0, (cap, d, d2)
    has_scales = bucket_scales is not None
    if not has_scales:
        # dummy operand keeps one kernel signature; never read
        bucket_scales = jnp.zeros((1, cap), jnp.float32)

    p_pad = _round_up(p, 8)
    if p_pad != p:
        probe_ids = jnp.pad(probe_ids, ((0, 0), (0, p_pad - p)))

    grid = (b, p_pad)
    kernel = functools.partial(_probe_score_kernel, has_scales=has_scales)
    scores, gids = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, d), lambda bi, pi, ids: (bi, 0, 0)),
                pl.BlockSpec(
                    (1, cap, d), lambda bi, pi, ids: (ids[bi, pi], 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, cap),
                    (lambda bi, pi, ids: (0, 0, 0)) if not has_scales
                    else (lambda bi, pi, ids: (ids[bi, pi], 0, 0)),
                ),
                pl.BlockSpec(
                    (1, 1, cap), lambda bi, pi, ids: (ids[bi, pi], 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, 1, cap), lambda bi, pi, ids: (bi, pi, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 1, cap), lambda bi, pi, ids: (bi, pi, 0, 0)
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, p_pad, 1, cap), jnp.float32),
            jax.ShapeDtypeStruct((b, p_pad, 1, cap), jnp.int32),
        ],
        interpret=_should_interpret(interpret),
    )(
        probe_ids,
        q.astype(jnp.float32)[:, None, :],
        buckets,
        bucket_scales[:, None, :],
        bucket_gids[:, None, :],
    )
    scores = scores[:, :p, 0]
    gids = gids[:, :p, 0]
    return scores, gids


def ivf_probe_scores_reference(q, probe_ids, buckets, bucket_scales,
                               bucket_gids):
    """XLA oracle for the kernel (the original gather+einsum path)."""
    bq = q.astype(jnp.bfloat16)
    bv = buckets[probe_ids]                      # (B, P, cap, D)
    g = bucket_gids[probe_ids]                   # (B, P, cap)
    sc = jnp.einsum(
        "bd,bpcd->bpc", bq, bv.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if bucket_scales is not None:
        sc = sc * bucket_scales[probe_ids]
    sc = jnp.where(g >= 0, sc, -jnp.inf)
    return sc, g
