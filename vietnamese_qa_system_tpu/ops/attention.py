"""Flash attention (Pallas TPU kernel).

Capability of the reference's FlashAttention-2 usage
(`--use_flash_attention_2`, reference train.py:26 / src/models/trainer.py:527
and the SDP-kernel autocast context, trainer.py:1011-1012): fused attention
that never materializes the (Tq, Tk) score matrix in HBM.

Design (standard TPU flash forward):
- grid = (batch*heads, Tq/BLK_Q, Tk/BLK_K); the Tk dimension is the
  innermost (sequential) axis, so running max ``m``, normalizer ``l`` and
  the output accumulator live in VMEM scratch across k-blocks.
- online softmax with fp32 accumulation; bf16 MXU matmuls.
- causal masking skips fully-masked k-blocks via ``pl.when`` (no wasted
  MXU work above the diagonal) and masks the diagonal block elementwise.
- optional per-row key-padding via ``kv_lens`` (B,) for right-padded
  batches.

Backward: ``flash_attention`` is wrapped in ``jax.custom_vjp`` with fully
fused FA2-style Pallas backward kernels (``_fa_bwd_kv_kernel`` /
``_fa_bwd_q_kernel`` below): dK/dV accumulate over q-blocks and dQ over
k-blocks, recomputing probabilities blockwise in VMEM from the saved
softmax statistics — the (Tq, Tk) score matrix is never materialized in
HBM in either direction.  Measured numbers in docs/BENCHMARKS.md.

Additive score bias (ALiBi / MPNet / T5 relative positions) is fused into
both directions; the bias itself gets a ZERO cotangent (exact for ALiBi's
constant bias and for LoRA training where relative-bias tables are frozen;
see ``flash_attention``).  A (H, 1, Tk) bias broadcasts over queries inside
the kernel, so ALiBi never materializes an (H, Tq, Tk) tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _should_interpret(interpret: bool | None) -> bool:
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _fa_kernel(
    *refs,  # [lens_ref (1, BH) SMEM if static_len is None], q_ref (1, BLK_Q,
    # D), k_ref, v_ref, [bias_ref (1, BLK_Q, BLK_K)?], o_ref, lse_ref,
    # m/l/acc scratch.  The lens row lives in SMEM when present (a (BH, 1)
    # column layout blows the 1 MB SMEM budget for encoder-sized BH).
    blk_q: int,
    blk_k: int,
    causal: bool,
    scale: float,
    has_bias: bool = False,
    window: int | None = None,
    static_len: int | None = None,
    mxu_row_sum: bool = True,
):
    # `static_len` specialization: when every row attends the full
    # (static) key length, the length is baked in as a compile-time
    # constant and the lens operand is dropped.  Honest A/B (slope method,
    # scripts/probe_flash_honest.py) measures the two within noise of each
    # other (45.4 vs 44.8 TF/s at T=4k) — an earlier "4x operand penalty"
    # claim was a timing artifact: XLA hoists a loop-invariant 3-operand
    # pallas call out of a timing scan (LICM) but not a 4-operand one, so
    # hoisted variants looked iters-times faster.  The specialization is
    # kept for the simpler varlen-free compile path; perf-neutral.
    refs = list(refs)
    if static_len is None:
        lens_ref = refs.pop(0)
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *scratch = refs
    else:
        bias_ref = None
        q_ref, k_ref, v_ref, o_ref, lse_ref, *scratch = refs
    if mxu_row_sum:
        m_scr, acc_scr = scratch
        l_scr = None
    else:
        # separate VPU row-sum recurrence: at D % 128 == 0 (the PhoGPT
        # D=128 regime) the ones-column trick below pads p@v to D+1
        # columns, which spills into a SECOND 128-wide MXU tile and
        # doubles that matmul's hardware cost; a (BLK_Q, 1) l scratch +
        # one VPU row reduce is cheaper there (round-5 diagnosis of the
        # fwd-vs-bwd TF/s asymmetry, scripts/probe_flash_rowsum.py)
        m_scr, acc_scr, l_scr = scratch
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    # hoisted out of the pl.when branch: program_id / SMEM reads must run
    # at kernel top level for interpret mode
    cur_len = static_len if static_len is not None else lens_ref[0, pl.program_id(0)]

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)
        if l_scr is not None:
            l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)

    def compute(masked: bool):
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLK_Q, BLK_K)
        if scale != 1.0:
            # the public wrapper pre-scales q so this full-size multiply
            # vanishes (the kernel is VPU-bound; every per-score op counts)
            s = s * scale
        if bias_ref is not None:
            # additive per-head score bias (MPNet/T5 relative positions),
            # applied after scaling — same semantics as layers.attention
            s = s + bias_ref[0]

        if masked:
            # one combined mask: k_pos < min(cur_len, q_pos+1) folds the
            # length and causal constraints into a single compare against
            # a per-row (BLK_Q, 1) limit — vs the naive two full-size
            # iotas + two compares + and (the kernel is VPU-bound, so
            # every (BLK_Q, BLK_K) pass counts)
            q_col = iq * blk_q + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, 1), 0
            )
            k_pos = ik * blk_k + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 1
            )
            limit = jnp.minimum(cur_len, q_col + 1) if causal else cur_len
            mask = k_pos < limit
            if window is not None:
                # sliding window: a query sees at most `window` keys ending
                # at itself (GPT-Neo/Mistral local attention; matches
                # models/causal_lm._window_mask in slot space)
                mask &= k_pos > q_col - window
            s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # NOTE: exp in bf16 measured neutral-to-worse (3.97 vs 3.84 ms
        # honest at T=4k) — Mosaic's transcendental rate doesn't double
        p_f = jnp.exp(s - m_cur)  # (BLK_Q, BLK_K) f32
        p = p_f.astype(jnp.bfloat16)
        alpha = jnp.exp(m_prev - m_cur)  # (BLK_Q, 1)
        if mxu_row_sum:
            # row-sum rides the MXU for free WHEN D leaves tile slack:
            # at D=64 the matmul N-dim only half-fills the 128-wide MXU
            # tile, so appending a ones column to v computes sum(p) in
            # the SAME pass as p@v — the VPU row-sum and the separate l
            # recurrence disappear (l is acc column D, sharing the alpha
            # rescale).  At D=128 this pad costs a whole second tile —
            # use mxu_row_sum=False there.
            v_ext = jnp.pad(
                v_ref[0], ((0, 0), (0, 1)), constant_values=1.0)
            pv = jax.lax.dot_general(
                p,
                v_ext,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BLK_Q, D+1); column D is sum(p)
            acc_scr[:] = acc_scr[:] * alpha + pv
        else:
            pv = jax.lax.dot_general(
                p,
                v_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BLK_Q, D)
            acc_scr[:] = acc_scr[:] * alpha + pv
            l_scr[:] = l_scr[:] * alpha + jnp.sum(
                p_f, axis=1, keepdims=True)
        m_scr[:] = m_cur

    # Interior blocks need NO masking at all: every key in the block is
    # (a) inside the valid length, (b) at-or-before every query (causal),
    # and (c) inside the sliding-window band.  At large T most computed
    # blocks are interior, and the mask machinery was ~half the VPU work
    # of this VPU-bound kernel.
    clean = (ik + 1) * blk_k <= cur_len
    if causal:
        clean = jnp.logical_and(clean, (ik + 1) * blk_k - 1 <= iq * blk_q)
    if window is not None:
        clean = jnp.logical_and(
            clean, (iq + 1) * blk_q - 1 - ik * blk_k < window
        )

    if causal:
        # skip blocks entirely above the diagonal; with a sliding window
        # also skip blocks entirely below it (O(T*window) work, not O(T^2))
        cond = ik * blk_k <= (iq + 1) * blk_q - 1
        if window is not None:
            cond = jnp.logical_and(
                cond, (ik + 1) * blk_k - 1 >= iq * blk_q - (window - 1)
            )
    else:
        cond = True

    @pl.when(jnp.logical_and(cond, clean))
    def _clean():
        compute(masked=False)

    @pl.when(jnp.logical_and(cond, jnp.logical_not(clean)))
    def _masked():
        compute(masked=True)

    @pl.when(ik == nk - 1)
    def _emit():
        if mxu_row_sum:
            d = acc_scr.shape[-1] - 1
            l = jnp.maximum(acc_scr[:, d:], 1e-30)  # (BLK_Q, 1): sum(p)
            o_ref[0] = (acc_scr[:, :d] / l).astype(o_ref.dtype)
        else:
            l = jnp.maximum(l_scr[:], 1e-30)
            o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse = (m_scr[:] + jnp.log(l)).reshape(1, blk_q)  # (1, BLK_Q)
        lse_ref[0, 0] = jnp.broadcast_to(lse, (8, blk_q))


@functools.partial(
    jax.jit,
    static_argnames=("causal", "blk_q", "blk_k", "scale", "interpret",
                     "n_heads", "window", "static_len", "mxu_row_sum"),
)
def _flash_fwd(q, k, v, kv_lens, bias=None, *, causal, blk_q, blk_k, scale,
               interpret, n_heads: int = 1, window: int | None = None,
               static_len: int | None = None,
               mxu_row_sum: bool | None = None):
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq = tq // blk_q
    grid = (bh, nq, tk // blk_k)
    if mxu_row_sum is None:
        # the ones-column trick is free only while D leaves slack in the
        # last 128-wide MXU tile; at D % 128 == 0 the pad costs a whole
        # extra tile per p@v (A/B in scripts/probe_flash_rowsum.py; see
        # docs/BENCHMARKS.md round-5 "flash fwd row-sum")
        mxu_row_sum = d % 128 != 0
    kernel = functools.partial(
        _fa_kernel, blk_q=blk_q, blk_k=blk_k, causal=causal, scale=scale,
        has_bias=bias is not None, window=window, static_len=static_len,
        mxu_row_sum=mxu_row_sum,
    )
    in_specs = [
        pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [q, k, v]
    if static_len is None:
        # whole lens vector in SMEM (tiny); per-bh blocks would violate
        # Mosaic's min block-shape rules
        in_specs.insert(0, pl.BlockSpec(
            (1, bh), lambda b, i, j: (0, 0), memory_space=pltpu.SMEM))
        inputs.insert(0, kv_lens)
    if bias is not None:
        # (H, Tq|1, Tk) shared across the batch; grid rows are bh = b*H + h.
        # A q-dim of 1 (ALiBi key-only bias) broadcasts inside the kernel.
        bq = blk_q if bias.shape[1] != 1 else 1
        in_specs.append(
            pl.BlockSpec(
                (1, bq, blk_k),
                lambda b, i, j: (b % n_heads, i if bq != 1 else 0, j),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(bias)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, blk_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 8, blk_q),
                lambda b, i, j: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq, 8, blk_q), jnp.float32),
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((blk_q, 1), jnp.float32),
                # accumulator column d carries sum(p) (MXU-rowsum trick)
                pltpu.VMEM((blk_q, d + 1), jnp.float32),
            ]
            if mxu_row_sum
            else [
                pltpu.VMEM((blk_q, 1), jnp.float32),
                pltpu.VMEM((blk_q, d), jnp.float32),
                # separate VPU row-sum recurrence (D % 128 == 0 path)
                pltpu.VMEM((blk_q, 1), jnp.float32),
            ]
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq * tk * d,
            bytes_accessed=2 * bh * (tq + 2 * tk) * d,
            transcendentals=bh * tq * tk,
        ),
        interpret=interpret,
    )(*inputs)


def _reference_attention(q, k, v, kv_lens, causal, scale, window=None):
    """XLA reference (used for tests and the custom-vjp backward)."""
    kv_lens = kv_lens.reshape(-1)  # accept (BH,), (BH, 1) or (1, BH)
    s = jnp.einsum(
        "bqd,bkd->bqk",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    tq, tk = q.shape[1], k.shape[1]
    k_pos = jnp.arange(tk)[None, None, :]
    mask = k_pos < kv_lens[:, None, None]
    if causal:
        mask &= k_pos <= jnp.arange(tq)[None, :, None]
    if window is not None:
        mask &= (jnp.arange(tq)[None, :, None] - k_pos) < window
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)




# ---------------------------------------------------------------------------
# Fused backward (FA2-style): two kernels, dK/dV then dQ
# ---------------------------------------------------------------------------


def _bwd_clean_cond(cur_len, iq, ik, *, blk_q, blk_k, causal,
                    window: int | None):
    """Scalar predicate: this (q-block, k-block) pair needs NO mask (every
    key valid, at-or-before every query, inside the window band)."""
    clean = (ik + 1) * blk_k <= cur_len
    if causal:
        clean = jnp.logical_and(clean, (ik + 1) * blk_k - 1 <= iq * blk_q)
    if window is not None:
        clean = jnp.logical_and(
            clean, (iq + 1) * blk_q - 1 - ik * blk_k < window
        )
    return clean


def _fa_bwd_common(cur_len, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                   iq, ik, *, blk_q, blk_k, causal, scale, bias_ref=None,
                   window: int | None = None, masked: bool = True):
    """Recompute P for one (q-block, k-block) pair and form dS/scale.

    Returns (p, ds0) both (BLK_Q, BLK_K) f32 with ds0 = p * (dp - dd) —
    the ``* scale`` factor is deliberately NOT applied here: callers fold
    it into the tiny (BLK, D) accumulator at emit time instead of paying
    a full-size f32 multiply per block (the kernel is VPU-bound).
    lse/dd are sublane-replicated (1, 1, 8, BLK_Q) blocks; row 0 carries
    the values.  ``cur_len`` must be read at kernel top level (program_id
    breaks inside pl.when branches in interpret mode).  ``masked=False``
    skips the mask machinery entirely (interior blocks).
    """
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:
        # the public wrapper pre-scales q, making this a no-op (see
        # flash_attention); kept for direct callers
        s = s * scale
    if bias_ref is not None:
        # same post-scale additive bias as the forward recompute; a
        # (1, BLK_K) block broadcasts over the q rows (ALiBi key-only form)
        s = s + bias_ref[0]
    lse = lse_ref[0, 0, 0, :].reshape(blk_q, 1)  # (BLK_Q, 1)
    if masked:
        q_col = iq * blk_q + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, 1), 0
        )
        k_pos = ik * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1
        )
        limit = jnp.minimum(cur_len, q_col + 1) if causal else cur_len
        mask = k_pos < limit
        if window is not None:
            mask &= k_pos > q_col - window
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # normalized probs
    else:
        p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLK_Q, BLK_K)
    dd = dd_ref[0, 0, 0, :].reshape(blk_q, 1)  # rowsum(dO * O)
    ds0 = p * (dp - dd)
    return p, ds0


def _fa_bwd_kv_kernel(
    *refs,
    blk_q, blk_k, causal, scale, has_bias: bool = False,
    window: int | None = None, static_len: int | None = None,
):
    """grid (BH, nk, nq), q innermost: accumulate dK/dV per k-block.

    Like the forward, specialized on ``static_len``: the lens operand is
    dropped when all rows share one (static) key length (perf-neutral,
    see the note in _fa_kernel).
    """
    refs = list(refs)
    if static_len is None:
        lens_ref = refs.pop(0)
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref = refs[:6]
    rest = refs[6:]
    if has_bias:
        bias_ref, dk_ref, dv_ref, dk_acc, dv_acc = rest
    else:
        bias_ref = None
        dk_ref, dv_ref, dk_acc, dv_acc = rest
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)
    cur_len = static_len if static_len is not None else lens_ref[0, pl.program_id(0)]

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros(dk_acc.shape, jnp.float32)
        dv_acc[:] = jnp.zeros(dv_acc.shape, jnp.float32)

    def compute(masked: bool):
        p, ds0 = _fa_bwd_common(
            cur_len, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
            iq, ik, blk_q=blk_q, blk_k=blk_k, causal=causal, scale=scale,
            bias_ref=bias_ref, window=window, masked=masked,
        )
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), do_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLK_K, D)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds0.astype(jnp.bfloat16), q_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        # q-blocks strictly above the diagonal contribute nothing; with a
        # sliding window neither do q-blocks entirely past k+window-1
        cond = (iq + 1) * blk_q - 1 >= ik * blk_k
        if window is not None:
            cond = jnp.logical_and(
                cond, iq * blk_q <= (ik + 1) * blk_k - 1 + (window - 1)
            )
    else:
        cond = True
    clean = _bwd_clean_cond(
        cur_len, iq, ik, blk_q=blk_q, blk_k=blk_k, causal=causal,
        window=window,
    )

    @pl.when(jnp.logical_and(cond, clean))
    def _clean():
        compute(masked=False)

    @pl.when(jnp.logical_and(cond, jnp.logical_not(clean)))
    def _masked():
        compute(masked=True)

    @pl.when(iq == nq - 1)
    def _emit():
        # dS = ds0 * scale, folded into the (BLK_K, D) accumulator here
        # instead of a full (BLK_Q, BLK_K) multiply per block
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _fa_bwd_q_kernel(
    *refs,
    blk_q, blk_k, causal, scale, has_bias: bool = False,
    window: int | None = None, static_len: int | None = None,
):
    """grid (BH, nq, nk), k innermost: accumulate dQ per q-block."""
    refs = list(refs)
    if static_len is None:
        lens_ref = refs.pop(0)
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref = refs[:6]
    rest = refs[6:]
    if has_bias:
        bias_ref, dq_ref, dq_acc = rest
    else:
        bias_ref = None
        dq_ref, dq_acc = rest
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    cur_len = static_len if static_len is not None else lens_ref[0, pl.program_id(0)]

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros(dq_acc.shape, jnp.float32)

    def compute(masked: bool):
        _, ds0 = _fa_bwd_common(
            cur_len, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
            iq, ik, blk_q=blk_q, blk_k=blk_k, causal=causal, scale=scale,
            bias_ref=bias_ref, window=window, masked=masked,
        )
        dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
            ds0.astype(jnp.bfloat16), k_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLK_Q, D)

    if causal:
        cond = ik * blk_k <= (iq + 1) * blk_q - 1
        if window is not None:
            cond = jnp.logical_and(
                cond, (ik + 1) * blk_k - 1 >= iq * blk_q - (window - 1)
            )
    else:
        cond = True
    clean = _bwd_clean_cond(
        cur_len, iq, ik, blk_q=blk_q, blk_k=blk_k, causal=causal,
        window=window,
    )

    @pl.when(jnp.logical_and(cond, clean))
    def _clean():
        compute(masked=False)

    @pl.when(jnp.logical_and(cond, jnp.logical_not(clean)))
    def _masked():
        compute(masked=True)

    @pl.when(ik == nk - 1)
    def _emit():
        # dS = ds0 * scale, folded into the (BLK_Q, D) accumulator here
        dq_ref[0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _fa_bwd_fused_kernel(
    *refs,
    blk_q, blk_k, causal, scale, has_bias: bool = False,
    window: int | None = None, static_len: int | None = None,
):
    """Single-pass backward: grid (BH, nq, nk) with k innermost, computing
    dQ, dK AND dV in one sweep.

    The split dq/dkv design recomputes p and dp twice (7 matmuls total)
    and reads q/k/v/dO/lse/dd from HBM twice; here the recompute happens
    ONCE (5 matmuls) and the inputs stream once.  dQ accumulates in a
    (BLK_Q, D) scratch reset per q-row (emitted at the row's last
    k-block, exactly like the split dq kernel).  dK/dV accumulate into
    FULL-LENGTH (Tk, D) f32 VMEM scratch persisting across the whole
    per-bh subgrid (zeroed at the subgrid's first step) and are emitted
    blockwise on the last q-row.  The dk/dv output windows are revisited
    once per q-row, so Pallas DMAs partially-accumulated blocks out
    (nq-1) extra times — wasted bandwidth but correct, because the grid
    is sequential and the final (iq == nq-1) write lands last; the waste
    is bounded by the VMEM cap below (see _flash_bwd_impl), and the
    recompute + re-read savings measured larger (docs/BENCHMARKS.md).
    """
    refs = list(refs)
    if static_len is None:
        lens_ref = refs.pop(0)
    q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref = refs[:6]
    rest = refs[6:]
    if has_bias:
        (bias_ref, dq_ref, dk_ref, dv_ref,
         dq_acc, dk_full, dv_full) = rest
    else:
        bias_ref = None
        dq_ref, dk_ref, dv_ref, dq_acc, dk_full, dv_full = rest
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nq = pl.num_programs(1)
    nk = pl.num_programs(2)
    cur_len = static_len if static_len is not None else lens_ref[0, pl.program_id(0)]

    @pl.when(ik == 0)
    def _init_row():
        dq_acc[:] = jnp.zeros(dq_acc.shape, jnp.float32)

    @pl.when(jnp.logical_and(iq == 0, ik == 0))
    def _init_bh():
        dk_full[:] = jnp.zeros(dk_full.shape, jnp.float32)
        dv_full[:] = jnp.zeros(dv_full.shape, jnp.float32)

    def compute(masked: bool):
        p, ds0 = _fa_bwd_common(
            cur_len, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
            iq, ik, blk_q=blk_q, blk_k=blk_k, causal=causal, scale=scale,
            bias_ref=bias_ref, window=window, masked=masked,
        )
        pb = p.astype(jnp.bfloat16)
        dsb = ds0.astype(jnp.bfloat16)
        dq_acc[:] = dq_acc[:] + jax.lax.dot_general(
            dsb, k_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLK_Q, D)
        sl = pl.dslice(ik * blk_k, blk_k)
        dv_full[sl] = dv_full[sl] + jax.lax.dot_general(
            pb, do_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLK_K, D)
        dk_full[sl] = dk_full[sl] + jax.lax.dot_general(
            dsb, q_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if causal:
        cond = ik * blk_k <= (iq + 1) * blk_q - 1
        if window is not None:
            cond = jnp.logical_and(
                cond, (ik + 1) * blk_k - 1 >= iq * blk_q - (window - 1)
            )
    else:
        cond = True
    clean = _bwd_clean_cond(
        cur_len, iq, ik, blk_q=blk_q, blk_k=blk_k, causal=causal,
        window=window,
    )

    @pl.when(jnp.logical_and(cond, clean))
    def _clean():
        compute(masked=False)

    @pl.when(jnp.logical_and(cond, jnp.logical_not(clean)))
    def _masked():
        compute(masked=True)

    @pl.when(ik == nk - 1)
    def _emit_dq():
        out = dq_acc[:]
        if scale != 1.0:
            out = out * scale
        dq_ref[0] = out.astype(dq_ref.dtype)

    @pl.when(iq == nq - 1)
    def _emit_dkv():
        sl = pl.dslice(ik * blk_k, blk_k)
        dk = dk_full[sl]
        if scale != 1.0:
            dk = dk * scale
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_full[sl].astype(dv_ref.dtype)


# The fused single-pass backward holds full-length (Tk, D) f32 dK/dV
# accumulators in VMEM; cap the residency (2 * Tk * D * 4 bytes) and fall
# back to the two-kernel path for longer sequences.
_FUSED_BWD_MAX_BYTES = 4 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("causal", "blk_q", "blk_k", "scale", "interpret",
                     "n_heads", "window", "static_len"),
)
def _flash_bwd_impl(q, k, v, kv_lens, do, lse4, dd4, bias=None, *, causal,
                    blk_q, blk_k, scale, interpret, n_heads: int = 1,
                    window: int | None = None,
                    static_len: int | None = None):
    bh, tq, d = q.shape
    tk = k.shape[1]
    nq, nk = tq // blk_q, tk // blk_k
    has_bias = bias is not None

    if static_len is None:
        common_in_specs = [
            pl.BlockSpec((1, bh), lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        common_inputs = [kv_lens]
    else:
        common_in_specs = []
        common_inputs = []

    if 2 * tk * d * 4 <= _FUSED_BWD_MAX_BYTES:
        # single-pass fused backward (see _fa_bwd_fused_kernel)
        fused_kernel = functools.partial(
            _fa_bwd_fused_kernel, blk_q=blk_q, blk_k=blk_k, causal=causal,
            scale=scale, has_bias=has_bias, window=window,
            static_len=static_len,
        )

        def qspec_f(im):
            return pl.BlockSpec((1, blk_q, d), im, memory_space=pltpu.VMEM)

        def kspec_f(im):
            return pl.BlockSpec((1, blk_k, d), im, memory_space=pltpu.VMEM)

        f_inputs = common_inputs + [q, k, v, do, lse4, dd4]
        f_in_specs = common_in_specs + [
            qspec_f(lambda b, iq, jk: (b, iq, 0)),
            kspec_f(lambda b, iq, jk: (b, jk, 0)),
            kspec_f(lambda b, iq, jk: (b, jk, 0)),
            qspec_f(lambda b, iq, jk: (b, iq, 0)),
            pl.BlockSpec((1, 1, 8, blk_q), lambda b, iq, jk: (b, iq, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, blk_q), lambda b, iq, jk: (b, iq, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if has_bias:
            bq = blk_q if bias.shape[1] != 1 else 1
            f_in_specs.append(
                pl.BlockSpec(
                    (1, bq, blk_k),
                    lambda b, iq, jk: (b % n_heads, iq if bq != 1 else 0, jk),
                    memory_space=pltpu.VMEM,
                )
            )
            f_inputs.append(bias)
        dq, dk, dv = pl.pallas_call(
            fused_kernel,
            grid=(bh, nq, nk),
            in_specs=f_in_specs,
            out_specs=(
                qspec_f(lambda b, iq, jk: (b, iq, 0)),
                kspec_f(lambda b, iq, jk: (b, jk, 0)),
                kspec_f(lambda b, iq, jk: (b, jk, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
                jax.ShapeDtypeStruct((bh, tk, d), q.dtype),
                jax.ShapeDtypeStruct((bh, tk, d), q.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((blk_q, d), jnp.float32),
                pltpu.VMEM((tk, d), jnp.float32),
                pltpu.VMEM((tk, d), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=10 * bh * tq * tk * d,
                bytes_accessed=2 * bh * (2 * tq + 2 * tk) * d,
                transcendentals=bh * tq * tk,
            ),
            interpret=interpret,
        )(*f_inputs)
        return dq, dk, dv

    def qspec(im):
        return pl.BlockSpec((1, blk_q, d), im, memory_space=pltpu.VMEM)

    def kspec(im):
        return pl.BlockSpec((1, blk_k, d), im, memory_space=pltpu.VMEM)

    def rspec(im):
        return pl.BlockSpec((1, 1, 8, blk_q), im, memory_space=pltpu.VMEM)

    # dK/dV: grid (BH, nk, nq), q innermost
    kv_kernel = functools.partial(
        _fa_bwd_kv_kernel, blk_q=blk_q, blk_k=blk_k, causal=causal,
        scale=scale, has_bias=has_bias, window=window, static_len=static_len,
    )
    kv_inputs = common_inputs + [q, k, v, do, lse4, dd4]
    kv_in_specs = common_in_specs + [
        qspec(lambda b, jk, iq: (b, iq, 0)),
        kspec(lambda b, jk, iq: (b, jk, 0)),
        kspec(lambda b, jk, iq: (b, jk, 0)),
        qspec(lambda b, jk, iq: (b, iq, 0)),
        rspec(lambda b, jk, iq: (b, iq, 0, 0)),
        rspec(lambda b, jk, iq: (b, iq, 0, 0)),
    ]
    if has_bias:
        bq = blk_q if bias.shape[1] != 1 else 1
        kv_in_specs.append(
            pl.BlockSpec(
                (1, bq, blk_k),
                lambda b, jk, iq: (b % n_heads, iq if bq != 1 else 0, jk),
                memory_space=pltpu.VMEM,
            )
        )
        kv_inputs.append(bias)
    dk, dv = pl.pallas_call(
        kv_kernel,
        grid=(bh, nk, nq),
        in_specs=kv_in_specs,
        out_specs=(
            kspec(lambda b, jk, iq: (b, jk, 0)),
            kspec(lambda b, jk, iq: (b, jk, 0)),
        ),
        out_shape=(
            # emitted in the input dtype: the custom-vjp caller casts to
            # q.dtype anyway, so f32 outputs only doubled the write DMA
            jax.ShapeDtypeStruct((bh, tk, d), q.dtype),
            jax.ShapeDtypeStruct((bh, tk, d), q.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_k, d), jnp.float32),
            pltpu.VMEM((blk_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(*kv_inputs)

    # dQ: grid (BH, nq, nk), k innermost
    q_kernel = functools.partial(
        _fa_bwd_q_kernel, blk_q=blk_q, blk_k=blk_k, causal=causal,
        scale=scale, has_bias=has_bias, window=window, static_len=static_len,
    )
    q_inputs = common_inputs + [q, k, v, do, lse4, dd4]
    q_in_specs = common_in_specs + [
        qspec(lambda b, iq, jk: (b, iq, 0)),
        kspec(lambda b, iq, jk: (b, jk, 0)),
        kspec(lambda b, iq, jk: (b, jk, 0)),
        qspec(lambda b, iq, jk: (b, iq, 0)),
        rspec(lambda b, iq, jk: (b, iq, 0, 0)),
        rspec(lambda b, iq, jk: (b, iq, 0, 0)),
    ]
    if has_bias:
        bq = blk_q if bias.shape[1] != 1 else 1
        q_in_specs.append(
            pl.BlockSpec(
                (1, bq, blk_k),
                lambda b, iq, jk: (b % n_heads, iq if bq != 1 else 0, jk),
                memory_space=pltpu.VMEM,
            )
        )
        q_inputs.append(bias)
    dq = pl.pallas_call(
        q_kernel,
        grid=(bh, nq, nk),
        in_specs=q_in_specs,
        out_specs=qspec(lambda b, iq, jk: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
        interpret=interpret,
    )(*q_inputs)
    return dq, dk, dv



@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_core(q, k, v, kv_lens, causal, scale, blk_q, blk_k, window,
                static_len):
    o, _ = _flash_fwd(
        q, k, v, kv_lens,
        causal=causal, blk_q=blk_q, blk_k=blk_k, scale=scale,
        interpret=_should_interpret(None), window=window,
        static_len=static_len,
    )
    return o


def _flash_core_fwd(q, k, v, kv_lens, causal, scale, blk_q, blk_k, window,
                    static_len):
    o, lse4 = _flash_fwd(
        q, k, v, kv_lens,
        causal=causal, blk_q=blk_q, blk_k=blk_k, scale=scale,
        interpret=_should_interpret(None), window=window,
        static_len=static_len,
    )
    # name the kernel outputs so selective remat policies can SAVE them
    # (models/layers.py::remat_wrap "dots"): unnamed pallas results are
    # not dots, so the whole forward kernel would re-run in the backward
    # just to regenerate these residuals
    o = checkpoint_name(o, "flash_out")
    lse4 = checkpoint_name(lse4, "flash_lse")
    return o, (q, k, v, kv_lens, o, lse4)


def _flash_core_bwd(causal, scale, blk_q, blk_k, window, static_len,
                    residuals, g):
    """Fully fused FA2 backward: dK/dV and dQ kernels recompute P blockwise
    from the saved logsumexp — O(T) memory, no (Tq, Tk) materialization."""
    q, k, v, kv_lens, o, lse4 = residuals
    bh, tq, d = q.shape
    nq = tq // blk_q
    do = g.astype(jnp.bfloat16)
    # D = rowsum(dO * O), laid out like the lse residual
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dd4 = jnp.broadcast_to(
        dd.reshape(bh, nq, 1, blk_q), (bh, nq, 8, blk_q)
    )
    dq, dk, dv = _flash_bwd_impl(
        q, k, v, kv_lens, do, lse4, dd4,
        causal=causal, blk_q=blk_q, blk_k=blk_k, scale=scale,
        interpret=_should_interpret(None), window=window,
        static_len=static_len,
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _flash_core_bias(q, k, v, kv_lens, bias, causal, scale, blk_q, blk_k,
                     n_heads, window, static_len):
    o, _ = _flash_fwd(
        q, k, v, kv_lens, bias,
        causal=causal, blk_q=blk_q, blk_k=blk_k, scale=scale,
        interpret=_should_interpret(None), n_heads=n_heads, window=window,
        static_len=static_len,
    )
    return o


def _flash_core_bias_fwd(q, k, v, kv_lens, bias, causal, scale, blk_q, blk_k,
                         n_heads, window, static_len):
    o, lse4 = _flash_fwd(
        q, k, v, kv_lens, bias,
        causal=causal, blk_q=blk_q, blk_k=blk_k, scale=scale,
        interpret=_should_interpret(None), n_heads=n_heads, window=window,
        static_len=static_len,
    )
    o = checkpoint_name(o, "flash_out")
    lse4 = checkpoint_name(lse4, "flash_lse")
    return o, (q, k, v, kv_lens, bias, o, lse4)


def _flash_core_bias_bwd(causal, scale, blk_q, blk_k, n_heads, window,
                         static_len, residuals, g):
    """Fused backward with the additive bias folded into the blockwise
    recompute of P.  The bias cotangent is ZERO by design: exact for
    constant biases (ALiBi) and for frozen relative-bias tables (LoRA
    fine-tuning) — see :func:`flash_attention`."""
    q, k, v, kv_lens, bias, o, lse4 = residuals
    bh, tq, d = q.shape
    nq = tq // blk_q
    do = g.astype(jnp.bfloat16)
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dd4 = jnp.broadcast_to(
        dd.reshape(bh, nq, 1, blk_q), (bh, nq, 8, blk_q)
    )
    dq, dk, dv = _flash_bwd_impl(
        q, k, v, kv_lens, do, lse4, dd4, bias,
        causal=causal, blk_q=blk_q, blk_k=blk_k, scale=scale,
        interpret=_should_interpret(None), n_heads=n_heads, window=window,
        static_len=static_len,
    )
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        None, jnp.zeros_like(bias),
    )


_flash_core_bias.defvjp(_flash_core_bias_fwd, _flash_core_bias_bwd)

# Block-size sweep on v5e at D=64 (T=2048 causal fwd, best-of-rounds):
# 256x256 5.63 ms, 512x512 3.22, 512x1024 2.75-2.94, 1024x1024 2.57 (2.2x),
# 1024x2048 / 2048x1024 regress.  exp2-based softmax measured neutral
# (Mosaic already lowers exp well).  Honest slope-method numbers
# (scripts/probe_flash_honest.py): fwd 4.55 ms = 45 TF/s at T=4k, bwd
# impl 12.1 ms, full grad 18.1 ms = 40 TF/s combined.  The kernel is
# VPU-softmax-bound at D=64 (round-2 diagnosis confirmed after the
# round-3 hoisting artifact was found).  Details in docs/BENCHMARKS.md.
_BLKQ = 1024
_BLKK = 1024


def flash_attention(
    q,
    k,
    v,
    *,
    kv_lens=None,
    causal: bool = True,
    scale: float | None = None,
    bias=None,
    window: int | None = None,
):
    """Fused attention over (B, T, H, D) tensors.

    - ``kv_lens`` (B,) int32: valid key length per row (right padding);
      defaults to full length.
    - ``bias``: optional (H, Tq, Tk) — or (H, 1, Tk), broadcast over
      queries (the ALiBi key-only form) — additive score bias shared
      across the batch (ALiBi / MPNet / T5 relative positions).  Fully
      differentiable w.r.t. q/k/v; the BIAS cotangent is zero (exact for
      ALiBi's constant bias and for LoRA training, which freezes
      relative-bias tables — training that updates the bias table itself
      must use the dense path).
    - ``window``: optional sliding window (causal only) — a query attends
      to at most ``window`` keys ending at itself (GPT-Neo local layers,
      reference GPTNeo `attention_types` / Mistral `sliding_window`).
      Blocks wholly outside the band are skipped in both directions, so
      work scales O(T*window) instead of O(T^2).
    - T is padded internally to the block size; outputs are sliced back.
    """
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    # kv_lens=None compiles the static specialization: the key length is
    # a compile-time constant and the kernels carry no lens operand
    # (perf-neutral vs the lens operand — see _fa_kernel — but a simpler
    # compile path).  Padded key columns (tk -> tk+pad_k) stay masked:
    # the static length is the UNPADDED tk.
    static_len = tk if kv_lens is None else None
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        window = int(window)

    blk_q = min(_BLKQ, max(128, 1 << max(tq - 1, 1).bit_length()))
    blk_k = min(_BLKK, max(128, 1 << max(tk - 1, 1).bit_length()))
    # No block-size cap for windows: measured on v5e (T=8192, w=256),
    # 256-wide k-blocks track the band tightly but the extra per-block
    # softmax rescale/pipeline overhead cancels the saving (3.38 ms vs
    # 3.48 full causal), while coarse 1024-block band skipping wins
    # (2.91 ms at w=1024).  The kernel is VPU-bound, so fewer, larger
    # blocks with whole-block skips beat a tighter band.
    if bias is not None and bias.shape[1] != 1:
        # a full-rank (H, Tq, Tk) f32 bias adds a (blk_q, blk_k) block to
        # every kernel's VMEM working set; 1024x1024 (4 MB double-buffered
        # to 8) blows the ~16 MB scoped budget in the backward — 512 fits.
        # The (H, 1, Tk) key-only form (ALiBi) keeps the big blocks.
        blk_q = min(blk_q, 512)
        blk_k = min(blk_k, 512)
    pad_q = (-tq) % blk_q
    pad_k = (-tk) % blk_k

    def to_bh(x, pad):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return (
            jnp.transpose(x, (0, 2, 1, 3))
            .reshape(b * h, x.shape[1], d)
            .astype(jnp.bfloat16)
        )

    # Fold the softmax scale into q OUTSIDE the kernel: the in-kernel
    # `s * scale` was a full (BLK_Q, BLK_K) f32 multiply per block on the
    # VPU-bound path; pre-scaling q touches only (T, D) elements and fuses
    # into the transpose/cast.  The backward is exact automatically: the
    # kernels see scale=1 and autodiff through this multiply restores the
    # scale factor on dq.
    qb = to_bh(q * scale if scale != 1.0 else q, pad_q)
    kb = to_bh(k, pad_k)
    vb = to_bh(v, pad_k)
    kernel_scale = 1.0
    lens = (
        None if kv_lens is None
        else jnp.repeat(kv_lens.astype(jnp.int32), h).reshape(1, b * h)
    )

    if bias is not None:
        bias = jnp.asarray(bias, jnp.float32)
        bias = jnp.pad(
            bias,
            ((0, 0), (0, pad_q if bias.shape[1] != 1 else 0), (0, pad_k)),
        )
        out = _flash_core_bias(
            qb, kb, vb, lens, bias, causal, kernel_scale, blk_q, blk_k, h,
            window, static_len,
        )
    else:
        out = _flash_core(
            qb, kb, vb, lens, causal, kernel_scale, blk_q, blk_k, window,
            static_len,
        )
    out = out.reshape(b, h, tq + pad_q, d)[:, :, :tq]
    return jnp.transpose(out, (0, 2, 1, 3))


def flash_attention_reference(q, k, v, *, kv_lens=None, causal=True,
                              scale=None, window=None):
    """(B, T, H, D) XLA oracle with identical masking semantics."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    if kv_lens is None:
        kv_lens = jnp.full((b,), tk, jnp.int32)
    qb = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, tq, d)
    kb = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, tk, d)
    vb = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, tk, d)
    lens = jnp.repeat(kv_lens.astype(jnp.int32), h)
    out = _reference_attention(qb, kb, vb, lens, causal, scale, window)
    return jnp.transpose(out.reshape(b, h, tq, d), (0, 2, 1, 3))
