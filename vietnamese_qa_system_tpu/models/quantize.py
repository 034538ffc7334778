"""Quantized base-model weights for LoRA training (QLoRA-class).

Capability of the reference's BitsAndBytesConfig base quantization —
``load_in_8bit`` / ``load_in_4bit`` with nf4 + double-quant LoRA training
(reference src/models/trainer.py:470-487) and the k-bit training prep
(reference src/models/trainer.py:590-605) — rebuilt TPU-native:

- Dense weights are stored as int8 (blockwise absmax, linear) or packed
  nf4 codes (two 4-bit codes per byte, 16-level normal-float codebook from
  the QLoRA paper) with one fp32 scale per ``block`` input rows.
- ``nf4-dq`` additionally double-quantizes the absmax scales themselves
  (the reference's ``bnb_4bit_use_double_quant=use_nested_quant``,
  trainer.py:474): each block-row of f32 scales becomes int8 codes plus
  one f32 (offset, step) pair, cutting scale overhead from 0.5 to
  ~0.13 bits/param.
- Dequantization happens *at the point of use* inside the jitted step
  (``layers.dense``), so the persistent HBM copy is 2x (int8) / 4x (nf4)
  smaller than bf16 while XLA schedules the transient bf16 weight right
  next to its matmul (and recomputes it in the backward under remat).
- LoRA rides on top lazily: ``merge_lora`` attaches the (a, b) factors to
  the quantized leaf and ``dense`` adds ``(x @ a) @ b`` — the full-rank
  delta matrix is never materialized (the exact QLoRA compute).

Embeddings and the LM head stay in float — mirroring bitsandbytes'
default ``llm_int8_skip_modules=["lm_head"]`` behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 16-level normal-float codebook (QLoRA paper, appendix E): quantiles of a
# standard normal, renormalized to [-1, 1], with an exact zero.  A numpy
# constant on purpose: a module-level jnp.array would eagerly initialize
# the DEFAULT backend at import time (it landed on the real TPU and broke
# the driver's CPU-mesh dryrun whenever the axon terminal was unhealthy —
# MULTICHIP_r01/r02).  Convert with jnp.asarray at the point of use.
NF4_LEVELS = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    np.float32,
)


def _pick_block(d_in: int, block: int) -> int:
    """Largest power-of-two block <= requested that divides d_in (>= 2).

    The requested size is first rounded DOWN to a power of two: halving a
    non-power-of-two request (e.g. 96 -> 48 -> ... -> 3) can walk past
    every divisor and bottom out at 1, i.e. one scale per ELEMENT — nf4
    codes would collapse to sign bits with all resolution in the scales."""
    b = 1 << max(block.bit_length() - 1, 1)
    while b > 2 and d_in % b:
        b //= 2
    if b < 2 or d_in % b:
        raise ValueError(f"no even power-of-two block divides d_in={d_in}")
    return b


def quantize_weight(w, mode: str = "nf4", block: int = 64) -> dict:
    """(d_in, d_out) float weight -> {"w_q", "w_s"} quantized leaf.

    int8: ``w_q`` int8 (d_in, d_out), ``w_s`` f32 (d_in/block, d_out) where
    ``w = w_q * w_s`` per block.  nf4: ``w_q`` uint8 (d_in/2, d_out) with
    two codes per byte along d_in (even row in the low nibble), ``w_s``
    the blockwise absmax.  All shape/blocking metadata is recoverable from
    the array shapes alone — no side-channel needed under jit.

    A 3-D (L, d_in, d_out) stacked leaf (scan-over-layers) quantizes each
    layer independently via vmap; lax.scan then slices 2-D leaves the
    in-step dequant already understands.
    """
    w = jnp.asarray(w)
    if w.ndim == 3:
        # sequential over the stacked layer dim: vmap would materialize
        # every layer's quantization transients at once (OOMs eagerly on
        # billion-param stacked trees); one layer's transients at a time
        # keeps peak memory O(d_in * d_out).  The f32 cast must also
        # happen INSIDE the per-layer call — casting the whole stacked
        # leaf first is a 4N-byte transient (4.8 GB for PhoGPT-4B's MLP
        # leaf; OOMed quantizing a bf16 4B tree on-chip, round 4)
        return jax.lax.map(lambda x: quantize_weight(x, mode, block), w)
    w = w.astype(jnp.float32)
    d_in, d_out = w.shape
    if mode == "int8c":
        # per-output-CHANNEL scales (one block spanning all of d_in,
        # nb == 1): the layout the w8 GEMM kernel needs — the scale
        # folds through the K contraction, so the kernel streams int8
        # from HBM and multiplies once per output (ops/w8_matmul.py).
        # block = d_in exactly (no power-of-two walk: any d_in divides
        # itself).
        # ACCURACY: one scale spanning all of d_in is coarser than
        # blockwise int8, and there is no LLM.int8-style outlier
        # decomposition (bitsandbytes' load_in_8bit splits outlier
        # columns to fp16 precisely because plain per-channel int8 can
        # degrade on real large-model weights with outlier channels).
        # tests/test_quantize_base.py plants outlier channels and bounds
        # the extra error; the trained-checkpoint ppl comparison lives
        # in docs/BENCHMARKS.md "Weight-only int8 serving".  Validate on
        # YOUR checkpoint before serving int8c.
        mode, block = "int8", d_in
    else:
        block = _pick_block(d_in, block)
    nb = d_in // block
    wb = w.reshape(nb, block, d_out)
    absmax = jnp.maximum(jnp.max(jnp.abs(wb), axis=1), 1e-12)  # (nb, d_out)
    if mode == "int8":
        scale = absmax / 127.0
        q = jnp.clip(jnp.round(wb / scale[:, None, :]), -127, 127)
        return {
            "w_q": q.reshape(d_in, d_out).astype(jnp.int8),
            "w_s": scale,
        }
    if mode in ("nf4", "nf4-dq"):
        normed = wb / absmax[:, None, :]  # [-1, 1]
        # nearest sorted level == count of inter-level midpoints below the
        # value — an O(1)-memory equivalent of argmin |x - levels| (which
        # broadcasts a 16x-wider intermediate)
        mids = (NF4_LEVELS[1:] + NF4_LEVELS[:-1]) / 2.0
        codes = jnp.searchsorted(mids, normed).astype(jnp.uint8)
        pairs = codes.reshape(d_in // 2, 2, d_out)
        packed = pairs[:, 0] | (pairs[:, 1] << 4)
        if mode == "nf4":
            return {"w_q": packed, "w_s": absmax}
        # double-quant: the (nb, d_out) f32 absmax plane becomes int8
        # codes with one f32 (offset, step) pair per block-row — the
        # second quantization level of bnb_4bit_use_double_quant
        s_m = absmax.mean(axis=1, keepdims=True)  # (nb, 1)
        c = absmax - s_m
        s_s = jnp.maximum(jnp.abs(c).max(axis=1, keepdims=True), 1e-12) / 127.0
        s_q = jnp.clip(jnp.round(c / s_s), -127, 127).astype(jnp.int8)
        return {"w_q": packed, "s_q": s_q, "s_s": s_s, "s_m": s_m}
    raise ValueError(f"mode must be int8, nf4 or nf4-dq, got {mode!r}")


def dense_shape(leaf: dict) -> tuple[int, int]:
    """(d_in, d_out) of a float or quantized dense leaf (2-D), or
    (L, d_in, d_out) for a stacked leaf."""
    if "w" in leaf:
        return tuple(leaf["w"].shape)
    q = leaf["w_q"]
    if q.dtype == jnp.uint8:  # packed nf4
        return q.shape[:-2] + (2 * q.shape[-2], q.shape[-1])
    return tuple(q.shape)


_QUANT_KEYS = ("w_q", "w_s", "s_q", "s_s", "s_m")


def _leaf_scales(leaf: dict):
    """(nb, d_out) f32 absmax plane of a quantized leaf, reconstructing
    through the second quantization level when double-quantized."""
    if "w_s" in leaf:
        return leaf["w_s"]
    return leaf["s_q"].astype(jnp.float32) * leaf["s_s"] + leaf["s_m"]


def dequantize_weight(leaf: dict, dtype=jnp.bfloat16):
    """Reconstruct the (d_in, d_out) weight from a quantized leaf
    ((L, d_in, d_out) for stacked leaves).

    Stacked leaves dequantize sequentially via lax.map — one layer's
    transients at a time, mirroring quantize_weight's 3-D path: a single
    whole-leaf gather over a billion-param stacked leaf crashed the TPU
    worker (qlora_dequant="once" on llama1b, round 4), while the
    per-layer (d_in, d_out) gather is exactly the shape the fused
    in-scan dequant runs every step."""
    q = leaf["w_q"]
    if q.ndim == 3:
        sub = {k: leaf[k] for k in _QUANT_KEYS if k in leaf}
        return jax.lax.map(lambda l: dequantize_weight(l, dtype), sub)
    s = _leaf_scales(leaf)
    nb, d_out = s.shape
    if q.dtype == jnp.uint8:  # packed nf4
        lo = (q & 0xF).astype(jnp.int32)
        hi = (q >> 4).astype(jnp.int32)
        codes = jnp.stack([lo, hi], axis=1).reshape(2 * q.shape[0], d_out)
        w = jnp.asarray(NF4_LEVELS)[codes]
        d_in = 2 * q.shape[0]
    else:
        w = q.astype(jnp.float32)
        d_in = q.shape[0]
    block = d_in // nb
    w = w.reshape(nb, block, d_out) * s[:, None, :]
    return w.reshape(d_in, d_out).astype(dtype)


def _is_quantizable(node, name: str) -> bool:
    return (
        isinstance(node, dict)
        and "w" in node
        and getattr(node["w"], "ndim", 0) in (2, 3)
        and name != "lm_head"
    )


def quantize_dense_tree(params, mode: str = "nf4", block: int = 64):
    """Quantize every dense weight (2-D, or 3-D scan-stacked) in the
    pytree except embeddings
    (raw arrays, skipped structurally) and the LM head (kept float for
    logit accuracy, like bitsandbytes' llm_int8_skip_modules default).
    Biases and norms stay float."""

    # jit per leaf so XLA fuses the scale/round/pack chain instead of
    # eagerly materializing every intermediate (matters for billion-param
    # stacked leaves where eager transients alone can exhaust HBM)
    quantize_jit = jax.jit(quantize_weight, static_argnums=(1, 2))

    def walk(node, name=""):
        if _is_quantizable(node, name):
            out = {k: v for k, v in node.items() if k != "w"}
            out.update(quantize_jit(node["w"], mode, block))
            return out
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node

    return walk(params)


def dequantize_tree(params, dtype=jnp.float32, *, fold_lora: bool = True):
    """Inverse of quantize_dense_tree (for export / HF conversion, and
    the in-step whole-base dequant of qlora_dequant="once").  LoRA
    factors attached by merge_lora are folded into the dense weight by
    default (export semantics).

    ``fold_lora=False`` keeps the factors ATTACHED (layers.dense applies
    (x @ A) @ B lazily on the plain-``w`` path too) and only the frozen
    base is dequantized.  This is what the in-step "once" dequant must
    use: folding makes the merged weight a function of the adapter, so
    the scan-over-layers backward materializes a full-size stacked
    weight-cotangent tree (~4N f32 bytes — measured +7 GB on PhoGPT-4B,
    OOM) before contracting it to the rank-r factor grads; with the base
    dequantized factor-free it is constant w.r.t. the trainables and its
    cotangent is symbolically zero, while the lazy low-rank application
    gives dA/dB via activation-sized intermediates only.

    Stacked leaves run dequant + (optional fold) + output-cast inside
    one per-layer lax.map body: casting outside the map materialized
    whole leaves in f32 first (a (32, 3072, 12288) MLP leaf is 4.8 GB)."""

    def fold(sub):
        # sub: one layer's quantized leaf (+ optional lora factors)
        w = dequantize_weight(
            {k: v for k, v in sub.items() if k in _QUANT_KEYS}, jnp.float32
        )
        if "lora_a" in sub:  # lora_b already carries alpha/r
            w = w + jnp.dot(
                sub["lora_a"], sub["lora_b"],
                preferred_element_type=jnp.float32,
            )
        return w.astype(dtype)

    def walk(node):
        if isinstance(node, dict) and "w_q" in node:
            fold_keys = _QUANT_KEYS + (
                ("lora_a", "lora_b") if fold_lora else ()
            )
            keys = tuple(k for k in fold_keys if k in node)
            sub = {k: node[k] for k in keys}
            if node["w_q"].ndim == 3:
                w = jax.lax.map(fold, sub)
            else:
                w = fold(sub)
            out = {k: v for k, v in node.items() if k not in keys}
            out["w"] = w
            return out
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def tree_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
