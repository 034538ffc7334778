"""Seq2seq family resolution — one place instead of N inline conditionals.

The generation drivers (models/generate.py), the slot engine
(models/decode_engine.py), the trainer, and eval all dispatch on
``ModelConfig.seq2seq_family``; adding a family means extending
:func:`s2s_module` here and nothing else at the call sites.
"""

from __future__ import annotations

from .config import ModelConfig


def s2s_module(cfg: ModelConfig):
    """The module implementing cfg's encoder-decoder family.  Every family
    exposes the same surface: encode / decode / forward / loss_fn /
    precompute_cross_kv with identical call contracts."""
    if cfg.seq2seq_family == "t5":
        from . import t5

        return t5
    if cfg.seq2seq_family == "bart":
        from . import bart

        return bart
    if cfg.seq2seq_family == "native":
        from . import seq2seq

        return seq2seq
    raise ValueError(f"unknown seq2seq_family {cfg.seq2seq_family!r}")


def s2s_stacked(cfg: ModelConfig, params) -> bool:
    """True when params are in the scan-over-layers stacked form (leading
    layer dim).  Only the t5 family has a stacked form today."""
    if cfg.seq2seq_family == "t5":
        from .t5 import t5_stacked

        return t5_stacked(params)
    return False


def unstack_for_decode(params, cfg: ModelConfig):
    """Scan-over-layers (stacked) pytree -> list-of-blocks, for SERVING.

    Scan-over-layers is a training-compile-time device: one traced layer
    regardless of depth, with per-layer remat.  At decode time it costs
    real bandwidth instead — ``lax.scan`` materializes each iteration's
    sliced layer weights as a fresh buffer, so weight streaming runs at
    ~55% of the HBM rate the same kernel reaches on a plain 2-D leaf
    (408 vs 741 GB/s measured for the w8 int8 GEMM on v5e, and
    +7% vs +33% end-to-end PhoGPT-4B B=1 decode —
    docs/BENCHMARKS.md "Weight-only int8 serving").  Decode also never
    pays scan's compile-depth advantage back: the unrolled decode step
    compiles once per serving process.  The CLI serve/chat loaders call
    this by default (``--keep-stacked`` opts out).

    No-op for list-form params and for families without a stacked form.
    Reference context: the serving scripts load the trained model fresh
    for inference (reference src/models/model_utils/ds_inference.py:45-60)
    — the training-time graph layout never leaks into serving there
    either.
    """
    if cfg.arch == "causal":
        from .causal_lm import blocks_stacked, unstack_blocks

        if blocks_stacked(params):
            return unstack_blocks(params, cfg.n_layers)
        return params
    if cfg.arch == "seq2seq" and s2s_stacked(cfg, params):
        from .t5 import unstack_t5

        return unstack_t5(params, cfg)
    return params
