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
