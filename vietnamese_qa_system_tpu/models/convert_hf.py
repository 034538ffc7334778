"""HF checkpoint import (GPT-NeoX / pythia family).

Capability of the reference's model loading (`AutoModelForCausalLM` +
`poor_man_llm_load`, reference src/models/trainer.py:536-551 and
src/models/model_utils/load_model.py:7-44 — the latter re-shards a big
checkpoint through disk to fit low host RAM).  Here:

- :func:`convert_gpt_neox` maps a GPT-NeoX state dict onto this
  framework's functional pytree **faithfully** (the causal LM supports
  parallel residual + partial rotary + untied head, so pythia weights
  reproduce HF logits — tested against transformers in
  tests/test_convert_hf.py).
- Conversion is streaming: tensors convert one at a time and the torch
  copy is dropped immediately (the low-RAM capability; no tmpdir
  re-sharding needed since we never hold two full copies).
- :func:`load_gpt_neox` loads from a LOCAL transformers model directory
  (this environment has no network egress).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from .config import ModelConfig


def _t(x) -> np.ndarray:
    """torch tensor -> float32 numpy (detach/cpu safe)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


def neox_config(hf_cfg) -> ModelConfig:
    """transformers GPTNeoXConfig -> ModelConfig."""
    return ModelConfig(
        arch="causal",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.hidden_size,
        n_heads=hf_cfg.num_attention_heads,
        n_layers=hf_cfg.num_hidden_layers,
        d_ff=hf_cfg.intermediate_size,
        max_seq_len=hf_cfg.max_position_embeddings,
        rope_theta=float(getattr(hf_cfg, "rotary_emb_base", 10000.0)),
        rope_pct=float(getattr(hf_cfg, "rotary_pct", 1.0)),
        parallel_residual=bool(getattr(hf_cfg, "use_parallel_residual", True)),
        tie_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", False)),
        norm_eps=float(getattr(hf_cfg, "layer_norm_eps", 1e-5)),
    )


def convert_gpt_neox(state_dict: Mapping, cfg: ModelConfig) -> dict:
    """GPT-NeoX state dict -> this framework's causal-LM pytree.

    The fused query_key_value weight is stored head-interleaved
    ((H, 3, Dh) rows); it is unpacked into separate q/k/v projections in
    the head-major layout our ``_split_heads`` expects.  HF Linear weights
    are (out, in) and ours are (in, out), hence the transposes.
    """
    h, dh = cfg.n_heads, cfg.head_dim
    d = cfg.d_model

    def pick(name):
        if name not in state_dict:
            raise KeyError(f"missing weight {name!r} in state dict")
        return _t(state_dict[name])

    def qkv_split(w_qkv, b_qkv):
        # rows: [head0: q(dh), k(dh), v(dh)] [head1: ...] ...
        w = w_qkv.reshape(h, 3, dh, d)
        b = b_qkv.reshape(h, 3, dh)
        out = {}
        for j, name in enumerate(("wq", "wk", "wv")):
            wj = w[:, j].reshape(h * dh, d)  # (D, D) rows head-major
            bj = b[:, j].reshape(h * dh)
            out[name] = {"w": wj.T.copy(), "b": bj.copy()}
        return out

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"gpt_neox.layers.{i}."
        attn = qkv_split(
            pick(pre + "attention.query_key_value.weight"),
            pick(pre + "attention.query_key_value.bias"),
        )
        attn["wo"] = {
            "w": pick(pre + "attention.dense.weight").T.copy(),
            "b": pick(pre + "attention.dense.bias"),
        }
        blocks.append(
            {
                "ln1": {
                    "scale": pick(pre + "input_layernorm.weight"),
                    "bias": pick(pre + "input_layernorm.bias"),
                },
                "attn": attn,
                "ln2": {
                    "scale": pick(pre + "post_attention_layernorm.weight"),
                    "bias": pick(pre + "post_attention_layernorm.bias"),
                },
                "mlp": {
                    "wi": {
                        "w": pick(pre + "mlp.dense_h_to_4h.weight").T.copy(),
                        "b": pick(pre + "mlp.dense_h_to_4h.bias"),
                    },
                    "wo": {
                        "w": pick(pre + "mlp.dense_4h_to_h.weight").T.copy(),
                        "b": pick(pre + "mlp.dense_4h_to_h.bias"),
                    },
                },
            }
        )

    params = {
        "tok_embed": pick("gpt_neox.embed_in.weight"),
        "blocks": blocks,
        "ln_f": {
            "scale": pick("gpt_neox.final_layer_norm.weight"),
            "bias": pick("gpt_neox.final_layer_norm.bias"),
        },
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"w": pick("embed_out.weight").T.copy()}
    return params


def load_gpt_neox(model_dir: str):
    """Local transformers GPT-NeoX directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModelForCausalLM  # local only

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = neox_config(hf_cfg)
    params = convert_gpt_neox(model.state_dict(), cfg)
    del model
    return params, cfg
