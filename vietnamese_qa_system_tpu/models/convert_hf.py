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


def to_gpt_neox_state_dict(params, cfg: ModelConfig) -> dict:
    """Inverse of :func:`convert_gpt_neox`: this framework's pytree → an HF
    GPT-NeoX state dict (numpy), so models trained here can be exported and
    served by any transformers stack — the capability of the reference's
    `save_push` export (reference src/models/trainer.py:726-753) without
    the Hub round trip."""
    h, dh, d = cfg.n_heads, cfg.head_dim, cfg.d_model
    out: dict = {"gpt_neox.embed_in.weight": np.asarray(params["tok_embed"], np.float32)}

    for i, blk in enumerate(params["blocks"]):
        pre = f"gpt_neox.layers.{i}."
        # re-fuse q/k/v into the head-interleaved layout
        w = np.zeros((h, 3, dh, d), np.float32)
        b = np.zeros((h, 3, dh), np.float32)
        for j, name in enumerate(("wq", "wk", "wv")):
            wj = np.asarray(blk["attn"][name]["w"], np.float32).T.reshape(h, dh, d)
            bj = np.asarray(blk["attn"][name]["b"], np.float32).reshape(h, dh)
            w[:, j] = wj
            b[:, j] = bj
        out[pre + "attention.query_key_value.weight"] = w.reshape(3 * d, d)
        out[pre + "attention.query_key_value.bias"] = b.reshape(3 * d)
        out[pre + "attention.dense.weight"] = np.asarray(
            blk["attn"]["wo"]["w"], np.float32
        ).T
        out[pre + "attention.dense.bias"] = np.asarray(
            blk["attn"]["wo"]["b"], np.float32
        )
        out[pre + "input_layernorm.weight"] = np.asarray(blk["ln1"]["scale"], np.float32)
        out[pre + "input_layernorm.bias"] = np.asarray(blk["ln1"]["bias"], np.float32)
        out[pre + "post_attention_layernorm.weight"] = np.asarray(
            blk["ln2"]["scale"], np.float32
        )
        out[pre + "post_attention_layernorm.bias"] = np.asarray(
            blk["ln2"]["bias"], np.float32
        )
        out[pre + "mlp.dense_h_to_4h.weight"] = np.asarray(
            blk["mlp"]["wi"]["w"], np.float32
        ).T
        out[pre + "mlp.dense_h_to_4h.bias"] = np.asarray(
            blk["mlp"]["wi"]["b"], np.float32
        )
        out[pre + "mlp.dense_4h_to_h.weight"] = np.asarray(
            blk["mlp"]["wo"]["w"], np.float32
        ).T
        out[pre + "mlp.dense_4h_to_h.bias"] = np.asarray(
            blk["mlp"]["wo"]["b"], np.float32
        )

    out["gpt_neox.final_layer_norm.weight"] = np.asarray(
        params["ln_f"]["scale"], np.float32
    )
    out["gpt_neox.final_layer_norm.bias"] = np.asarray(
        params["ln_f"]["bias"], np.float32
    )
    if "lm_head" in params:
        out["embed_out.weight"] = np.asarray(params["lm_head"]["w"], np.float32).T
    else:
        out["embed_out.weight"] = out["gpt_neox.embed_in.weight"]
    return out


def export_gpt_neox(params, cfg: ModelConfig, out_dir: str) -> str:
    """Write a transformers-loadable GPT-NeoX model directory."""
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    hf_cfg = GPTNeoXConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.d_model,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.d_ff,
        max_position_embeddings=cfg.max_seq_len,
        rotary_pct=cfg.rope_pct,
        rotary_emb_base=int(cfg.rope_theta),
        use_parallel_residual=cfg.parallel_residual,
        tie_word_embeddings=cfg.tie_embeddings,
        layer_norm_eps=cfg.norm_eps,
    )
    model = GPTNeoXForCausalLM(hf_cfg)
    sd = {k: torch.from_numpy(v.copy()) for k, v in to_gpt_neox_state_dict(params, cfg).items()}
    # strict=False tolerates non-weight buffers (rotary tables); any truly
    # unexpected key is a conversion bug
    _, unexpected = model.load_state_dict(sd, strict=False)
    if unexpected:
        raise ValueError(f"unexpected keys in export: {unexpected}")
    model.save_pretrained(out_dir, safe_serialization=False)
    return out_dir


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


# ---------------------------------------------------------------------------
# GPT-Neo (EleutherAI/gpt-neo-125m — the reference's canonical training
# model, reference scripts/train.sh:7) and GPT-2 (special-cased by the
# reference at src/models/trainer.py:529)
# ---------------------------------------------------------------------------


def gpt_neo_config(hf_cfg) -> ModelConfig:
    """transformers GPTNeoConfig -> ModelConfig.

    GPT-Neo specifics: learned absolute positions (wpe), NO attention
    scaling, per-layer global/local attention (window_size sliding window),
    gelu_new MLPs, tied LM head."""
    return ModelConfig(
        arch="causal",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.hidden_size,
        n_heads=hf_cfg.num_heads,
        n_layers=hf_cfg.num_layers,
        d_ff=getattr(hf_cfg, "intermediate_size", None) or 4 * hf_cfg.hidden_size,
        max_seq_len=hf_cfg.max_position_embeddings,
        positional="learned",
        norm_eps=float(getattr(hf_cfg, "layer_norm_epsilon", 1e-5)),
        tie_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", True)),
        attention_scale=1.0,
        attention_layers=tuple(hf_cfg.attention_layers),
        attention_window=int(getattr(hf_cfg, "window_size", 256)),
        activation="gelu_new",
    )


def convert_gpt_neo(state_dict: Mapping, cfg: ModelConfig) -> dict:
    """HF GPT-Neo state dict -> this framework's causal-LM pytree.

    q/k/v projections carry no bias (out_proj does); attention and MLP
    weights are nn.Linear (out, in) -> transposed to (in, out)."""

    def pick(name):
        for key in (name, "transformer." + name):
            if key in state_dict:
                return _t(state_dict[key])
        raise KeyError(f"missing weight {name!r} in state dict")

    def lin(name, *, bias=True):
        p = {"w": pick(name + ".weight").T.copy()}
        if bias:
            p["b"] = pick(name + ".bias")
        return p

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"h.{i}."
        blocks.append(
            {
                "ln1": {
                    "scale": pick(pre + "ln_1.weight"),
                    "bias": pick(pre + "ln_1.bias"),
                },
                "attn": {
                    "wq": lin(pre + "attn.attention.q_proj", bias=False),
                    "wk": lin(pre + "attn.attention.k_proj", bias=False),
                    "wv": lin(pre + "attn.attention.v_proj", bias=False),
                    "wo": lin(pre + "attn.attention.out_proj"),
                },
                "ln2": {
                    "scale": pick(pre + "ln_2.weight"),
                    "bias": pick(pre + "ln_2.bias"),
                },
                "mlp": {
                    "wi": lin(pre + "mlp.c_fc"),
                    "wo": lin(pre + "mlp.c_proj"),
                },
            }
        )
    return {
        "tok_embed": pick("wte.weight"),
        "pos_embed": pick("wpe.weight"),
        "blocks": blocks,
        "ln_f": {
            "scale": pick("ln_f.weight"),
            "bias": pick("ln_f.bias"),
        },
    }


def load_gpt_neo(model_dir: str):
    """Local transformers GPT-Neo directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = gpt_neo_config(hf_cfg)
    params = convert_gpt_neo(model.state_dict(), cfg)
    del model
    return params, cfg


def gpt2_config(hf_cfg) -> ModelConfig:
    """transformers GPT2Config -> ModelConfig (learned positions, scaled
    attention, gelu_new, tied head)."""
    return ModelConfig(
        arch="causal",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.n_embd,
        n_heads=hf_cfg.n_head,
        n_layers=hf_cfg.n_layer,
        d_ff=getattr(hf_cfg, "n_inner", None) or 4 * hf_cfg.n_embd,
        max_seq_len=hf_cfg.n_positions,
        positional="learned",
        norm_eps=float(getattr(hf_cfg, "layer_norm_epsilon", 1e-5)),
        tie_embeddings=True,
        activation="gelu_new",
    )


def convert_gpt2(state_dict: Mapping, cfg: ModelConfig) -> dict:
    """HF GPT-2 state dict -> this framework's causal-LM pytree.

    GPT-2 blocks use Conv1D weights stored (in, out) — no transpose — and
    a fused c_attn whose output columns are [q | k | v]."""
    d = cfg.d_model

    def pick(name):
        for key in (name, "transformer." + name):
            if key in state_dict:
                return _t(state_dict[key])
        raise KeyError(f"missing weight {name!r} in state dict")

    def conv1d(name):
        return {"w": pick(name + ".weight").copy(), "b": pick(name + ".bias")}

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"h.{i}."
        w_qkv = pick(pre + "attn.c_attn.weight")  # (D, 3D)
        b_qkv = pick(pre + "attn.c_attn.bias")  # (3D,)
        attn = {
            name: {"w": w_qkv[:, j * d : (j + 1) * d].copy(),
                   "b": b_qkv[j * d : (j + 1) * d].copy()}
            for j, name in enumerate(("wq", "wk", "wv"))
        }
        attn["wo"] = conv1d(pre + "attn.c_proj")
        blocks.append(
            {
                "ln1": {
                    "scale": pick(pre + "ln_1.weight"),
                    "bias": pick(pre + "ln_1.bias"),
                },
                "attn": attn,
                "ln2": {
                    "scale": pick(pre + "ln_2.weight"),
                    "bias": pick(pre + "ln_2.bias"),
                },
                "mlp": {
                    "wi": conv1d(pre + "mlp.c_fc"),
                    "wo": conv1d(pre + "mlp.c_proj"),
                },
            }
        )
    return {
        "tok_embed": pick("wte.weight"),
        "pos_embed": pick("wpe.weight"),
        "blocks": blocks,
        "ln_f": {
            "scale": pick("ln_f.weight"),
            "bias": pick("ln_f.bias"),
        },
    }


def load_gpt2(model_dir: str):
    """Local transformers GPT-2 directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = gpt2_config(hf_cfg)
    params = convert_gpt2(model.state_dict(), cfg)
    del model
    return params, cfg


def llama_config(hf_cfg) -> ModelConfig:
    """transformers LlamaConfig (also covers Mistral-style configs) ->
    ModelConfig: RMSNorm, SwiGLU, GQA, full-dim RoPE, bias-free
    projections.  Mistral's ``sliding_window`` (all layers local) maps to
    an all-"local" ``attention_layers`` tuple + ``attention_window``, which
    runs on the fused flash kernel's O(T*window) sliding-window mode."""
    n_heads = hf_cfg.num_attention_heads
    n_kv = int(getattr(hf_cfg, "num_key_value_heads", n_heads))
    window = getattr(hf_cfg, "sliding_window", None)
    # Keyed on the CONFIG SHAPE, not model_type: any config with a bare
    # ``sliding_window`` and no Qwen2-style ``use_sliding_window`` gate
    # uses Mistral semantics (all layers local) — covers "ministral"-type
    # forks that would otherwise silently import as all-global attention
    # and produce wrong logits.  Qwen2 configs carry ``use_sliding_window``
    # and get their per-layer mapping in :func:`qwen2_config`.
    local = window is not None and not hasattr(hf_cfg, "use_sliding_window")
    return ModelConfig(
        arch="causal",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.hidden_size,
        n_heads=n_heads,
        n_layers=hf_cfg.num_hidden_layers,
        d_ff=hf_cfg.intermediate_size,
        max_seq_len=hf_cfg.max_position_embeddings,
        rope_theta=float(getattr(hf_cfg, "rope_theta", 10000.0)),
        norm="rmsnorm",
        norm_eps=float(getattr(hf_cfg, "rms_norm_eps", 1e-6)),
        tie_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", False)),
        n_kv_heads=None if n_kv == n_heads else n_kv,
        mlp_gated=True,
        attention_bias=bool(getattr(hf_cfg, "attention_bias", False)),
        attention_layers=("local",) * hf_cfg.num_hidden_layers
        if local else None,
        attention_window=int(window) if local else 256,
    )


def qwen2_config(hf_cfg) -> ModelConfig:
    """transformers Qwen2Config -> ModelConfig: the llama layout with
    q/k/v-only projection biases and (typically) rope_theta=1e6 + tied
    embeddings.  Qwen2/2.5 is the strongest multilingual open-weights
    family for Vietnamese; the reference would load it through its
    AutoModelForCausalLM path (reference src/models/trainer.py:536-551)."""
    base = llama_config(hf_cfg)
    import dataclasses

    extra = {}
    if bool(getattr(hf_cfg, "use_sliding_window", False)) and getattr(
        hf_cfg, "sliding_window", None
    ):
        # HF Qwen2 applies SWA only to layers >= max_window_layers
        # (modeling_qwen2: `use_sliding_window and layer_idx >=
        # config.max_window_layers`); lower layers attend globally
        mwl = int(
            getattr(hf_cfg, "max_window_layers", hf_cfg.num_hidden_layers)
        )
        extra["attention_layers"] = tuple(
            "global" if i < mwl else "local"
            for i in range(hf_cfg.num_hidden_layers)
        )
        extra["attention_window"] = int(hf_cfg.sliding_window)
    return dataclasses.replace(base, attention_bias="qkv", **extra)


def load_qwen2(model_dir: str):
    """Local transformers Qwen2 directory -> (params, ModelConfig).
    The state-dict layout matches llama (plus q/k/v biases, which
    :func:`convert_llama` already imports when present)."""
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = qwen2_config(hf_cfg)
    params = convert_llama(model.state_dict(), cfg)
    del model
    return params, cfg


def convert_llama(state_dict: Mapping, cfg: ModelConfig) -> dict:
    """HF Llama state dict -> this framework's causal-LM pytree.

    HF llama RoPE uses the same half-split rotate convention as
    ``apply_rope`` (models/layers.py), so q/k import untouched."""

    def pick(name):
        for key in (name, "model." + name):
            if key in state_dict:
                return _t(state_dict[key])
        raise KeyError(f"missing weight {name!r} in state dict")

    def lin(name):
        p = {"w": pick(name + ".weight").T.copy()}
        bias_key = name + ".bias"
        if bias_key in state_dict or "model." + bias_key in state_dict:
            p["b"] = pick(bias_key)
        return p

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"layers.{i}."
        blocks.append(
            {
                "ln1": {"scale": pick(pre + "input_layernorm.weight")},
                "attn": {
                    "wq": lin(pre + "self_attn.q_proj"),
                    "wk": lin(pre + "self_attn.k_proj"),
                    "wv": lin(pre + "self_attn.v_proj"),
                    "wo": lin(pre + "self_attn.o_proj"),
                },
                "ln2": {"scale": pick(pre + "post_attention_layernorm.weight")},
                "mlp": {
                    "wg": lin(pre + "mlp.gate_proj"),
                    "wi": lin(pre + "mlp.up_proj"),
                    "wo": lin(pre + "mlp.down_proj"),
                },
            }
        )
    params = {
        "tok_embed": pick("embed_tokens.weight"),
        "blocks": blocks,
        "ln_f": {"scale": pick("norm.weight")},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"w": pick("lm_head.weight").T.copy()}
    return params


def gemma_config(hf_cfg) -> ModelConfig:
    """transformers GemmaConfig -> ModelConfig (Gemma-1 — Google's
    multilingual open-weights family): the llama layout plus a GeGLU gate
    (hidden_act="gelu_pytorch_tanh" — every Gemma release uses the tanh
    gate), sqrt(d_model) embedding scaling, an explicit head_dim decoupled
    from d_model (2b: 8 heads x 256 > 2048), and (1+weight) RMSNorms —
    folded into the imported scales by :func:`convert_gemma`, so the
    runtime norm stays the standard RMSNorm."""
    import dataclasses

    base = llama_config(hf_cfg)
    head_dim = int(
        getattr(hf_cfg, "head_dim", None)
        or hf_cfg.hidden_size // hf_cfg.num_attention_heads
    )
    return dataclasses.replace(
        base,
        activation="gelu_new",
        scale_embedding=True,
        tie_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", True)),
        d_kv=(
            head_dim
            if head_dim * hf_cfg.num_attention_heads != hf_cfg.hidden_size
            else None
        ),
    )


def convert_gemma(state_dict: Mapping, cfg: ModelConfig) -> dict:
    """HF Gemma state dict -> pytree: the llama layout with every RMSNorm
    weight stored as (1 + w) — GemmaRMSNorm computes x_hat * (1 + weight)
    (modeling_gemma.py GemmaRMSNorm.forward), which folds exactly into the
    standard RMSNorm scale since both normalize in f32."""
    params = convert_llama(state_dict, cfg)
    for blk in params["blocks"]:
        for name in ("ln1", "ln2"):
            blk[name]["scale"] = blk[name]["scale"] + 1.0
    params["ln_f"]["scale"] = params["ln_f"]["scale"] + 1.0
    return params


def load_gemma(model_dir: str):
    """Local transformers Gemma directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = gemma_config(hf_cfg)
    params = convert_gemma(model.state_dict(), cfg)
    del model
    return params, cfg


def load_llama(model_dir: str):
    """Local transformers Llama directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = llama_config(hf_cfg)
    params = convert_llama(model.state_dict(), cfg)
    del model
    return params, cfg


def to_gpt_neo_state_dict(params, cfg: ModelConfig) -> dict:
    """Inverse of :func:`convert_gpt_neo` (numpy HF state dict)."""
    out: dict = {
        "transformer.wte.weight": np.asarray(params["tok_embed"], np.float32),
        "transformer.wpe.weight": np.asarray(params["pos_embed"], np.float32),
    }
    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer.h.{i}."
        out[pre + "ln_1.weight"] = np.asarray(blk["ln1"]["scale"], np.float32)
        out[pre + "ln_1.bias"] = np.asarray(blk["ln1"]["bias"], np.float32)
        for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj")):
            out[pre + f"attn.attention.{theirs}.weight"] = np.asarray(
                blk["attn"][ours]["w"], np.float32
            ).T
        out[pre + "attn.attention.out_proj.weight"] = np.asarray(
            blk["attn"]["wo"]["w"], np.float32
        ).T
        out[pre + "attn.attention.out_proj.bias"] = np.asarray(
            blk["attn"]["wo"]["b"], np.float32
        )
        out[pre + "ln_2.weight"] = np.asarray(blk["ln2"]["scale"], np.float32)
        out[pre + "ln_2.bias"] = np.asarray(blk["ln2"]["bias"], np.float32)
        out[pre + "mlp.c_fc.weight"] = np.asarray(blk["mlp"]["wi"]["w"], np.float32).T
        out[pre + "mlp.c_fc.bias"] = np.asarray(blk["mlp"]["wi"]["b"], np.float32)
        out[pre + "mlp.c_proj.weight"] = np.asarray(blk["mlp"]["wo"]["w"], np.float32).T
        out[pre + "mlp.c_proj.bias"] = np.asarray(blk["mlp"]["wo"]["b"], np.float32)
    out["transformer.ln_f.weight"] = np.asarray(params["ln_f"]["scale"], np.float32)
    out["transformer.ln_f.bias"] = np.asarray(params["ln_f"]["bias"], np.float32)
    out["lm_head.weight"] = out["transformer.wte.weight"]
    return out


def export_gpt_neo(params, cfg: ModelConfig, out_dir: str) -> str:
    """Write a transformers-loadable GPT-Neo model directory."""
    import torch
    from transformers import GPTNeoConfig, GPTNeoForCausalLM

    kinds = cfg.attention_layers or ("global",) * cfg.n_layers
    hf_cfg = GPTNeoConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.d_model,
        num_layers=cfg.n_layers,
        attention_types=[[[k], 1] for k in kinds],
        num_heads=cfg.n_heads,
        intermediate_size=cfg.d_ff,
        max_position_embeddings=cfg.max_seq_len,
        window_size=cfg.attention_window,
        activation_function="gelu_new",
        layer_norm_epsilon=cfg.norm_eps,
        tie_word_embeddings=True,
    )
    model = GPTNeoForCausalLM(hf_cfg)
    sd = {
        k: torch.from_numpy(v.copy())
        for k, v in to_gpt_neo_state_dict(params, cfg).items()
    }
    _, unexpected = model.load_state_dict(sd, strict=False)
    if unexpected:
        raise ValueError(f"unexpected keys in export: {unexpected}")
    model.save_pretrained(out_dir, safe_serialization=False)
    return out_dir


def to_llama_state_dict(params, cfg: ModelConfig) -> dict:
    """Inverse of :func:`convert_llama` (numpy HF state dict)."""
    out: dict = {
        "model.embed_tokens.weight": np.asarray(params["tok_embed"], np.float32)
    }
    for i, blk in enumerate(params["blocks"]):
        pre = f"model.layers.{i}."
        out[pre + "input_layernorm.weight"] = np.asarray(
            blk["ln1"]["scale"], np.float32
        )
        for ours, theirs in (
            ("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj"), ("wo", "o_proj")
        ):
            out[pre + f"self_attn.{theirs}.weight"] = np.asarray(
                blk["attn"][ours]["w"], np.float32
            ).T
            if "b" in blk["attn"][ours]:  # Qwen2: q/k/v carry biases
                out[pre + f"self_attn.{theirs}.bias"] = np.asarray(
                    blk["attn"][ours]["b"], np.float32
                )
        out[pre + "post_attention_layernorm.weight"] = np.asarray(
            blk["ln2"]["scale"], np.float32
        )
        for ours, theirs in (("wg", "gate_proj"), ("wi", "up_proj"), ("wo", "down_proj")):
            out[pre + f"mlp.{theirs}.weight"] = np.asarray(
                blk["mlp"][ours]["w"], np.float32
            ).T
    out["model.norm.weight"] = np.asarray(params["ln_f"]["scale"], np.float32)
    if "lm_head" in params:
        out["lm_head.weight"] = np.asarray(params["lm_head"]["w"], np.float32).T
    else:
        out["lm_head.weight"] = out["model.embed_tokens.weight"]
    return out


def _export_llama_layout(params, cfg: ModelConfig, out_dir: str,
                         hf_cfg, model_cls) -> str:
    """Shared exporter for the llama state-dict layout (Llama and Qwen2
    differ only in the HF config/model classes and the q/k/v biases the
    state dict carries)."""
    import torch

    model = model_cls(hf_cfg)
    sd = {
        k: torch.from_numpy(v.copy())
        for k, v in to_llama_state_dict(params, cfg).items()
    }
    _, unexpected = model.load_state_dict(sd, strict=False)
    if unexpected:
        raise ValueError(f"unexpected keys in export: {unexpected}")
    model.save_pretrained(out_dir, safe_serialization=False)
    return out_dir


def export_llama(params, cfg: ModelConfig, out_dir: str) -> str:
    """Write a transformers-loadable Llama model directory."""
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.d_model,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.kv_heads,
        intermediate_size=cfg.d_ff,
        max_position_embeddings=cfg.max_seq_len,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.norm_eps,
        tie_word_embeddings=cfg.tie_embeddings,
        attention_bias=False,
    )
    return _export_llama_layout(params, cfg, out_dir, hf_cfg,
                                LlamaForCausalLM)


def export_qwen2(params, cfg: ModelConfig, out_dir: str) -> str:
    """Write a transformers-loadable Qwen2 model directory (llama state
    dict plus the q/k/v biases :func:`to_llama_state_dict` emits)."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.d_model,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.kv_heads,
        intermediate_size=cfg.d_ff,
        max_position_embeddings=cfg.max_seq_len,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.norm_eps,
        tie_word_embeddings=cfg.tie_embeddings,
        use_sliding_window=False,
    )
    return _export_llama_layout(params, cfg, out_dir, hf_cfg,
                                Qwen2ForCausalLM)


def export_gemma(params, cfg: ModelConfig, out_dir: str) -> str:
    """Write a transformers-loadable Gemma model directory: the llama
    state-dict layout with the (1 + w) norm fold of :func:`convert_gemma`
    inverted (scale - 1) before writing."""
    from transformers import GemmaConfig, GemmaForCausalLM

    params = dict(params)
    params["blocks"] = [dict(b) for b in params["blocks"]]
    for blk in params["blocks"]:
        for name in ("ln1", "ln2"):
            blk[name] = {"scale": np.asarray(blk[name]["scale"]) - 1.0}
    params["ln_f"] = {"scale": np.asarray(params["ln_f"]["scale"]) - 1.0}

    hf_cfg = GemmaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.d_model,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.kv_heads,
        head_dim=cfg.head_dim,
        intermediate_size=cfg.d_ff,
        max_position_embeddings=cfg.max_seq_len,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.norm_eps,
        tie_word_embeddings=cfg.tie_embeddings,
        hidden_act="gelu_pytorch_tanh",
        attention_bias=False,
    )
    return _export_llama_layout(params, cfg, out_dir, hf_cfg,
                                GemmaForCausalLM)


def to_gpt2_state_dict(params, cfg: ModelConfig) -> dict:
    """Inverse of :func:`convert_gpt2` (numpy HF state dict; Conv1D keeps
    (in, out) orientation and c_attn re-fuses [q | k | v] columns)."""
    out: dict = {
        "transformer.wte.weight": np.asarray(params["tok_embed"], np.float32),
        "transformer.wpe.weight": np.asarray(params["pos_embed"], np.float32),
    }
    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer.h.{i}."
        out[pre + "ln_1.weight"] = np.asarray(blk["ln1"]["scale"], np.float32)
        out[pre + "ln_1.bias"] = np.asarray(blk["ln1"]["bias"], np.float32)
        out[pre + "attn.c_attn.weight"] = np.concatenate(
            [np.asarray(blk["attn"][n]["w"], np.float32) for n in ("wq", "wk", "wv")],
            axis=1,
        )
        out[pre + "attn.c_attn.bias"] = np.concatenate(
            [np.asarray(blk["attn"][n]["b"], np.float32) for n in ("wq", "wk", "wv")]
        )
        out[pre + "attn.c_proj.weight"] = np.asarray(blk["attn"]["wo"]["w"], np.float32)
        out[pre + "attn.c_proj.bias"] = np.asarray(blk["attn"]["wo"]["b"], np.float32)
        out[pre + "ln_2.weight"] = np.asarray(blk["ln2"]["scale"], np.float32)
        out[pre + "ln_2.bias"] = np.asarray(blk["ln2"]["bias"], np.float32)
        out[pre + "mlp.c_fc.weight"] = np.asarray(blk["mlp"]["wi"]["w"], np.float32)
        out[pre + "mlp.c_fc.bias"] = np.asarray(blk["mlp"]["wi"]["b"], np.float32)
        out[pre + "mlp.c_proj.weight"] = np.asarray(blk["mlp"]["wo"]["w"], np.float32)
        out[pre + "mlp.c_proj.bias"] = np.asarray(blk["mlp"]["wo"]["b"], np.float32)
    out["transformer.ln_f.weight"] = np.asarray(params["ln_f"]["scale"], np.float32)
    out["transformer.ln_f.bias"] = np.asarray(params["ln_f"]["bias"], np.float32)
    out["lm_head.weight"] = out["transformer.wte.weight"]
    return out


def export_gpt2(params, cfg: ModelConfig, out_dir: str) -> str:
    """Write a transformers-loadable GPT-2 model directory."""
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        vocab_size=cfg.vocab_size,
        n_embd=cfg.d_model,
        n_layer=cfg.n_layers,
        n_head=cfg.n_heads,
        n_inner=cfg.d_ff,
        n_positions=cfg.max_seq_len,
        layer_norm_epsilon=cfg.norm_eps,
        tie_word_embeddings=True,
    )
    model = GPT2LMHeadModel(hf_cfg)
    sd = {
        k: torch.from_numpy(v.copy())
        for k, v in to_gpt2_state_dict(params, cfg).items()
    }
    _, unexpected = model.load_state_dict(sd, strict=False)
    if unexpected:
        raise ValueError(f"unexpected keys in export: {unexpected}")
    model.save_pretrained(out_dir, safe_serialization=False)
    return out_dir


def bloom_config(hf_cfg) -> ModelConfig:
    """transformers BloomConfig -> ModelConfig (the bloomz/vietcuna family —
    the dominant Vietnamese open-weights base, loadable through the
    reference's AutoModelForCausalLM path at src/models/trainer.py:536-551)."""
    if getattr(hf_cfg, "apply_residual_connection_post_layernorm", False):
        raise ValueError(
            "apply_residual_connection_post_layernorm BLOOM variants are "
            "not supported (no released checkpoint uses it)"
        )
    return ModelConfig(
        arch="causal",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.hidden_size,
        n_heads=hf_cfg.n_head,
        n_layers=hf_cfg.n_layer,
        d_ff=4 * hf_cfg.hidden_size,
        max_seq_len=int(getattr(hf_cfg, "seq_length", 2048)),
        positional="alibi",
        embed_layernorm=True,
        tie_embeddings=True,
        norm_eps=float(getattr(hf_cfg, "layer_norm_epsilon", 1e-5)),
        activation="gelu_new",  # BloomGelu is the tanh approximation
    )


def convert_bloom(state_dict: Mapping, cfg: ModelConfig) -> dict:
    """BLOOM state dict -> this framework's causal-LM pytree.

    The fused query_key_value rows are head-interleaved ``(H, 3, Dh)`` —
    the same packing as GPT-NeoX (HF ``BloomAttention._split_heads`` views
    the fused output as (..., H, 3, Dh)), unpacked into head-major q/k/v.
    """
    h, dh, d = cfg.n_heads, cfg.head_dim, cfg.d_model

    def pick(name):
        if name not in state_dict:
            raise KeyError(f"missing weight {name!r} in state dict")
        return _t(state_dict[name])

    def ln(name):
        return {
            "scale": pick(name + ".weight"),
            "bias": pick(name + ".bias"),
        }

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"transformer.h.{i}."
        w = pick(pre + "self_attention.query_key_value.weight").reshape(
            h, 3, dh, d
        )
        b = pick(pre + "self_attention.query_key_value.bias").reshape(h, 3, dh)
        attn = {
            name: {
                "w": w[:, j].reshape(h * dh, d).T.copy(),
                "b": b[:, j].reshape(h * dh).copy(),
            }
            for j, name in enumerate(("wq", "wk", "wv"))
        }
        attn["wo"] = {
            "w": pick(pre + "self_attention.dense.weight").T.copy(),
            "b": pick(pre + "self_attention.dense.bias"),
        }
        blocks.append(
            {
                "ln1": ln(pre + "input_layernorm"),
                "attn": attn,
                "ln2": ln(pre + "post_attention_layernorm"),
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

    return {
        "tok_embed": pick("transformer.word_embeddings.weight"),
        "emb_ln": ln("transformer.word_embeddings_layernorm"),
        "blocks": blocks,
        "ln_f": ln("transformer.ln_f"),
    }


def load_bloom(model_dir: str):
    """Local transformers BLOOM directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = bloom_config(hf_cfg)
    params = convert_bloom(model.state_dict(), cfg)
    del model
    return params, cfg


def to_bloom_state_dict(params, cfg: ModelConfig) -> dict:
    """Inverse of :func:`convert_bloom` (numpy HF state dict)."""
    h, dh, d = cfg.n_heads, cfg.head_dim, cfg.d_model
    out: dict = {
        "transformer.word_embeddings.weight": np.asarray(
            params["tok_embed"], np.float32
        ),
        "transformer.word_embeddings_layernorm.weight": np.asarray(
            params["emb_ln"]["scale"], np.float32
        ),
        "transformer.word_embeddings_layernorm.bias": np.asarray(
            params["emb_ln"]["bias"], np.float32
        ),
    }
    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer.h.{i}."
        w = np.zeros((h, 3, dh, d), np.float32)
        b = np.zeros((h, 3, dh), np.float32)
        for j, name in enumerate(("wq", "wk", "wv")):
            w[:, j] = np.asarray(blk["attn"][name]["w"], np.float32).T.reshape(
                h, dh, d
            )
            b[:, j] = np.asarray(blk["attn"][name]["b"], np.float32).reshape(h, dh)
        out[pre + "self_attention.query_key_value.weight"] = w.reshape(3 * d, d)
        out[pre + "self_attention.query_key_value.bias"] = b.reshape(3 * d)
        out[pre + "self_attention.dense.weight"] = np.asarray(
            blk["attn"]["wo"]["w"], np.float32
        ).T
        out[pre + "self_attention.dense.bias"] = np.asarray(
            blk["attn"]["wo"]["b"], np.float32
        )
        for ours, theirs in (
            ("ln1", "input_layernorm"), ("ln2", "post_attention_layernorm")
        ):
            out[pre + theirs + ".weight"] = np.asarray(
                blk[ours]["scale"], np.float32
            )
            out[pre + theirs + ".bias"] = np.asarray(blk[ours]["bias"], np.float32)
        for ours, theirs in (("wi", "dense_h_to_4h"), ("wo", "dense_4h_to_h")):
            out[pre + f"mlp.{theirs}.weight"] = np.asarray(
                blk["mlp"][ours]["w"], np.float32
            ).T
            out[pre + f"mlp.{theirs}.bias"] = np.asarray(
                blk["mlp"][ours]["b"], np.float32
            )
    out["transformer.ln_f.weight"] = np.asarray(params["ln_f"]["scale"], np.float32)
    out["transformer.ln_f.bias"] = np.asarray(params["ln_f"]["bias"], np.float32)
    out["lm_head.weight"] = out["transformer.word_embeddings.weight"]
    return out


def export_bloom(params, cfg: ModelConfig, out_dir: str) -> str:
    """Write a transformers-loadable BLOOM model directory."""
    import torch
    from transformers import BloomConfig, BloomForCausalLM

    hf_cfg = BloomConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.d_model,
        n_layer=cfg.n_layers,
        n_head=cfg.n_heads,
        layer_norm_epsilon=cfg.norm_eps,
        tie_word_embeddings=True,
    )
    model = BloomForCausalLM(hf_cfg)
    sd = {
        k: torch.from_numpy(v.copy())
        for k, v in to_bloom_state_dict(params, cfg).items()
    }
    _, unexpected = model.load_state_dict(sd, strict=False)
    if unexpected:
        raise ValueError(f"unexpected keys in export: {unexpected}")
    model.save_pretrained(out_dir, safe_serialization=False)
    return out_dir


def mpt_config(hf_cfg) -> ModelConfig:
    """transformers MptConfig -> ModelConfig (the MosaicML MPT family —
    notably vinai/PhoGPT-4B, the strongest Vietnamese-first open LLM,
    which is ``model_type: mpt``; loadable through the reference's
    AutoModelForCausalLM path at src/models/trainer.py:536-551).

    MPT is pre-LN with bias-free LayerNorms, a fused bias-free Wqkv,
    MPT-variant ALiBi slopes (next-higher power of two + interleave —
    PhoGPT's 24 heads hit the non-power-of-two branch), optional
    ``clip_qkv`` clamping, and an exact-GELU 4x MLP."""
    attn = hf_cfg.attn_config
    if not getattr(attn, "alibi", True):
        raise ValueError(
            "non-ALiBi MPT configs are not supported (transformers' native "
            "MptModel is ALiBi-only as well)"
        )
    if getattr(attn, "qk_ln", False):
        raise ValueError(
            "qk_ln MPT variants require trust_remote_code in transformers "
            "too (native MptAttention has no q/k LayerNorm) — unsupported"
        )
    scale = getattr(attn, "softmax_scale", None)
    return ModelConfig(
        arch="causal",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.d_model,
        n_heads=hf_cfg.n_heads,
        n_layers=hf_cfg.n_layers,
        d_ff=int(hf_cfg.expansion_ratio * hf_cfg.d_model),
        max_seq_len=int(hf_cfg.max_seq_len),
        positional="alibi",
        alibi_mode="mpt",
        alibi_bias_max=float(getattr(attn, "alibi_bias_max", 8)),
        clip_qkv=(
            float(attn.clip_qkv)
            if getattr(attn, "clip_qkv", None) else None
        ),
        attention_scale=float(scale) if scale is not None else None,
        tie_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", True)),
        attention_bias=not bool(getattr(hf_cfg, "no_bias", True)),
        norm_eps=float(getattr(hf_cfg, "layer_norm_epsilon", 1e-5)),
        activation="gelu",  # MptMLP uses nn.GELU(approximate="none")
    )


def convert_mpt(state_dict: Mapping, cfg: ModelConfig) -> dict:
    """MPT state dict -> this framework's causal-LM pytree.

    The fused Wqkv rows are FEATURE-major (q = rows [0, d), k = [d, 2d),
    v = [2d, 3d) — HF ``mixed_qkv.chunk(3, dim=2)``), unlike BLOOM's
    head-interleaved packing.  MPT LayerNorms carry no bias on the Hub
    (``norm_1.bias = None`` in modeling_mpt.py); zeros are imported so the
    pytree stays a mean-subtracting LayerNorm (the param-shape dispatch in
    layers.layernorm reads a missing bias as RMSNorm)."""
    d = cfg.d_model

    def pick(name):
        if name not in state_dict:
            raise KeyError(f"missing weight {name!r} in state dict")
        return _t(state_dict[name])

    def lin(name):
        w = {"w": pick(name + ".weight").T.copy()}
        if name + ".bias" in state_dict:
            w["b"] = pick(name + ".bias")
        return w

    def ln(name):
        p = {"scale": pick(name + ".weight")}
        p["bias"] = (
            pick(name + ".bias") if name + ".bias" in state_dict
            else np.zeros((d,), np.float32)
        )
        return p

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"transformer.blocks.{i}."
        wqkv = pick(pre + "attn.Wqkv.weight")  # (3d, d) rows = out features
        attn = {
            name: {"w": wqkv[j * d:(j + 1) * d].T.copy()}
            for j, name in enumerate(("wq", "wk", "wv"))
        }
        if pre + "attn.Wqkv.bias" in state_dict:
            bqkv = pick(pre + "attn.Wqkv.bias")
            for j, name in enumerate(("wq", "wk", "wv")):
                attn[name]["b"] = bqkv[j * d:(j + 1) * d].copy()
        attn["wo"] = lin(pre + "attn.out_proj")
        blocks.append(
            {
                "ln1": ln(pre + "norm_1"),
                "attn": attn,
                "ln2": ln(pre + "norm_2"),
                "mlp": {
                    "wi": lin(pre + "ffn.up_proj"),
                    "wo": lin(pre + "ffn.down_proj"),
                },
            }
        )

    params = {
        "tok_embed": pick("transformer.wte.weight"),
        "blocks": blocks,
        "ln_f": ln("transformer.norm_f"),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"w": pick("lm_head.weight").T.copy()}
    return params


def load_mpt(model_dir: str):
    """Local transformers MPT directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModelForCausalLM

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = mpt_config(hf_cfg)
    params = convert_mpt(model.state_dict(), cfg)
    del model
    return params, cfg


def to_mpt_state_dict(params, cfg: ModelConfig) -> dict:
    """Inverse of :func:`convert_mpt` (numpy HF state dict).

    MPT LayerNorms on the Hub have no bias, so a bias learned by full
    fine-tuning cannot be represented — raise rather than silently drop
    it (LoRA training keeps the zeros imported by convert_mpt)."""
    d = cfg.d_model
    out: dict = {
        "transformer.wte.weight": np.asarray(params["tok_embed"], np.float32),
    }

    def put_ln(name, p):
        out[name + ".weight"] = np.asarray(p["scale"], np.float32)
        b = np.asarray(p.get("bias", 0.0), np.float32)
        if np.abs(b).max(initial=0.0) > 1e-6:
            raise ValueError(
                f"{name}: nonzero LayerNorm bias cannot be exported to the "
                "MPT format (HF MptModel pins norm biases to None)"
            )

    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer.blocks.{i}."
        put_ln(pre + "norm_1", blk["ln1"])
        put_ln(pre + "norm_2", blk["ln2"])
        wqkv = np.concatenate(
            [
                np.asarray(blk["attn"][n]["w"], np.float32).T
                for n in ("wq", "wk", "wv")
            ],
            axis=0,
        )
        out[pre + "attn.Wqkv.weight"] = wqkv
        if "b" in blk["attn"]["wq"]:
            out[pre + "attn.Wqkv.bias"] = np.concatenate(
                [
                    np.asarray(blk["attn"][n]["b"], np.float32)
                    for n in ("wq", "wk", "wv")
                ]
            )
        for ours, theirs in (
            ("wo", "attn.out_proj"),
        ):
            out[pre + theirs + ".weight"] = np.asarray(
                blk["attn"][ours]["w"], np.float32
            ).T
            if "b" in blk["attn"][ours]:
                out[pre + theirs + ".bias"] = np.asarray(
                    blk["attn"][ours]["b"], np.float32
                )
        for ours, theirs in (("wi", "ffn.up_proj"), ("wo", "ffn.down_proj")):
            out[pre + f"{theirs}.weight"] = np.asarray(
                blk["mlp"][ours]["w"], np.float32
            ).T
            if "b" in blk["mlp"][ours]:
                out[pre + f"{theirs}.bias"] = np.asarray(
                    blk["mlp"][ours]["b"], np.float32
                )
    put_ln("transformer.norm_f", params["ln_f"])
    out["lm_head.weight"] = (
        out["transformer.wte.weight"] if cfg.tie_embeddings
        else np.asarray(params["lm_head"]["w"], np.float32).T
    )
    return out


def export_mpt(params, cfg: ModelConfig, out_dir: str) -> str:
    """Write a transformers-loadable MPT model directory."""
    import torch
    from transformers import MptConfig, MptForCausalLM

    hf_cfg = MptConfig(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        n_heads=cfg.n_heads,
        n_layers=cfg.n_layers,
        expansion_ratio=cfg.d_ff // cfg.d_model,
        max_seq_len=cfg.max_seq_len,
        layer_norm_epsilon=cfg.norm_eps,
        no_bias=not bool(cfg.attention_bias),
        tie_word_embeddings=cfg.tie_embeddings,
        attn_config={
            "alibi": True,
            "alibi_bias_max": cfg.alibi_bias_max,
            "clip_qkv": cfg.clip_qkv,
            "softmax_scale": cfg.attention_scale,
        },
    )
    model = MptForCausalLM(hf_cfg)
    sd = {
        k: torch.from_numpy(v.copy())
        for k, v in to_mpt_state_dict(params, cfg).items()
    }
    _, unexpected = model.load_state_dict(sd, strict=False)
    if unexpected:
        raise ValueError(f"unexpected keys in export: {unexpected}")
    model.save_pretrained(out_dir, safe_serialization=False)
    return out_dir


def export_causal_auto(params, cfg: ModelConfig, out_dir: str) -> str:
    """Export this framework's causal pytree to the matching HF format,
    dispatched on the config's architecture fingerprints (the inverse of
    :func:`load_causal_auto`):

    - RMSNorm / gated MLP            -> Llama (qkv biases -> Qwen2,
                                       scale_embedding -> Gemma)
    - ALiBi positions                -> BLOOM (alibi_mode="mpt" -> MPT)
    - learned positions, unscaled    -> GPT-Neo (attention_scale == 1.0)
    - learned positions, 1/sqrt(d)   -> GPT-2
    - otherwise (RoPE)               -> GPT-NeoX

    Scan-over-layers (stacked) pytrees are unstacked transparently.
    """
    from .causal_lm import blocks_stacked, unstack_blocks

    if blocks_stacked(params):
        params = unstack_blocks(params, cfg.n_layers)
    if cfg.norm == "rmsnorm" or cfg.mlp_gated:
        if cfg.attention_bias == "qkv":
            return export_qwen2(params, cfg, out_dir)
        if cfg.scale_embedding:
            return export_gemma(params, cfg, out_dir)
        return export_llama(params, cfg, out_dir)
    if cfg.positional == "alibi":
        if cfg.alibi_mode == "mpt":
            return export_mpt(params, cfg, out_dir)
        return export_bloom(params, cfg, out_dir)
    if cfg.positional == "learned":
        if cfg.attention_scale == 1.0:
            return export_gpt_neo(params, cfg, out_dir)
        return export_gpt2(params, cfg, out_dir)
    return export_gpt_neox(params, cfg, out_dir)


def load_causal_auto(model_dir: str):
    """Local transformers causal-LM directory -> (params, ModelConfig),
    dispatching on config model_type — the capability of the reference's
    `AutoModelForCausalLM.from_pretrained` over its model zoo
    (gpt-neo-125m in scripts/train.sh, pythia in scripts/train_test.sh,
    the gpt2 special case at trainer.py:529), plus the llama family."""
    from transformers import AutoConfig

    model_type = getattr(AutoConfig.from_pretrained(model_dir), "model_type", "")
    if model_type == "gpt_neo":
        return load_gpt_neo(model_dir)
    if model_type == "gpt2":
        return load_gpt2(model_dir)
    if model_type in ("llama", "mistral"):
        return load_llama(model_dir)
    if model_type == "gemma":
        return load_gemma(model_dir)
    if model_type == "qwen2":
        return load_qwen2(model_dir)
    if model_type == "bloom":
        return load_bloom(model_dir)
    if model_type == "mpt":
        return load_mpt(model_dir)
    return load_gpt_neox(model_dir)


# ---------------------------------------------------------------------------
# BERT-class encoders (sentence-transformers MiniLM family)
# ---------------------------------------------------------------------------


def bert_config(hf_cfg) -> ModelConfig:
    """transformers BertConfig -> ModelConfig (post-LN, BERT embeddings).

    Covers BERT-architecture sentence encoders such as the MiniLM models
    the reference indexes with (heavy_ranker.py:78-88).  MPNet (relative
    position attention) has its own importer: :func:`load_mpnet`."""
    return ModelConfig(
        arch="encoder",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.hidden_size,
        n_heads=hf_cfg.num_attention_heads,
        n_layers=hf_cfg.num_hidden_layers,
        d_ff=hf_cfg.intermediate_size,
        max_seq_len=hf_cfg.max_position_embeddings,
        positional="learned",
        norm_eps=float(getattr(hf_cfg, "layer_norm_eps", 1e-12)),
        norm_position="post",
        bert_embeddings=True,
        use_flash_attention=True,
        activations_bf16=True,
    )


def convert_bert(state_dict: Mapping, cfg: ModelConfig, prefix: str = "") -> dict:
    """HF BERT state dict -> this framework's encoder pytree.

    Accepts raw `bert.`-prefixed keys or stripped ones (sentence-transformers
    exports vary); pass `prefix` when keys carry an extra namespace.
    """

    def pick(name):
        for key in (prefix + name, prefix + "bert." + name):
            if key in state_dict:
                return _t(state_dict[key])
        raise KeyError(f"missing weight {name!r} in state dict")

    def lin(name):
        return {"w": pick(name + ".weight").T.copy(), "b": pick(name + ".bias")}

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"encoder.layer.{i}."
        blocks.append(
            {
                "attn": {
                    "wq": lin(pre + "attention.self.query"),
                    "wk": lin(pre + "attention.self.key"),
                    "wv": lin(pre + "attention.self.value"),
                    "wo": lin(pre + "attention.output.dense"),
                },
                "ln1": {
                    "scale": pick(pre + "attention.output.LayerNorm.weight"),
                    "bias": pick(pre + "attention.output.LayerNorm.bias"),
                },
                "mlp": {
                    "wi": lin(pre + "intermediate.dense"),
                    "wo": lin(pre + "output.dense"),
                },
                "ln2": {
                    "scale": pick(pre + "output.LayerNorm.weight"),
                    "bias": pick(pre + "output.LayerNorm.bias"),
                },
            }
        )
    return {
        "tok_embed": pick("embeddings.word_embeddings.weight"),
        "pos_embed": pick("embeddings.position_embeddings.weight"),
        "type_embed": pick("embeddings.token_type_embeddings.weight"),
        "emb_ln": {
            "scale": pick("embeddings.LayerNorm.weight"),
            "bias": pick("embeddings.LayerNorm.bias"),
        },
        "blocks": blocks,
    }


def load_bert(model_dir: str):
    """Local transformers BERT directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModel

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModel.from_pretrained(model_dir, torch_dtype="float32")
    cfg = bert_config(hf_cfg)
    params = convert_bert(model.state_dict(), cfg)
    del model
    return params, cfg


# ---------------------------------------------------------------------------
# MPNet encoders (paraphrase-mpnet-base-v2 — the reference's second encoder,
# heavy_ranker.py:83-88)
# ---------------------------------------------------------------------------


def mpnet_config(hf_cfg) -> ModelConfig:
    """transformers MPNetConfig -> ModelConfig (post-LN, embedding LN,
    RoBERTa position offset, shared bucketed relative attention bias)."""
    return ModelConfig(
        arch="encoder",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.hidden_size,
        n_heads=hf_cfg.num_attention_heads,
        n_layers=hf_cfg.num_hidden_layers,
        d_ff=hf_cfg.intermediate_size,
        max_seq_len=hf_cfg.max_position_embeddings,
        positional="learned",
        norm_eps=float(getattr(hf_cfg, "layer_norm_eps", 1e-5)),
        norm_position="post",
        embed_layernorm=True,
        position_offset=int(getattr(hf_cfg, "pad_token_id", 1)) + 1,
        relative_attention_buckets=int(
            getattr(hf_cfg, "relative_attention_num_buckets", 32)
        ),
        use_flash_attention=True,
        activations_bf16=True,
    )


def convert_mpnet(state_dict: Mapping, cfg: ModelConfig, prefix: str = "") -> dict:
    """HF MPNet state dict -> this framework's encoder pytree.

    MPNet layer naming: attention.attn.{q,k,v,o} + attention.LayerNorm,
    then intermediate/output dense + output.LayerNorm; one shared
    encoder.relative_attention_bias table."""

    def pick(name):
        for key in (prefix + name, prefix + "mpnet." + name):
            if key in state_dict:
                return _t(state_dict[key])
        raise KeyError(f"missing weight {name!r} in state dict")

    def lin(name):
        return {"w": pick(name + ".weight").T.copy(), "b": pick(name + ".bias")}

    blocks = []
    for i in range(cfg.n_layers):
        pre = f"encoder.layer.{i}."
        blocks.append(
            {
                "attn": {
                    "wq": lin(pre + "attention.attn.q"),
                    "wk": lin(pre + "attention.attn.k"),
                    "wv": lin(pre + "attention.attn.v"),
                    "wo": lin(pre + "attention.attn.o"),
                },
                "ln1": {
                    "scale": pick(pre + "attention.LayerNorm.weight"),
                    "bias": pick(pre + "attention.LayerNorm.bias"),
                },
                "mlp": {
                    "wi": lin(pre + "intermediate.dense"),
                    "wo": lin(pre + "output.dense"),
                },
                "ln2": {
                    "scale": pick(pre + "output.LayerNorm.weight"),
                    "bias": pick(pre + "output.LayerNorm.bias"),
                },
            }
        )
    return {
        "tok_embed": pick("embeddings.word_embeddings.weight"),
        "pos_embed": pick("embeddings.position_embeddings.weight"),
        "emb_ln": {
            "scale": pick("embeddings.LayerNorm.weight"),
            "bias": pick("embeddings.LayerNorm.bias"),
        },
        "rel_bias": pick("encoder.relative_attention_bias.weight"),
        "blocks": blocks,
    }


def load_mpnet(model_dir: str):
    """Local transformers MPNet directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModel

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModel.from_pretrained(model_dir, torch_dtype="float32")
    cfg = mpnet_config(hf_cfg)
    params = convert_mpnet(model.state_dict(), cfg)
    del model
    return params, cfg


def load_encoder_auto(model_dir: str):
    """Local transformers encoder directory -> (params, ModelConfig),
    dispatching on config model_type (bert-class vs mpnet) — so the CLI
    can take either of the reference's two index encoders
    (heavy_ranker.py:78-88)."""
    from transformers import AutoConfig

    model_type = getattr(AutoConfig.from_pretrained(model_dir), "model_type", "")
    if model_type == "mpnet":
        return load_mpnet(model_dir)
    return load_bert(model_dir)


# ---------------------------------------------------------------------------
# T5/mT5 encoder-decoders (the reference's mt5 seq2seq path,
# reference src/test.py:106-147; loadable by its AutoModelForSeq2SeqLM
# branch at src/models/trainer.py:536-544)
# ---------------------------------------------------------------------------


def t5_config(hf_cfg) -> ModelConfig:
    """transformers T5Config/MT5Config -> ModelConfig (models/t5.py family)."""
    ff_proj = str(getattr(hf_cfg, "feed_forward_proj", "relu"))
    gated = bool(getattr(hf_cfg, "is_gated_act", "gated" in ff_proj))
    return ModelConfig(
        arch="seq2seq",
        seq2seq_family="t5",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.d_model,
        n_heads=hf_cfg.num_heads,
        d_kv=hf_cfg.d_kv,
        n_layers=hf_cfg.num_layers,
        n_decoder_layers=int(
            getattr(hf_cfg, "num_decoder_layers", None) or hf_cfg.num_layers
        ),
        d_ff=hf_cfg.d_ff,
        max_seq_len=1024,  # T5 has no absolute position table
        mlp_gated=gated,
        tie_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", True)),
        relative_attention_buckets=int(hf_cfg.relative_attention_num_buckets),
        relative_attention_max_distance=int(
            getattr(hf_cfg, "relative_attention_max_distance", 128)
        ),
        norm_eps=float(getattr(hf_cfg, "layer_norm_epsilon", 1e-6)),
        attention_bias=False,
    )


def convert_t5(state_dict: Mapping, cfg: ModelConfig) -> dict:
    """T5/mT5 state dict -> the models/t5.py pytree.

    HF layer indices: encoder block = [0: SelfAttention, 1: FFN]; decoder
    block = [0: SelfAttention, 1: EncDecAttention, 2: FFN].  The shared
    relative bias lives on block 0 of each stack.  Gated FFNs store the
    gelu gate as wi_0 (our "wg") and the linear branch as wi_1 (our "wi").
    """

    def pick(name):
        if name not in state_dict:
            raise KeyError(f"missing weight {name!r} in state dict")
        return _t(state_dict[name])

    def attn(pre):
        return {
            "wq": {"w": pick(pre + ".q.weight").T.copy()},
            "wk": {"w": pick(pre + ".k.weight").T.copy()},
            "wv": {"w": pick(pre + ".v.weight").T.copy()},
            "wo": {"w": pick(pre + ".o.weight").T.copy()},
        }

    def ffn(pre):
        if cfg.mlp_gated:
            return {
                "wg": {"w": pick(pre + ".wi_0.weight").T.copy()},
                "wi": {"w": pick(pre + ".wi_1.weight").T.copy()},
                "wo": {"w": pick(pre + ".wo.weight").T.copy()},
            }
        return {
            "wi": {"w": pick(pre + ".wi.weight").T.copy()},
            "wo": {"w": pick(pre + ".wo.weight").T.copy()},
        }

    enc_blocks = []
    for i in range(cfg.n_layers):
        pre = f"encoder.block.{i}."
        enc_blocks.append(
            {
                "ln1": {"scale": pick(pre + "layer.0.layer_norm.weight")},
                "attn": attn(pre + "layer.0.SelfAttention"),
                "ln2": {"scale": pick(pre + "layer.1.layer_norm.weight")},
                "mlp": ffn(pre + "layer.1.DenseReluDense"),
            }
        )
    dec_blocks = []
    for i in range(cfg.decoder_layers):
        pre = f"decoder.block.{i}."
        dec_blocks.append(
            {
                "ln1": {"scale": pick(pre + "layer.0.layer_norm.weight")},
                "attn": attn(pre + "layer.0.SelfAttention"),
                "ln_cross": {"scale": pick(pre + "layer.1.layer_norm.weight")},
                "cross_attn": attn(pre + "layer.1.EncDecAttention"),
                "ln2": {"scale": pick(pre + "layer.2.layer_norm.weight")},
                "mlp": ffn(pre + "layer.2.DenseReluDense"),
            }
        )
    params = {
        "tok_embed": pick("shared.weight"),
        "enc_rel_bias": pick(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"
        ),
        "dec_rel_bias": pick(
            "decoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"
        ),
        "enc_blocks": enc_blocks,
        "enc_ln_f": {"scale": pick("encoder.final_layer_norm.weight")},
        "dec_blocks": dec_blocks,
        "dec_ln_f": {"scale": pick("decoder.final_layer_norm.weight")},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = {"w": pick("lm_head.weight").T.copy()}
    return params


def load_t5(model_dir: str):
    """Local transformers T5/mT5 directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModelForSeq2SeqLM  # local only

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForSeq2SeqLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = t5_config(hf_cfg)
    params = convert_t5(model.state_dict(), cfg)
    del model
    return params, cfg


def mbart_config(hf_cfg) -> ModelConfig:
    """transformers MBartConfig -> ModelConfig (models/bart.py family).
    Covers vinai-translate / mbart-50-class checkpoints — the reference's
    offline en→vi translation model (reference src/data/features/
    final_storge_converted/data_parser.py:75-93) is mBART-architecture."""
    if hf_cfg.encoder_attention_heads != hf_cfg.decoder_attention_heads:
        raise ValueError("mbart import requires equal enc/dec head counts")
    if hf_cfg.encoder_ffn_dim != hf_cfg.decoder_ffn_dim:
        raise ValueError("mbart import requires equal enc/dec FFN dims")
    return ModelConfig(
        arch="seq2seq",
        seq2seq_family="bart",
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.d_model,
        n_heads=int(hf_cfg.encoder_attention_heads),
        n_layers=int(hf_cfg.encoder_layers),
        n_decoder_layers=int(hf_cfg.decoder_layers),
        d_ff=int(hf_cfg.encoder_ffn_dim),
        max_seq_len=int(hf_cfg.max_position_embeddings),
        positional="learned",
        activation=str(getattr(hf_cfg, "activation_function", "gelu")),
        scale_embedding=bool(getattr(hf_cfg, "scale_embedding", False)),
        tie_embeddings=True,
        # HF MBart layers use torch nn.LayerNorm's default eps
        norm_eps=1e-5,
        attention_bias=True,
    )


def convert_mbart(state_dict: Mapping, cfg: ModelConfig) -> dict:
    """MBart state dict -> the models/bart.py pytree.  ``final_logits_bias``
    (a zeros buffer in published checkpoints) is stored only when nonzero —
    its presence is self-describing (bart._logits)."""

    def pick(name):
        for key in (name, "model." + name):
            if key in state_dict:
                return _t(state_dict[key])
        raise KeyError(f"missing weight {name!r} in state dict")

    def lin(pre):
        return {"w": pick(pre + ".weight").T.copy(), "b": pick(pre + ".bias")}

    def ln(pre):
        return {"scale": pick(pre + ".weight"), "bias": pick(pre + ".bias")}

    def attn(pre):
        return {
            "wq": lin(pre + ".q_proj"),
            "wk": lin(pre + ".k_proj"),
            "wv": lin(pre + ".v_proj"),
            "wo": lin(pre + ".out_proj"),
        }

    def block(pre, cross: bool):
        p = {
            "ln1": ln(pre + ".self_attn_layer_norm"),
            "attn": attn(pre + ".self_attn"),
            "ln2": ln(pre + ".final_layer_norm"),
            "mlp": {"fc1": lin(pre + ".fc1"), "fc2": lin(pre + ".fc2")},
        }
        if cross:
            p["ln_cross"] = ln(pre + ".encoder_attn_layer_norm")
            p["cross_attn"] = attn(pre + ".encoder_attn")
        return p

    params = {
        "tok_embed": pick("shared.weight"),
        "enc_pos_embed": pick("encoder.embed_positions.weight"),
        "dec_pos_embed": pick("decoder.embed_positions.weight"),
        "enc_ln_emb": ln("encoder.layernorm_embedding"),
        "dec_ln_emb": ln("decoder.layernorm_embedding"),
        "enc_blocks": [
            block(f"encoder.layers.{i}", cross=False)
            for i in range(cfg.n_layers)
        ],
        "enc_ln_f": ln("encoder.layer_norm"),
        "dec_blocks": [
            block(f"decoder.layers.{i}", cross=True)
            for i in range(cfg.decoder_layers)
        ],
        "dec_ln_f": ln("decoder.layer_norm"),
    }
    try:
        bias = pick("final_logits_bias").reshape(-1)
        if np.any(bias != 0.0):
            params["logits_bias"] = bias
    except KeyError:
        pass
    return params


def load_mbart(model_dir: str):
    """Local transformers mBART directory -> (params, ModelConfig)."""
    from transformers import AutoConfig, AutoModelForSeq2SeqLM  # local only

    hf_cfg = AutoConfig.from_pretrained(model_dir)
    model = AutoModelForSeq2SeqLM.from_pretrained(
        model_dir, torch_dtype="float32", low_cpu_mem_usage=True
    )
    cfg = mbart_config(hf_cfg)
    params = convert_mbart(model.state_dict(), cfg)
    del model
    return params, cfg


def load_seq2seq_auto(model_dir: str):
    """Local transformers seq2seq directory -> (params, ModelConfig).
    t5/mt5 (the reference's mt5 experiments) and mbart (the reference's
    vinai-translate en→vi model)."""
    from transformers import AutoConfig

    model_type = getattr(AutoConfig.from_pretrained(model_dir), "model_type", "")
    if model_type in ("t5", "mt5", "longt5"):
        return load_t5(model_dir)
    if model_type == "mbart":
        return load_mbart(model_dir)
    raise ValueError(f"unsupported seq2seq model_type {model_type!r}")


def to_t5_state_dict(params, cfg: ModelConfig) -> dict:
    """Inverse of :func:`convert_t5` (transpose back to HF (out, in)).
    Scan-over-layers (stacked) pytrees are unstacked transparently."""
    from .t5 import t5_stacked, unstack_t5

    if t5_stacked(params):
        params = unstack_t5(params, cfg)
    out = {}

    def put(name, w):
        out[name] = np.asarray(w, np.float32).T.copy()

    def attn(pre, p):
        for ours, theirs in (("wq", "q"), ("wk", "k"), ("wv", "v"), ("wo", "o")):
            put(f"{pre}.{theirs}.weight", p[ours]["w"])

    def ffn(pre, p):
        if "wg" in p:
            put(pre + ".wi_0.weight", p["wg"]["w"])
            put(pre + ".wi_1.weight", p["wi"]["w"])
        else:
            put(pre + ".wi.weight", p["wi"]["w"])
        put(pre + ".wo.weight", p["wo"]["w"])

    out["shared.weight"] = np.asarray(params["tok_embed"], np.float32)
    out["encoder.embed_tokens.weight"] = out["shared.weight"]
    out["decoder.embed_tokens.weight"] = out["shared.weight"]
    out[
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    ] = np.asarray(params["enc_rel_bias"], np.float32)
    out[
        "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    ] = np.asarray(params["dec_rel_bias"], np.float32)
    for i, blk in enumerate(params["enc_blocks"]):
        pre = f"encoder.block.{i}."
        out[pre + "layer.0.layer_norm.weight"] = np.asarray(
            blk["ln1"]["scale"], np.float32
        )
        attn(pre + "layer.0.SelfAttention", blk["attn"])
        out[pre + "layer.1.layer_norm.weight"] = np.asarray(
            blk["ln2"]["scale"], np.float32
        )
        ffn(pre + "layer.1.DenseReluDense", blk["mlp"])
    out["encoder.final_layer_norm.weight"] = np.asarray(
        params["enc_ln_f"]["scale"], np.float32
    )
    for i, blk in enumerate(params["dec_blocks"]):
        pre = f"decoder.block.{i}."
        out[pre + "layer.0.layer_norm.weight"] = np.asarray(
            blk["ln1"]["scale"], np.float32
        )
        attn(pre + "layer.0.SelfAttention", blk["attn"])
        out[pre + "layer.1.layer_norm.weight"] = np.asarray(
            blk["ln_cross"]["scale"], np.float32
        )
        attn(pre + "layer.1.EncDecAttention", blk["cross_attn"])
        out[pre + "layer.2.layer_norm.weight"] = np.asarray(
            blk["ln2"]["scale"], np.float32
        )
        ffn(pre + "layer.2.DenseReluDense", blk["mlp"])
    out["decoder.final_layer_norm.weight"] = np.asarray(
        params["dec_ln_f"]["scale"], np.float32
    )
    if "lm_head" in params:
        out["lm_head.weight"] = np.asarray(
            params["lm_head"]["w"], np.float32
        ).T.copy()
    else:
        out["lm_head.weight"] = out["shared.weight"]
    return out


def export_t5(
    params,
    cfg: ModelConfig,
    out_dir: str,
    *,
    pad_token_id: int = 0,
    eos_token_id: int = 1,
    decoder_start_token_id: int = 0,
) -> str:
    """Write a transformers-loadable T5/mT5 model directory (the seq2seq
    side of the reference's --convert_cpkt capability,
    reference src/models/trainer.py:772-774).  Special-token ids default to
    the HF T5 convention (eos=1); models trained with another tokenizer
    (ByteTokenizer: eos=2) must pass their own ids or HF `generate()` will
    stop on the wrong token."""
    import torch
    from transformers import T5Config, T5ForConditionalGeneration

    hf_cfg = T5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.head_dim,
        d_ff=cfg.d_ff,
        num_layers=cfg.n_layers,
        num_decoder_layers=cfg.decoder_layers,
        num_heads=cfg.n_heads,
        relative_attention_num_buckets=cfg.relative_attention_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu" if cfg.mlp_gated else "relu",
        tie_word_embeddings=cfg.tie_embeddings,
        layer_norm_epsilon=cfg.norm_eps,
        decoder_start_token_id=decoder_start_token_id,
        pad_token_id=pad_token_id,
        eos_token_id=eos_token_id,
    )
    model = T5ForConditionalGeneration(hf_cfg)
    sd = {
        k: torch.from_numpy(v.copy())
        for k, v in to_t5_state_dict(params, cfg).items()
    }
    _, unexpected = model.load_state_dict(sd, strict=False)
    if unexpected:
        raise ValueError(f"unexpected keys in export: {unexpected}")
    model.save_pretrained(out_dir, safe_serialization=False)
    return out_dir
