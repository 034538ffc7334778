"""Model configuration.

Replaces the capability of the reference's HF `AutoModelFor*` +
`AutoConfig` loading (reference src/models/trainer.py:536-551) with typed,
self-contained configs.  Three architectures cover the reference's model
families:

- ``encoder``  — bidirectional sentence encoder (capability of the
  sentence-transformers MiniLM/mpnet models used by
  reference inference_pipeline/db_utils/heavy_ranker.py:78-83).
- ``causal``   — decoder-only LM (capability of gpt-neo / pythia in
  reference scripts/train.sh).
- ``seq2seq``  — encoder-decoder LM (capability of the mt5 path,
  reference src/test.py:106-147 and the SEQ_2_SEQ_LM task type).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Literal


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: Literal["encoder", "causal", "seq2seq"] = "causal"
    vocab_size: int = 512
    d_model: int = 256
    n_heads: int = 4
    n_layers: int = 2
    d_ff: int = 1024
    max_seq_len: int = 1024
    # decoder stack for seq2seq (encoder uses n_layers)
    n_decoder_layers: int | None = None
    # "rope" for causal/seq2seq decoders, "learned" for the encoder family,
    # "alibi" for the BLOOM family (per-head linear score bias, no position
    # table — the architecture of the most common Vietnamese base models,
    # bloomz/vietcuna, loadable through the reference's AutoModelForCausalLM
    # path at reference src/models/trainer.py:536-551)
    positional: Literal["rope", "learned", "alibi"] = "rope"
    # ALiBi slope construction for non-power-of-two head counts: "bloom"
    # extends the closest LOWER power of two's sequence (HF
    # build_alibi_tensor); "mpt" builds the next HIGHER power of two's
    # sequence and interleaves (HF build_mpt_alibi_tensor — the MPT/PhoGPT
    # family, e.g. vinai/PhoGPT-4B with 24 heads).  Identical for
    # power-of-two head counts at alibi_bias_max=8.
    alibi_mode: str = "bloom"
    alibi_bias_max: float = 8.0
    # MPT attn_config.clip_qkv: clamp q/k/v projections to [-clip, clip]
    # before attention (None = off)
    clip_qkv: float | None = None
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6
    tie_embeddings: bool = True
    dropout_rate: float = 0.0  # inference default; trainer may override
    # fused Pallas attention (ops/attention.py) on the non-cached causal
    # path — capability of the reference's --use_flash_attention_2 flag
    use_flash_attention: bool = False
    # GPT-NeoX-style (pythia) architecture knobs, enabling faithful import
    # of the reference's pythia-410m family (scripts/train_test.sh):
    # x + attn(ln1(x)) + mlp(ln2(x)) instead of sequential residuals
    parallel_residual: bool = False
    # fraction of head_dim that RoPE rotates (NeoX rotary_pct, e.g. 0.25)
    rope_pct: float = 1.0
    norm: str = "layernorm"  # "layernorm" | "rmsnorm" (llama family)
    # encoder-family knobs for faithful BERT import (MiniLM-class
    # sentence-transformers weights, models/convert_hf.py):
    norm_position: str = "pre"  # "pre" | "post" (BERT is post-LN)
    bert_embeddings: bool = False  # embedding LayerNorm + token-type table
    # MPNet-family knobs (paraphrase-mpnet-base-v2, the reference's second
    # encoder, heavy_ranker.py:83-88): embedding LayerNorm without a
    # token-type table, RoBERTa-style position indexing (padding_idx+1
    # offset), and a shared T5-style bucketed relative attention bias
    embed_layernorm: bool = False
    position_offset: int = 0  # first real token's position id (MPNet: 2)
    relative_attention_buckets: int = 0  # 0 = absolute positions only
    relative_attention_max_distance: int = 128
    # GPT-Neo / GPT-2 family knobs (EleutherAI/gpt-neo-125m is the
    # reference's canonical training model, reference scripts/train.sh:7;
    # the reference special-cases gpt2 at src/models/trainer.py:529):
    # - GPT-Neo attends WITHOUT the 1/sqrt(head_dim) scaling
    #   (attention_scale=1.0); None = standard scaling.
    # - attention_layers: per-layer "global" | "local"; GPT-Neo alternates,
    #   local layers see a sliding window of ``attention_window`` keys.
    # - activation "gelu_new" is the tanh approximation both families use.
    attention_scale: float | None = None
    attention_layers: tuple | None = None
    attention_window: int = 256
    activation: str = "gelu"  # "gelu" (erf, HF default) | "gelu_new" (tanh)
    # Llama-family knobs (beyond the reference's model zoo, included so the
    # causal stack covers the modern open-weights family): RMSNorm blocks,
    # SwiGLU gated MLPs, grouped-query attention, bias-free projections.
    n_kv_heads: int | None = None  # None = multi-head (no GQA)
    mlp_gated: bool = False
    # True = biases everywhere (GPT families), False = bias-free (llama),
    # "qkv" = biases on the q/k/v projections only (Qwen2 family — the
    # strongest multilingual open weights for Vietnamese today)
    attention_bias: bool | str = True
    # Seq2seq family selection for arch="seq2seq":
    # - "t5" selects models/t5.py (T5 RMS norms, per-stack shared relative
    #   bias, unscaled attention, gated-gelu FFN) — the reference's mt5
    #   path (src/test.py:106-147);
    # - "bart" selects models/bart.py (mBART pre-LN, learned +2-offset
    #   positions, embedding layernorm, tied head) — the reference's
    #   vinai-translate en→vi model (data_parser.py:75-93) is mBART;
    # - "native" keeps the framework's RoPE encoder-decoder
    #   (models/seq2seq.py).
    seq2seq_family: str = "native"
    # mBART multiplies token embeddings by sqrt(d_model) (HF
    # scale_embedding); only the bart family reads this.
    scale_embedding: bool = False
    # T5 decouples the attention inner dim from d_model: head_dim = d_kv
    # (mt5-small: 6 heads x 64 = 384 vs d_model 512).  None = d_model/heads.
    d_kv: int | None = None
    # Stack homogeneous decoder blocks into one leading-L pytree and run
    # them under lax.scan (T5X/MaxText-style scan-over-layers): ONE kernel
    # lowering + one layer compile regardless of depth — compile time is
    # O(1) in n_layers instead of O(n_layers), which dominates for deep
    # models with Pallas kernels.  Requires uniform layers (no GPT-Neo
    # local/global alternation).  The stacked pytree is the on-disk and
    # in-memory format when this is set (models/causal_lm.py::stack_blocks).
    scan_layers: bool = False
    # Remat granularity for the scan-over-layers path (layers.remat_wrap):
    # "full" = recompute the whole layer in bwd (min memory);
    # "dots" = save matmul outputs + the flash-attention out/lse, recompute
    # only elementwise glue — trades ~B*T*(4d+2ff) saved f32/layer for
    # skipping the fwd recompute (~25% of step FLOPs; measured numbers in
    # docs/BENCHMARKS.md);
    # "proj_bf16" = like "dots" but the saves are rounded to bf16 (half
    # the bytes that made dots OOM) and the fused-QLoRA dequant re-gather
    # is skipped too — the flagship training policy (layers.remat_wrap);
    # "none" = no remat (deep flash stacks OOM).  The capability knob
    # behind torch's gradient_checkpointing_enable (reference
    # src/models/trainer.py:527-533), with selectivity torch's flag lacks.
    remat_policy: str = "full"
    # bf16 residual/norm-output activations (norm math stays fp32):
    # standard inference mixed precision; halves inter-op HBM traffic.
    # On by default only for the retrieval encoders (their outputs are
    # mean-pooled unit vectors — tested to keep HF parity within 0.03).
    activations_bf16: bool = False

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def head_dim(self) -> int:
        if self.d_kv is not None:
            return self.d_kv
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def decoder_layers(self) -> int:
        return self.n_decoder_layers or self.n_layers

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "ModelConfig":
        d = json.loads(s)
        if d.get("attention_layers") is not None:
            # JSON has no tuples; the config must stay hashable (it is a
            # static jit argument throughout models/generate.py)
            d["attention_layers"] = tuple(d["attention_layers"])
        return cls(**d)


# Ready-made sizes, roughly matching the reference's model scale points
# (gpt-neo-125m / pythia-410m in reference scripts/train*.sh and the
# MiniLM-L12 / mpnet-base encoders in heavy_ranker.py).
def tiny_test(arch="causal") -> ModelConfig:
    return ModelConfig(
        arch=arch, vocab_size=512, d_model=128, n_heads=4, n_layers=2,
        d_ff=512, max_seq_len=256,
        positional="learned" if arch == "encoder" else "rope",
    )


def minilm_class() -> ModelConfig:
    """~33M-param sentence encoder (MiniLM-L12 class, 384-d)."""
    return ModelConfig(
        arch="encoder", vocab_size=32000, d_model=384, n_heads=12,
        n_layers=12, d_ff=1536, max_seq_len=512, positional="learned",
        use_flash_attention=True, activations_bf16=True,
    )


def mpnet_class() -> ModelConfig:
    """~110M-param sentence encoder, faithful mpnet-base layout
    (paraphrase-mpnet-base-v2: post-LN, embedding LN, position offset 2,
    32-bucket shared relative attention bias) so real MPNet weights
    import via models/convert_hf.py::load_mpnet."""
    return ModelConfig(
        arch="encoder", vocab_size=30527, d_model=768, n_heads=12,
        n_layers=12, d_ff=3072, max_seq_len=514, positional="learned",
        norm_eps=1e-5, norm_position="post", embed_layernorm=True,
        position_offset=2, relative_attention_buckets=32,
        use_flash_attention=True, activations_bf16=True,
    )


def gpt_125m_class() -> ModelConfig:
    """gpt-neo-125m class decoder (reference scripts/train.sh)."""
    return ModelConfig(
        arch="causal", vocab_size=50304, d_model=768, n_heads=12,
        n_layers=12, d_ff=3072, max_seq_len=2048,
        use_flash_attention=True,
    )


def gpt_neo_125m() -> ModelConfig:
    """Faithful EleutherAI/gpt-neo-125m layout (the exact model in
    reference scripts/train.sh:7): learned positions, unscaled attention,
    alternating global/local(256) layers, gelu_new, tied head — real HF
    weights import via models/convert_hf.py::load_gpt_neo."""
    return ModelConfig(
        arch="causal", vocab_size=50257, d_model=768, n_heads=12,
        n_layers=12, d_ff=3072, max_seq_len=2048, positional="learned",
        norm_eps=1e-5, tie_embeddings=True, attention_scale=1.0,
        attention_layers=tuple(
            "global" if i % 2 == 0 else "local" for i in range(12)
        ),
        attention_window=256, activation="gelu_new",
    )


def pythia_410m_class() -> ModelConfig:
    """pythia-410m class decoder (reference scripts/train_test.sh) —
    faithful GPT-NeoX layout (parallel residual, rotary_pct=0.25,
    untied head), so real pythia weights import via models/convert_hf.py."""
    return ModelConfig(
        arch="causal", vocab_size=50304, d_model=1024, n_heads=16,
        n_layers=24, d_ff=4096, max_seq_len=2048,
        parallel_residual=True, rope_pct=0.25, tie_embeddings=False,
        norm_eps=1e-5, use_flash_attention=True,
    )


def llama_1b_class() -> ModelConfig:
    """~1.2B-param llama-family decoder (RMSNorm, SwiGLU, GQA) — the
    single-chip QLoRA scale point: an int8/nf4 base + LoRA fits v5e HBM
    where full fine-tuning would not (the capability the reference gets
    from bitsandbytes 4/8-bit + peft, reference src/models/trainer.py:
    470-497)."""
    return ModelConfig(
        arch="causal", vocab_size=32000, d_model=2048, n_heads=32,
        n_kv_heads=8, n_layers=22, d_ff=5632, max_seq_len=2048,
        norm="rmsnorm", mlp_gated=True, attention_bias=False,
        tie_embeddings=False, norm_eps=1e-5, use_flash_attention=True,
    )


def qwen2_05b_class() -> ModelConfig:
    """Faithful Qwen2-0.5B layout (Qwen2/2.5 are the strongest multilingual
    open-weights family for Vietnamese): llama-style RMSNorm/SwiGLU/GQA
    with q/k/v-only biases, tied embeddings, rope_theta=1e6 — real Qwen2
    weights import via models/convert_hf.py::load_qwen2 (the reference
    loads any such model through AutoModelForCausalLM,
    reference src/models/trainer.py:536-551)."""
    return ModelConfig(
        arch="causal", vocab_size=151936, d_model=896, n_heads=14,
        n_kv_heads=2, n_layers=24, d_ff=4864, max_seq_len=2048,
        rope_theta=1e6, norm="rmsnorm", mlp_gated=True,
        attention_bias="qkv", tie_embeddings=True, norm_eps=1e-6,
        use_flash_attention=True,
    )


def bloom_560m_class() -> ModelConfig:
    """Faithful bigscience/bloom-560m layout (the bloomz/vietcuna family —
    the dominant Vietnamese open-weights base): ALiBi attention, embedding
    LayerNorm, fused-QKV import, gelu_new MLP, tied head — real BLOOM
    weights import via models/convert_hf.py::load_bloom."""
    return ModelConfig(
        arch="causal", vocab_size=250880, d_model=1024, n_heads=16,
        n_layers=24, d_ff=4096, max_seq_len=2048, positional="alibi",
        embed_layernorm=True, norm_eps=1e-5, tie_embeddings=True,
        activation="gelu_new", use_flash_attention=True,
    )


def phogpt_4b_class() -> ModelConfig:
    """Faithful vinai/PhoGPT-4B layout — the strongest Vietnamese-first
    open LLM (trained from scratch on 102B Vietnamese tokens; model_type
    "mpt"): MPT architecture — ALiBi with the MPT slope recipe (24 heads =
    non-power-of-two interleave), bias-free pre-LN LayerNorms, fused Wqkv,
    exact-GELU 4x MLP, tied head, 20480-token Vietnamese BPE vocab.  Real
    PhoGPT weights import via models/convert_hf.py::load_mpt (the
    reference loads any such model through AutoModelForCausalLM,
    reference src/models/trainer.py:536-551).  scan_layers: 32 deep flash
    layers compile O(1) over the remote-compile tunnel."""
    return ModelConfig(
        arch="causal", vocab_size=20480, d_model=3072, n_heads=24,
        n_layers=32, d_ff=12288, max_seq_len=8192, positional="alibi",
        alibi_mode="mpt", attention_bias=False, norm_eps=1e-5,
        tie_embeddings=True, activation="gelu", use_flash_attention=True,
        scan_layers=True,
    )


def mt5_small_class() -> ModelConfig:
    """Faithful google/mt5-small layout (the reference's seq2seq
    experiments, src/test.py:106-147 use mt5 + LoRA): T5 v1.1 family —
    gated-gelu FFN, untied lm_head, d_kv=64 (inner 384 != d_model 512),
    shared 32-bucket relative bias — so real mt5 weights import via
    models/convert_hf.py::load_t5."""
    return ModelConfig(
        arch="seq2seq", seq2seq_family="t5", vocab_size=250112, d_model=512,
        n_heads=6, d_kv=64, n_layers=8, n_decoder_layers=8, d_ff=1024,
        max_seq_len=1024, mlp_gated=True, tie_embeddings=False,
        relative_attention_buckets=32, relative_attention_max_distance=128,
        attention_bias=False,
    )


def seq2seq_native_small() -> ModelConfig:
    """The framework's native RoPE encoder-decoder at mt5-small scale
    (models/seq2seq.py) — for from-scratch seq2seq training."""
    return ModelConfig(
        arch="seq2seq", vocab_size=250112, d_model=512, n_heads=8,
        n_layers=8, n_decoder_layers=8, d_ff=1024, max_seq_len=1024,
    )
