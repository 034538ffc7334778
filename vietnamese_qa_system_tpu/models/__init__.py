from .config import (
    ModelConfig,
    gpt_125m_class,
    gpt_neo_125m,
    minilm_class,
    mpnet_class,
    pythia_410m_class,
    llama_1b_class,
    mt5_small_class,
    seq2seq_native_small,
    tiny_test,
)
from .lora import LoraConfig, init_lora, merge_lora, count_params, resize_embeddings
from .quantize import (
    dequantize_tree,
    dequantize_weight,
    quantize_dense_tree,
    quantize_weight,
    tree_bytes,
)
from . import causal_lm, encoder, seq2seq, t5, generate

__all__ = [
    "ModelConfig",
    "tiny_test",
    "minilm_class",
    "mpnet_class",
    "gpt_125m_class",
    "gpt_neo_125m",
    "pythia_410m_class",
    "llama_1b_class",
    "mt5_small_class",
    "LoraConfig",
    "init_lora",
    "merge_lora",
    "count_params",
    "resize_embeddings",
    "quantize_weight",
    "quantize_dense_tree",
    "dequantize_weight",
    "dequantize_tree",
    "tree_bytes",
    "seq2seq_native_small",
    "causal_lm",
    "encoder",
    "seq2seq",
    "t5",
    "generate",
]
