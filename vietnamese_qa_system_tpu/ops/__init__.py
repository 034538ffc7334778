from .topk import matmul_topk, matmul_topk_reference
from .quant import (
    quantize_int8,
    dequantize_int8,
    quantize_int8_reference,
    quantize_int8_residual,
)

__all__ = [
    "matmul_topk",
    "matmul_topk_reference",
    "quantize_int8",
    "dequantize_int8",
    "quantize_int8_reference",
    "quantize_int8_residual",
]
