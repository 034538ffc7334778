"""Dtype policy — bf16 compute / fp32 accumulation by default.

Capability of the reference's mixed-precision setup (`mixed_precision: bf16`
in every accelerate YAML, reference src/models/configs/*.yaml, and the TF32 /
autocast toggles at reference src/models/trainer.py:26-27,1010-1012).  On TPU
bf16 is native on the MXU; fp32 accumulation is requested explicitly via
``preferred_element_type`` at each matmul.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32  # master weights
    compute_dtype: jnp.dtype = jnp.bfloat16  # activations / matmul inputs
    accum_dtype: jnp.dtype = jnp.float32  # matmul / loss accumulation

    def cast_compute(self, tree):
        import jax

        def _cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return jax.tree.map(_cast, tree)


DEFAULT_POLICY = DTypePolicy()
FP32_POLICY = DTypePolicy(compute_dtype=jnp.float32)
