from .sharding import (
    ShardingRules,
    FSDP_RULES,
    TP_RULES,
    DP_RULES,
    param_sharding,
    batch_sharding,
    accum_batch_sharding,
    replicated,
    shard_params,
)

__all__ = [
    "ShardingRules",
    "FSDP_RULES",
    "TP_RULES",
    "DP_RULES",
    "param_sharding",
    "batch_sharding",
    "accum_batch_sharding",
    "replicated",
    "shard_params",
]
