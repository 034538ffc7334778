from .optim import make_optimizer, make_schedule, quantize_blockwise, dequantize_blockwise
from .checkpoint import (
    CheckpointManager,
    save_pytree,
    load_pytree,
    save_pytree_sharded,
    load_pytree_sharded,
)
from .trainer import TrainConfig, Trainer, make_train_step, init_model_params
from .evaluate import perplexity_eval, generative_eval

__all__ = [
    "make_optimizer",
    "make_schedule",
    "quantize_blockwise",
    "dequantize_blockwise",
    "CheckpointManager",
    "save_pytree",
    "load_pytree",
    "save_pytree_sharded",
    "load_pytree_sharded",
    "TrainConfig",
    "Trainer",
    "make_train_step",
    "init_model_params",
    "perplexity_eval",
    "generative_eval",
]
