from .build import get_lib, native_available
from .codec import (
    native_batch_encode,
    native_encode_completion_batch,
    native_pack_blocks,
)

__all__ = [
    "get_lib",
    "native_available",
    "native_batch_encode",
    "native_encode_completion_batch",
    "native_pack_blocks",
]
