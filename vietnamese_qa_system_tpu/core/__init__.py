from .mesh import MeshSpec, create_mesh, local_mesh
from .dtypes import DTypePolicy, DEFAULT_POLICY
from .rng import RNG, set_seed
from .profiling import timeit, MemoryTracker, bytes_to_mb

__all__ = [
    "MeshSpec",
    "create_mesh",
    "local_mesh",
    "DTypePolicy",
    "DEFAULT_POLICY",
    "RNG",
    "set_seed",
    "timeit",
    "MemoryTracker",
    "bytes_to_mb",
]
