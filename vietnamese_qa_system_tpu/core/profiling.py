"""Timing and memory introspection.

Capabilities replaced from the reference:
- `@timeit` wall-clock decorator (reference src/utils/utils.py:44-54).
- `TorchTracemalloc` context manager (reference src/models/trainer.py:235-278)
  — GPU allocated/peak via torch.cuda memory APIs plus a busy-wait thread for
  CPU RSS.  Here: XLA device memory stats + tracemalloc for host, no busy
  thread.
"""

from __future__ import annotations

import functools
import time
import tracemalloc
from typing import Any

import jax


def bytes_to_mb(n: int | float) -> float:
    """Bytes → MiB (reference `b2mb`, src/models/trainer.py:80)."""
    return round(n / (1 << 20), 2)


def timeit(fn):
    """Wall-clock decorator; attaches the last duration to the wrapper."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        wrapper.last_seconds = time.perf_counter() - t0
        return out

    wrapper.last_seconds = 0.0
    return wrapper


def device_memory_stats(device: jax.Device | None = None) -> dict[str, Any]:
    """Best-effort device memory stats (bytes).

    ``supported=False`` (all-zero counters) when the backend exposes no
    stats — the CPU backend does not, so a virtual-mesh dry run would
    otherwise report a vacuous ``device_mem_peak=0.0MB``."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
        "supported": "bytes_in_use" in stats,
    }


class MemoryTracker:
    """Context manager reporting host + device memory deltas.

    TPU-native equivalent of the reference's `TorchTracemalloc`
    (src/models/trainer.py:235-278): `used`/`peaked` MiB attributes for the
    device, `cpu_used`/`cpu_peaked` for the host.
    """

    def __enter__(self):
        self._tracing = not tracemalloc.is_tracing()
        if self._tracing:
            tracemalloc.start()
        self._cpu_begin, _ = tracemalloc.get_traced_memory()
        self._dev_begin = device_memory_stats()["bytes_in_use"]
        return self

    def __exit__(self, *exc):
        cpu_now, cpu_peak = tracemalloc.get_traced_memory()
        self.cpu_used = bytes_to_mb(cpu_now - self._cpu_begin)
        self.cpu_peaked = bytes_to_mb(cpu_peak - self._cpu_begin)
        stats = device_memory_stats()
        self.device_supported = stats["supported"]
        self.used = bytes_to_mb(stats["bytes_in_use"] - self._dev_begin)
        self.peaked = bytes_to_mb(
            max(0, stats["peak_bytes_in_use"] - self._dev_begin)
        )
        if self._tracing:
            tracemalloc.stop()
        return False
