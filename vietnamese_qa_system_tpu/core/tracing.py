"""Profiling / tracing / failure recording.

Capabilities of the reference's aux subsystems (SURVEY §5.1, §5.3):

- `@timeit` + `TorchTracemalloc` → core/profiling.py (timing + memory).
- tqdm-style throughput metering (reference trainer.py:816-817) →
  :class:`StepTimer` (steps/s, tokens/s, ETA).
- torchelastic error propagation (`@record` + TORCHELASTIC_ERROR_FILE,
  reference src/models/trainer.py:15,281) → :func:`record_errors`, which
  writes a structured error file before re-raising so an external
  supervisor can collect failure causes.
- XLA profiler traces (the TPU-native upgrade over the reference's wall
  clocks): :func:`trace` wraps ``jax.profiler`` for TensorBoard-viewable
  device traces; :func:`roofline` estimates achieved vs peak FLOPs/BW —
  the SURVEY §5.1 roofline-verification requirement.
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import time
import traceback
from typing import Optional

import jax

# v5e peak numbers used by the roofline report
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BW = 819e9


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running steps/s + tokens/s + ETA (the reference derived these from
    tqdm rates, trainer.py:816-829)."""

    def __init__(self, total_steps: Optional[int] = None):
        self.total = total_steps
        self.start = time.perf_counter()
        self.steps = 0
        self.tokens = 0

    def update(self, n_tokens: int = 0) -> dict:
        self.steps += 1
        self.tokens += n_tokens
        elapsed = time.perf_counter() - self.start
        out = {
            "steps_per_s": self.steps / max(elapsed, 1e-9),
            "tokens_per_s": self.tokens / max(elapsed, 1e-9),
            "elapsed_s": elapsed,
        }
        if self.total:
            remaining = max(self.total - self.steps, 0)
            out["eta_s"] = remaining / max(out["steps_per_s"], 1e-9)
        return out


def roofline(
    flops: float,
    bytes_accessed: float,
    seconds: float,
    *,
    peak_flops: float = PEAK_BF16_FLOPS,
    peak_bw: float = PEAK_HBM_BW,
) -> dict:
    """Achieved vs peak compute/bandwidth + the binding resource."""
    achieved_flops = flops / seconds
    achieved_bw = bytes_accessed / seconds
    intensity = flops / max(bytes_accessed, 1)
    ridge = peak_flops / peak_bw
    bound = "compute" if intensity >= ridge else "memory"
    limit = peak_flops if bound == "compute" else peak_bw * intensity
    return {
        "achieved_tflops": achieved_flops / 1e12,
        "achieved_gbps": achieved_bw / 1e9,
        "flops_utilization": achieved_flops / peak_flops,
        "bw_utilization": achieved_bw / peak_bw,
        "arithmetic_intensity": intensity,
        "bound": bound,
        "fraction_of_roofline": achieved_flops / limit,
    }


ERROR_FILE_ENV = "VQA_TPU_ERROR_FILE"


def record_errors(fn=None, *, error_file: Optional[str] = None):
    """Decorator: on exception, write {time, type, message, traceback,
    process_index} as json to $VQA_TPU_ERROR_FILE (or `error_file`) and
    re-raise — capability of torchelastic's @record
    (reference trainer.py:15,281)."""

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            try:
                return f(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — record everything
                path = error_file or os.environ.get(ERROR_FILE_ENV)
                if path:
                    try:
                        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                        with open(path, "w") as fh:
                            json.dump(
                                {
                                    "time": time.time(),
                                    "type": type(e).__name__,
                                    "message": str(e),
                                    "traceback": traceback.format_exc(),
                                    "process_index": jax.process_index(),
                                },
                                fh,
                                indent=2,
                            )
                    except OSError:
                        pass
                raise

        return wrapper

    return deco(fn) if fn is not None else deco
