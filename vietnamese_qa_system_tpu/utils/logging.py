"""Host-side logging utilities.

Capability of the reference's `dist_print` / `in_notebook`
(src/utils/utils.py:15-32) and the per-rank logger verbosity split
(src/models/trainer.py:296-309).  Under JAX multi-host SPMD the analogue of
"rank 0" is `jax.process_index() == 0`.

HERMETICITY: `get_logger` is called at module scope all over the package,
so it must NOT touch `jax.process_index()` eagerly — that initializes the
default (possibly TPU) backend at import time, which broke the driver's
CPU-mesh dryrun for two rounds (MULTICHIP_r01/r02: an unhealthy axon
terminal killed `import vietnamese_qa_system_tpu.*` before the dryrun
could pin the CPU platform).  The per-process level split is applied
lazily by a filter that only consults the process index once a backend
has ALREADY been initialized by someone else.
"""

from __future__ import annotations

import logging
import sys


def _process_index_if_initialized() -> int:
    """jax.process_index() without forcing backend initialization.

    Returns 0 (the single-host answer, and the level-split default) when
    no backend is up yet — importing a module must never be the thing
    that initializes a device runtime.
    """
    try:
        from jax._src import xla_bridge as xb

        if not xb._backends:
            return 0
        import jax

        return jax.process_index()
    except Exception:
        return 0


def dist_print(*args, **kwargs) -> None:
    """Print only on process 0 (reference dist_print prints on rank 0)."""
    if _process_index_if_initialized() == 0:
        print(*args, **kwargs)


class _Rank0InfoFilter(logging.Filter):
    """Non-zero processes drop records below WARNING (lazy rank split)."""

    def filter(self, record: logging.LogRecord) -> bool:
        if record.levelno >= logging.WARNING:
            return True
        return _process_index_if_initialized() == 0


def get_logger(name: str = "vqa_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s [p%(process)d] %(levelname)s %(name)s: %(message)s"
            )
        )
        handler.addFilter(_Rank0InfoFilter())
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


def in_notebook() -> bool:
    """True when running inside IPython/Jupyter (reference utils.py:26-32)."""
    try:
        from IPython import get_ipython  # type: ignore

        ip = get_ipython()
        return ip is not None and "IPKernelApp" in ip.config
    except Exception:
        return False
