"""Host-side logging utilities.

Capability of the reference's `dist_print` / `in_notebook`
(src/utils/utils.py:15-32) and the per-rank logger verbosity split
(src/models/trainer.py:296-309).  Under JAX multi-host SPMD the analogue of
"rank 0" is `jax.process_index() == 0`.
"""

from __future__ import annotations

import logging
import sys

import jax


def dist_print(*args, **kwargs) -> None:
    """Print only on process 0 (reference dist_print prints on rank 0)."""
    if jax.process_index() == 0:
        print(*args, **kwargs)


def get_logger(name: str = "vqa_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s [p%(process)d] %(levelname)s %(name)s: %(message)s"
            )
        )
        logger.addHandler(handler)
        logger.setLevel(
            logging.INFO if jax.process_index() == 0 else logging.WARNING
        )
    return logger


def in_notebook() -> bool:
    """True when running inside IPython/Jupyter (reference utils.py:26-32)."""
    try:
        from IPython import get_ipython  # type: ignore

        ip = get_ipython()
        return ip is not None and "IPKernelApp" in ip.config
    except Exception:
        return False
