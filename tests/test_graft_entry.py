"""Driver entry-point checks.

The round-1 multichip gate failed even though the 8-device test matrix
passed, because the driver invokes `dryrun_multichip` in a fresh process
with the default (TPU) platform live — a path no in-process test covered.
These tests run the real invocation shape in a subprocess.
"""

import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_extra: dict) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # the conftest forces CPU via JAX_PLATFORMS for *this* process; the
    # driver's subprocess must see the machine default (axon/TPU when
    # present), so drop the overrides.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )


def test_entry_jits_in_process():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_fresh_process_env_route():
    """Driver shape: XLA_FLAGS set before start, default platform live."""
    r = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('OK')",
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_dryrun_multichip_fresh_process_config_route():
    """No env help at all: the function must configure the CPU client itself."""
    r = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('OK')",
        {},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_dryrun_multichip_late_init_fails_loudly():
    r = _run(
        "import jax; jax.devices('cpu');"
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        {},
    )
    assert r.returncode != 0
    assert "xla_force_host_platform_device_count" in r.stderr
