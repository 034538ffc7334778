"""Driver entry-point checks.

The round-1 and round-2 multichip gates failed even though the 8-device
test matrix passed, because the driver invokes `dryrun_multichip` in a
fresh process where the default platform is the real TPU: any eager
dispatch or backend initialization outside the dryrun's CPU pin dies
whenever the axon terminal is unhealthy (libtpu mismatch in both
recorded driver runs).  These tests therefore assert HERMETICITY, not
just success: importing the package must not initialize a backend, and
the dryrun subprocess must never touch the axon platform at all.
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


def _assert_no_tpu_contact(stderr: str) -> None:
    """The dryrun path must never initialize the axon/TPU backend: an
    unhealthy terminal must not be able to fail a CPU-only dry run
    (root cause of MULTICHIP_r01/r02)."""
    assert "Platform 'axon'" not in stderr, stderr[-2000:]
    assert "libtpu" not in stderr, stderr[-2000:]


def test_entry_jits_in_process():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_package_import_is_hermetic():
    """Importing EVERY module of the package must not initialize any JAX
    backend (module-level jnp constants / jax.process_index() calls were
    the root cause of two red multichip gates)."""
    r = _run(
        "import pkgutil, importlib\n"
        "import vietnamese_qa_system_tpu as pkg\n"
        "from jax._src import xla_bridge as xb\n"
        "for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + '.'):\n"
        "    leaf = m.name.rsplit('.', 1)[-1]\n"
        "    if leaf.startswith('lib'):\n"
        "        continue  # raw ctypes .so artifacts, not python modules\n"
        "    importlib.import_module(m.name)\n"
        "    assert not xb._backends, f'{m.name} initialized {list(xb._backends)}'\n"
        "print('HERMETIC')\n",
        {},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "HERMETIC" in r.stdout
    _assert_no_tpu_contact(r.stderr)


def test_dryrun_multichip_fresh_process_env_route():
    """Driver shape: XLA_FLAGS set before start, default platform live."""
    r = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('OK')",
        {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout
    _assert_no_tpu_contact(r.stderr)


def test_dryrun_multichip_fresh_process_config_route():
    """No env help at all: the function must configure the CPU client itself."""
    r = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('OK')",
        {},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout
    _assert_no_tpu_contact(r.stderr)


def test_dryrun_multichip_survives_broken_tpu_plugin():
    """The regression that actually broke rounds 1-2: a live-but-broken
    TPU platform.  Simulate by making the axon plugin unimportable is not
    possible from here, so instead assert the stronger property directly:
    with the default platform available, the dryrun never initializes it
    (checked via jax's backend table after the run)."""
    r = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)\n"
        "from jax._src import xla_bridge as xb\n"
        "assert set(xb._backends) <= {'cpu'}, list(xb._backends)\n"
        "print('CPU-ONLY')\n",
        {},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CPU-ONLY" in r.stdout
    _assert_no_tpu_contact(r.stderr)


def test_dryrun_multichip_late_init_fails_loudly():
    r = _run(
        "import jax; jax.devices('cpu');"
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        {},
    )
    assert r.returncode != 0
    assert "xla_force_host_platform_device_count" in r.stderr
