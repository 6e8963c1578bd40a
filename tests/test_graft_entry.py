"""Self-checks for the driver entry points in __graft_entry__.py.

Round-2 post-mortem: the driver's multichip capture failed for two rounds with
a libtpu-mismatch traceback raised at *import time* — a module-level
``jnp.asarray`` in ops/spline.py eagerly initialised the driver process's
(broken) TPU backend before ``dryrun_multichip`` could spawn its clean CPU
subprocess.  These tests pin down both halves of the fix:

1. importing ``__graft_entry__`` (and the whole package underneath it) must not
   touch any JAX backend;
2. the *exact* driver call ``__graft_entry__.dryrun_multichip(n_devices=8)``
   must succeed from a hostile parent process (foreign cwd, poisoned
   JAX_PLATFORMS / XLA_FLAGS) and print the DRYRUN_MULTICHIP_OK marker.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_import_touches_no_backend():
    """Import the driver module with backend resolution booby-trapped."""
    code = r"""
import jax
import jax._src.xla_bridge as xb
def boom(*a, **k):
    raise RuntimeError("BACKEND TOUCHED AT IMPORT")
xb.backends = boom
xb.get_backend = boom
import __graft_entry__
import wildcat_slam_tpu.odometry.pipeline
import wildcat_slam_tpu.parallel.mesh
import wildcat_slam_tpu.cli
print("IMPORT_CLEAN")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": REPO}, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "IMPORT_CLEAN" in proc.stdout


@pytest.mark.full
def test_dryrun_multichip_exact_driver_call(tmp_path):
    """Run the exact driver invocation from a hostile parent environment."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # Poison the parent: a bogus platform preference and a hostile device-count
    # flag.  dryrun_multichip's subprocess must override both.
    env["JAX_PLATFORMS"] = "bogus_platform"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=3"
    ).strip()
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(n_devices=8)\n" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=str(tmp_path),
        capture_output=True, text=True, env=env, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DRYRUN_MULTICHIP_OK devices=8" in proc.stdout, proc.stdout
