"""The driver's multi-chip gate: dryrun_multichip must self-bootstrap its
virtual CPU mesh — no env vars supplied by the caller (VERDICT round 1 #1)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # strip any pre-set virtual device count so the bootstrap has to do it
    flags = env.get("XLA_FLAGS", "").split()
    env["XLA_FLAGS"] = " ".join(
        f for f in flags if "host_platform_device_count" not in f)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_bootstraps_fresh_process():
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mesh 4x2 ok" in out.stdout


def test_dryrun_reexecs_when_jax_preinitialized():
    # jax initialized first with (at most) the default device set; the
    # bootstrap must fall back to the subprocess re-exec path. Preinit on
    # CPU (config API — the env var alone is ignored on this backend): the
    # re-exec path only cares that device_count() < n, and initializing the
    # default platform here would hang the suite whenever the tunneled TPU
    # backend is down (tests must stay green CPU-only).
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)")
    env = _clean_env()
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mesh 4x2 ok" in out.stdout
