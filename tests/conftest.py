"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of a fake backend (SURVEY.md §4): pmap/pjit
collectives and GSPMD shardings execute for real on 8 host-platform devices,
so multi-chip code paths are covered without TPU hardware. Must run before
jax initializes its backends, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's site hook re-pins JAX_PLATFORMS to the real chip; the
# config API wins over the env var, so force CPU through it as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Suite time is dominated by XLA compiles of the same programs on every run;
# the persistent cache (keyed by platform+topology, so CPU-mesh entries never
# collide with real-chip ones) makes them a once-per-machine cost.
# TPUSEG_COMPILE_CACHE=0 opts out.
from tpuseg.utils import compile_cache  # noqa: E402

compile_cache.enable()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
