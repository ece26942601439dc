"""Process-level JAX runtime setup shared by the CLI entry points.

- Persistent XLA compilation cache: compiles over the tunneled TPU backend
  cost 25s-200s per program; the cache makes each distinct program a
  once-per-machine cost. Opt out with TPUSEG_COMPILE_CACHE=0.
- Platform selection: ``JAX_PLATFORMS`` applied through the config API,
  which site hooks cannot override (the env var alone can be ignored when
  a hook registers a backend plugin first) — so ``JAX_PLATFORMS=cpu
  tpuseg-train ...`` works everywhere, e.g. for CPU smoke runs.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/tpuseg-xla")


def honor_platform_env() -> None:
    """Apply ``JAX_PLATFORMS`` through the config API (wins over any site
    hook), so explicit platform choices are honored on every deployment.
    Must run before first device use; no-op when the variable is unset."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass  # backends already initialized: too late, keep going


def enable(cache_dir: str | None = None) -> None:
    honor_platform_env()
    setting = os.environ.get("TPUSEG_COMPILE_CACHE", "1")
    if setting == "0":
        return
    import jax

    path = cache_dir or (setting if setting not in ("", "1") else DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags: cache is best-effort
