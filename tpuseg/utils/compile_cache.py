"""Persistent XLA compilation cache.

Compiles over the tunneled TPU backend cost 25s-200s per program; the
persistent cache makes each distinct program a once-per-machine cost.
Enabled by every CLI entry point; opt out with TPUSEG_COMPILE_CACHE=0.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/tpuseg-xla")


def enable(cache_dir: str | None = None) -> None:
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
