"""Persistent XLA compilation cache setup.

The double-float transform graphs are large; first compiles take tens of
seconds.  Every pipeline entry point calls :func:`ensure_cache` before its
first jit so compiles are shared across processes and sessions.
"""

from __future__ import annotations

import os

_done = False


def ensure_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    path = os.environ.get(
        "TINYIMGCODEC_XLA_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "tinyimgcodec_tpu",
            "xla-cache",
        ),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (RuntimeError, OSError):
        pass  # already configured or read-only fs: non-fatal
