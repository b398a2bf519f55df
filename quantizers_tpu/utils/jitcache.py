"""Persistent XLA compilation cache setup.

Through the tunneled axon backend every first-seen program pays a 1-40 s
remote compile (memory: axon-tpu-quirks); the round-4 driver bench lost
~8.5 minutes to compiles before the first timed step. JAX's persistent
compilation cache works through the tunnel (verified: 3.5 s -> 0.1 s for a
fused matmul program across processes), so every bench/CLI entry point
calls :func:`enable_persistent_cache` to key compiled executables on disk.

Cache location: ``$QTPU_JIT_CACHE`` if set (``0``/``off`` disables), else
``<repo-root>/.jax_cache``. Entries are keyed by program hash + jax
version + backend fingerprint, so stale entries are never served; the dir
is gitignored (build artifact, not source).
"""

from __future__ import annotations

import os

_DONE = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently enable the on-disk compilation cache; returns the dir
    (None if disabled). Must run before the first compilation to catch it,
    but is safe to call at any time."""
    global _DONE
    env = os.environ.get("QTPU_JIT_CACHE")
    if env is not None and env.lower() in ("0", "off", "none", ""):
        return None
    if _DONE:
        return env or _default_dir()
    import jax

    cache_dir = path or env or _default_dir()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # catch the many small relayout/build programs too — through the
        # tunnel even a 1 s compile is worth caching
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.4)
    except Exception:
        return None
    _DONE = True
    return cache_dir


def _default_dir() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, ".jax_cache")
