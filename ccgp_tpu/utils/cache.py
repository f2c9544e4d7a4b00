"""Persistent XLA compilation cache.

The reference has no compilation step at all; here every sweep variant
costs a fresh XLA compile (measured ~160 s for the 24-lane 1-D study,
RESULTS.md) unless cached. Enabling the JAX persistent cache makes repeat
invocations — across processes — pay only the steady-state run time.
"""
from __future__ import annotations

from pathlib import Path


def enable_persistent_cache(path: str | Path | None = None) -> Path:
    """Point JAX's persistent compilation cache at `path` (default:
    `<repo>/.jax_cache`). Must be called before the first compilation;
    safe to call more than once. Returns the cache directory."""
    import jax

    if path is None:
        path = Path(__file__).resolve().parents[2] / ".jax_cache"
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache every entry, no matter how small/fast
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
