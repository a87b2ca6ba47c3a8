"""Persistent XLA compilation cache.

The reference ships pre-compiled CUBINs per SM architecture
(reference: src/luminary/device/device_library.c — embedded CUBIN loaded via
cuLibraryLoadData); the JAX equivalent is the persistent compilation cache:
the first render of a (resolution, depth, feature-set) configuration pays the
XLA compile (~20-40 s for the full wavefront program), every later process
reuses the cached executable from disk.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Idempotently turn on JAX's on-disk compilation cache."""
    global _enabled
    if _enabled:
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "LUMINARY_JAX_CACHE",
            os.path.expanduser("~/.cache/luminary_tpu/jax"),
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Renderer programs are large and slow to build; cache everything
        # that takes more than a second.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization; never fail the render
        pass
    _enabled = True
