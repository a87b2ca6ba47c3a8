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

    # TPU-class backends only: the cache exists to amortize the 20-40 s
    # wavefront compiles across renderer processes. On XLA:CPU the
    # serialize/deserialize path has crashed twice in CI (segfaults inside
    # put/get_executable_and_time on the largest executables, plus AOT
    # results are not portable across CPU microarchitectures), and CPU
    # compiles are cheap — so skip it there.
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            _enabled = True
            return
    except Exception:
        pass

    if cache_dir is None:
        cache_dir = os.environ.get(
            "LUMINARY_JAX_CACHE",
            os.path.expanduser("~/.cache/luminary_tpu/jax"),
        )
        # Key the cache by the host's CPU feature set: XLA:CPU AOT
        # executables are not portable across microarchitectures, and jax's
        # cache key does not include them — loading an entry compiled on a
        # different machine SIGILL/segfaults (observed in CI when the cache
        # directory outlives the machine image).
        try:
            import hashlib

            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        fp = hashlib.sha1(line.encode()).hexdigest()[:10]
                        cache_dir = os.path.join(cache_dir, fp)
                        break
        except OSError:
            pass
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
