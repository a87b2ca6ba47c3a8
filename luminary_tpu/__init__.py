"""Luminary-TPU: a TPU-native path-tracing renderer in JAX/XLA/Pallas.

A from-scratch rebuild of the capabilities of MilchRatchet/Luminary (a
CUDA/OptiX wavefront path tracer) designed for TPU hardware: dense SoA ray
wavefronts over XLA, Pallas kernels for the hot traversal/shading ops, and
multi-chip sample distribution over ICI via ``jax.sharding``.

Public API: the :class:`Host` class mirrors the reference's ``luminary_host_*``
C API (reference: include/luminary/host.h:29-129).
"""

__version__ = "0.1.0"

from .scene import (  # noqa: F401
    Camera,
    Cloud,
    CloudLayer,
    DirtyFlags,
    Filter,
    Fog,
    Instance,
    JerlovWaterType,
    Material,
    Mesh,
    Ocean,
    Particles,
    RendererSettings,
    Scene,
    ShadingMode,
    Sky,
    SkyMode,
    Texture,
    ToneMap,
)
from .utils.errors import LuminaryError  # noqa: F401


def __getattr__(name):
    # Lazy import of the host (pulls in jax) so scene/io stay importable in
    # light-weight contexts.
    if name == "Host":
        from .host.host import Host

        return Host
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
