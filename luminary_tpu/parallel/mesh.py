"""Multi-chip sample distribution over a device mesh.

The reference distributes whole samples across up to 4 GPUs and reduces the
per-device moment accumulators through shared pinned staging + a BUFFER_ADD
kernel on the main GPU (reference: src/luminary/device/device_result_interface.c,
device.c:1587-1624). The TPU equivalent is radically simpler: shard the sample
axis over a ``jax.sharding.Mesh``, render one sample per device per step, and
``psum`` the moment buffers over ICI — the staging/event machinery becomes one
collective.

Two parallel axes are modeled (reference §2g only has the first):
  * ``samples``: each device renders the full frame at different sample ids
    (throughput scaling, the reference's strategy);
  * ``pixels``: the wavefront itself is sharded (memory scaling for >4K
    frames) — pixel rows split across devices, no collective needed until
    output gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.wavefront import RenderConfig, render_sample


def make_sample_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("samples",))


def make_grid_mesh(n_samples: int, n_pixels: int, devices=None) -> Mesh:
    """2D mesh: sample replication × pixel sharding."""
    devices = devices if devices is not None else jax.devices()
    grid = np.asarray(devices).reshape(n_samples, n_pixels)
    return Mesh(grid, ("samples", "pixels"))


def distributed_sample_step(mesh: Mesh, config: RenderConfig):
    """Build a jitted multi-chip accumulation step.

    Returned fn(scene, cam, px, py, radiance_accum, lum_sq_accum, sample_base)
    advances the accumulators by ``mesh.shape['samples']`` samples in one step.
    Scene/camera/pixels/accumulators are replicated over the sample axis; if a
    ``pixels`` axis exists, the pixel wavefront and accumulators are sharded
    over it.
    """
    has_pixel_axis = "pixels" in mesh.axis_names
    pix_spec = P("pixels") if has_pixel_axis else P()
    n_samples_axis = mesh.shape["samples"]

    def body(scene, cam, px, py, rad_accum, lum_accum, sample_base):
        sid = sample_base + jax.lax.axis_index("samples").astype(jnp.uint32)
        radiance, gbuf, rays = render_sample(scene, cam, config, px, py, sid)
        radiance = jnp.minimum(radiance, 1e6)
        lum = (
            0.2126 * radiance[..., 0]
            + 0.7152 * radiance[..., 1]
            + 0.0722 * radiance[..., 2]
        )
        # The reference's result-interface gather ⇒ one psum over ICI.
        total = jax.lax.psum(radiance, "samples")
        total_lum_sq = jax.lax.psum(lum * lum, "samples")
        # gbuffer: the sample-axis-0 device's primary hits (picking data —
        # any sample's jittered gbuffer serves, reference takes the last)
        first = (jax.lax.axis_index("samples") == 0).astype(jnp.float32)
        gbuf = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(
                x * first.astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else jnp.where(first > 0, x, jnp.zeros_like(x)),
                "samples",
            ),
            gbuf,
        )
        rays_total = jax.lax.psum(rays, "samples")
        return rad_accum + total, lum_accum + total_lum_sq, gbuf, rays_total

    shmap = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), pix_spec, pix_spec, pix_spec, pix_spec, P()),
        out_specs=(pix_spec, pix_spec, pix_spec, P()),
        check_vma=False,
    )
    return jax.jit(shmap, donate_argnums=(4, 5)), n_samples_axis


def shard_pixels(mesh: Mesh, *arrays):
    """Place pixel-axis arrays with the pixel sharding of the mesh."""
    if "pixels" not in mesh.axis_names:
        return arrays
    sharding = NamedSharding(mesh, P("pixels"))
    return tuple(jax.device_put(a, sharding) for a in arrays)
