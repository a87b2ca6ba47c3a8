"""The renderer: owns device state, compiled steps, and the sample loop.

Fills the role of the reference's Device + DeviceRenderer + DeviceManager
single-device path (reference: src/luminary/device/device.c:1452-1555
device_start_render / continue, device_renderer.c action queues): the action
queue becomes a jitted ``render_sample`` XLA program; the continuation
callback loop becomes the host sample loop (XLA pipelines dispatches);
constant-memory dirty sync becomes re-packing the DeviceScene pytree when the
scene's dirty flags say so.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.camera import DeviceCamera, pack_camera
from ..ops.tonemap import (
    apply_crt_scanlines,
    apply_filter,
    apply_tonemap,
    dither_and_quantize,
    linear_to_srgb,
)
from ..scene.entities import TEXTURE_NONE
from ..scene.scene import DirtyFlags, Scene
from ..utils.compile_cache import enable_persistent_cache
from ..utils.log import info_message

enable_persistent_cache()
from .device_scene import (
    DeviceScene,
    pack_geometry,
    pack_lights_for,
    pack_materials,
    pack_sky,
)
from .wavefront import GBufferMeta, RenderConfig, render_sample


class AccumState(NamedTuple):
    """Per-pixel accumulators (reference: frame first/second moment buffers,
    device_utils.h:474-492)."""

    radiance: jnp.ndarray  # f32 [N,3] running sum
    lum_sq: jnp.ndarray  # f32 [N] luminance second moment sum (adaptive/variance)
    sample_count: jnp.ndarray  # i32 [N] per-pixel (adaptive sampling varies it)


@partial(jax.jit, static_argnames=("config",))
def _preview_step(scene, cam, config, pixel_x, pixel_y):
    """One sample on a strided preview grid (undersampling fast path)."""
    return render_sample(scene, cam, config, pixel_x, pixel_y, jnp.uint32(0))


@partial(jax.jit, static_argnames=("config",), donate_argnames=("accum",))
def _sample_step(
    scene: DeviceScene,
    cam: DeviceCamera,
    config: RenderConfig,
    pixel_x,
    pixel_y,
    sample_id,
    accum: AccumState,
):
    radiance, gbuffer, rays = render_sample(scene, cam, config, pixel_x, pixel_y, sample_id)
    # Firefly suppression: clamp per-sample radiance (reference exposes
    # FIREFLYC; fixed generous clamp until the setting is wired through).
    radiance = jnp.minimum(radiance, 1e6)
    lum = 0.2126 * radiance[..., 0] + 0.7152 * radiance[..., 1] + 0.0722 * radiance[..., 2]
    return (
        AccumState(
            radiance=accum.radiance + radiance,
            lum_sq=accum.lum_sq + lum * lum,
            sample_count=accum.sample_count + 1,
        ),
        gbuffer,
        rays,
    )


@partial(jax.jit, static_argnames=("config", "rounds"))
def _subset_step(
    scene: DeviceScene,
    cam: DeviceCamera,
    config: RenderConfig,
    pixel_x,
    pixel_y,
    sample_ids,
    rounds: int,
):
    """Adaptive-stage pass: `rounds` extra samples for a pixel subset, with
    per-lane QMC sample indices (each pixel continues its own sequence)."""
    s = pixel_x.shape[0]
    rad = jnp.zeros((s, 3), jnp.float32)
    lsq = jnp.zeros((s,), jnp.float32)
    for r in range(rounds):
        radiance, _, _ = render_sample(
            scene, cam, config, pixel_x, pixel_y, sample_ids + jnp.uint32(r)
        )
        radiance = jnp.minimum(radiance, 1e6)
        lum = (
            0.2126 * radiance[..., 0]
            + 0.7152 * radiance[..., 1]
            + 0.0722 * radiance[..., 2]
        )
        rad = rad + radiance
        lsq = lsq + lum * lum
    return rad, lsq


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tonemap", "filter_id", "dithering",
        "bloom", "purkinje", "color_correction", "film_grain",
        "supersampling",
    ),
)
def _generate_image(
    accum: AccumState,
    width: int,
    height: int,
    supersampling: int,
    exposure,
    tonemap: int,
    filter_id: int,
    dithering: bool,
    agx_custom,
    bloom: bool,
    bloom_blend,
    purkinje: bool,
    purkinje_kappa,
    color_correction: bool,
    correction_rgb,
    film_grain: bool,
    film_grain_strength,
):
    """GENERATE_FINAL_IMAGE + CONVERT_RGBF_TO_ARGB8 equivalent (reference:
    kernels.cuh:503-644, device_post.c): HDR post (bloom, purkinje) →
    tonemap → LDR post (color correction, filter, grain, dither)."""
    from ..ops.post import (
        apply_bloom,
        apply_color_correction,
        apply_film_grain,
        apply_purkinje,
    )

    n_pixels = width * height
    mean = accum.radiance[:n_pixels] / jnp.maximum(
        accum.sample_count[:n_pixels].astype(jnp.float32), 1.0
    )[:, None]
    img = (mean * exposure).reshape(height, width, 3)
    if supersampling > 1:
        oh, ow = height // supersampling, width // supersampling
        img = img[: oh * supersampling, : ow * supersampling].reshape(
            oh, supersampling, ow, supersampling, 3
        ).mean(axis=(1, 3))
        height, width = oh, ow
        n_pixels = oh * ow
    if bloom:
        img = apply_bloom(img, bloom_blend)
    if purkinje:
        img = apply_purkinje(img, purkinje_kappa[0], purkinje_kappa[1])
    rgb = apply_tonemap(img.reshape(-1, 3), tonemap, agx_custom)
    if color_correction:
        rgb = jnp.clip(apply_color_correction(rgb, correction_rgb), 0.0, 1.0)
    rgb = apply_filter(rgb, filter_id)
    rgb = linear_to_srgb(rgb)
    img = rgb.reshape(height, width, 3)
    if film_grain:
        img = jnp.clip(apply_film_grain(img, film_grain_strength, 0), 0.0, 1.0)
    if filter_id == 5:
        img = apply_crt_scanlines(img)
    pixel_id = jnp.arange(n_pixels, dtype=jnp.uint32).reshape(height, width)
    seed = jnp.max(accum.sample_count)
    return dither_and_quantize(img, pixel_id, seed, dithering)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cloud_layers(cloud) -> tuple:
    from ..ops.clouds import active_layer_indices

    return active_layer_indices(cloud)


class Renderer:
    """Renderer over one chip or a device mesh.

    mesh: optional jax.sharding.Mesh with a "samples" axis (and optionally
    "pixels") — samples are distributed across devices and the moment
    accumulators reduced with one psum over ICI, the TPU translation of the
    reference's multi-GPU result interface (device_result_interface.c,
    device.c:1587-1624). Each render_samples budget is rounded up to a
    multiple of the sample-axis size.
    """

    # Default trace chunk: 1M rays. The packet traversal is dispatch-bound
    # (~30 XLA ops/step at ~5 us each regardless of width), so small chunks
    # multiply the lockstep walk cost; the only reason to chunk at all is the
    # [8, 8, G] slab temporaries (~33 MB per 1M rays each).
    def __init__(self, scene: Scene, chunk: int = 1 << 20, mesh=None):
        self.scene = scene
        self.chunk = chunk
        self.mesh = mesh
        # device elasticity state (reference: device_manager.c:529-572 hot
        # enable/disable + device.h:83 DEVICE_STATE_UNAVAILABLE): the
        # original mesh device list is immutable; the live mesh is re-formed
        # over the enabled subset, and the first enabled device is the main
        # (re-election = list order).
        self._mesh_devices = (
            list(np.asarray(mesh.devices).reshape(-1)) if mesh is not None
            else None
        )
        self._device_state = (
            ["enabled"] * len(self._mesh_devices)
            if self._mesh_devices else None
        )
        self._dist_step = None
        self._dist_config = None
        self.device_scene: DeviceScene | None = None
        self.device_camera: DeviceCamera | None = None
        self.config: RenderConfig | None = None
        self.accum: AccumState | None = None
        self.gbuffer: GBufferMeta | None = None
        self._px = None
        self._py = None
        self._last_sample_time = 0.0
        self._last_rays_per_sample = 0.0
        self.update()

    # -- dirty-driven update (reference: device_manager.c:281-513) ----------

    def update(self) -> DirtyFlags:
        flags = self.scene.consume_dirty()
        if flags == DirtyFlags.NONE:
            return flags
        s = self.scene.settings

        rebuild_buffers = (
            self.config is None
            or flags & DirtyFlags.BUFFERS
            or self.config.width != s.width
            or self.config.height != s.height
        )
        if rebuild_buffers or flags & DirtyFlags.INTEGRATION:
            # Supersampling renders at ss x resolution and box-averages on
            # output (reference: structs.h supersampling + GENERATE_FINAL_IMAGE
            # SS average). Region rendering restricts the wavefront to the
            # sensor sub-rect (reference: settings.region_*).
            ss = max(int(s.supersampling), 1)
            rw_full, rh_full = s.width * ss, s.height * ss
            rx = int(np.clip(s.region_x, 0.0, 1.0) * rw_full)
            ry = int(np.clip(s.region_y, 0.0, 1.0) * rh_full)
            rw = max(int(np.clip(s.region_width, 0.0, 1.0) * rw_full), 1)
            rh = max(int(np.clip(s.region_height, 0.0, 1.0) * rh_full), 1)
            rw = min(rw, rw_full - rx)
            rh = min(rh, rh_full - ry)
            self._ss = ss
            self._region = (rx, ry, rw, rh)
            n_pixels = rw * rh
            # Choose the chunk so the padded wavefront is minimal: the lane
            # count must be a chunk multiple, and naively rounding N up to a
            # multiple of self.chunk padded 1080p (2.07M pixels) to 3.15M
            # lanes — 52% wasted work in every non-traversal stage (measured
            # round 4). Split into ceil(N/chunk) equal chunks instead.
            n_chunks = max(-(-n_pixels // max(self.chunk, 1)), 1)
            chunk = _round_up(-(-n_pixels // n_chunks), 256)
            self.config = RenderConfig(
                width=rw_full,
                height=rh_full,
                max_depth=max(int(s.max_ray_depth), 1),
                chunk=chunk,
                shading_mode=int(s.shading_mode),
                # clamped to 8: the per-candidate random sub-stream strides
                # by 8 (wavefront.py dk = depth*8 + k), so K > 8 would
                # correlate NEE samples across bounces
                ris_candidates=min(max(int(s.light_ris_candidates), 1), 8),
                use_textures=len(self.scene.textures) > 0,
                use_aux_textures=any(
                    m.roughness_tex != TEXTURE_NONE
                    or m.metallic_tex != TEXTURE_NONE
                    or m.normal_tex != TEXTURE_NONE
                    or m.luminance_tex != TEXTURE_NONE
                    for m in self.scene.materials
                ),
                # HDRI mode folds the cloud layers into the baked env map
                # (pack_sky), so the per-sample march is skipped.
                use_clouds=bool(
                    _cloud_layers(self.scene.cloud)
                    and int(self.scene.sky.mode) != 1
                ),
                cloud_steps=min(max(int(self.scene.cloud.steps) // 2, 8), 64),
                cloud_layers=_cloud_layers(self.scene.cloud),
                use_bridges=bool(self.scene.fog.active),
                bridge_vertices=min(max(int(s.bridge_max_num_vertices), 1), 4),
                use_physical_camera=bool(self.scene.camera.use_physical_camera),
                # Env NEE: HDRI skies only, matching the reference's
                # ambient gate (direct_lighting.cuh:279 disallows ambient
                # NEE for SKY_MODE_DEFAULT — the procedural atmosphere is
                # smooth once the solar disc is excluded, so importance
                # sampling it buys no variance and costs a third shadow
                # segment per vertex). Constant-color skies are uniform
                # (cosine BSDF sampling is already exact), so they skip it
                # too. Clouds land on the miss side only, so an HDRI under
                # a cloud march keeps NEE off (MIS pairing against an
                # un-clouded NEE estimate would bias).
                env_nee=bool(
                    getattr(s, "ambient_nee", True)
                    and int(self.scene.sky.mode) == 1
                ),
                spectral=bool(getattr(s, "spectral_rendering", False)),
                blue_noise=bool(getattr(s, "blue_noise", True)),
                aerial=bool(
                    getattr(s, "aerial_perspective", True)
                    and int(self.scene.sky.mode) == 0
                ),
                sun_ris=bool(getattr(s, 'sun_ris', True)
                             and int(self.scene.sky.mode) != 2),
                # caustics: 1/4 of the entity's RIS count — our candidates
                # each pay 5 FBM evaluations, the reference's are cheaper
                ocean_caustics=bool(
                    self.scene.ocean.active
                    and getattr(self.scene.ocean, "caustics_active", False)
                    and int(self.scene.sky.mode) != 2
                ),
                caustics_k=min(max(int(getattr(
                    self.scene.ocean, "caustics_ris_sample_count", 32))
                    // 4, 2), 32),
                ocean_mat_id=(len(self.scene.materials)
                              if self.scene.ocean.active else -1),
                analytic_ocean=bool(
                    self.scene.ocean.active
                    and not getattr(self.scene.ocean, "tessellated", False)
                ),
                # water in-scattering (reference volume.cuh ocean medium):
                # always on with the ocean — Jerlov scattering is small but
                # physical (underwater light shafts, haze)
                water_scatter=bool(self.scene.ocean.active),
                use_particles=bool(
                    self.scene.particles.active
                    and int(self.scene.particles.count) > 0
                ),
                particle_diameter=float(self.scene.particles.phase_diameter),
                particle_mat_id=(
                    len(self.scene.materials)
                    + (1 if self.scene.ocean.active else 0)
                    if self.scene.particles.active else -1
                ),
            )
            n_pad = chunk * n_chunks
            idx = np.arange(n_pad, dtype=np.uint32)
            idx = np.minimum(idx, n_pixels - 1)  # padded lanes re-trace pixel N-1
            self._px, self._py = jax.device_put(
                (
                    (rx + idx % rw).astype(np.int32),
                    (ry + idx // rw).astype(np.int32),
                )
            )

        # Ocean follow (tessellated opt-in only — the analytic tier needs no
        # recentering): the grid is centered on the camera at pack time
        # (ops/procedural.generate_ocean_mesh, ±200 world units); fly past
        # half that margin and the geometry must re-tessellate or the ocean
        # silently ends.
        if (self.scene.ocean.active
                and getattr(self.scene.ocean, "tessellated", False)
                and self.device_scene is not None):
            cx, cz = float(self.scene.camera.pos[0]), float(self.scene.camera.pos[2])
            ox, oz = getattr(self, "_ocean_center", (cx, cz))
            if max(abs(cx - ox), abs(cz - oz)) > 100.0:
                flags |= DirtyFlags.MESHES

        if self.device_scene is None or flags & (
            DirtyFlags.MESHES | DirtyFlags.INSTANCES
        ):
            # INSTANCE-only edits REFIT the cached tree topology instead of
            # rebuilding (reference: IAS update + GAS cache, optix_bvh.c)
            sig = tuple(
                (i.id, i.mesh_id)
                for i in self.scene.instances
                if i.active and i.mesh_id < len(self.scene.meshes)
            )
            topo = None
            if (
                self.device_scene is not None
                and not (flags & DirtyFlags.MESHES)
                and getattr(self, "_bvh_topo", None) is not None
                and getattr(self, "_topo_sig", None) == sig
            ):
                topo = self._bvh_topo
            geo = pack_geometry(self.scene, topo=topo)
            self._bvh_topo = getattr(pack_geometry, "last_wide", None)
            self._topo_sig = sig
            self._ocean_center = (
                float(self.scene.camera.pos[0]),
                float(self.scene.camera.pos[2]),
            )
        else:
            geo = self.device_scene.geo
        # Wavefront sorting (tasks_sort analog) is OFF by default: measured
        # on-chip at 1080p/127k tris it costs ~260 ms/sample and the capped
        # trace chunk already bounds the lockstep tail it was meant to cut.
        # settings.wavefront_sorting forces it on for sort-friendly loads.
        want_sort = bool(getattr(s, "wavefront_sorting", False))
        if self.config.sort_wavefront != want_sort:
            self.config = self.config._replace(sort_wavefront=want_sort)
        if self.device_scene is None or flags & DirtyFlags.MATERIALS:
            materials = pack_materials(self.scene)
        else:
            materials = self.device_scene.materials
        if self.device_scene is None or flags & (DirtyFlags.SKY_LUT | DirtyFlags.HDRI):
            sky = pack_sky(self.scene)
        else:
            sky = self.device_scene.sky
        if self.device_scene is None or flags & (
            DirtyFlags.LIGHT_TREE | DirtyFlags.MESHES | DirtyFlags.INSTANCES | DirtyFlags.MATERIALS
        ):
            lights = pack_lights_for(geo, materials, scene=self.scene)
        else:
            lights = self.device_scene.lights
        # K RIS candidates beyond the emitter count are pure waste (drawing
        # the same light repeatedly); clamp statically at pack time. Also
        # clamped to 8: the per-candidate random sub-stream strides by 8
        # (wavefront.py dk = depth*8 + k) — more would collide with the
        # next depth's streams and correlate NEE across bounces.
        k_eff = max(
            min(max(int(s.light_ris_candidates), 1), 8,
                max(int(lights.num_lights), 1)),
            1,
        )
        if self.config.ris_candidates != k_eff:
            self.config = self.config._replace(ris_candidates=k_eff)
        from ..ops.clouds import pack_clouds
        from ..ops.textures import pack_textures
        from ..ops.volume import pack_fog, pack_water

        if self.device_scene is None or flags & DirtyFlags.TEXTURES:
            textures = pack_textures(self.scene.textures)
        else:
            textures = self.device_scene.textures
        if self.device_scene is None or flags & DirtyFlags.PARTICLES:
            from .device_scene import pack_particles_device

            dev_particles = pack_particles_device(self.scene.particles)
        else:
            dev_particles = self.device_scene.particles
        from ..utils.fastput import fast_device_put

        if self.device_scene is None or flags & (
            DirtyFlags.MESHES | DirtyFlags.INSTANCES | DirtyFlags.MATERIALS
            | DirtyFlags.LIGHT_TREE
        ):
            from .device_scene import pack_light_slot_rows, pack_shade_packed

            from ..ops.textures import page_resolutions

            shade_hot, shade_aux, shade_micro = pack_shade_packed(
                geo, materials, lights,
                tex_res=page_resolutions(self.scene.textures))
            light_slot_rows = pack_light_slot_rows(geo, materials, lights)
        else:
            shade_hot = self.device_scene.shade_hot
            shade_aux = self.device_scene.shade_aux
            shade_micro = self.device_scene.shade_micro
            light_slot_rows = self.device_scene.light_slot_rows
        self.device_scene = fast_device_put(
            DeviceScene(
                geo=geo, materials=materials, sky=sky, lights=lights,
                fog=pack_fog(self.scene.fog),
                water=pack_water(self.scene.ocean),
                textures=textures,
                clouds=pack_clouds(self.scene.cloud),
                shade_hot=shade_hot,
                shade_aux=shade_aux,
                shade_micro=shade_micro,
                light_slot_rows=light_slot_rows,
                particles=dev_particles,
            )
        )
        self.device_camera = pack_camera(self.scene.camera)

        if flags & (DirtyFlags.INTEGRATION | DirtyFlags.BUFFERS) or self.accum is None:
            self.start_new_render()
        return flags

    def start_new_render(self):
        """Reset accumulation (reference: luminary_host_start_new_render)."""
        n_pad = int(self._px.shape[0])
        self.accum = AccumState(
            radiance=jnp.zeros((n_pad, 3), jnp.float32),
            lum_sq=jnp.zeros((n_pad,), jnp.float32),
            sample_count=jnp.zeros((n_pad,), jnp.int32),
        )

    # -- checkpoint / resume -------------------------------------------------
    # The reference has NO checkpointing: progressive state lives only in
    # GPU accumulators and dies with the process (SURVEY §5). Long offline
    # TPU renders want resumability, so the moment accumulators + per-pixel
    # sample counts serialize to one npz; sample ids derive from
    # sample_count, so restoring the accumulators also restores the QMC
    # stream position — a resumed render is bit-identical to an unbroken
    # one.

    def _checkpoint_fingerprint(self) -> np.ndarray:
        c = self.config
        rx, ry, rw, rh = self._region
        return np.asarray(
            [c.width, c.height, c.max_depth, self._ss, rx, ry, rw, rh,
             int(self._px.shape[0])], np.int64)

    def save_checkpoint(self, path: str):
        """Serialize render progress (accumulators + config fingerprint)."""
        np.savez_compressed(
            path,
            radiance=np.asarray(self.accum.radiance),
            lum_sq=np.asarray(self.accum.lum_sq),
            sample_count=np.asarray(self.accum.sample_count),
            fingerprint=self._checkpoint_fingerprint(),
        )

    def load_checkpoint(self, path: str):
        """Resume from save_checkpoint output. Raises ValueError when the
        checkpoint's resolution/region/depth fingerprint does not match the
        current configuration (the accumulators would be meaningless)."""
        with np.load(path) as z:
            fp = z["fingerprint"]
            want = self._checkpoint_fingerprint()
            if fp.shape != want.shape or not (fp == want).all():
                raise ValueError(
                    "checkpoint fingerprint mismatch: saved "
                    f"{fp.tolist()} vs current {want.tolist()}")
            self.accum = AccumState(
                radiance=jnp.asarray(z["radiance"]),
                lum_sq=jnp.asarray(z["lum_sq"]),
                sample_count=jnp.asarray(z["sample_count"]),
            )

    # -- device elasticity (reference: device_manager.c:529-572 hot device
    # enable/disable with main re-election; failure detection analog of
    # DEVICE_STATE_UNAVAILABLE, device.h:83) ---------------------------------

    def set_device_enable(self, device_id: int, enable: bool):
        """Hot-enable/disable a mesh device (reference:
        luminary_host_set_device_enable, host.h:36 →
        _device_manager_enable_device_queue_work). Re-forms the mesh over
        the enabled subset (first enabled device is the main — re-election)
        and restarts accumulation, matching the reference's INTEGRATION
        dirty + render restart."""
        from ..utils.errors import InvalidAPIArgumentError

        if self._mesh_devices is None:
            raise InvalidAPIArgumentError(
                "set_device_enable requires a mesh renderer")
        if not 0 <= device_id < len(self._mesh_devices):
            raise InvalidAPIArgumentError(
                f"device id {device_id} out of range")
        state = self._device_state[device_id]
        if state == "unavailable" and enable:
            raise InvalidAPIArgumentError(
                "Tried to enable an unavailable device.")
        new_state = "enabled" if enable else "disabled"
        if state == new_state:
            return
        self._device_state[device_id] = new_state
        self._reform_mesh()

    def device_states(self) -> list:
        return list(self._device_state or [])

    def _reform_mesh(self):
        """Rebuild the live mesh over enabled devices + restart the render."""
        from ..parallel.mesh import make_sample_mesh

        enabled = [d for d, s in zip(self._mesh_devices, self._device_state)
                   if s == "enabled"]
        if not enabled:
            raise RuntimeError("no devices left enabled")
        self.mesh = make_sample_mesh(enabled)
        self._dist_step = None  # the step is specialized per mesh
        self._dist_config = None
        if self._px is not None:
            self.start_new_render()

    def _probe_mesh_devices(self) -> list:
        """Which mesh devices still respond (tiny computation per device)."""
        alive = []
        for d, s in zip(self._mesh_devices, self._device_state):
            if s != "enabled":
                continue
            try:
                x = jax.device_put(jnp.ones((8,), jnp.float32), d)
                jax.block_until_ready(x + 1.0)
                alive.append(d)
            except Exception:
                pass
        return alive

    def _recover_dead_devices(self) -> bool:
        """Mark non-responding devices unavailable and re-form. Returns True
        if any device was dropped (the render restarts on the new mesh)."""
        alive = set(id(a) for a in self._probe_mesh_devices())
        dropped = False
        for i, (d, s) in enumerate(
                zip(self._mesh_devices, self._device_state)):
            if s == "enabled" and id(d) not in alive:
                self._device_state[i] = "unavailable"
                dropped = True
        if dropped:
            self._reform_mesh()
        return dropped

    # -- undersampling preview (reference: kernels.cuh:19-43 undersampling
    # checkerboard + device.c undersampling state machine) -------------------

    def render_preview(self, level: int):
        """Trace one sample on a 2^level-strided pixel grid and store it as
        the preview buffer; get_image upscales it while sample_count == 0.
        Gives sub-second first frames for interactive use."""
        self.update()
        level = max(int(level), 1)
        rx, ry, rw, rh = self._region
        step = 1 << level
        pw, ph = max(rw // step, 1), max(rh // step, 1)
        ux = (np.arange(pw * ph, dtype=np.int64) % pw) * step + step // 2
        uy = (np.arange(pw * ph, dtype=np.int64) // pw) * step + step // 2
        px = jnp.asarray((rx + np.minimum(ux, rw - 1)).astype(np.int32))
        py = jnp.asarray((ry + np.minimum(uy, rh - 1)).astype(np.int32))
        radiance, _, _ = _preview_step(
            self.device_scene, self.device_camera, self.config, px, py
        )
        self._preview = (level, pw, ph, np.asarray(radiance))

    def _preview_image_accum(self):
        """Upscaled preview radiance as a 1-sample AccumState."""
        level, pw, ph, rad = self._preview
        _, _, rw, rh = self._region
        img = rad.reshape(ph, pw, 3)
        img = np.repeat(np.repeat(img, 1 << level, axis=0), 1 << level, axis=1)
        img = img[:rh, :rw]
        # pad if the strided grid under-covers the edge
        if img.shape[0] < rh or img.shape[1] < rw:
            img = np.pad(
                img,
                ((0, rh - img.shape[0]), (0, rw - img.shape[1]), (0, 0)),
                mode="edge",
            )
        n_pad = int(self._px.shape[0])
        flat = np.zeros((n_pad, 3), np.float32)
        flat[: rw * rh] = img.reshape(-1, 3)
        return AccumState(
            radiance=jnp.asarray(flat),
            lum_sq=jnp.zeros((n_pad,), jnp.float32),
            sample_count=jnp.ones((n_pad,), jnp.int32),
        )

    # -- sample loop --------------------------------------------------------

    @property
    def sample_count(self) -> int:
        """Effective (minimum completed) samples per pixel. 0 before the
        first update() (the async worker may poll between construction and
        the first render step)."""
        if getattr(self, "_region", None) is None or self.accum is None:
            return 0
        _, _, rw, rh = self._region
        return int(jnp.min(self.accum.sample_count[: rw * rh]))

    def render_samples(self, num_samples: int):
        """Advance accumulation by a budget of num_samples full-frame
        samples (blocking). With adaptive sampling enabled, part of the
        budget is redirected to high-variance 4x4 blocks (reference:
        device_adaptive_sampler.c stage allocation)."""
        self.update()
        t0 = time.monotonic()
        s = self.scene.settings
        if self.mesh is not None and self.mesh.size > 1:
            self._render_mesh(num_samples)
        elif s.enable_adaptive_sampling:
            self._render_adaptive(num_samples)
        else:
            start = self.sample_count
            for i in range(start, start + num_samples):
                self.accum, self.gbuffer, rays = _sample_step(
                    self.device_scene,
                    self.device_camera,
                    self.config,
                    self._px,
                    self._py,
                    jnp.uint32(i),
                    self.accum,
                )
            self._last_rays_per_sample = float(rays)
        jax.block_until_ready(self.accum.radiance)
        self._last_sample_time = (time.monotonic() - t0) / max(num_samples, 1)

    def _render_mesh(self, num_samples: int):
        """Distribute whole samples across the mesh's "samples" axis and
        reduce moments with a psum (reference result-interface equivalent)."""
        from ..parallel.mesh import distributed_sample_step, shard_pixels

        if self._dist_step is None or self._dist_config != self.config:
            self._dist_step, self._n_axis = distributed_sample_step(
                self.mesh, self.config
            )
            self._dist_config = self.config
        n_axis = self._n_axis
        rad = self.accum.radiance
        lsq = self.accum.lum_sq
        px, py, rad, lsq = shard_pixels(self.mesh, self._px, self._py, rad, lsq)
        count = self.accum.sample_count
        base = self.sample_count
        steps = max((num_samples + n_axis - 1) // n_axis, 1)
        try:
            for k in range(steps):
                rad, lsq, gbuf, rays = self._dist_step(
                    self.device_scene, self.device_camera, px, py,
                    rad, lsq, jnp.uint32(base + k * n_axis),
                )
                count = count + n_axis
            jax.block_until_ready(rad)
        except Exception:
            # failure detection + elastic recovery (reference: device
            # errors → DEVICE_STATE_UNAVAILABLE + render restart): probe
            # the mesh, drop dead devices, restart the budget on the
            # re-formed mesh. A failure with all devices alive is a real
            # error and propagates.
            if not self._mesh_devices or not self._recover_dead_devices():
                raise
            self.render_samples(num_samples)
            return
        # main device = first enabled mesh device (re-election by order)
        dev0 = (np.asarray(self.mesh.devices).reshape(-1)[0]
                if self.mesh is not None else jax.devices()[0])
        self.accum = AccumState(
            radiance=jax.device_put(rad, dev0),
            lum_sq=jax.device_put(lsq, dev0),
            sample_count=count,
        )
        # picking + ray accounting parity with the single-chip path
        self.gbuffer = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, dev0), gbuf)
        self._last_rays_per_sample = float(rays) / n_axis

    def _render_adaptive(self, num_samples: int):
        from .adaptive import (
            allocate_stage_tasks,
            block_error_map,
            scatter_add_stage,
        )

        s = self.scene.settings
        _, _, rw, rh = self._region
        n_pixels = rw * rh
        lane_budget = num_samples * n_pixels
        interval = max(int(s.adaptive_sampling_update_interval) // 8, 2)

        # Stage 0: uniform coverage until every pixel has a baseline.
        base = max(int(s.adaptive_sampling_avg_sampling_rate), 2)
        while self.sample_count < base and lane_budget > 0:
            i = self.sample_count
            self.accum, self.gbuffer, rays = _sample_step(
                self.device_scene, self.device_camera, self.config,
                self._px, self._py, jnp.uint32(i), self.accum,
            )
            self._last_rays_per_sample = float(rays)
            lane_budget -= n_pixels

        n_pad = int(self._px.shape[0])
        chunk = self.config.chunk or 65536
        # subset strictly smaller than the frame so allocation is selective
        subset = min(n_pad, chunk) if n_pad > chunk else max(n_pad // 4, 16)
        avg_rate = max(int(s.adaptive_sampling_avg_sampling_rate), 1)
        max_rate = max(int(s.adaptive_sampling_max_sampling_rate), avg_rate)
        rx0, ry0 = self._region[0], self._region[1]
        while lane_budget > 0:
            err = np.asarray(
                block_error_map(
                    self.accum.radiance, self.accum.lum_sq,
                    self.accum.sample_count,
                    rw, rh,
                    bool(s.adaptive_sampling_exposure_aware),
                    jnp.float32(self.scene.camera.exposure),
                )
            )
            rounds = min(interval, max(lane_budget // subset, 1))
            # proportional per-block counts (reference: compute_stage_sample
            # _counts — count ∝ err/avg_err, clamped [1, max_rate]); the
            # returned task list is the prefix-sum task generation analog
            pix_all, rank_all = allocate_stage_tasks(
                err, rw, rh, avg_rate, max_rate,
                budget_tasks=max(lane_budget // rounds, subset),
            )
            if pix_all is None:
                break
            counts0 = np.asarray(self.accum.sample_count)
            total = pix_all.size
            n_slices = max((total + subset - 1) // subset, 1)
            # pad the task list to a whole number of fixed-size wavefronts
            # by wrapping — wrapped entries continue their pixel's rank
            # sequence so no sample id repeats within the stage
            pad_n = n_slices * subset - total
            if pad_n:
                max_rank = int(rank_all.max()) + 1
                wraps = (pad_n + total - 1) // total
                pads_p, pads_r = [], []
                for j in range(1, wraps + 1):
                    pads_p.append(pix_all)
                    pads_r.append(rank_all + j * max_rank)
                pix_all = np.concatenate([pix_all] + pads_p)[: n_slices * subset]
                rank_all = np.concatenate([rank_all] + pads_r)[: n_slices * subset]
            for sl in range(n_slices):
                if lane_budget <= 0:
                    break
                pix_s = pix_all[sl * subset:(sl + 1) * subset]
                rank_s = rank_all[sl * subset:(sl + 1) * subset]
                sample_ids = jnp.asarray(
                    counts0[pix_s].astype(np.uint32)
                    + rank_s.astype(np.uint32) * rounds
                )
                idx = jnp.asarray(pix_s.astype(np.int32))
                px = jnp.asarray((rx0 + pix_s % rw).astype(np.int32))
                py = jnp.asarray((ry0 + pix_s // rw).astype(np.int32))
                rad, lsq = _subset_step(
                    self.device_scene, self.device_camera, self.config,
                    px, py, sample_ids, rounds,
                )
                r0, l0, c0 = scatter_add_stage(
                    self.accum.radiance, self.accum.lum_sq,
                    self.accum.sample_count,
                    idx, rad, lsq, jnp.full((subset,), rounds, jnp.int32),
                )
                self.accum = AccumState(radiance=r0, lum_sq=l0, sample_count=c0)
                lane_budget -= subset * rounds

    @property
    def current_sample_time(self) -> float:
        """Seconds per sample (reference: luminary_host_get_current_sample_time)."""
        return self._last_sample_time

    # -- output -------------------------------------------------------------

    def get_image(self) -> np.ndarray:
        """uint8 [H, W, 3] final image (or an adaptive-sampling inspection
        view when settings.adaptive_sampling_output_mode != BEAUTY;
        reference: structs.h AdaptiveSamplingOutputMode,
        adaptive_sampling.cuh debug outputs)."""
        mode = int(self.scene.settings.adaptive_sampling_output_mode)
        if mode != 0:
            return self._debug_output_image(mode)
        cam = self.scene.camera
        rx, ry, rw, rh = self._region
        accum = self.accum
        if self.sample_count == 0 and getattr(self, "_preview", None) is not None:
            accum = self._preview_image_accum()
        img = _generate_image(
            accum,
            rw,
            rh,
            self._ss,
            jnp.float32(cam.exposure),
            int(cam.tonemap),
            int(cam.filter),
            bool(cam.dithering),
            jnp.asarray(
                [cam.agx_custom_slope, cam.agx_custom_power, cam.agx_custom_saturation],
                jnp.float32,
            ),
            bool(cam.bloom_blend > 0.0),
            jnp.float32(cam.bloom_blend),
            bool(cam.purkinje),
            jnp.asarray([cam.purkinje_kappa1, cam.purkinje_kappa2], jnp.float32),
            bool(cam.use_color_correction),
            jnp.asarray(cam.color_correction, jnp.float32),
            bool(cam.film_grain > 0.0),
            jnp.float32(cam.film_grain),
        )
        return np.asarray(img)

    def _debug_output_image(self, mode: int) -> np.ndarray:
        """VARIANCE / ERROR / SAMPLE_DISTRIBUTION inspection images
        (uint8 heatmaps; reference AdaptiveSamplingOutputMode semantics)."""
        _, _, rw, rh = self._region
        n = rw * rh
        cnt = np.maximum(np.asarray(self.accum.sample_count[:n], np.float64), 1.0)
        if mode == 3:  # SAMPLE_DISTRIBUTION
            field = np.asarray(self.accum.sample_count[:n], np.float64)
        else:
            rad = np.asarray(self.accum.radiance[:n], np.float64)
            lum = (
                0.2126 * rad[:, 0] + 0.7152 * rad[:, 1] + 0.0722 * rad[:, 2]
            ) / cnt
            e2 = np.asarray(self.accum.lum_sq[:n], np.float64) / cnt
            var = np.maximum(e2 - lum * lum, 0.0)
            if mode == 1:  # VARIANCE
                field = var
            else:  # ERROR: exposure-aware relative std error of the mean
                field = np.sqrt(var / cnt) / (lum + 0.1)
        field = field.reshape(rh, rw)
        hi = np.percentile(field, 99.0) or 1.0
        t = np.clip(field / max(hi, 1e-12), 0.0, 1.0)
        # blue → red heatmap, green bump at mid-range for contrast
        img = np.stack([t, 2.0 * t * (1.0 - t), 1.0 - t], -1)
        out = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if self._ss > 1:
            out = out[:: self._ss, :: self._ss]
        return out

    def get_radiance(self) -> np.ndarray:
        """float32 [H, W, 3] linear mean radiance (for comparison metrics)."""
        rx, ry, rw, rh = self._region
        n = rw * rh
        mean = self.accum.radiance[:n] / jnp.maximum(
            self.accum.sample_count[:n].astype(jnp.float32), 1.0
        )[:, None]
        return np.asarray(mean).reshape(rh, rw, 3)

    def get_pixel_info(self, x: int, y: int):
        """Interactive picking (reference: luminary_host_get_pixel_info,
        host.c:997-1016). Returns dict or None before first sample."""
        if self.gbuffer is None:
            return None
        rx, ry, rw, rh = self._region
        idx = (y * self._ss - ry) * rw + (x * self._ss - rx)
        if not 0 <= idx < rw * rh:
            return None
        depth = float(self.gbuffer.depth[idx])
        return {
            "pixel_query_is_valid": bool(self.gbuffer.instance_id[idx] >= 0),
            "instance_id": int(self.gbuffer.instance_id[idx]),
            "material_id": int(self.gbuffer.material_id[idx]),
            "depth": depth,
            "rel_hit_pos": tuple(np.asarray(self.gbuffer.rel_hit_pos[idx])),
        }
