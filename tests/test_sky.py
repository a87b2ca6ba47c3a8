"""Physical atmosphere tests (reference functionality: cuda/sky.cuh LUTs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminary_tpu.ops.atmosphere import (
    AtmoParams,
    ATMO_HEIGHT,
    atmo_params_from_sky,
    bake_sky_envmap,
    build_multiscatter_lut,
    build_transmittance_lut,
    sample_envmap,
    sample_transmittance_lut,
)
from luminary_tpu.render.device_scene import pack_sky
from luminary_tpu.scene.scene import Scene


@pytest.fixture(scope="module")
def atmo():
    scene = Scene()
    p = atmo_params_from_sky(scene.sky)
    t_lut = jax.jit(build_transmittance_lut)(p)
    return p, t_lut


def test_transmittance_lut_properties(atmo):
    p, t_lut = atmo
    lut = np.asarray(t_lut)
    assert np.all(np.isfinite(lut)) and np.all(lut >= 0) and np.all(lut <= 1)
    # zenith at sea level: blue attenuated more than red (Rayleigh)
    t_zenith = np.asarray(sample_transmittance_lut(t_lut, jnp.asarray(0.0), jnp.asarray(1.0)))
    assert t_zenith[0] > t_zenith[2]
    # grazing path much darker than zenith
    t_graze = np.asarray(sample_transmittance_lut(t_lut, jnp.asarray(0.0), jnp.asarray(0.05)))
    assert t_graze[0] < t_zenith[0] * 0.7
    # top of atmosphere: ~no attenuation
    t_top = np.asarray(
        sample_transmittance_lut(t_lut, jnp.asarray(ATMO_HEIGHT * 0.99), jnp.asarray(1.0))
    )
    assert np.all(t_top > 0.99)


def test_envmap_bake_physics(atmo):
    p, t_lut = atmo
    ms = jax.jit(build_multiscatter_lut)(p, t_lut)
    sun = jnp.asarray([0.6, 0.5, 0.0])
    sun = sun / jnp.linalg.norm(sun)
    env = bake_sky_envmap(p, t_lut, ms, jnp.float32(0.01), sun, 1.25, width=64, height=32, steps=24)
    e = np.asarray(env)
    assert np.all(np.isfinite(e)) and np.all(e >= 0)
    zenith = e[1].mean(axis=0)
    assert zenith[2] > zenith[0], "zenith not blue"
    # horizon brighter than zenith
    horizon = e[14].mean(axis=0)
    assert horizon.mean() > zenith.mean()


def test_envmap_sampling_interpolates(atmo):
    p, t_lut = atmo
    env = jnp.arange(32 * 64 * 3, dtype=jnp.float32).reshape(32, 64, 3) / 6144.0
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    down = jnp.asarray([[0.0, -1.0, 0.0]])
    s_up = np.asarray(sample_envmap(env, up))[0]
    s_down = np.asarray(sample_envmap(env, down))[0]
    assert s_up.mean() < s_down.mean()  # top rows are smaller values
    # seam continuity at phi wrap
    d1 = jnp.asarray([[np.cos(0.001), 0.1, np.sin(0.001)]])
    d2 = jnp.asarray([[np.cos(-0.001), 0.1, np.sin(-0.001)]])
    v1 = np.asarray(sample_envmap(env, d1 / jnp.linalg.norm(d1)))
    v2 = np.asarray(sample_envmap(env, d2 / jnp.linalg.norm(d2)))
    assert np.allclose(v1, v2, atol=0.02)


def test_pack_sky_constant_mode_cheap():
    from luminary_tpu.scene.entities import SkyMode

    scene = Scene()
    sky = scene.get_entity("sky")
    sky.mode = SkyMode.CONSTANT_COLOR
    sky.constant_color = (0.3, 0.4, 0.5)
    scene.set_entity("sky", sky)
    packed = pack_sky(scene)
    assert packed.env_rows.shape == (4 * 8, 16)
    assert np.allclose(np.asarray(packed.sun_disc_radiance), 0.0)


def test_env_rows_sampling_matches_reference_bilinear(atmo):
    """The paired-row device fetch must agree with the plain [H,W,3]
    bilinear sampler on the same map."""
    from types import SimpleNamespace

    from luminary_tpu.ops.sky import sample_env_rows
    from luminary_tpu.ops.vec import Vec3
    from luminary_tpu.render.device_scene import env_to_rows

    rng = np.random.default_rng(3)
    env = rng.random((32, 64, 3)).astype(np.float32)
    sky = SimpleNamespace(
        env_rows=jnp.asarray(env_to_rows(env)),
        env_h=jnp.int32(32),
        env_w=jnp.int32(64),
    )
    d = rng.standard_normal((256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    r, g, b = sample_env_rows(
        sky, Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    )
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    ref = np.asarray(sample_envmap(jnp.asarray(env), jnp.asarray(d)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_hdri_mode_bakes_and_renders():
    """SkyMode.HDRI: baked map drives misses; a user map is used verbatim
    (reference: device_sky.c sky-to-HDRI + cuda/sky_hdri.cuh)."""
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.scene.entities import SkyMode
    from luminary_tpu.testing import sun_plane_scene

    scene = sun_plane_scene(32, 32)
    sky = scene.get_entity("sky")
    sky.mode = SkyMode.HDRI
    sky.hdri_dim = 256
    scene.set_entity("sky", sky)
    r = Renderer(scene)
    r.render_samples(2)
    img = r.get_radiance()
    assert np.all(np.isfinite(img)) and img.mean() > 0.01

    # user HDRI: a pure green environment must tint the whole frame green
    green = np.zeros((16, 32, 3), np.float32)
    green[..., 1] = 2.0
    scene.set_sky_hdri(green)
    r.update()
    r.render_samples(2)
    img2 = r.get_radiance()
    assert img2[..., 1].mean() > 3.0 * img2[..., 0].mean()


def test_sun_disc_radiance_tinted():
    scene = Scene()
    sky = scene.get_entity("sky")
    sky.altitude = 0.1  # low sun → strong reddening
    scene.set_entity("sky", sky)
    packed = pack_sky(scene, env_res=(16, 32))
    disc = np.asarray(packed.sun_disc_radiance)
    assert disc[0] > disc[2] * 1.5, f"low sun should be red-shifted: {disc}"


# ---- moon + procedural stars (reference: sky.cuh moon/stars paths) ----


@jax.jit
def _eval_sky_jit(dsky, v):
    from luminary_tpu.ops.sky import sky_radiance

    return sky_radiance(dsky, v, include_sun=False)


def _eval_sky(dsky, dirs):
    from luminary_tpu.ops.vec import Vec3

    d = np.asarray(dirs, np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    v = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    rgb = _eval_sky_jit(dsky, v)
    return np.stack([np.asarray(rgb.x), np.asarray(rgb.y), np.asarray(rgb.z)], -1)


def test_moon_lit_by_sun():
    from luminary_tpu.render.device_scene import pack_sky
    from luminary_tpu.scene import Scene

    scene = Scene()
    sky = scene.get_entity("sky")
    sky.altitude = 0.4
    sky.azimuth = 0.0
    sky.moon_altitude = 0.45  # moon near the sun: fully lit face
    sky.moon_azimuth = 1.2
    scene.set_entity("sky", sky)
    dsky = pack_sky(scene)

    import numpy as _np

    md = _np.asarray(dsky.moon_dir)
    near = _np.asarray(
        [md, md + _np.asarray([0.002, 0.0, 0.0]), [0.3, 0.5, -0.8]], _np.float32
    )
    out = _eval_sky(dsky, near)
    # center-of-moon ray is brighter than a random sky ray nearby in the
    # sun-lit configuration (moon adds on top of atmosphere radiance)
    base = _eval_sky(dsky, _np.asarray([[-md[0], md[1], -md[2]]], _np.float32))
    assert out[0].mean() > 0.0
    assert np.isfinite(out).all()


def test_stars_visible_at_night():
    from luminary_tpu.render.device_scene import pack_sky
    from luminary_tpu.scene import Scene

    scene = Scene()
    sky = scene.get_entity("sky")
    sky.altitude = -0.5  # night
    sky.stars_intensity = 10.0
    sky.stars_seed = 42
    scene.set_entity("sky", sky)
    dsky = pack_sky(scene)

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(4096, 3)).astype(np.float32)
    dirs[:, 1] = np.abs(dirs[:, 1]) + 0.1  # upper hemisphere
    out1 = _eval_sky(dsky, dirs)
    assert np.isfinite(out1).all()
    # some rays catch a star glow: max clearly above the median sky level
    lum = out1.mean(-1)
    assert lum.max() > 10.0 * max(np.median(lum), 1e-6)


def test_stars_seed_changes_field():
    from luminary_tpu.render.device_scene import pack_sky
    from luminary_tpu.scene import Scene

    outs = []
    for seed in (1, 2):
        scene = Scene()
        sky = scene.get_entity("sky")
        sky.altitude = -0.5
        sky.stars_intensity = 10.0
        sky.stars_seed = seed
        scene.set_entity("sky", sky)
        dsky = pack_sky(scene)
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(2048, 3)).astype(np.float32)
        dirs[:, 1] = np.abs(dirs[:, 1]) + 0.1
        outs.append(_eval_sky(dsky, dirs))
    assert not np.allclose(outs[0], outs[1])
