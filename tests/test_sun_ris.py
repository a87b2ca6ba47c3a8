"""Sun RIS over {solid-angle, BSDF-proposed} candidates
(reference: direct_lighting.cuh:21-119) + NEE-coverage MIS weights.

The render-level near-mirror × 0.27°-disc configuration is too
heavy-tailed to gate in CI time, so the estimator is validated directly
against disc quadrature at a single vertex: the three-sampler balance
weights (cone NEE, BSDF NEE, BSDF bounce) must integrate to the true
f·cos·Ω within Monte-Carlo tolerance.
"""

import numpy as np

import jax.numpy as jnp

from luminary_tpu.ops.material import (
    LaneMaterial,
    frame_eval,
    make_frame,
    material_sample,
)
from luminary_tpu.ops.sky import SUN_ANGULAR_RADIUS, SUN_COS_RADIUS
from luminary_tpu.ops.vec import Vec3, dot
from luminary_tpu.ops.wavefront_utils import sample_sun_direction

SUN_SOLID_ANGLE = 2 * np.pi * (1 - np.cos(SUN_ANGULAR_RADIUS))


def _lane(n, rough):
    return LaneMaterial(
        albedo_r=jnp.full((n,), 0.95), albedo_g=jnp.full((n,), 0.93),
        albedo_b=jnp.full((n,), 0.9), roughness=jnp.full((n,), rough),
        metallic=jnp.ones((n,)), ior=jnp.full((n,), 1.5),
        translucent=jnp.zeros((n,), bool), opacity=jnp.ones((n,)),
        thin_walled=jnp.zeros((n,), bool))


def _disc_quadrature(rough, wo_v, sun, m=512):
    t_ = np.array([0.0, 0.0, 1.0])
    b_ = np.cross(sun, t_)
    b_ /= np.linalg.norm(b_)
    u1, u2 = np.meshgrid((np.arange(m) + 0.5) / m, (np.arange(m) + 0.5) / m)
    ct = 1 - u1.ravel() * (1 - np.cos(SUN_ANGULAR_RADIUS))
    st = np.sqrt(1 - ct**2)
    ph = 2 * np.pi * u2.ravel()
    dirs = (sun[None, :] * ct[:, None]
            + (np.outer(np.cos(ph), t_) + np.outer(np.sin(ph), b_))
            * st[:, None])
    k = dirs.shape[0]
    lane = _lane(k, rough)
    ns = Vec3(jnp.zeros((k,)), jnp.ones((k,)), jnp.zeros((k,)))
    wo = Vec3(*(jnp.full((k,), wo_v[i]) for i in range(3)))
    fr = make_frame(lane, ns, wo)
    dv = Vec3(*(jnp.asarray(dirs[:, i], jnp.float32) for i in range(3)))
    (fq, _, _), _ = frame_eval(lane, fr, lane.roughness, dv)
    return float(jnp.mean(fq)) * SUN_SOLID_ANGLE


def test_sun_three_way_weights_match_quadrature(rng):
    n = 1 << 19
    rough = 0.02
    lane = _lane(n, rough)
    ns = Vec3(jnp.zeros((n,)), jnp.ones((n,)), jnp.zeros((n,)))
    alt = np.pi / 2 - 0.02
    sun = np.array([np.cos(alt), np.sin(alt), 0.0])
    sun /= np.linalg.norm(sun)
    wo_v = np.array([-np.sin(0.035), np.cos(0.035), 0.0])
    wo = Vec3(*(jnp.full((n,), wo_v[i]) for i in range(3)))
    fr = make_frame(lane, ns, wo)
    sv = Vec3(*(jnp.float32(sun[i]) for i in range(3)))
    truth = _disc_quadrature(rough, wo_v, sun)

    pid = jnp.asarray(rng.integers(0, 2**31, n), jnp.uint32)
    sid = jnp.zeros((n,), jnp.uint32)
    pdf_sun = 1.0 / SUN_SOLID_ANGLE
    # candidate 1: cone
    s1 = sample_sun_direction(sv, pid, sid, 0)
    (f1, _, _), p1e = frame_eval(lane, fr, lane.roughness, s1)
    # candidate 2: BSDF proposal (true sampler density p2s, nominal p2e)
    wi2, _, p2s, _, _ = material_sample(lane, fr, ns, wo, pid, sid, 64)
    (f2, _, _), p2e = frame_eval(lane, fr, lane.roughness, wi2)
    in2 = dot(wi2, sv) >= SUN_COS_RADIUS
    w1 = jnp.where(f1 > 0, f1 / (pdf_sun + p1e * 2.0), 0.0)
    w2 = jnp.where(in2 & (f2 > 0),
                   p2e / (pdf_sun + p2e * 2.0)
                   * f2 / jnp.maximum(p2s, 1e-12), 0.0)
    nee_est = float(jnp.mean(w1 + w2))  # g/phat = 1 at Le = 1
    # bounce sampler with its balance weight
    wib, wb, pb, _, _ = material_sample(lane, fr, ns, wo, pid, sid, 7)
    inb = dot(wib, sv) >= SUN_COS_RADIUS
    wmiss = pb / (pdf_sun + pb * 2.0)
    bounce_est = float(jnp.mean(jnp.where(inb, wb[0] * wmiss, 0.0)))
    total = nee_est + bounce_est
    assert abs(total - truth) / truth < 0.05, (total, truth)


def test_sun_ris_render_smoke():
    """End-to-end: a near-mirror floor under a zenith sun renders finite,
    non-negative, and in the same brightness class with the second
    candidate on or off (the tails preclude a tight CI gate)."""
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.scene.entities import Material, SkyMode
    from luminary_tpu.scene.mesh import Mesh
    from luminary_tpu.scene.scene import Scene

    def build(flag):
        scene = Scene()
        scene.add_material(Material(albedo=(0.95, 0.93, 0.9, 1.0),
                                    roughness=0.05, metallic=True))
        verts = [(-30, 0, -30), (30, 0, -30), (30, 0, 30), (-30, 0, 30)]
        tris = [[0, 1, 2], [0, 2, 3]]
        mesh = Mesh(vertices=np.asarray(verts, np.float32),
                    triangles=np.asarray(tris, np.int32),
                    material_ids=np.zeros(2, np.uint16), name="floor")
        scene.add_mesh(mesh)
        inst = scene.new_instance()
        inst.mesh_id = mesh.id
        scene.set_instance(inst)
        sky = scene.get_entity("sky")
        sky.mode = SkyMode.DEFAULT
        sky.altitude = 1.4
        scene.set_entity("sky", sky)
        st = scene.get_entity("settings")
        st.width = st.height = 12
        st.max_ray_depth = 2
        st.sun_ris = flag
        scene.set_entity("settings", st)
        cam = scene.get_entity("camera")
        cam.pos = (0.0, 3.0, 0.0)
        cam.rotation = (-np.pi / 2, 0.0, 0.0)
        scene.set_entity("camera", cam)
        return scene

    means = []
    for flag in (True, False):
        r = Renderer(build(flag), chunk=1 << 20)
        r.update()
        assert r.config.sun_ris == flag
        r.render_samples(128)
        acc = r.accum
        m = float(np.asarray(acc.radiance).mean()
                  / np.asarray(acc.sample_count).mean())
        assert np.isfinite(m) and m >= 0
        means.append(m)
    assert 0.3 < means[0] / means[1] < 3.0, means
