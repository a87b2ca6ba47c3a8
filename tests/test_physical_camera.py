"""Physical lens camera tests (reference: cuda/camera_physical.cuh,
device_physical_camera.c — lens-stack trace with Abbe dispersion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminary_tpu.ops.camera import pack_camera
from luminary_tpu.ops.camera_physical import (
    achromat_prescription,
    cie_fit_xyz,
    generate_physical_camera_rays,
    pack_physical_camera,
    xyz_to_rgb,
)
from luminary_tpu.scene import Camera


def _rays(camera, n=1024, w=32, h=32):
    cam = pack_camera(camera)
    idx = np.arange(n, dtype=np.int32)
    px = jnp.asarray(idx % w)
    py = jnp.asarray((idx // w) % h)
    pid = jnp.asarray(idx.astype(np.uint32))
    return generate_physical_camera_rays(
        cam, cam.phys, w, h, px, py, pid, jnp.uint32(0)
    )


def _mk_camera(**phys_kw):
    c = Camera()
    c.use_physical_camera = True
    for k, v in phys_kw.items():
        setattr(c.physical, k, v)
    return c


def test_achromat_prescription_focuses():
    """Paraxial rays through the generated doublet converge near f."""
    interfaces, media = achromat_prescription(0.05, 0.01)
    assert interfaces.shape == (3, 3) and media.shape == (4, 2)
    # crown front surface is convex toward the world (R1 > 0), flint rear
    # surface strongly curved
    assert interfaces[2, 0] > 0


def test_physical_rays_exit_and_focus():
    c = _mk_camera(focal_length=0.05, image_plane_distance=0.055,
                   aperture_diameter=0.01)
    o, d, (wr, wg, wb) = _rays(c)
    wr = np.asarray(wr)
    assert (wr > 0).mean() > 0.3, "most rays should survive the lens"
    dz = np.asarray(d.z)
    # camera looks down -z
    assert (dz[wr > 0] < 0).all()
    assert np.isfinite(np.asarray(o.x)).all()


def test_wide_aperture_vignettes_more():
    """Edge rays through a wide stop clip on element clear radii; a tiny
    paraxial stop passes everything."""
    c = _mk_camera(focal_length=0.05, image_plane_distance=0.055,
                   aperture_diameter=0.0005)
    _, _, (wr, _, _) = _rays(c)
    c2 = _mk_camera(focal_length=0.05, image_plane_distance=0.055,
                    aperture_diameter=0.02)
    _, _, (wr2, _, _) = _rays(c2)
    assert float(np.asarray(wr).mean()) >= float(np.asarray(wr2).mean())
    assert float(np.asarray(wr2).mean()) < 1.0


def test_spectral_weights_average_to_white():
    """CIE-fit spectral weights integrate to ~(1,1,1) over the band."""
    lam = jnp.linspace(380.0, 700.0, 2048)
    x, y, z = cie_fit_xyz(lam)
    scale = 320.0 / 106.857
    r, g, b = xyz_to_rgb(x * scale, y * scale, z * scale)
    mr, mg, mb = float(r.mean()), float(g.mean()), float(b.mean())
    assert abs(mg - 1.0) < 0.1, mg
    assert 0.7 < mr < 1.4 and 0.7 < mb < 1.4


def test_spectral_mode_disperses():
    """With dispersion, different wavelengths exit at different angles."""
    c = _mk_camera(focal_length=0.05, image_plane_distance=0.055,
                   aperture_diameter=0.01, use_spectral_rendering=True)
    o, d, (wr, wg, wb) = _rays(c, n=4096)
    wr, wg, wb = (np.asarray(a) for a in (wr, wg, wb))
    live = (np.abs(wr) + np.abs(wg) + np.abs(wb)) > 0
    assert live.mean() > 0.2
    # spectral weights differ per lane (not all white)
    assert np.std(wr[live] - wb[live]) > 1e-3


def test_render_sample_with_physical_camera():
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.testing import cornell_scene

    scene = cornell_scene(32, 32, max_depth=2)
    cam = scene.get_entity("camera")
    cam.use_physical_camera = True
    cam.physical.focal_length = 0.05
    cam.physical.image_plane_distance = 0.055
    cam.physical.aperture_diameter = 0.01
    cam.physical.sensor_width = 0.036
    scene.set_entity("camera", cam)
    r = Renderer(scene)
    r.render_samples(2)
    img = r.get_image()
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
