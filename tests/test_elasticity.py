"""Hot device enable/disable + failure recovery on the CPU mesh
(reference: device_manager.c:529-572 enable/disable with main re-election,
device.h:83 DEVICE_STATE_UNAVAILABLE)."""

import jax
import numpy as np
import pytest

from luminary_tpu.parallel.mesh import make_sample_mesh
from luminary_tpu.render.renderer import Renderer
from luminary_tpu.testing import cornell_scene
from luminary_tpu.utils.errors import InvalidAPIArgumentError

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

W = H = 16


def _mesh_renderer(n=4):
    scene = cornell_scene(W, H, max_depth=2)
    mesh = make_sample_mesh(jax.devices()[:n])
    return Renderer(scene, chunk=W * H, mesh=mesh)


def test_hot_disable_reforms_mesh_and_restarts():
    r = _mesh_renderer(4)
    r.render_samples(4)
    assert r.sample_count == 4
    # disable the MAIN device (id 0) → re-election to device 1, mesh of 3,
    # accumulation restarts (reference INTEGRATION dirty semantics)
    r.set_device_enable(0, False)
    assert r.sample_count == 0
    assert r.mesh.size == 3
    assert r.device_states() == ["disabled", "enabled", "enabled", "enabled"]
    r.render_samples(3)
    assert r.sample_count == 3
    rad_after = r.get_radiance()
    assert np.isfinite(rad_after).all() and rad_after.mean() > 0.0
    # the restarted render must bit-match a fresh 3-device renderer (same
    # sample ids, same devices-count mesh)
    r2 = _mesh_renderer(3)
    r2.render_samples(3)
    assert np.allclose(rad_after, r2.get_radiance(), atol=1e-6)
    # re-enable: back to 4 devices, fresh accumulation
    r.set_device_enable(0, True)
    assert r.mesh.size == 4
    assert r.sample_count == 0


def test_disable_all_devices_rejected():
    r = _mesh_renderer(2)
    r.set_device_enable(0, False)
    with pytest.raises(RuntimeError):
        r.set_device_enable(1, False)


def test_failure_recovery_drops_dead_device():
    """A step failure triggers the probe; devices the probe reports dead are
    marked unavailable and the budget restarts on the re-formed mesh."""
    r = _mesh_renderer(4)
    r.render_samples(4)

    # simulate device 2 dying: the next distributed step raises once and the
    # probe no longer sees device 2
    real_probe = r._probe_mesh_devices
    dead = r._mesh_devices[2]
    r._probe_mesh_devices = lambda: [d for d in real_probe() if d is not dead]
    fail_once = {"armed": True}
    real_step = r._dist_step
    assert real_step is not None  # built by the first render_samples

    def exploding(*a, **k):
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("simulated device loss")
        return real_step(*a, **k)

    r._dist_step = exploding
    r.render_samples(3)
    # device 2 was dropped as unavailable; render completed on 3 devices
    assert r.device_states()[2] == "unavailable"
    assert r.mesh.size == 3
    assert r.sample_count >= 3
    assert np.isfinite(r.get_radiance()).all()
    # an unavailable device cannot be re-enabled (reference parity)
    with pytest.raises(InvalidAPIArgumentError):
        r.set_device_enable(2, True)


def test_host_device_info_reflects_elasticity():
    from luminary_tpu.host.host import Host

    host = Host(mesh=4)
    try:
        host.scene = cornell_scene(W, H, max_depth=2)
        host.renderer  # force renderer construction
        host.set_device_enable(1, False)
        info0 = host.get_device_info(0)
        info1 = host.get_device_info(1)
        assert info0["is_main_device"] and info0["is_enabled"]
        assert not info1["is_enabled"] and not info1["is_unavailable"]
        # disable the main -> re-election to the next enabled device
        host.set_device_enable(0, False)
        assert host.get_device_info(2)["is_main_device"]
    finally:
        host.destroy()
