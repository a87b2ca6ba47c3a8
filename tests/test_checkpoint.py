"""Checkpoint/resume: a resumed render must be BIT-identical to an
unbroken one (sample ids derive from the restored per-pixel counts, so
the QMC stream position survives the round trip). No reference analog —
its progressive state lives only in GPU accumulators (SURVEY §5)."""

import numpy as np

from luminary_tpu.render.renderer import Renderer
from luminary_tpu.testing import cornell_scene

import pytest


def test_resume_bit_identical(tmp_path):
    scene = cornell_scene(32, 32, max_depth=2)
    r1 = Renderer(scene)
    r1.render_samples(4)

    scene2 = cornell_scene(32, 32, max_depth=2)
    r2 = Renderer(scene2)
    r2.render_samples(2)
    path = str(tmp_path / "ckpt.npz")
    r2.save_checkpoint(path)

    scene3 = cornell_scene(32, 32, max_depth=2)
    r3 = Renderer(scene3)
    r3.load_checkpoint(path)
    assert r3.sample_count == 2
    r3.render_samples(2)

    np.testing.assert_array_equal(
        np.asarray(r1.accum.radiance), np.asarray(r3.accum.radiance))
    np.testing.assert_array_equal(
        np.asarray(r1.accum.sample_count), np.asarray(r3.accum.sample_count))


def test_fingerprint_mismatch_raises(tmp_path):
    r = Renderer(cornell_scene(32, 32, max_depth=2))
    r.render_samples(1)
    path = str(tmp_path / "ckpt.npz")
    r.save_checkpoint(path)
    other = Renderer(cornell_scene(48, 32, max_depth=2))
    with pytest.raises(ValueError):
        other.load_checkpoint(path)


def test_host_surface(tmp_path):
    from luminary_tpu.host.host import Host

    h = Host()
    h.scene = cornell_scene(32, 32, max_depth=2)
    h.renderer.render_samples(1)
    path = str(tmp_path / "h.npz")
    h.save_checkpoint(path)
    h.load_checkpoint(path)
    assert h.renderer.sample_count == 1
    h.destroy()
