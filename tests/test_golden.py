"""Golden-image regression gate.

The reference's de-facto integration test is the benchmark ladder + FLIP
comparison against stored reference images (comparison.py). This is the CI
version: small deterministic renders compared against goldens stored in
tests/golden/. A silent change to any estimator (BSDF sign, MIS weight, RNG
stream, NEE pdf) shifts the image beyond the gate.

Regenerate intentionally with:
    python tests/test_golden.py --regen
and justify the change in the commit message.
"""

import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SPP = 64


def _scenes():
    from luminary_tpu.testing import cornell_scene, sun_plane_scene

    # cornell: GGX + area-light NEE + MIS; sun_plane: sun NEE + env sky
    return {
        "cornell_32": cornell_scene(32, 32, max_depth=4),
        "sun_plane_32": sun_plane_scene(32, 32),
    }


def _render(scene):
    from luminary_tpu.render.renderer import Renderer

    r = Renderer(scene, chunk=1 << 20)
    r.render_samples(SPP)
    n = scene.settings.width * scene.settings.height
    img = (
        np.asarray(r.accum.radiance)[:n]
        / np.asarray(r.accum.sample_count)[:n, None]
    )
    return img.reshape(scene.settings.height, scene.settings.width, 3)


def test_renders_match_goldens():
    from luminary_tpu.tools.compare import rel_mse, rmse

    for name, scene in _scenes().items():
        path = os.path.join(GOLDEN_DIR, f"{name}_{SPP}spp.npy")
        assert os.path.exists(path), (
            f"golden missing: {path} — run python tests/test_golden.py --regen"
        )
        ref = np.load(path).astype(np.float32)
        img = _render(scene)
        r = rmse(img, ref)
        rm = rel_mse(img, ref)
        scale = float(np.abs(ref).mean()) + 1e-6
        # identical RNG streams → only float-reassociation noise expected
        assert r / scale < 0.02, (name, r, scale, rm)


def test_render_is_deterministic():
    name, scene = next(iter(_scenes().items()))
    a = _render(scene)
    b = _render(_scenes()[name])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, scene in _scenes().items():
            img = _render(scene)
            # f32: f16 loses ~5e-4 relative on firefly pixels, which alone
            # breaks a 2% RMSE gate on a 32x32 image
            np.save(os.path.join(GOLDEN_DIR, f"{name}_{SPP}spp.npy"),
                    img.astype(np.float32))
            print("wrote", name, img.mean())
