"""Correctness check: Pallas fused-body traversal vs the XLA path.

CPU (interpret mode): python tools/proto_pallas_check.py cpu
TPU (compiled):       python tools/proto_pallas_check.py tpu
"""

import sys

import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if mode == "cpu":
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp  # noqa: E402

from luminary_tpu.bvh.builder import build_bvh  # noqa: E402
from luminary_tpu.bvh.wide import WIDE_LEAF, collapse_bvh8  # noqa: E402
from luminary_tpu.ops.traverse import _traverse_wide, pack_device_bvh  # noqa: E402
from luminary_tpu.ops.traverse_pallas import traverse_wide_pallas  # noqa: E402
from luminary_tpu.ops.vec import Vec3  # noqa: E402


def main():
    rng = np.random.default_rng(7)
    num_tris = 2000 if mode == "cpu" else 20000
    base = (rng.random((num_tris, 1, 3)) - 0.5) * 10.0
    offs = (rng.random((num_tris, 3, 3)) - 0.5) * 0.5
    corners = (base + offs).astype(np.float32)
    bvh2 = build_bvh(corners, leaf_size=WIDE_LEAF)
    wide = collapse_bvh8(bvh2)
    order = wide.tri_order
    valid = order >= 0
    safe = np.where(valid, order, 0)
    c = corners[safe]
    v0 = c[:, 0].copy()
    e1 = c[:, 1] - c[:, 0]
    e2 = c[:, 2] - c[:, 0]
    v0[~valid] = 0
    e1[~valid] = 0
    e2[~valid] = 0
    dbvh = jax.device_put(pack_device_bvh(wide, v0, e1, e2))
    print(f"tris {num_tris}, rows {dbvh.rows.shape}, depth {dbvh.depth}")

    n_rays = 16 * 512 if mode == "cpu" else 16 * 512 * 4
    origins = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * 20.0
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = Vec3(*(jnp.asarray(origins[:, i]) for i in range(3)))
    d = Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3)))
    t_max = jnp.full((n_rays,), 3e38, jnp.float32)
    act = jnp.asarray(rng.random(n_rays) > 0.1)

    for any_hit in (False, True):
        tm = t_max if not any_hit else jnp.full((n_rays,), 6.0, jnp.float32)
        ref = _traverse_wide(dbvh, o, d, tm, any_hit=any_hit, active=act)
        got = traverse_wide_pallas(
            dbvh, o, d, tm, any_hit=any_hit, active=act,
            interpret=(mode == "cpu"))
        ref_t, got_t = np.asarray(ref.t), np.asarray(got.t)
        ref_s, got_s = np.asarray(ref.slot), np.asarray(got.slot)
        if any_hit:
            match = (ref_s >= 0) == (got_s >= 0)
            print(f"any_hit: {match.mean()*100:.3f}% agree "
                  f"({(~match).sum()} differ)")
            assert match.all()
        else:
            t_ok = np.isclose(ref_t, got_t, rtol=1e-5, atol=1e-5)
            s_ok = ref_s == got_s
            print(f"closest: t {t_ok.mean()*100:.3f}%  slot "
                  f"{s_ok.mean()*100:.3f}% agree ({(~s_ok).sum()} differ)")
            assert t_ok.all(), np.abs(ref_t - got_t).max()
            assert s_ok.mean() > 0.9995  # ties can legitimately differ
    print("PASS")


if __name__ == "__main__":
    main()
