"""Bridge sampling: multi-vertex volume NEE (reference: light_bridges.cuh).

A bridge connects a volume scattering vertex x to a light point y through
M - 1 intermediate scattering vertices without tracing a random walk that
has to *find* the light: sample M phase directions and unit-exponential
distances freely, then SCALE the whole sub-path so its endpoint lands
exactly on y and ROTATE it so the endpoint direction matches, absorbing the
constraint into an analytic pdf (reference math, light_bridges.cuh:141-218):

    path:    d_1 = normalize(y - x), t_i ~ Exp(1),
             d_i = phase_sample(d_{i-1})          (i = 2..M)
    scale:   s = |y - x| / |sum t_i d_i|
    weight:  sigma_s^M * exp(-sum(s t_i) * sigma_t)    per channel
    pdf:     p(M) * M! / (s sum t_i)^M * |y - x|^3

The whole path is then rotated about x so the endpoint hits y; the first
segment's direction after rotation enters the phase function against the
view direction. Visibility = product of per-segment occlusion tests.

TPU shape discipline: M is bounded by the STATIC max_vertices (settings
.bridge_max_num_vertices, reference default 1); all M lanes run masked.
"""

from __future__ import annotations

import jax.numpy as jnp

from .random import RandomTarget, random_1d
from .vec import Vec3, dot, vwhere
from .volume import hg_phase, sample_hg_direction


def _log_factorial(m: jnp.ndarray) -> jnp.ndarray:
    """log((m-1)!) — Ramanujan approximation (reference
    bridges_log_factorial)."""
    n = jnp.maximum(m.astype(jnp.float32) - 1.0, 1.0)
    t0 = n * jnp.log(n)
    t1 = (1.0 / 6.0) * jnp.log(n * (1.0 + 4.0 * n * (1.0 + 2.0 * n)))
    t2 = 0.5 * jnp.log(jnp.pi)
    return jnp.where(m <= 1, 0.0, t0 + t1 + t2 - n)


def _rodrigues(a: Vec3, b: Vec3, v: Vec3) -> Vec3:
    """Rotate v by the shortest rotation taking unit a → unit b. With the
    unnormalized axis a×b, k = (1-c)/|a×b|² has the well-conditioned limit
    1/(1+c) as c→1, so near-parallel needs NO special case; only true
    antiparallel (c→-1) degenerates (handled by _rotate_to)."""
    c = dot(a, b)
    axis = Vec3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )
    s2 = axis.x * axis.x + axis.y * axis.y + axis.z * axis.z
    k = (1.0 - c) / jnp.maximum(s2, 1e-20)
    axv = Vec3(
        axis.y * v.z - axis.z * v.y,
        axis.z * v.x - axis.x * v.z,
        axis.x * v.y - axis.y * v.x,
    )
    axd = dot(axis, v)
    return Vec3(
        v.x * c + axv.x + axis.x * axd * k,
        v.y * c + axv.y + axis.y * axd * k,
        v.z * c + axv.z + axis.z * axd * k,
    )


def _rotate_to(a: Vec3, b: Vec3, v: Vec3) -> Vec3:
    """Rodrigues rotation a → b applied to v; near-antiparallel lanes route
    through a perpendicular intermediate (two well-conditioned ~90°
    rotations) — the reference's quaternion normalization plays this role
    (bridges_compute_rotation)."""
    c = dot(a, b)
    # a stable perpendicular of a
    use_x = jnp.abs(a.x) < 0.9
    px = jnp.where(use_x, 0.0, -a.z)
    py = jnp.where(use_x, a.z, 0.0)
    pz = jnp.where(use_x, -a.y, a.x)
    pl = jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-20))
    p = Vec3(px / pl, py / pl, pz / pl)
    two_step = _rodrigues(p, b, _rodrigues(a, p, v))
    return vwhere(c < -0.99, two_step, _rodrigues(a, b, v))


def sample_bridge(
    x: Vec3,  # volume vertex [N]
    y: Vec3,  # light point [N]
    view_dir: Vec3,  # ray direction at x (incoming path direction)
    g,  # HG anisotropy (scalar)
    sigma_s,  # scattering coefficient (scalar or per-lane)
    sigma_t,  # extinction coefficient
    max_vertices: int,  # STATIC
    pixel_id,
    sample_id,
    depth: int,
):
    """Sample one bridge per lane.

    Returns (first_dir Vec3, segment starts [list of Vec3 len max_vertices],
    segment dirs, segment lens, weight_over_pdf [N], phase_first [N],
    n_verts [N] i32). Contribution = Le * phase_first * weight_over_pdf *
    visibility(all segments). Lanes with degenerate targets report weight 0.
    """
    n = x.x.shape[0]
    to_light = y - x
    target = jnp.sqrt(jnp.maximum(dot(to_light, to_light), 0.0))
    base_dir = vwhere(
        target > 1e-6,
        Vec3(to_light.x / jnp.maximum(target, 1e-6),
             to_light.y / jnp.maximum(target, 1e-6),
             to_light.z / jnp.maximum(target, 1e-6)),
        Vec3.of(0.0, 0.0, 1.0, like=to_light),
    )

    # vertex count ~ truncated Poisson in the optical distance s0 = σ_t·d:
    # in a homogeneous medium the number of interior collisions over
    # optical depth s0 is Poisson(s0), so P(n) ∝ s0^(n-1)/(n-1)! over
    # n = 1..M — the analytic stand-in for the reference's distance-keyed
    # embedded LUT (light_bridges.cuh:68-139, bridge_lut.bin): short
    # connections favor the direct order, optically thick ones the high
    # orders. The sampled pdf folds into path_pdf, so only variance moves.
    if max_vertices > 1:
        r_m = random_1d(RandomTarget.BRIDGE_VERTEX_COUNT, pixel_id, sample_id, depth)
        s0 = jnp.asarray(sigma_t, jnp.float32) * target
        log_s0 = jnp.log(jnp.maximum(s0, 1e-6))
        lf = 0.0
        log_w = []
        for nn in range(max_vertices):
            if nn >= 2:
                import math as _math

                lf += _math.log(nn)
            log_w.append(nn * log_s0 - lf)
        lw = jnp.stack(log_w, axis=0)  # [M, N]
        lw = lw - jnp.max(lw, axis=0, keepdims=True)
        w_cnt = jnp.exp(lw)
        cdf = jnp.cumsum(w_cnt, axis=0)
        tot = cdf[-1]
        u = r_m * tot
        m = 1 + jnp.sum((u > cdf).astype(jnp.int32), axis=0)
        m = jnp.clip(m, 1, max_vertices)
        count_pdf = jnp.take_along_axis(
            w_cnt, (m - 1)[None, :], axis=0)[0] / tot
    else:
        m = jnp.ones((n,), jnp.int32)
        count_pdf = 1.0

    # unscaled walk (all max_vertices steps, masked by i < m)
    cur_dir = base_dir
    px = jnp.zeros_like(x.x)
    py = jnp.zeros_like(x.x)
    pz = jnp.zeros_like(x.x)
    sum_dist = jnp.zeros_like(x.x)
    rel_starts = []
    dirs = []
    lens = []
    for i in range(max_vertices):
        live = i < m
        if i > 0:
            nd = sample_hg_direction(cur_dir, g, pixel_id, sample_id,
                                     depth * max_vertices + i)
            cur_dir = vwhere(live, nd, cur_dir)
        r_d = random_1d(RandomTarget.BRIDGE_DISTANCE, pixel_id, sample_id,
                        depth * max_vertices + i)
        t_i = -jnp.log(jnp.clip(1.0 - r_d, 1e-7, 1.0))
        t_i = jnp.where(live, t_i, 0.0)
        rel_starts.append(Vec3(px, py, pz))
        dirs.append(cur_dir)
        lens.append(t_i)
        px = px + cur_dir.x * t_i
        py = py + cur_dir.y * t_i
        pz = pz + cur_dir.z * t_i
        sum_dist = sum_dist + t_i

    actual = jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, 0.0))
    ok = (actual > 1e-6) & (target > 1e-6)
    scale = jnp.where(ok, target / jnp.maximum(actual, 1e-6), 0.0)
    s_sum = sum_dist * scale

    mf = m.astype(jnp.float32)
    log_pdf = _log_factorial(m) - mf * jnp.log(jnp.maximum(s_sum, 1e-20))
    path_pdf = count_pdf * jnp.exp(log_pdf) * target * target * target
    # sigma_s^(M-1): the M-1 INTERIOR scattering events; the scattering
    # albedo at x itself is already in the path throughput (the integrator
    # applies it at the collision), and the endpoint lands on the emitter.
    weight = jnp.exp(
        (mf - 1.0) * jnp.log(jnp.maximum(sigma_s, 1e-20)) - s_sum * sigma_t
    )
    w_over_pdf = jnp.where(
        ok & (path_pdf > 1e-30), weight / jnp.maximum(path_pdf, 1e-30), 0.0
    )

    # rotate the path so its endpoint lands on y
    end_dir = vwhere(
        ok,
        Vec3(px / jnp.maximum(actual, 1e-6), py / jnp.maximum(actual, 1e-6),
             pz / jnp.maximum(actual, 1e-6)),
        base_dir,
    )
    first_dir = _rotate_to(end_dir, base_dir, dirs[0])
    # cos between the incoming path direction and the (rotated) first
    # bridge segment (reference: -dot(rotated_dir, V), V = -ray direction)
    phase_first = hg_phase(dot(view_dir, first_dir), g)

    seg_starts = []
    seg_dirs = []
    seg_lens = []
    for i in range(max_vertices):
        rs = _rotate_to(end_dir, base_dir, rel_starts[i])
        seg_starts.append(Vec3(
            x.x + rs.x * scale, x.y + rs.y * scale, x.z + rs.z * scale
        ))
        seg_dirs.append(_rotate_to(end_dir, base_dir, dirs[i]))
        seg_lens.append(lens[i] * scale)

    return (first_dir, seg_starts, seg_dirs, seg_lens, w_over_pdf,
            phase_first, m)
