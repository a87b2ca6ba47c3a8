"""Procedural geometry generation: ocean heightfield, particle billboards.

Reference equivalents: the ocean is an analytic FBM heightfield raymarched in
the integrator (reference: cuda/ocean_utils.cuh — Lipschitz-bounded marching);
particles are GPU-generated billboard quads in a tiled unit cube (reference:
cuda/particle.cuh PARTICLE_GENERATE, device_particle.c). The TPU build
*tessellates* both into triangles at scene-pack time and lets the BVH/dense
tracer handle them — per-lane raymarching of a procedural surface is control-
flow the TPU hates, while a 100k-triangle displaced grid is free for the
builder and keeps every hit in the one unified hit pipeline.
"""

from __future__ import annotations

import numpy as np

# Stable ids for procedural instances (picking parity; user instances are
# sequential from 0).
OCEAN_INSTANCE_ID = 0x7FFF0000
PARTICLES_INSTANCE_ID = 0x7FFF0001


def _hash2(ix: np.ndarray, iz: np.ndarray, seed: int) -> np.ndarray:
    # u32 wraparound is the hash's mixing mechanism — silence the numpy
    # overflow warning deliberately so REAL overflows elsewhere stay loud
    with np.errstate(over="ignore"):
        h = (ix.astype(np.uint32) * np.uint32(374761393)
             + iz.astype(np.uint32) * np.uint32(668265263)
             + np.uint32(seed) * np.uint32(2246822519))
        h ^= h >> 13
        h = h * np.uint32(1274126177)
    h ^= h >> 16
    return (h >> 8).astype(np.float32) / 16777216.0


def value_noise(x: np.ndarray, z: np.ndarray, seed: int = 0) -> np.ndarray:
    """Smooth value noise on a unit grid (bilinear with smoothstep)."""
    ix, iz = np.floor(x), np.floor(z)
    fx, fz = x - ix, z - iz
    sx = fx * fx * (3.0 - 2.0 * fx)
    sz = fz * fz * (3.0 - 2.0 * fz)
    ix, iz = ix.astype(np.int64), iz.astype(np.int64)
    v00 = _hash2(ix, iz, seed)
    v10 = _hash2(ix + 1, iz, seed)
    v01 = _hash2(ix, iz + 1, seed)
    v11 = _hash2(ix + 1, iz + 1, seed)
    return (
        v00 * (1 - sx) * (1 - sz)
        + v10 * sx * (1 - sz)
        + v01 * (1 - sx) * sz
        + v11 * sx * sz
    )


def ocean_fbm(x: np.ndarray, z: np.ndarray, octaves: int = 5, seed: int = 7) -> np.ndarray:
    """FBM in [-0.5, 0.5]-ish (reference ocean uses a choppy FBM heightfield,
    ocean_utils.cuh:4-14; this is our own value-noise stack, not a port)."""
    total = np.zeros_like(x)
    amp, freq, norm = 0.5, 1.0, 0.0
    for o in range(octaves):
        total += amp * (value_noise(x * freq + 13.7 * o, z * freq - 7.1 * o, seed + o) - 0.5)
        norm += amp
        amp *= 0.5
        freq *= 2.1
    return total / max(norm, 1e-6)


def generate_ocean_mesh(
    ocean,
    center_xz: tuple[float, float] = (0.0, 0.0),
    extent: float = 200.0,
    resolution: int = 128,
):
    """Displaced grid over [center±extent]²: (corners [T,3,3], normals
    [T,3,3] smooth)."""
    n = resolution
    xs = np.linspace(center_xz[0] - extent, center_xz[0] + extent, n + 1)
    zs = np.linspace(center_xz[1] - extent, center_xz[1] + extent, n + 1)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    h = ocean.height + ocean.amplitude * ocean_fbm(
        gx * ocean.frequency, gz * ocean.frequency
    )
    verts = np.stack([gx, h, gz], axis=-1).astype(np.float32)  # [n+1, n+1, 3]

    # smooth vertex normals from central differences
    dx = np.gradient(h, xs[1] - xs[0], axis=0)
    dz = np.gradient(h, zs[1] - zs[0], axis=1)
    vn = np.stack([-dx, np.ones_like(h), -dz], axis=-1)
    vn /= np.linalg.norm(vn, axis=-1, keepdims=True)

    # two triangles per cell
    v00 = verts[:-1, :-1]
    v10 = verts[1:, :-1]
    v01 = verts[:-1, 1:]
    v11 = verts[1:, 1:]
    n00 = vn[:-1, :-1]
    n10 = vn[1:, :-1]
    n01 = vn[:-1, 1:]
    n11 = vn[1:, 1:]
    # winding order: counter-clockwise seen from ABOVE so the geometric
    # normal e1 x e2 points +y — front_face (and with it the air→water
    # Fresnel/eta orientation) keys off the UNFLIPPED face normal
    t1 = np.stack([v00, v11, v10], axis=2).reshape(-1, 3, 3)
    t2 = np.stack([v00, v01, v11], axis=2).reshape(-1, 3, 3)
    n1 = np.stack([n00, n11, n10], axis=2).reshape(-1, 3, 3)
    n2 = np.stack([n00, n01, n11], axis=2).reshape(-1, 3, 3)
    corners = np.concatenate([t1, t2]).astype(np.float32)
    normals = np.concatenate([n1, n2]).astype(np.float32)
    return corners, normals


def _hash2_jnp(ix, iz, seed: int):
    """jnp twin of _hash2 (bit-exact wraparound semantics)."""
    import jax.numpy as jnp

    h = (ix.astype(jnp.uint32) * jnp.uint32(374761393)
         + iz.astype(jnp.uint32) * jnp.uint32(668265263)
         + jnp.uint32(seed) * jnp.uint32(2246822519))
    h ^= h >> 13
    h = h * jnp.uint32(1274126177)
    h ^= h >> 16
    return (h >> 8).astype(jnp.float32) / 16777216.0


def value_noise_jnp(x, z, seed: int = 0):
    import jax.numpy as jnp

    ix, iz = jnp.floor(x), jnp.floor(z)
    fx, fz = x - ix, z - iz
    sx = fx * fx * (3.0 - 2.0 * fx)
    sz = fz * fz * (3.0 - 2.0 * fz)
    ix = ix.astype(jnp.int32)
    iz = iz.astype(jnp.int32)
    v00 = _hash2_jnp(ix, iz, seed)
    v10 = _hash2_jnp(ix + 1, iz, seed)
    v01 = _hash2_jnp(ix, iz + 1, seed)
    v11 = _hash2_jnp(ix + 1, iz + 1, seed)
    return (v00 * (1 - sx) * (1 - sz) + v10 * sx * (1 - sz)
            + v01 * (1 - sx) * sz + v11 * sx * sz)


def ocean_fbm_jnp(x, z, octaves: int = 5, seed: int = 7):
    """jnp twin of ocean_fbm — the caustic connection sampler must see the
    SAME surface the tessellated mesh displaces (ocean caustics,
    reference caustics.cuh / ocean_utils.cuh)."""
    import jax.numpy as jnp

    total = jnp.zeros_like(x)
    amp, freq, norm = 0.5, 1.0, 0.0
    for o in range(octaves):
        total = total + amp * (
            value_noise_jnp(x * freq + 13.7 * o, z * freq - 7.1 * o, seed + o)
            - 0.5)
        norm += amp
        amp *= 0.5
        freq *= 2.1
    return total / max(norm, 1e-6)


def ocean_height_normal_jnp(water, px, pz, h_eps: float = 1.0):
    """Surface height y(x,z) and unit normal of the procedural ocean at
    world positions — central differences at the mesh-cell scale so the
    analytic normal tracks the tessellated facets. Returns (y, (nx,ny,nz))."""
    import jax.numpy as jnp

    f = water.frequency

    def h(xx, zz):
        return water.height + water.amplitude * ocean_fbm_jnp(xx * f, zz * f)

    import jax

    y = h(px, pz)
    dhdx = (h(px + h_eps, pz) - h(px - h_eps, pz)) / (2.0 * h_eps)
    dhdz = (h(px, pz + h_eps) - h(px, pz - h_eps)) / (2.0 * h_eps)
    inv = jax.lax.rsqrt(dhdx * dhdx + 1.0 + dhdz * dhdz)
    return y, (-dhdx * inv, inv, -dhdz * inv)


# Jerlov water types: (absorption RGB 1/m, scattering 1/m) — standard
# oceanographic coefficient classes (reference: JerlovWaterType enum).
JERLOV_COEFFS = {
    0: ((0.035, 0.045, 0.120), 0.002),  # I
    1: ((0.040, 0.050, 0.125), 0.003),  # IA
    2: ((0.045, 0.055, 0.130), 0.004),  # IB
    3: ((0.060, 0.070, 0.160), 0.009),  # II
    4: ((0.110, 0.110, 0.220), 0.016),  # III
    5: ((0.100, 0.090, 0.200), 0.016),  # 1C
    6: ((0.190, 0.150, 0.300), 0.029),  # 3C
    7: ((0.330, 0.230, 0.400), 0.049),  # 5C
    8: ((0.500, 0.330, 0.540), 0.075),  # 7C
    9: ((0.780, 0.500, 0.740), 0.115),  # 9C
}


def generate_particles(particles):
    """Billboard quads in TILE coordinates [0, scale)³ (reference:
    PARTICLE_GENERATE fills a quad buffer in a tiled unit cube scaled by
    particles.scale, cuda/particle.cuh:165-199; the trace kernel wraps ray
    origins into the tile, optix_kernel_raytrace.cu:96-117).

    Returns (corners [T,3,3], normals [T,3,3]).
    """
    rng = np.random.default_rng(particles.seed)
    count = int(particles.count)
    scale = float(particles.scale)
    centers = rng.random((count, 3), np.float32) * scale
    sizes = (
        0.01 * particles.size * (1.0 + particles.size_variation * (rng.random(count, dtype=np.float32) - 0.5))
    ).astype(np.float32)
    # random facing
    phi = rng.random(count, dtype=np.float32) * 2 * np.pi
    ct = rng.random(count, dtype=np.float32) * 2 - 1
    st = np.sqrt(np.maximum(1 - ct * ct, 0))
    n = np.stack([st * np.cos(phi), ct, st * np.sin(phi)], axis=-1)
    up = np.where(np.abs(n[:, 1:2]) < 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
    t = np.cross(up, n)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    b = np.cross(n, t)
    s = sizes[:, None]
    p0 = centers - t * s - b * s
    p1 = centers + t * s - b * s
    p2 = centers + t * s + b * s
    p3 = centers - t * s + b * s
    t1 = np.stack([p0, p1, p2], axis=1)
    t2 = np.stack([p0, p2, p3], axis=1)
    corners = np.concatenate([t1, t2]).astype(np.float32)
    nn = np.concatenate([n, n]).astype(np.float32)
    normals = np.repeat(nn[:, None, :], 3, axis=1)
    return corners, normals
