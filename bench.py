"""Benchmark entry point — prints ONE JSON line for the driver.

Metric: Mrays/sec/chip on the standard benchmark scene (BASELINE.md: target
>= 100 Mrays/s/chip). Runs on whatever platform JAX resolves (the tunneled
TPU chip under the driver; CPU with BENCH_CPU=1 for local smoke).
"""

import json
import os
import sys
import time

BASELINE_MRAYS = 100.0


def main():
    if os.environ.get("BENCH_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.testing import cornell_scene

    width = int(os.environ.get("BENCH_WIDTH", "512"))
    height = int(os.environ.get("BENCH_HEIGHT", "512"))
    depth = int(os.environ.get("BENCH_DEPTH", "4"))
    # The remote executor's first ~12 invocations of a fresh executable run
    # ~40 ms slower each; warm past that so the metric is steady-state.
    warmup = int(os.environ.get("BENCH_WARMUP", "16"))
    samples = int(os.environ.get("BENCH_SAMPLES", "64"))

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    t0 = time.monotonic()
    scene = cornell_scene(width, height, max_depth=depth)
    r = Renderer(scene, chunk=int(os.environ.get("BENCH_CHUNK", str(1 << 20))))
    log(f"bench: pack done in {time.monotonic()-t0:.1f}s")

    t0 = time.monotonic()
    r.render_samples(warmup)  # compile + warm caches
    log(f"bench: warmup ({warmup} samples incl. compile) {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    r.render_samples(samples)
    dt = time.monotonic() - t0
    log(f"bench: {samples} samples in {dt:.2f}s")

    rays_per_sample = r._last_rays_per_sample
    mrays = rays_per_sample * samples / dt / 1e6
    result = {
        "metric": "Mrays/sec/chip (cornell %dx%d depth %d)" % (width, height, depth),
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
