"""Quick tree-tier timing probe: pack + warm + N timed samples.

Usage: python tools/quick_bench.py [width height warm timed]
Respects LUM_TRAV_SORT_EVERY / LUM_TRAV_ROWMAJOR / LUM_NO_PALLAS.
"""

import os
import sys
import time

CHUNK = int(os.environ.get("LUM_QB_CHUNK", str(1 << 20)))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
WARM = int(sys.argv[3]) if len(sys.argv) > 3 else 14
TIMED = int(sys.argv[4]) if len(sys.argv) > 4 else 8


def main():
    from luminary_tpu.testing import benchmark_scene
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    scene = benchmark_scene(W, H, max_depth=4)
    t0 = time.time()
    r = Renderer(scene, chunk=CHUNK)
    print(f"pack {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    r.render_samples(WARM)
    print(f"warm{WARM} {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    r.render_samples(TIMED)
    dt = time.time() - t0
    rays = r._last_rays_per_sample
    print(f"{TIMED} samples: {dt / TIMED * 1000:.0f} ms/sample  "
          f"{rays * TIMED / dt / 1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
