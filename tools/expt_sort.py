"""A/B: wavefront sort on/off on the tree-tier bench scene (real chip)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def run(sort):
    from luminary_tpu.testing import benchmark_scene
    from luminary_tpu.render.renderer import Renderer
    scene = benchmark_scene(1920, 1080, max_depth=4)
    r = Renderer(scene, chunk=1 << 20)
    if sort:
        r.config = r.config._replace(sort_wavefront=True)
    t0 = time.time(); r.render_samples(2); print(f"warm {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); r.render_samples(4); dt = (time.time()-t0)/4
    print(f"sort={sort}: {dt*1000:.0f} ms/sample", flush=True)
    return dt

if __name__ == "__main__":
    run(sort=(sys.argv[1] == "on"))
