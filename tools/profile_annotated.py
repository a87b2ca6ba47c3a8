"""Annotated render profile: map the most expensive device ops to SOURCE.

Traces N samples of the tree-tier bench scene, aggregates per-HLO-op
durations from the Chrome trace, then joins op names against XLA's dumped
optimized HLO (run with XLA_FLAGS=--xla_dump_to=<dir>) to recover each
fusion's jax source location (metadata op_name / source_file:line). This
answers "which Python line is this 70 ms fusion?" — profiling by op-type
prefix cannot.

Usage:
  XLA_FLAGS=--xla_dump_to=/tmp/hlo_dump python tools/profile_annotated.py \
      [width height samples]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
S = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def hlo_source_map(dump_dir):
    """op name -> 'op_name source_file:line' from dumped optimized HLO."""
    src = {}
    if not dump_dir:
        return src
    pat = re.compile(
        r"%?([\w.\-]+) = .*?metadata={([^}]*)}")
    op_name_pat = re.compile(r'op_name="([^"]*)"')
    file_pat = re.compile(r'source_file="([^"]*)"')
    line_pat = re.compile(r"source_line=(\d+)")
    for path in glob.glob(os.path.join(dump_dir, "*after_optimizations.txt")):
        with open(path) as f:
            for line in f:
                m = pat.search(line)
                if not m:
                    continue
                name, meta = m.groups()
                op = op_name_pat.search(meta)
                fl = file_pat.search(meta)
                ln = line_pat.search(meta)
                parts = []
                if fl:
                    parts.append("%s:%s" % (os.path.basename(fl.group(1)),
                                            ln.group(1) if ln else "?"))
                if op:
                    parts.append(op.group(1)[-70:])
                if parts and name not in src:
                    src[name] = "  ".join(parts)
    return src


def parse_hlo_text(txt):
    """op name -> 'source_file:line op_name' from one HLO module text."""
    src = {}
    pat = re.compile(r"%?([\w.\-]+) = .*?metadata={([^}]*)}")
    op_name_pat = re.compile(r'op_name="([^"]*)"')
    file_pat = re.compile(r'source_file="([^"]*)"')
    line_pat = re.compile(r"source_line=(\d+)")
    for line in txt.splitlines():
        m = pat.search(line)
        if not m:
            continue
        name, meta = m.groups()
        op = op_name_pat.search(meta)
        fl = file_pat.search(meta)
        ln = line_pat.search(meta)
        parts = []
        if fl:
            parts.append("%s:%s" % (os.path.basename(fl.group(1)),
                                    ln.group(1) if ln else "?"))
        if op:
            parts.append(op.group(1)[-90:])
        if parts and name not in src:
            src[name] = "  ".join(parts)
    return src


def main():
    from luminary_tpu.testing import benchmark_scene, cornell_scene
    from luminary_tpu.render.renderer import Renderer
    from luminary_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if os.environ.get("LUM_PROFILE_SCENE", "tree") == "cornell":
        scene = cornell_scene(W, H, max_depth=4)
    else:
        scene = benchmark_scene(W, H, max_depth=4)
    t0 = time.time()
    r = Renderer(scene, chunk=1 << 20)
    print(f"pack {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    r.render_samples(2)
    print(f"warm2 {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    r.render_samples(4)
    dt = time.time() - t0
    print(f"4 samples: {dt / 4 * 1000:.0f} ms/sample", flush=True)

    td = "/tmp/lum_trace_a"
    os.system("rm -rf " + td)
    with jax.profiler.trace(td):
        r.render_samples(S)

    tot = collections.Counter()
    for p in glob.glob(td + "/plugins/profile/*/*.trace.json.gz"):
        for e in json.load(gzip.open(p)).get("traceEvents", []):
            if e.get("ph") != "X" or "dur" not in e:
                continue
            name = e.get("name", "")
            if name.startswith(("$", "jit", "while", "Pjit", "Device",
                                "thread", "process", "np.asarray",
                                "copy-start", "copy-done")):
                continue
            tot[name] += e["dur"]
    grand = sum(tot.values())
    print(f"device total {grand / 1e3:.0f} ms over {S} samples "
          f"({grand / 1e3 / S:.0f} ms/sample)", flush=True)

    dump_dir = ""
    for part in os.environ.get("XLA_FLAGS", "").split():
        if part.startswith("--xla_dump_to="):
            dump_dir = part.split("=", 1)[1]
    src = hlo_source_map(dump_dir)
    if not src:
        # Tunneled backends compile remotely (no local dump files); AOT
        # lower+compile the hot step and parse compiled.as_text() instead.
        import jax.numpy as jnp
        from luminary_tpu.render.renderer import _sample_step

        txt = _sample_step.lower(
            r.device_scene, r.device_camera, r.config, r._px, r._py,
            jnp.uint32(0), r.accum,
        ).compile().as_text()
        with open("/tmp/lum_hlo.txt", "w") as f:
            f.write(txt)
        src = parse_hlo_text(txt)
    print(f"(source map: {len(src)} ops)", flush=True)

    for name, us in tot.most_common(60):
        loc = src.get(name, "")
        print(f"{us / 1e3:9.1f}  {name[:34]:34s} {loc[:100]}", flush=True)

    # aggregate by source location (first field of the mapping)
    by_loc = collections.Counter()
    for name, us in tot.items():
        loc = src.get(name, "?")
        by_loc[loc.split("  ")[0]] += us
    print("\n--- by source location ---", flush=True)
    for loc, us in by_loc.most_common(50):
        print(f"{us / 1e3:9.1f}  {loc[:110]}", flush=True)


if __name__ == "__main__":
    main()
