"""Per-stage render profiling.

The reference times every kernel with CUDA events behind
DEVICE_RENDERER_DO_PER_KERNEL_TIMING and prints a percentage breakdown
(reference: device_renderer.c:282-343, 608-638). The TPU equivalent wraps
one sample in a jax.profiler trace and aggregates the device ops from the
Chrome-trace export into named stage groups.

Usage:
    from luminary_tpu.utils.profiling import profile_renderer
    rows = profile_renderer(renderer)   # [(group, ms, percent), ...]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile

# op-name prefixes → readable stage groups
_GROUPS = [
    ("copy", "while-loop state copies"),
    ("iota", "argmin/iota reductions"),
    ("select_reduce", "masked reductions"),
    ("compare_select", "compare/select chains"),
    ("gather", "row gathers"),
    ("dynamic-slice", "dynamic slices"),
    ("dynamic_update", "dynamic updates"),
    ("sort", "wavefront sort"),
    ("fusion", "fused compute (slab/M-T/shading)"),
    ("convert", "dtype conversion"),
    ("transpose", "transposes"),
    ("reduce", "reductions"),
    ("scatter", "scatters"),
]


def summarize_trace(trace_dir: str) -> list[tuple[str, float]]:
    """Aggregate device op durations (ms) by stage group from a
    jax.profiler trace directory."""
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        return []
    tot: collections.Counter = collections.Counter()
    for path in paths:
        events = json.load(gzip.open(path)).get("traceEvents", [])
        for e in events:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            name = e.get("name", "")
            # skip host-side / framework frames
            if name.startswith(("$", "jit", "while", "Pjit", "Device")):
                continue
            for prefix, label in _GROUPS:
                if name.startswith(prefix):
                    tot[label] += e["dur"]
                    break
            else:
                tot["other device ops"] += e["dur"]
    return [(k, v / 1e3) for k, v in tot.most_common()]


def profile_renderer(renderer, samples: int = 1, trace_dir: str | None = None):
    """Render `samples` under a profiler trace; returns
    [(group, ms, percent)] sorted by cost. The trace directory is kept when
    trace_dir is given (inspect with TensorBoard), else temporary."""
    import jax

    own = trace_dir is None
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="lum_profile_")
    renderer.update()
    if renderer.sample_count == 0:  # compile outside the trace
        renderer.render_samples(1)
    with jax.profiler.trace(trace_dir):
        renderer.render_samples(samples)
    rows = summarize_trace(trace_dir)
    total = sum(ms for _, ms in rows) or 1.0
    out = [(g, ms, 100.0 * ms / total) for g, ms in rows]
    if own:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)
    return out


def format_breakdown(rows) -> str:
    lines = ["  %8s  %5s  %s" % ("ms", "%", "stage")]
    for g, ms, pct in rows:
        lines.append("  %8.2f  %5.1f  %s" % (ms, pct, g))
    return "\n".join(lines)
