"""Convergence comparison across benchmark runs.

Equivalent of the reference's top-level comparison.py (reference:
comparison.py:8-78 — per-output mean FLIP error vs a reference image, plotted
as log-error against samples and against wall time, across test sets).

Given one or more benchmark output directories (each holding
``Bench-<spp>-<name>.png`` + ``BenchResults-<name>.txt`` CSVs produced by
luminary_tpu.frontend.benchmark), this computes per-output error against a
reference image (the highest-spp render by default) and writes a CSV of
(name, spp, seconds, rmse, flip) rows; with matplotlib available it also
saves log-log convergence plots.

The FLIP column is a lightweight perceptual approximation (luminance-edge
weighted error in a gamma-mapped space), not the full NVIDIA LDR-FLIP
pipeline; RMSE is exact.

Usage: python tools/comparison.py <run_dir> [<run_dir> ...] [--ref img.png]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from luminary_tpu.io.png import read_png  # noqa: E402


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.float64) - b.astype(np.float64)
    return float(np.sqrt(np.mean(d * d)))


def flip_approx(a: np.ndarray, b: np.ndarray) -> float:
    """Perceptually weighted error: differences count more along luminance
    edges and in mid-tones (a cheap stand-in for LDR-FLIP's feature and
    color pipelines)."""
    a = a.astype(np.float64) / 255.0 if a.max() > 1.5 else a.astype(np.float64)
    b = b.astype(np.float64) / 255.0 if b.max() > 1.5 else b.astype(np.float64)
    la = 0.2126 * a[..., 0] + 0.7152 * a[..., 1] + 0.0722 * a[..., 2]
    lb = 0.2126 * b[..., 0] + 0.7152 * b[..., 1] + 0.0722 * b[..., 2]

    def edges(l):
        gx = np.abs(np.diff(l, axis=1, append=l[:, -1:]))
        gy = np.abs(np.diff(l, axis=0, append=l[-1:, :]))
        return np.sqrt(gx * gx + gy * gy)

    w = 1.0 + 4.0 * np.maximum(edges(la), edges(lb))
    err = np.mean(np.abs(a - b), axis=-1) ** 0.7  # FLIP-style compression
    return float(np.mean(w * err) / np.mean(w))


def load_run(run_dir: str):
    """Returns (name, [(spp, seconds, png_path)]) sorted by spp."""
    csvs = [f for f in os.listdir(run_dir) if f.startswith("BenchResults-")]
    if not csvs:
        raise SystemExit(f"no BenchResults-*.txt in {run_dir}")
    name = csvs[0][len("BenchResults-"):-len(".txt")]
    rows = []
    with open(os.path.join(run_dir, csvs[0])) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) >= 2 and parts[0].isdigit():
                spp = int(parts[0])
                seconds = float(parts[1])
                png = os.path.join(run_dir, f"Bench-{spp}-{name}.png")
                if os.path.exists(png):
                    rows.append((spp, seconds, png))
    rows.sort()
    return name, rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="+", help="benchmark output directories")
    ap.add_argument("--ref", default=None,
                    help="reference image (default: highest-spp render)")
    ap.add_argument("--out", default="comparison.csv")
    args = ap.parse_args(argv)

    results = {}
    for run_dir in args.runs:
        name, rows = load_run(run_dir)
        ref = (np.asarray(read_png(args.ref)) if args.ref
               else np.asarray(read_png(rows[-1][2])))
        series = []
        for spp, seconds, png in rows:
            img = np.asarray(read_png(png))
            if img.shape != ref.shape:
                continue
            series.append((spp, seconds, rmse(img, ref), flip_approx(img, ref)))
        results[name] = series

    with open(args.out, "w") as f:
        f.write("name,spp,seconds,rmse,flip\n")
        for name, series in results.items():
            for spp, seconds, r, fl in series:
                f.write(f"{name},{spp},{seconds:.4f},{r:.6f},{fl:.6f}\n")
    print(f"wrote {args.out}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for name, series in results.items():
            spp = [s for s, *_ in series[:-1]]
            secs = [t for _, t, *_ in series[:-1]]
            fl = [f_ for *_, f_ in series[:-1]]
            axes[0].loglog(spp, fl, marker="o", label=name)
            axes[1].loglog(secs, fl, marker="o", label=name)
        axes[0].set_xlabel("samples")
        axes[1].set_xlabel("seconds")
        for ax in axes:
            ax.set_ylabel("mean FLIP (approx)")
            ax.grid(True, which="both", alpha=0.3)
            ax.legend()
        fig.tight_layout()
        fig.savefig("comparison.png", dpi=120)
        print("wrote comparison.png")
    except Exception as e:  # matplotlib optional
        print(f"(no plot: {e})")


if __name__ == "__main__":
    main()
