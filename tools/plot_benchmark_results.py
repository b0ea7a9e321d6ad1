# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Plot benchmark sweep results (parity: reference
``tools/plot_benchmark_results.py``).

Reads every ``*.csv`` in a results directory — the schema written by
``conch_tpu.utils.benchmark.BenchmarkResult.csv_row`` plus any extra
columns a sweep script appends (e.g. ``seq_len``) — and plots one line
per tag over the chosen x-axis column.

Usage:
    python tools/plot_benchmark_results.py --results-directory out/ \
        --x-axis seq_len [--y-axis median_ms] [--output plot.png]
"""

from __future__ import annotations

import argparse
import csv
import pathlib
import re
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402


def load_rows(results_directory: pathlib.Path) -> list[dict[str, str]]:
    rows: list[dict[str, str]] = []
    for path in sorted(results_directory.glob("*.csv")):
        with path.open() as fh:
            rows.extend(csv.DictReader(fh))
    return rows


def main() -> None:
    parser = argparse.ArgumentParser(description="Plot benchmark results")
    parser.add_argument("--results-directory", type=pathlib.Path, required=True)
    parser.add_argument("--x-axis", required=True, help="column for the x-axis (e.g. seq_len)")
    parser.add_argument("--y-axis", default="median_ms", help="column for the y-axis")
    parser.add_argument("--title", default=None)
    parser.add_argument("--logx", action="store_true")
    parser.add_argument("--logy", action="store_true")
    parser.add_argument("--output", type=pathlib.Path, default=pathlib.Path("benchmark_plot.png"))
    args = parser.parse_args()

    rows = load_rows(args.results_directory)
    if not rows:
        raise SystemExit(f"no CSV rows found in {args.results_directory}")

    series: dict[str, list[tuple[float, float]]] = defaultdict(list)
    for row in rows:
        if args.x_axis not in row or args.y_axis not in row:
            continue
        # Benchmark tags embed the shape (e.g. "paged_attention_b4_s8192");
        # strip it so one sweep forms one series per op.
        tag = re.sub(r"(_b\d+)?(_s\d+)?$", "", row["tag"])
        series[tag].append((float(row[args.x_axis]), float(row[args.y_axis])))

    if not series:
        raise SystemExit(f"columns {args.x_axis!r}/{args.y_axis!r} not present in results")

    fig, ax = plt.subplots(figsize=(8, 5))
    for tag, points in sorted(series.items()):
        points.sort()
        ax.plot([p[0] for p in points], [p[1] for p in points], marker="o", label=tag)
    if args.logx:
        ax.set_xscale("log", base=2)
    if args.logy:
        ax.set_yscale("log")
    ax.set_xlabel(args.x_axis)
    ax.set_ylabel(args.y_axis)
    ax.set_title(args.title or f"{args.y_axis} vs {args.x_axis}")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
