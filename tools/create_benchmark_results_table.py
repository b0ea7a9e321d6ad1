# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Run every op microbenchmark and render a results table.

Parity with the reference's ``tools/create_benchmark_results_table.py``:
collects each ``benchmarks/*_benchmark.py`` CSV output and prints a
markdown table (written to stdout or --output).
"""

from __future__ import annotations

import argparse
import os
import pathlib
import subprocess
import sys

BENCH_DIR = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"


def run_benchmark(path: pathlib.Path, iterations: int) -> list[tuple[str, float]]:
    """Run one benchmark CLI; returns [(tag, median_ms)]."""
    env = dict(os.environ)
    repo_root = str(BENCH_DIR.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(path), "--csv", "--iterations", str(iterations)],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=repo_root,
        env=env,
    )
    rows = []
    for line in proc.stdout.splitlines():
        parts = line.strip().split(",")
        if len(parts) >= 5 and parts[0] != "tag":
            try:
                gbps = float(parts[6]) if len(parts) > 6 and parts[6] else None
                rows.append((parts[0], float(parts[4]), gbps))
            except ValueError:
                continue
    if proc.returncode != 0:
        print(f"[warn] {path.name} failed:\n{proc.stderr[-500:]}", file=sys.stderr)
    return rows


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--output", type=pathlib.Path, default=None)
    parser.add_argument("--only", default=None, help="substring filter on benchmark file names")
    args = parser.parse_args()

    # Stamp the chip's achievable bandwidth at generation time: the
    # tunneled dev chip fluctuates, so absolute times are only
    # interpretable relative to this calibration. Run in a subprocess —
    # the device supports one client at a time and the per-bench children
    # below each need to claim it.
    env = dict(os.environ)
    env["PYTHONPATH"] = str(BENCH_DIR.parent) + os.pathsep + env.get("PYTHONPATH", "")
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; from conch_tpu.utils.benchmark import calibrate_hbm_bw; "
         "print(jax.devices()[0].device_kind); print(calibrate_hbm_bw())"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    try:
        kind, bw = probe.stdout.strip().splitlines()[-2:]
        header = (
            f"<!-- device: {kind}, calibrated GEMV bandwidth at generation "
            f"time: {float(bw) / 1e9:.0f} GB/s -->"
        )
    except (ValueError, IndexError):
        header = "<!-- calibration failed -->"
    print(header.strip("<!- >"), file=sys.stderr)

    try:
        cal_gbps = float(bw) / 1e9
    except (NameError, ValueError):
        cal_gbps = None
    lines = [header, "| Benchmark | Case | Median (ms) | Achieved GB/s | % of calibrated bw |", "|---|---|---|---|---|"]
    for bench in sorted(BENCH_DIR.glob("*_benchmark.py")):
        if args.only and args.only not in bench.name:
            continue
        for tag, median, gbps in run_benchmark(bench, args.iterations):
            if gbps is None:
                gcol, pcol = "—", "—"
            else:
                gcol = f"{gbps:.1f}"
                frac = gbps / cal_gbps * 100 if cal_gbps else None
                # Rows implying more bandwidth than the chip can deliver in
                # this window are measurement bugs: flag, never publish as wins.
                pcol = "—" if frac is None else (f"{frac:.0f}% ⚠BOGUS" if frac > 110 else f"{frac:.0f}%")
            lines.append(f"| {bench.stem} | {tag} | {median:.4f} | {gcol} | {pcol} |")
            print(f"{bench.stem}: {tag} = {median:.4f} ms ({gcol} GB/s)", file=sys.stderr)

    table = "\n".join(lines)
    if args.output:
        args.output.write_text(table + "\n")
    else:
        print(table)


if __name__ == "__main__":
    main()
