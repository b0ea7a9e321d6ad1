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


def run_benchmark(path: pathlib.Path, iterations: int) -> tuple[list[tuple[str, float]], float | None]:
    """Run one benchmark CLI; returns ([(tag, median_ms, gbps)], cal_gbps).

    Each benchmark self-calibrates in-process (``--calibrate``): the
    tunneled chip's bandwidth fluctuates between windows, so a row's
    %-of-bandwidth is only meaningful against a calibration taken in the
    SAME process as the measurement.
    """
    env = dict(os.environ)
    repo_root = str(BENCH_DIR.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(path), "--csv", "--calibrate", "--iterations", str(iterations)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=repo_root,
        env=env,
    )
    rows = []
    cal_gbps = None
    for line in proc.stdout.splitlines():
        if line.startswith("# calibration_gbps,"):
            cal_gbps = float(line.split(",")[1])
            continue
        parts = line.strip().split(",")
        if len(parts) >= 5 and parts[0] != "tag":
            try:
                gbps = float(parts[6]) if len(parts) > 6 and parts[6] else None
                rows.append((parts[0], float(parts[4]), gbps))
            except ValueError:
                continue
    if proc.returncode != 0:
        print(f"[warn] {path.name} failed:\n{proc.stderr[-500:]}", file=sys.stderr)
    return rows, cal_gbps


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--output", type=pathlib.Path, default=None)
    parser.add_argument("--only", default=None, help="substring filter on benchmark file names")
    args = parser.parse_args()

    # Identify the device (cheap probe, no calibration: each benchmark
    # self-calibrates in its own process/window below).
    env = dict(os.environ)
    env["PYTHONPATH"] = str(BENCH_DIR.parent) + os.pathsep + env.get("PYTHONPATH", "")
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.devices()[0].device_kind)"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    kind = (probe.stdout.strip().splitlines() or ["unknown"])[-1]

    body = []
    cals = []
    rejected = []
    for bench in sorted(BENCH_DIR.glob("*_benchmark.py")):
        if args.only and args.only not in bench.name:
            continue
        rows, cal_gbps = run_benchmark(bench, args.iterations)
        if cal_gbps is not None and any(
            g is not None and g > cal_gbps * 1.1 for _, _, g in rows
        ):
            # A row implying more bandwidth than the same-window calibration
            # is a measurement bug (utils/benchmark.py contract). Retry the
            # whole file once in a fresh window before rejecting.
            print(f"[retry] {bench.name}: row exceeded window calibration", file=sys.stderr)
            rows, cal_gbps = run_benchmark(bench, args.iterations)
        if cal_gbps is not None:
            cals.append(cal_gbps)
        for tag, median, gbps in rows:
            frac = gbps / cal_gbps * 100 if (gbps is not None and cal_gbps) else None
            if frac is not None and frac > 110:
                # REJECT: never publish a physically impossible row.
                rejected.append(f"{bench.stem}/{tag}: {gbps:.1f} GB/s > window {cal_gbps:.0f} GB/s")
                print(f"{bench.stem}: {tag} REJECTED ({gbps:.1f} GB/s > window)", file=sys.stderr)
                continue
            gcol = "—" if gbps is None else f"{gbps:.1f}"
            pcol = "—" if frac is None else f"{frac:.0f}%"
            ccol = "—" if cal_gbps is None else f"{cal_gbps:.0f}"
            body.append(f"| {bench.stem} | {tag} | {median:.4f} | {gcol} | {ccol} | {pcol} |")
            print(f"{bench.stem}: {tag} = {median:.4f} ms ({gcol} GB/s, window {ccol} GB/s)", file=sys.stderr)

    cal_note = (
        f"same-window calibrations ranged {min(cals):.0f}-{max(cals):.0f} GB/s"
        if cals else "no calibrations recorded"
    )
    header = (
        f"<!-- device: {kind}; every benchmark process self-calibrates its "
        f"window's achievable bandwidth ({cal_note}); '% of window bw' is "
        f"achieved/window — the window-portable statistic. -->"
    )
    lines = [
        header,
        "| Benchmark | Case | Median (ms) | Achieved GB/s | Window bw (GB/s) | % of window bw |",
        "|---|---|---|---|---|---|",
        *body,
    ]
    if rejected:
        lines.append("")
        lines.append("Rejected rows (implied GB/s exceeded the same-window calibration twice —")
        lines.append("a measurement bug, not a fast kernel; see utils/benchmark.py):")
        lines.extend(f"- {r}" for r in rejected)
    table = "\n".join(lines)
    if args.output:
        args.output.write_text(table + "\n")
    else:
        print(table)
    if rejected:
        sys.exit(2)


if __name__ == "__main__":
    main()
