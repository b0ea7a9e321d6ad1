# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Detect inter-window measurement contradictions in the benchmark ledger.

Every benchmark CLI appends its rows to
``tools/drive/logs/measurements.jsonl``
(``conch_tpu.utils.benchmark.record_measurements``). The tunneled dev
chip delivers a fluctuating fraction of nominal bandwidth, so the same
tag can legitimately measure 2x apart in raw ms across windows — but
after normalizing by each window's calibrated bandwidth the numbers
should agree. This tool groups ledger entries by tag and flags tags
whose calibration-normalized medians spread by more than ``--threshold``
(default 1.5x): those rows contradict each other and neither should be
quoted without reconciliation (round-4 verdict: the [UNSTABLE] flag
only catches intra-window noise).

Usage:
    python tools/check_window_consistency.py [--ledger PATH] [--threshold X]

Exit code 1 when contradictions exist (CI-able).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
from collections import defaultdict


def main() -> int:
    parser = argparse.ArgumentParser()
    default_ledger = pathlib.Path(__file__).resolve().parent / "drive" / "logs" / "measurements.jsonl"
    parser.add_argument("--ledger", default=str(default_ledger))
    parser.add_argument("--threshold", type=float, default=1.5)
    parser.add_argument(
        "--raw", action="store_true",
        help="compare raw ms instead of calibration-normalized values "
        "(entries without a calibration are always compared raw)",
    )
    args = parser.parse_args()

    path = pathlib.Path(args.ledger)
    if not path.exists():
        print(f"no ledger at {path}; nothing to check")
        return 0

    # A spread is only a *contradiction* when the code was the same: a
    # kernel fix SHOULD move the number (e.g. r5's fp8 bit-algebra dequant,
    # 70 -> 196 GB/s). Newer ledger rows carry a "git" stamp and group by
    # it; rows predating the stamp can be marked superseded-by-a-code-change
    # in reconciliations.jsonl ({"tag", "through_ts", "reason"}) — a dated,
    # auditable record, not silent row deletion.
    superseded: dict[str, tuple[str, str]] = {}
    rec_path = path.parent / "reconciliations.jsonl"
    if rec_path.exists():
        for line in rec_path.read_text().splitlines():
            line = line.strip()
            if line:
                r = json.loads(line)
                superseded[r["tag"]] = (r["through_ts"], r["reason"])

    by_tag: dict[tuple[str, str | None], list[dict]] = defaultdict(list)
    n_superseded = 0
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        if e.get("unstable") or e.get("over_window"):
            continue  # already flagged at measurement time
        tag = e["tag"]
        if tag in superseded and e["ts"] <= superseded[tag][0]:
            n_superseded += 1
            continue
        by_tag[(tag, e.get("git"))].append(e)
    if n_superseded:
        print(f"(skipped {n_superseded} superseded rows — see {rec_path.name})")

    contradictions = 0
    for tag, git in sorted(by_tag, key=lambda k: (k[0], k[1] or "")):
        entries = by_tag[(tag, git)]
        if len(entries) < 2:
            continue

        def norm(e: dict) -> tuple[float, str]:
            cal = e.get("calibration_gbps")
            if not args.raw and cal and e.get("achieved_gbps"):
                # fraction of that window's achievable bandwidth —
                # window-independent when the kernel is HBM-bound
                return e["achieved_gbps"] / cal, "frac-of-window"
            return e["median_ms"], "ms"

        vals = [norm(e) for e in entries]
        units = {u for _, u in vals}
        if len(units) > 1:
            # mixed calibrated/uncalibrated history: compare raw ms
            vals = [(e["median_ms"], "ms") for e in entries]
        nums = [v for v, _ in vals]
        lo, hi = min(nums), max(nums)
        if lo <= 0 or hi / lo <= args.threshold:
            continue
        contradictions += 1
        unit = vals[0][1]
        print(f"CONTRADICTION {tag}: {hi / lo:.2f}x spread ({unit})")
        for e, (v, _) in zip(entries, vals):
            cal = e.get("calibration_gbps")
            cal_s = f" cal={cal:.0f}GB/s" if cal else ""
            gbps = e.get("achieved_gbps")
            gbps_s = f" {gbps:.0f}GB/s" if gbps else ""
            print(f"  {e['ts']}  {e['median_ms']:.4f} ms{gbps_s}{cal_s}  -> {v:.4g} {unit}")

    if contradictions:
        print(f"\n{contradictions} tag(s) with inter-window contradictions — reconcile before quoting.")
        return 1
    print(f"ledger consistent: {len(by_tag)} tags, threshold {args.threshold}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
