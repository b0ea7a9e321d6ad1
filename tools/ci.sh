#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# One-shot CI: full CPU test suite + lint + type check, tee'd to one log.
#
# Usage: tools/ci.sh [extra pytest args]
# Writes tools/drive/logs/ci.log (the single committed green artifact per
# round — "done" is a log, not a claim). Lint/type steps run when the
# tools are installed and are SKIPPED (not failed) otherwise: the TPU CI
# image ships without ruff/mypy; the dev pre-commit flow covers them.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=tools/drive/logs/ci.log
mkdir -p "$(dirname "$LOG")"

{
  echo "=== conch_tpu CI: $(date -u +%Y-%m-%dT%H:%M:%SZ) $(git rev-parse --short HEAD 2>/dev/null) ==="
  rc=0

  echo "--- pytest tests/ -q"
  python -m pytest tests/ -q "$@" || rc=1

  if python -c "import ruff" 2>/dev/null || command -v ruff >/dev/null; then
    echo "--- ruff check"
    (command -v ruff >/dev/null && ruff check conch_tpu tests benchmarks tools \
      || python -m ruff check conch_tpu tests benchmarks tools) || rc=1
  else
    echo "--- ruff: not installed, SKIPPED"
  fi

  if python -c "import mypy" 2>/dev/null; then
    echo "--- mypy conch_tpu"
    python -m mypy conch_tpu || rc=1
  else
    echo "--- mypy: not installed, SKIPPED"
  fi

  if [ "$rc" -eq 0 ]; then echo "=== CI GREEN ==="; else echo "=== CI FAILED ==="; fi
  exit "$rc"
} 2>&1 | tee "$LOG"
exit "${PIPESTATUS[0]}"
