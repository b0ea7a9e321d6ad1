#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Coverage workflow (parity: reference docs/development/coverage.md).
# Requires `pip install coverage` (not in the TPU CI image).
#
# tests/conftest.py normally re-execs pytest onto a clean CPU environment;
# execve would drop an in-process coverage tracer, so this script pre-sets
# that environment itself (_CONCH_TPU_TEST_REEXEC=1 disables the re-exec)
# and runs pytest under coverage directly.
set -euo pipefail
cd "$(dirname "$0")/.."

python -c "import coverage" 2>/dev/null || {
  echo "error: the 'coverage' package is not installed (pip install coverage)" >&2
  exit 1
}

export _CONCH_TPU_TEST_REEXEC=1
export JAX_PLATFORMS=cpu
unset PYTHONPATH
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"

# -n 0: keep xdist loaded (addopts pass -n) but run in-process so the
# tracer sees the tests; a single process is fine for a coverage pass.
python -m coverage run -m pytest tests/ -q -n 0 "$@"
python -m coverage report
echo "html report: python -m coverage html -> htmlcov/"
