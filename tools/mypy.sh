#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Type-check the package (parity: reference tools/mypy.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m mypy conch_tpu "$@"
