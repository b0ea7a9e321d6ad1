# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Test configuration: run on a virtual 8-device CPU mesh.

Tests run everywhere (no TPU required): Pallas kernels execute in
interpreter mode on CPU (see ``conch_tpu/kernels/common.py``), and
multi-device sharding tests use the 8 virtual CPU devices forced here.
This mirrors the reference's "tests runnable on any platform" strategy
(SURVEY.md §4).
"""

import os
import sys

# Unit tests must run on CPU (fast, parallel-safe, no TPU lock contention).
# In TPU environments a sitecustomize hook (e.g. the axon PJRT plugin on
# PYTHONPATH) imports and initializes JAX at interpreter startup, before
# conftest can set JAX_PLATFORMS — so env vars alone cannot force CPU.
# Solution: re-exec pytest once with a cleaned environment. The exec happens
# in pytest_configure, after restoring pytest's fd capture so the re-exec'd
# process writes to the real stdout.


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on real TPU hardware (Mosaic lowering, not interpret mode)"
    )
    if os.environ.get("_CONCH_TPU_TEST_REEXEC") == "1":
        return
    # `pytest -m tpu` selects the hardware tier: keep the ambient TPU
    # backend (axon sitecustomize) instead of re-exec'ing onto CPU.
    if (getattr(config.option, "markexpr", "") or "").strip() == "tpu":
        os.environ["_CONCH_TPU_TEST_REEXEC"] = "1"  # stop children re-execing
        return
    env = dict(os.environ)
    env["_CONCH_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop sitecustomize hooks that pin a TPU backend
    xla_flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        env["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
