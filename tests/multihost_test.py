# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Real multi-process "multi-host" test: 2 workers over a TCP coordinator.

The virtual-mesh tests elsewhere prove the sharding MATH on 8 in-process
devices; this test proves the multi-host BRING-UP PATH (SURVEY.md §2.8):
``jax.distributed.initialize`` against a real coordinator, cross-process
collectives, a TP decode whose "model" axis spans process boundaries, and
the orbax sharded checkpoint round-trip where each process writes/reads
only its own shards. See ``multihost_worker.py`` for the checks.
"""

from __future__ import annotations

import os
import pathlib
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_multihost(tmp_path):
    repo = pathlib.Path(__file__).resolve().parents[1]
    worker = repo / "tests" / "multihost_worker.py"
    port = _free_port()
    nprocs = 2
    ckpt_dir = tmp_path / "shared_ckpt"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(repo)  # drop sitecustomize hooks pinning a TPU backend
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("_CONCH_TPU_TEST_REEXEC", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(nprocs), str(port), str(ckpt_dir)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nprocs)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        for marker in (
            "devices ok: 8 global",
            "dp-across-hosts reduce ok",
            "tp8 cross-process decode ok",
            "sharded checkpoint round-trip ok",
            "ALL OK",
        ):
            assert f"[worker {pid}] {marker}" in out, f"worker {pid} missing '{marker}':\n{out}"
