# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Multi-host bring-up and data-parallel serving topology.

The north-star serving deployment (BASELINE.json): weights/KV
tensor-sharded over a device group's ICI, continuous batching scaled
across hosts over DCN. The TPU-native decomposition:

- **Tensor parallelism** lives *inside* one engine: a (1, tp) mesh whose
  "model" axis carries the Megatron collectives over ICI
  (``LLMEngine(mesh=...)``).
- **Data parallelism** lives *outside* the engine: one engine per device
  group (per host on a multi-host slice), each with its own scheduler,
  page pool, and request queue. DCN carries no tensor traffic at all —
  requests are routed to engines by a front-end, so there is nothing to
  synchronize between groups. This is why the engine rejects data>1
  meshes: a cross-group decode batch would force every scheduler
  decision to be replicated losslessly across hosts for zero bandwidth
  win (the KV pool is already fully local to each group).

Single-process multi-device (one host, N chips): use
``DataParallelEngineGroup`` to run dp independent TP engines over
disjoint device groups.

Multi-host (one process per host): call :func:`initialize` first; each
host then builds its local engine via :func:`local_engine`. Requests are
sharded across hosts by any front-end (round-robin DNS, a queue, ...).
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
from jax.sharding import Mesh

from conch_tpu.serving.engine import EngineConfig, LLMEngine
from conch_tpu.serving.sampling import SamplingParams


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Iterable[int] | None = None,
) -> None:
    """Multi-host JAX bring-up (one call per host process, before any jax op).

    Thin wrapper over ``jax.distributed.initialize``: on TPU pods the
    coordinator/process arguments are auto-detected from the metadata
    server, so a bare ``initialize()`` suffices; explicit arguments are
    for CPU/GPU clusters and tests.
    """
    kwargs: dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def tp_mesh(devices=None, tp: int | None = None) -> Mesh:
    """A (1, tp) serving mesh whose "model" axis is the fast (ICI) axis."""
    import numpy as np

    devices = list(devices) if devices is not None else jax.local_devices()
    tp = tp or len(devices)
    if tp > len(devices):
        msg = f"tp={tp} exceeds {len(devices)} available devices"
        raise ValueError(msg)
    grid = np.asarray(devices[:tp]).reshape(1, tp)
    return Mesh(grid, axis_names=("data", "model"))


def local_engine(
    params: dict,
    model_config,
    engine_config: EngineConfig,
    *,
    tp: int | None = None,
    cache_dtype=None,
) -> LLMEngine:
    """This host's tensor-parallel engine shard (multi-host DP serving).

    Each host calls this with the same params/config; the engine spans the
    host's addressable devices only, so scheduling stays host-local and
    DCN carries no tensor traffic.
    """
    return LLMEngine(
        params, model_config, engine_config,
        cache_dtype=cache_dtype, mesh=tp_mesh(jax.local_devices(), tp),
    )


class DataParallelEngineGroup:
    """dp independent TP engines over disjoint device groups (one process).

    The single-process analog of per-host engine shards: requests are
    routed round-robin (the least-loaded group would be the production
    policy), each engine schedules and steps independently, and results
    merge on the host. Useful for single-host multi-chip serving and for
    validating the DP topology on a virtual CPU mesh.
    """

    def __init__(
        self,
        params: dict,
        model_config,
        engine_config: EngineConfig,
        *,
        dp: int,
        tp: int,
        devices=None,
        cache_dtype=None,
    ):
        devices = list(devices) if devices is not None else jax.devices()
        if dp * tp > len(devices):
            msg = f"dp x tp = {dp}x{tp} needs {dp * tp} devices, have {len(devices)}"
            raise ValueError(msg)
        self.engines = [
            LLMEngine(
                params, model_config, engine_config, cache_dtype=cache_dtype,
                mesh=tp_mesh(devices[g * tp : (g + 1) * tp]),
            )
            for g in range(dp)
        ]
        self._next_group = 0
        self._route: dict[tuple[int, int], int] = {}  # (group, local id) keyed results

    def add_request(self, prompt: list[int], sampling: SamplingParams | None = None) -> tuple[int, int]:
        """Route a request round-robin; returns (group, local request id)."""
        g = self._next_group
        self._next_group = (self._next_group + 1) % len(self.engines)
        rid = self.engines[g].add_request(prompt, sampling)
        return (g, rid)

    def step(self) -> list[tuple[tuple[int, int], list[int]]]:
        """Step every engine; returns [((group, rid), output_tokens)]."""
        finished = []
        for g, eng in enumerate(self.engines):
            for req in eng.step():
                finished.append(((g, req.request_id), req.output_tokens))
        return finished

    @property
    def busy(self) -> bool:
        return any(e.waiting or e.running for e in self.engines)

    def generate(
        self, prompts: list[list[int]], sampling: SamplingParams | None = None
    ) -> list[list[int]]:
        keys = [self.add_request(p, sampling) for p in prompts]
        results: dict[tuple[int, int], list[int]] = {}
        while self.busy:
            for key, toks in self.step():
                results[key] = toks
        return [results[k] for k in keys]
