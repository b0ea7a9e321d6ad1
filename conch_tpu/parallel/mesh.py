# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Device-mesh construction.

The distributed backbone absent from the reference (SURVEY.md §2.8): on
TPU, the "communication backend" is the device mesh itself — sharding
annotations over a ``jax.sharding.Mesh`` make XLA insert ICI collectives
(all-gather / reduce-scatter / psum); DCN handles the host-level ("data")
axis on multi-host slices.

Axis convention:
- ``data``:  data parallelism (batch / requests). Maps to DCN across
  hosts, ICI within a host.
- ``model``: tensor parallelism (attention heads, MLP columns, vocab).
  Must map to ICI: keep it innermost so the mesh's fastest axis carries
  the per-layer collectives.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def create_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    ``model`` is the minor (fastest-varying) axis so tensor-parallel
    collectives ride ICI neighbor links.
    """
    devices = devices if devices is not None else jax.devices()
    if data * model > len(devices):
        msg = f"Mesh {data}x{model} needs {data * model} devices, have {len(devices)}"
        raise ValueError(msg)
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))
