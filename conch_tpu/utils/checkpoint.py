# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Checkpoint save/restore for model params (aux subsystem, SURVEY.md §5).

The reference has no checkpointing (its closest analog is the
serializable ``QuantState``). Conch-TPU checkpoints full param pytrees —
including quantized ``QuantizedLinear`` leaves (packed int32 words,
scales, metadata) — as portable numpy ``.npz`` + ``.json`` metadata
(bf16/fp8 stored bit-exactly via raw-bits views). Quantized checkpoints
restore bit-exactly. Restore validates the tree structure and every
leaf's shape/dtype against the template pytree.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(params: Any) -> tuple[dict[str, np.ndarray], list]:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    for i, (path, leaf) in enumerate(leaves):
        arrays[f"leaf_{i}"] = np.asarray(leaf)
    return arrays, treedef


def save_checkpoint(path: str | pathlib.Path, params: Any) -> None:
    """Save a param pytree (quantized or dense) to ``path`` (.npz + .json)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    # bfloat16 has no portable npz representation: store raw bits + dtype tag.
    dtypes = {}
    for k in list(arrays.keys()):
        dt = str(arrays[k].dtype)
        dtypes[k] = dt
        if dt in ("bfloat16", "float8_e4m3fn", "float8_e5m2"):
            arrays[k] = arrays[k].view(np.uint16 if dt == "bfloat16" else np.uint8)

    np.savez(str(path.with_suffix(".npz")), **arrays)
    meta = {
        "treedef": str(jax.tree_util.tree_structure(params)),
        "dtypes": dtypes,
        "num_leaves": len(leaves),
    }
    path.with_suffix(".json").write_text(json.dumps(meta))


def restore_checkpoint(path: str | pathlib.Path, params_like: Any) -> Any:
    """Restore a param pytree saved by :func:`save_checkpoint`.

    ``params_like`` provides the tree structure (e.g. a freshly
    ``init_llama_params``-created pytree with the same config/quant mode).
    """
    path = pathlib.Path(path)
    meta = json.loads(path.with_suffix(".json").read_text())
    data = np.load(str(path.with_suffix(".npz")))

    leaves_like, treedef = jax.tree_util.tree_flatten(params_like)
    if len(leaves_like) != meta["num_leaves"]:
        msg = (
            f"Checkpoint has {meta['num_leaves']} leaves but template has "
            f"{len(leaves_like)} - config/quant mode mismatch?"
        )
        raise ValueError(msg)
    saved_treedef = meta.get("treedef")
    if saved_treedef is not None and saved_treedef != str(treedef):
        msg = (
            "Checkpoint tree structure does not match the template pytree:\n"
            f"  saved:    {saved_treedef}\n  template: {treedef}"
        )
        raise ValueError(msg)

    restored = []
    for i in range(meta["num_leaves"]):
        arr = data[f"leaf_{i}"]
        dt = meta["dtypes"][f"leaf_{i}"]
        if dt in ("bfloat16", "float8_e4m3fn", "float8_e5m2"):
            arr = jnp.asarray(arr).view(jnp.dtype(dt))
        else:
            arr = jnp.asarray(arr)
        like = leaves_like[i]
        like_shape = tuple(getattr(like, "shape", ()))
        like_dtype = jnp.asarray(like).dtype
        if arr.shape != like_shape or arr.dtype != like_dtype:
            msg = (
                f"Checkpoint leaf {i} is {arr.shape}/{arr.dtype} but the "
                f"template expects {like_shape}/{like_dtype}"
            )
            raise ValueError(msg)
        restored.append(arr)
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_sharded_checkpoint(path: str | pathlib.Path, params: Any) -> None:
    """Save a (possibly mesh-sharded) param pytree via orbax.

    Each host writes only the shards it owns, so this is the multi-host
    checkpoint path (the ``.npz`` functions above gather to one host).
    Works for quantized pytrees: ``QuantizedLinear`` static metadata is
    carried by the template at restore time, matching the npz contract.
    """
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def restore_sharded_checkpoint(path: str | pathlib.Path, params_like: Any) -> Any:
    """Restore a checkpoint saved by :func:`save_sharded_checkpoint`.

    ``params_like`` provides tree structure AND target shardings: concrete
    ``jax.Array`` leaves (e.g. from ``shard_llama_params``) restore onto
    their mesh placement directly — each host reads only its shards —
    while plain numpy/abstract leaves restore unsharded.
    """
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()

    def as_abstract(leaf: Any) -> Any:
        if isinstance(leaf, jax.Array):
            return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=leaf.sharding)
        # numpy / scalar template leaves: metadata only, no device
        # transfer. Canonicalize so Python ints/floats map to the JAX
        # default widths (int32/float32), as jnp.asarray would.
        arr = np.asarray(leaf)
        return jax.ShapeDtypeStruct(arr.shape, jax.dtypes.canonicalize_dtype(arr.dtype))

    abstract = jax.tree_util.tree_map(as_abstract, params_like)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
