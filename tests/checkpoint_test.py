# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for checkpoint save/restore of dense and quantized params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


@pytest.mark.parametrize("quant_mode", ["bf16", "int4", "nf4"])
def test_checkpoint_roundtrip(tmp_path, quant_mode):
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=32, max_position=128,
    )
    params = init_llama_params(0, cfg, quant_mode, group_size=32)
    save_checkpoint(tmp_path / "ckpt", params)

    template = init_llama_params(1, cfg, quant_mode, group_size=32)  # different values
    restored = restore_checkpoint(tmp_path / "ckpt", template)

    orig_leaves = jax.tree_util.tree_leaves(params)
    rest_leaves = jax.tree_util.tree_leaves(restored)
    assert len(orig_leaves) == len(rest_leaves)
    for a, b in zip(orig_leaves, rest_leaves):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a).view(np.uint8), np.asarray(b).view(np.uint8))


def test_checkpoint_leaf_mismatch_raises(tmp_path):
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=32, max_position=128,
    )
    params = init_llama_params(0, cfg, "bf16")
    save_checkpoint(tmp_path / "ckpt", params)
    wrong_template = init_llama_params(0, cfg, "int4", group_size=32)
    with pytest.raises(ValueError, match="mismatch"):
        restore_checkpoint(tmp_path / "ckpt", wrong_template)


def test_checkpoint_treedef_mismatch_raises(tmp_path):
    """Same leaf count, different structure: restore must reject it."""
    save_checkpoint(tmp_path / "ckpt", {"a": jnp.zeros(3), "b": jnp.ones(3)})
    with pytest.raises(ValueError, match="tree structure"):
        restore_checkpoint(tmp_path / "ckpt", {"a": jnp.zeros(3), "c": jnp.ones(3)})


def test_checkpoint_shape_mismatch_raises(tmp_path):
    save_checkpoint(tmp_path / "ckpt", {"w": jnp.zeros((4, 4))})
    with pytest.raises(ValueError, match="template expects"):
        restore_checkpoint(tmp_path / "ckpt", {"w": jnp.zeros((4, 8))})


def test_checkpoint_dtype_mismatch_raises(tmp_path):
    save_checkpoint(tmp_path / "ckpt", {"w": jnp.zeros((4, 4), jnp.float32)})
    with pytest.raises(ValueError, match="template expects"):
        restore_checkpoint(tmp_path / "ckpt", {"w": jnp.zeros((4, 4), jnp.bfloat16)})


def test_sharded_checkpoint_roundtrip_on_mesh(tmp_path):
    """Orbax-backed multi-host path: int4 params sharded over a tp=4 mesh
    save shard-wise and restore onto their mesh placement bit-exactly."""
    import jax

    from conch_tpu.models.llama import LlamaConfig, init_llama_params
    from conch_tpu.parallel.mesh import create_mesh
    from conch_tpu.parallel.sharding import shard_llama_params
    from conch_tpu.utils.checkpoint import (
        restore_sharded_checkpoint,
        save_sharded_checkpoint,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_position=64, dtype=jnp.float32,
    )
    sharded = shard_llama_params(
        init_llama_params(0, cfg, "int4", group_size=16), create_mesh(data=1, model=4)
    )
    save_sharded_checkpoint(tmp_path / "ckpt", sharded)
    restored = restore_sharded_checkpoint(
        tmp_path / "ckpt", jax.tree.map(jnp.zeros_like, sharded)
    )
    assert jax.tree.all(jax.tree.map(lambda a, b: bool(jnp.all(a == b)), sharded, restored))
    assert all(
        r.sharding == s.sharding
        for r, s in zip(jax.tree.leaves(restored), jax.tree.leaves(sharded), strict=True)
    )
