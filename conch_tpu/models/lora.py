# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Multi-LoRA serving support for the Llama-family models.

Low-rank adapters (LoRA: https://arxiv.org/abs/2106.09685) add a
rank-``r`` delta ``scale * (x @ A) @ B`` to selected projections. For
*serving*, many adapters are live at once and every token in a batch may
use a different one (or none) — the multi-LoRA problem vLLM solves with
its punica/bgmv CUDA kernels.

The TPU-native design here is the same dense one-hot dispatch the MoE
layer uses (``models/moe.py``): adapters are stacked along a leading
adapter axis and every token is multiplied against *all* adapters'
``A`` matrices on the MXU, then the per-token one-hot selector (scaled
by each adapter's ``alpha/rank``) zeroes every non-selected adapter
*before* the summing ``B`` contraction:

    h     = einsum('tk,akr->tar', x, A)          # all adapters, MXU
    h_sel = h * (one_hot(lora_ids) * scales)     # zero non-selected
    delta = einsum('tar,arn->tn', h_sel, B)      # sum over a AND r

Because ``h_sel`` is zero outside each token's adapter, the second
contraction may sum over the adapter axis — making it ONE large matmul
``(T, A*r) @ (A*r, N)`` instead of a per-token gather. With ranks 8-64
and a handful of live adapters this is a vanishingly small fraction of
the base matmul's FLOPs, stays entirely on the MXU, and needs no
scatter/gather (which TPUs do poorly); ``lora_id = -1`` (no adapter)
falls out for free as an all-zero one-hot row.

Role parity: vLLM's multi-LoRA serving layer (the reference conch has no
LoRA; this is part of the north-star serving stack).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Projections LoRA can target, with (in_dim, out_dim) resolvers.
_TARGET_DIMS = {
    "wq": lambda c: (c.hidden_size, c.num_heads * c.head_dim),
    "wk": lambda c: (c.hidden_size, c.num_kv_heads * c.head_dim),
    "wv": lambda c: (c.hidden_size, c.num_kv_heads * c.head_dim),
    "wo": lambda c: (c.num_heads * c.head_dim, c.hidden_size),
    "w_gate": lambda c: (c.hidden_size, c.intermediate_size),
    "w_up": lambda c: (c.hidden_size, c.intermediate_size),
    "w_down": lambda c: (c.intermediate_size, c.hidden_size),
}

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo")


def init_lora_adapter(
    seed: int,
    config,
    rank: int = 8,
    alpha: float = 16.0,
    targets: tuple[str, ...] = DEFAULT_TARGETS,
    dtype=None,
    zero_b: bool = False,
) -> dict:
    """Random-initialize one adapter: per-layer stacked A/B per target.

    Returns ``{"layers": {target: {"a": (L, K, r), "b": (L, r, N)}},
    "scale": alpha / rank}``. ``zero_b=True`` gives the standard LoRA
    training init (delta starts at zero); tests use random B.
    """
    rng = np.random.default_rng(seed)
    dtype = dtype or config.dtype
    layers = {}
    for name in targets:
        if name not in _TARGET_DIMS:
            msg = f"unknown LoRA target {name!r}; supported: {sorted(_TARGET_DIMS)}"
            raise ValueError(msg)
        k_dim, n_dim = _TARGET_DIMS[name](config)
        a = rng.normal(size=(config.num_layers, k_dim, rank)) * (1.0 / np.sqrt(k_dim))
        b = (
            np.zeros((config.num_layers, rank, n_dim))
            if zero_b
            else rng.normal(size=(config.num_layers, rank, n_dim)) * 0.02
        )
        layers[name] = {
            "a": jnp.asarray(a, dtype=dtype),
            "b": jnp.asarray(b, dtype=dtype),
        }
    return {"layers": layers, "scale": float(alpha) / float(rank)}


def stack_lora_adapters(adapters: list[dict]) -> dict:
    """Stack single adapters into the serving set the model functions eat.

    Output: ``{"layers": {target: {"a": (L, A, K, r_max), "b":
    (L, A, r_max, N)}}, "scales": (A,) float32}``. Adapters may have
    different ranks (zero-padded to the max — zero rows contribute
    nothing) and different target subsets (missing targets are zeros).
    """
    if not adapters:
        raise ValueError("need at least one adapter")
    all_targets: dict[str, tuple[int, int]] = {}
    for ad in adapters:
        for name, ab in ad["layers"].items():
            k_dim, n_dim = ab["a"].shape[-2], ab["b"].shape[-1]
            prev = all_targets.setdefault(name, (k_dim, n_dim))
            if prev != (k_dim, n_dim):
                msg = f"adapter dim mismatch for target {name!r}: {prev} vs {(k_dim, n_dim)}"
                raise ValueError(msg)
    r_max = max(ab["a"].shape[-1] for ad in adapters for ab in ad["layers"].values())

    layers: dict = {}
    for name, (k_dim, n_dim) in sorted(all_targets.items()):
        a_rows, b_rows = [], []
        for ad in adapters:
            ab = ad["layers"].get(name)
            if ab is None:
                ref = next(iter(ad["layers"].values()))
                num_layers, dtype = ref["a"].shape[0], ref["a"].dtype
                a_rows.append(jnp.zeros((num_layers, k_dim, r_max), dtype))
                b_rows.append(jnp.zeros((num_layers, r_max, n_dim), dtype))
                continue
            a, b = ab["a"], ab["b"]
            pad = r_max - a.shape[-1]
            if pad:
                a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
                b = jnp.pad(b, ((0, 0), (0, pad), (0, 0)))
            a_rows.append(a)
            b_rows.append(b)
        layers[name] = {
            "a": jnp.stack(a_rows, axis=1),  # (L, A, K, r)
            "b": jnp.stack(b_rows, axis=1),  # (L, A, r, N)
        }
    scales = jnp.asarray([ad["scale"] for ad in adapters], jnp.float32)
    return {"layers": layers, "scales": scales}


def lora_selector(lora_ids: jax.Array, scales: jax.Array) -> jax.Array:
    """(T,) adapter ids (-1 = none) -> (T, A) scaled one-hot selector.

    Out-of-range ids (the -1 convention, and padded batch rows) produce
    an all-zero row, so "no adapter" costs nothing extra.
    """
    sel = jax.nn.one_hot(lora_ids, scales.shape[0], dtype=jnp.float32)
    return sel * scales[None, :]


def lora_delta(x: jax.Array, a: jax.Array, b: jax.Array, sel_scaled: jax.Array) -> jax.Array:
    """Batched multi-adapter LoRA delta, float32 result.

    x: (T, K); a: (A, K, r); b: (A, r, N); sel_scaled: (T, A).
    """
    h = jnp.einsum("tk,akr->tar", x, a.astype(x.dtype))
    h = (h.astype(jnp.float32) * sel_scaled[:, :, None]).astype(x.dtype)
    return jnp.einsum("tar,arn->tn", h, b.astype(x.dtype), preferred_element_type=jnp.float32)


def lora_delta_single(x: jax.Array, a: jax.Array, b: jax.Array, scale: float) -> jax.Array:
    """Single-adapter LoRA delta (training path: one adapter, all tokens).

    x: (T, K); a: (K, r); b: (r, N). Low-rank contractions in the input
    dtype on the MXU, scaled in float32.
    """
    h = jnp.einsum("tk,kr->tr", x, a.astype(x.dtype))
    d = jnp.einsum("tr,rn->tn", h, b.astype(x.dtype), preferred_element_type=jnp.float32)
    return d * scale


def merge_lora_into_params(params: dict, adapter: dict, config=None) -> dict:
    """Fold ONE adapter into dense (bf16/f32) Llama params: w += s*(A@B).

    Offline single-adapter deployment path, and the oracle for the
    multi-LoRA serving tests (batched dispatch must equal the merged
    model). Requires dense ``QuantizedLinear`` projections.
    """
    from conch_tpu.models.linear import QuantizedLinear

    layers = dict(params["layers"])
    scale = adapter["scale"]
    for name, ab in adapter["layers"].items():
        ql = layers[name]
        assert isinstance(ql, QuantizedLinear) and ql.kind == "dense", (
            f"merge_lora_into_params needs dense weights, got {ql.kind} for {name}"
        )
        w = ql.arrays["w"]  # (L, K, N) stacked
        delta = jnp.einsum(
            "lkr,lrn->lkn",
            ab["a"].astype(jnp.float32),
            ab["b"].astype(jnp.float32),
        ) * scale
        layers[name] = QuantizedLinear(
            kind="dense", arrays={"w": (w.astype(jnp.float32) + delta).astype(w.dtype)}
        )
    out = dict(params)
    out["layers"] = layers
    return out
