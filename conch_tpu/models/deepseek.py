# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""DeepSeek-V2 family: Multi-head Latent Attention + DeepSeek MoE.

Serving-path model built on the MLA kernel (`ops.attention.mla_attention`)
in the *absorbed* form: the KV cache stores one packed row
``[c_kv | k_pe | pad]`` per token (kv_lora_rank + qk_rope_head_dim
values — 576 for the real models, vs 2*H*192 for naive MHA, a 32x
compression at 96 heads), and the kv_b up-projections are folded into
the query (``q_nope @ W_uk``) and output (``out_lat @ W_uv``) sides.

Faithful to the HF ``DeepseekV2`` eager semantics (the behavior oracle;
`transformers/models/deepseek_v2/modeling_deepseek_v2.py`):

- interleaved-complex RoPE on the rope slices (NOT the neox half-split
  used by Llama): pairs (x[2i], x[2i+1]) rotate together;
- q path either full-rank (``q_proj``, V2-Lite) or low-rank
  (``q_a_proj`` -> RMSNorm -> ``q_b_proj``, V2);
- softmax scale 1/sqrt(qk_nope + qk_rope);
- MoE gate: f32 softmax over ALL experts, then top-k, scaled by
  ``routed_scaling_factor`` (greedy topk method); layer is MoE iff
  ``layer_idx >= first_k_dense_replace``; shared experts always run and
  add to the routed output.

Layers are scanned in two homogeneous segments (dense prefix, MoE rest).
No reference-repo counterpart: stackav-oss/conch stops at GQA models.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.kernels.common import round_up
from conch_tpu.models.linear import QuantizedLinear, quantize_linear
from conch_tpu.models.moe import make_dispatch
from conch_tpu.ops.activation import silu_and_mul
from conch_tpu.ops.attention import mla_attention
from conch_tpu.ops.cache import reshape_and_cache_mla
from conch_tpu.ops.normalization import rms_norm


@dataclass(frozen=True)
class DeepseekV2Config:
    """DeepSeek-V2 hyperparameters (defaults: a tiny debug model)."""

    vocab_size: int = 512
    hidden_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    q_lora_rank: int | None = None  # None => full-rank q_proj (V2-Lite)
    kv_lora_rank: int = 64
    qk_nope_head_dim: int = 32
    qk_rope_head_dim: int = 16
    v_head_dim: int = 32
    # MoE (n_routed_experts = 0 => dense MLP in every layer)
    n_routed_experts: int = 0
    n_shared_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: int = 64
    intermediate_size: int = 256  # dense layers
    first_k_dense_replace: int = 1
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = False
    # Gate variants: "greedy" (V2-Lite), "group_limited_greedy" (V2 —
    # keep topk_group of n_group expert groups by per-group max), or
    # "noaux_tc" (V3 — sigmoid scores, per-expert correction bias added
    # for CHOICE only, groups ranked by their top-2 sum).
    topk_method: str = "greedy"
    score_function: str = "softmax"  # "softmax" (V2) | "sigmoid" (V3)
    n_group: int = 1
    topk_group: int = 1
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    max_position: int = 4096
    dtype: Any = jnp.bfloat16
    moe_capacity_factor: float = 2.0  # serving-path expert capacity factor
    # Static per-tensor scale for int8/fp8 latent caches (stored value =
    # round(x / scale), saturating). NOTE: the stored row mixes the
    # RMS-normed c_kv with the RAW roped k_pe slice — c_kv is bounded but
    # k_pe follows the checkpoint's kv_a activation range, so int8 caches
    # (range ±127*scale) should calibrate this scale against observed
    # |k_pe|; fp8 e4m3 (±448*scale) has far more headroom.
    kv_cache_scale: float = 1.0 / 16
    # YaRN rope scaling (real V2/V3 checkpoints): HF-style dict stored as
    # an items-tuple so the frozen config stays hashable. The yarn
    # attention factor scales the cos/sin cache (both families); V3's
    # modeling code ADDITIONALLY multiplies the softmax scale by
    # mscale(factor, mscale_all_dim)^2 — V2's does not (HF eager
    # semantics, our oracle) — so that part is opt-in below.
    rope_scaling: tuple | None = None
    yarn_mscale_attention: bool = False  # V3: mscale^2 on the softmax scale

    def rope_scaling_dict(self) -> dict | None:
        return dict(self.rope_scaling) if self.rope_scaling else None

    def attention_scale(self) -> float:
        """Softmax scale incl. the V3 yarn mscale^2 adjustment."""
        s = 1.0 / math.sqrt(self.qk_head_dim)
        rs = self.rope_scaling_dict()
        if self.yarn_mscale_attention and rs and rs.get("mscale_all_dim"):
            m = _yarn_mscale(rs["factor"], rs["mscale_all_dim"])
            s *= m * m
        return s

    # -- engine-facing geometry ------------------------------------------
    @property
    def kv_cache_layout(self) -> str:
        return "mla"

    @property
    def kv_packed_dim(self) -> int:
        """Cache row width: [c_kv | k_pe] padded to a lane multiple."""
        return round_up(self.kv_lora_rank + self.qk_rope_head_dim, 128)

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    @staticmethod
    def v2_lite() -> "DeepseekV2Config":
        return DeepseekV2Config(
            vocab_size=102400, hidden_size=2048, num_layers=27, num_heads=16,
            q_lora_rank=None, kv_lora_rank=512, qk_nope_head_dim=128,
            qk_rope_head_dim=64, v_head_dim=128,
            n_routed_experts=64, n_shared_experts=2, num_experts_per_tok=6,
            moe_intermediate_size=1408, intermediate_size=10944,
            first_k_dense_replace=1, routed_scaling_factor=1.0,
            rope_theta=10000.0, max_position=163840,
            rope_scaling=(
                ("rope_type", "yarn"), ("factor", 40.0), ("beta_fast", 32),
                ("beta_slow", 1), ("mscale", 0.707), ("mscale_all_dim", 0.707),
                ("original_max_position_embeddings", 4096),
            ),
        )

    @staticmethod
    def v2() -> "DeepseekV2Config":
        return DeepseekV2Config(
            vocab_size=102400, hidden_size=5120, num_layers=60, num_heads=128,
            q_lora_rank=1536, kv_lora_rank=512, qk_nope_head_dim=128,
            qk_rope_head_dim=64, v_head_dim=128,
            n_routed_experts=160, n_shared_experts=2, num_experts_per_tok=6,
            moe_intermediate_size=1536, intermediate_size=12288,
            first_k_dense_replace=1, routed_scaling_factor=16.0,
            norm_topk_prob=False, rope_theta=10000.0, max_position=163840,
            rope_scaling=(
                ("rope_type", "yarn"), ("factor", 40.0), ("beta_fast", 32),
                ("beta_slow", 1), ("mscale", 0.707), ("mscale_all_dim", 0.707),
                ("original_max_position_embeddings", 4096),
            ),
        )

    @staticmethod
    def v3() -> "DeepseekV2Config":
        """DeepSeek-V3/R1 geometry (same MLA; sigmoid noaux_tc gate)."""
        return DeepseekV2Config(
            vocab_size=129280, hidden_size=7168, num_layers=61, num_heads=128,
            q_lora_rank=1536, kv_lora_rank=512, qk_nope_head_dim=128,
            qk_rope_head_dim=64, v_head_dim=128,
            n_routed_experts=256, n_shared_experts=1, num_experts_per_tok=8,
            moe_intermediate_size=2048, intermediate_size=18432,
            first_k_dense_replace=3, routed_scaling_factor=2.5,
            norm_topk_prob=True, topk_method="noaux_tc",
            score_function="sigmoid", n_group=8, topk_group=4,
            rope_theta=10000.0, max_position=163840,
            rope_scaling=(
                ("rope_type", "yarn"), ("factor", 40.0), ("beta_fast", 32),
                ("beta_slow", 1), ("mscale", 1.0), ("mscale_all_dim", 1.0),
                ("original_max_position_embeddings", 4096),
            ),
            yarn_mscale_attention=True,
        )

    @staticmethod
    def tiny(**overrides) -> "DeepseekV2Config":
        return DeepseekV2Config(**overrides)


# -- RoPE (interleaved-complex convention) --------------------------------


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def deepseek_rope_cache(config: DeepseekV2Config) -> jax.Array:
    """(max_position, rope_dim) [cos | sin] cache, f32.

    With ``rope_scaling`` (YaRN): low-frequency dims interpolate
    (freq / factor), high-frequency dims extrapolate unchanged, blended
    by the NTK-by-parts linear ramp; the yarn attention factor scales
    cos/sin (HF multiplies it into ``freqs_cis``). Mirrors
    ``transformers.modeling_rope_utils._compute_yarn_parameters``.
    """
    d = config.qk_rope_head_dim
    theta = config.rope_theta
    pos_freqs = theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    inv_freq = 1.0 / pos_freqs
    attention_factor = 1.0
    rs = config.rope_scaling_dict()
    if rs and rs.get("rope_type", rs.get("type")) == "yarn":
        factor = rs["factor"]
        orig = rs.get("original_max_position_embeddings") or config.max_position
        beta_fast = rs.get("beta_fast") or 32
        beta_slow = rs.get("beta_slow") or 1

        def corr_dim(num_rotations: float) -> float:
            return (d * math.log(orig / (num_rotations * 2 * math.pi))) / (2 * math.log(theta))

        low = max(math.floor(corr_dim(beta_fast)), 0)
        high = min(math.ceil(corr_dim(beta_slow)), d - 1)
        ramp = np.clip(
            (np.arange(d // 2, dtype=np.float64) - low) / max(high - low, 1e-3), 0, 1
        )
        extrapolation = 1.0 - ramp
        inv_freq = (1.0 / (factor * pos_freqs)) * ramp + inv_freq * extrapolation
        attention_factor = rs.get("attention_factor")
        if attention_factor is None:
            mscale, msdim = rs.get("mscale"), rs.get("mscale_all_dim")
            if mscale and msdim:
                attention_factor = _yarn_mscale(factor, mscale) / _yarn_mscale(factor, msdim)
            else:
                attention_factor = _yarn_mscale(factor)
    angles = np.arange(config.max_position, dtype=np.float64)[:, None] * inv_freq[None, :]
    return jnp.asarray(
        np.concatenate([np.cos(angles), np.sin(angles)], axis=-1) * attention_factor,
        jnp.float32,
    )


def _apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved pairs: (x[2i], x[2i+1]) by angle_i (HF
    ``apply_rotary_emb`` complex convention). cos/sin broadcast over x's
    leading dims; last dim of x is rope_dim, cos/sin rope_dim/2."""
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return jnp.stack([o0, o1], axis=-1).reshape(x.shape)


# -- MoE gate --------------------------------------------------------------


def deepseek_route(
    hidden: jax.Array,  # (T, H)
    router_w: jax.Array,  # (H, E)
    config: DeepseekV2Config,
    bias: jax.Array | None = None,  # (E,) noaux_tc correction bias
) -> tuple[jax.Array, jax.Array]:
    """DeepSeek gate, all three HF variants.

    - greedy (V2-Lite): softmax over all experts, top-k of the
      probabilities — not Mixtral's renormalized top-k softmax;
    - group_limited_greedy (V2): groups ranked by per-group MAX, only
      topk_group groups eligible;
    - noaux_tc (V3): sigmoid scores; ``bias`` is added for the CHOICE
      ranking only (groups by their top-2 sum), while the returned
      weights gather the UNbiased scores.
    """
    logits = hidden.astype(jnp.float32) @ router_w.astype(jnp.float32)
    if config.score_function == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    choice = scores + bias[None, :] if bias is not None else scores
    if config.topk_method in ("group_limited_greedy", "noaux_tc"):
        t = choice.shape[0]
        e_per_g = config.n_routed_experts // config.n_group
        grouped = choice.reshape(t, config.n_group, e_per_g)
        if config.topk_method == "noaux_tc":
            group_scores = jnp.sum(jax.lax.top_k(grouped, 2)[0], axis=-1)
        else:
            group_scores = jnp.max(grouped, axis=-1)
        _, gidx = jax.lax.top_k(group_scores, config.topk_group)
        gmask = jnp.sum(jax.nn.one_hot(gidx, config.n_group, dtype=jnp.float32), axis=1)
        choice = jnp.where(
            jnp.repeat(gmask, e_per_g, axis=-1) > 0, choice, 0.0
        )

    vals, idx = jax.lax.top_k(choice, config.num_experts_per_tok)
    if config.topk_method == "noaux_tc":
        vals = jnp.take_along_axis(scores, idx, axis=-1)  # weights w/o bias
    if config.norm_topk_prob:
        vals = vals / (jnp.sum(vals, axis=-1, keepdims=True) + 1e-20)
    return vals * config.routed_scaling_factor, idx


def _moe_mlp(
    layer: dict, x: jax.Array, config: DeepseekV2Config, tp_axis: str | None = None,
    proj=None, has=None,
) -> jax.Array:
    """Routed experts (dense-einsum dispatch, GShard capacity) + shared
    experts. Routed combine weights already carry the scaling factor.

    Under shard_map (``tp_axis``), expert stacks are the LOCAL expert
    shard: routing runs replicated over all global experts, each chip
    slices its expert range of the dispatch/combine tensors, the shared
    experts are column/row-parallel, and ONE psum reduces the combined
    routed+shared partial (the layer's MLP collective).
    """
    t = x.shape[0]
    cap = max(
        1,
        min(
            t,
            math.ceil(
                t * config.num_experts_per_tok / config.n_routed_experts
                * config.moe_capacity_factor
            ),
        ),
    )
    weights, experts = deepseek_route(
        x, layer["router_w"], config, bias=layer.get("router_bias")
    )
    dispatch, combine = make_dispatch(weights, experts, config.n_routed_experts, cap)
    if tp_axis is not None:
        num_local = layer["e_gate"].shape[0]
        offset = jax.lax.axis_index(tp_axis) * num_local
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, offset, num_local, axis=1)
        combine = jax.lax.dynamic_slice_in_dim(combine, offset, num_local, axis=1)
    xe = jnp.einsum("tec,th->ech", dispatch.astype(x.dtype), x)
    gate = jnp.einsum("ech,ehf->ecf", xe, layer["e_gate"])
    up = jnp.einsum("ech,ehf->ecf", xe, layer["e_up"])
    act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(x.dtype)
    y = jnp.einsum("ecf,efh->ech", act, layer["e_down"])
    out = jnp.einsum("tec,ech->th", combine.astype(x.dtype), y)
    if config.n_shared_experts > 0:
        proj = proj or (lambda name, xx: layer[name].apply(xx))
        has = has or (lambda name: name in layer)
        if has("shared_gateup"):
            act = silu_and_mul(proj("shared_gateup", x)).astype(x.dtype)
        else:
            sg = proj("shared_gate", x)
            su = proj("shared_up", x)
            act = (jax.nn.silu(sg.astype(jnp.float32)) * su.astype(jnp.float32)).astype(x.dtype)
        out = out + proj("shared_down", act)
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    return out


def _dense_mlp(layer: dict, x: jax.Array, tp_axis: str | None = None, proj=None, has=None) -> jax.Array:
    proj = proj or (lambda name, xx: layer[name].apply(xx))
    has = has or (lambda name: name in layer)
    if has("w_gateup"):
        act = silu_and_mul(proj("w_gateup", x)).astype(x.dtype)
    else:
        gate = proj("w_gate", x)
        up = proj("w_up", x)
        act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(x.dtype)
    out = proj("w_down", act)
    return jax.lax.psum(out, tp_axis) if tp_axis is not None else out


# -- params ----------------------------------------------------------------


def init_deepseek_params(
    seed: int, config: DeepseekV2Config, quant_mode: str = "bf16", group_size: int = 32
) -> dict:
    """Random-init DeepSeek-V2 params in the absorbed layout.

    Layer stacks: ``layers_dense`` (first_k_dense_replace layers) and
    ``layers_moe`` (the rest), each stacked for ``lax.scan``.
    ``quant_mode`` quantizes the 2-D projections (wq/kv_a/wo/MLP/shared)
    through ``QuantizedLinear`` exactly like the Llama family; the
    absorbed W_uk/W_uv einsums and expert stacks stay dense.
    """
    rng = np.random.default_rng(seed)
    h = config.hidden_size
    nh, nope, rope, v = (
        config.num_heads, config.qk_nope_head_dim, config.qk_rope_head_dim, config.v_head_dim,
    )
    lora = config.kv_lora_rank
    std = 0.02

    def proj(k_dim, n_dim):
        kwargs = {"group_size": group_size} if quant_mode in ("int4", "int8") else {}
        return quantize_linear(
            rng.standard_normal((k_dim, n_dim), dtype=np.float32) * std, quant_mode, **kwargs
        )

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape) * std, config.dtype)

    def make_layer(moe: bool):
        layer = {
            "w_kv_a": proj(h, lora + rope),
            "kv_a_norm": jnp.ones((lora,), config.dtype),
            "w_uk": arr(nh, nope, lora),
            "w_uv": arr(nh, lora, v),
            "wo": proj(nh * v, h),
            "input_norm": jnp.ones((h,), config.dtype),
            "post_attn_norm": jnp.ones((h,), config.dtype),
        }
        if config.q_lora_rank:
            layer["wq_a"] = proj(h, config.q_lora_rank)
            layer["q_a_norm"] = jnp.ones((config.q_lora_rank,), config.dtype)
            layer["wq_b"] = proj(config.q_lora_rank, nh * (nope + rope))
        else:
            layer["wq"] = proj(h, nh * (nope + rope))
        if moe:
            layer["router_w"] = arr(h, config.n_routed_experts)
            if config.topk_method == "noaux_tc":
                layer["router_bias"] = jnp.zeros((config.n_routed_experts,), jnp.float32)
            f = config.moe_intermediate_size
            layer["e_gate"] = arr(config.n_routed_experts, h, f)
            layer["e_up"] = arr(config.n_routed_experts, h, f)
            layer["e_down"] = arr(config.n_routed_experts, f, h)
            if config.n_shared_experts > 0:
                sf = f * config.n_shared_experts
                layer["shared_gate"] = proj(h, sf)
                layer["shared_up"] = proj(h, sf)
                layer["shared_down"] = proj(sf, h)
        else:
            layer["w_gate"] = proj(h, config.intermediate_size)
            layer["w_up"] = proj(h, config.intermediate_size)
            layer["w_down"] = proj(config.intermediate_size, h)
        return layer

    def stack(n, moe):
        layers = [make_layer(moe) for _ in range(n)]
        if not layers:
            return None
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    n_dense = config.num_layers if config.n_routed_experts == 0 else min(
        config.first_k_dense_replace, config.num_layers
    )
    n_moe = config.num_layers - n_dense
    return {
        "embedding": jnp.asarray(rng.standard_normal((config.vocab_size, h), dtype=np.float32) * std, config.dtype),
        "layers_dense": stack(n_dense, moe=False),
        "layers_moe": stack(n_moe, moe=True),
        "final_norm": jnp.ones((h,), config.dtype),
        "lm_head": proj(h, config.vocab_size),
        "rope_cache": deepseek_rope_cache(config),
    }


# -- forward ---------------------------------------------------------------


_DS_HEAVY_NAMES = (
    "wq", "wq_a", "wq_b", "w_kv_a", "wo",
    "w_gate", "w_up", "w_down",
    "shared_gate", "shared_up", "shared_down",
    "wq_kva", "w_gateup", "shared_gateup",
)


def fuse_deepseek_params(params: dict) -> dict:
    """Column-fuse DeepSeek projections that share an input (eager,
    one-time; the DeepSeek analogue of ``models.llama.fuse_llama_params``):

    - ``wq_kva`` = [wq_a|w_kv_a] (q-LoRA) or [wq|w_kv_a] (full-rank q) —
      both consume the post-norm hidden state, so one wide-N GEMM feeds
      the query path and the latent KV projection;
    - ``w_gateup`` = [w_gate|w_up] (dense-MLP layers);
    - ``shared_gateup`` = [shared_gate|shared_up] (MoE shared experts).

    Small-N decode GEMMs cannot amortize the dequant pipeline
    (exp_decode_profile_r4b.log); fusion halves launches and widens N.
    Apply per stacked group (layers_dense / layers_moe). Single-device
    serving only — the TP path keeps per-name shards.
    """
    from conch_tpu.models.linear import QuantizedLinear

    groups = (
        ("wq_kva", ("wq_a", "w_kv_a")),
        ("wq_kva", ("wq", "w_kv_a")),
        ("w_gateup", ("w_gate", "w_up")),
        ("shared_gateup", ("shared_gate", "shared_up")),
    )
    out = dict(params)
    for stack_name in ("layers_dense", "layers_moe"):
        layers = params.get(stack_name)
        if layers is None:
            continue
        layers = dict(layers)
        for fused_name, parts in groups:
            if fused_name in layers:
                continue
            if not all(isinstance(layers.get(p), QuantizedLinear) for p in parts):
                continue
            try:
                fused = QuantizedLinear.concat_n([layers[p] for p in parts])
            except ValueError:
                continue
            layers[fused_name] = fused
            for p in parts:
                del layers[p]
        out[stack_name] = layers
    return out


def _split_heavy_ds(layers: dict) -> tuple[dict | None, dict]:
    """Split a stacked DeepSeek layer dict into (heavy QuantizedLinear
    stacks, everything else). Heavy stacks are closed over as scan
    invariants and indexed inside the GEMM kernels (scalar prefetch);
    norms, the absorbed w_uk/w_uv einsum tensors, and the raw expert
    stacks keep riding the scan xs."""
    from conch_tpu.models.linear import QuantizedLinear

    heavy = {
        k: v
        for k, v in layers.items()
        if k in _DS_HEAVY_NAMES and isinstance(v, QuantizedLinear)
    }
    light = {k: v for k, v in layers.items() if k not in heavy}
    return (heavy or None), light


def _mla_layer_step(
    config: DeepseekV2Config,
    positions: jax.Array,  # (T,)
    slot_mapping: jax.Array,  # (T,)
    cu_seqlens_q: jax.Array,
    max_seqlen_q: int,
    seq_lens: jax.Array,
    block_tables: jax.Array,
    rope_cache: jax.Array,
    mlp_fn,
    tp_axis: str | None = None,
    heavy: dict | None = None,
):
    """One scanned decoder layer (absorbed MLA attention + residual MLP).

    ``heavy`` carries the stacked (L, ...) QuantizedLinear projections OUT
    of the scan (same mechanism as ``models.llama``): each GEMM selects
    its layer via the kernel's scalar-prefetch index
    (``QuantizedLinear.apply_stacked``) instead of consuming a scan slice
    — XLA materializes a copy of any sliced weight fed to an opaque
    pallas_call, a measured 2-7x GEMM bandwidth loss on v5e
    (tools/drive/logs/exp_lmhead_r4b.log).

    Under shard_map (``tp_axis``): q/W_uk/W_uv/wo carry only the LOCAL
    head shard (the head count is read from ``w_uk`` at runtime); the
    latent cache is REPLICATED per chip (it is MQA-shared and tiny —
    packed_dim bytes/token — so replication costs far less than the
    per-head K/V it replaces), every chip computes the identical kv row
    from the replicated ``w_kv_a``, and attention needs zero cross-chip
    communication; one psum follows the row-parallel ``wo``.
    """
    nope, rope_d = config.qk_nope_head_dim, config.qk_rope_head_dim
    lora, v_dim = config.kv_lora_rank, config.v_head_dim
    packed = config.kv_packed_dim
    scale = config.attention_scale()

    cs = jnp.take(rope_cache, positions, axis=0)  # (T, rope_d) [cos|sin]
    cos, sin = cs[:, : rope_d // 2], cs[:, rope_d // 2 :]

    def layer_step(hidden, scanned):
        layer, kv_cache, l_idx = scanned
        nh = layer["w_uk"].shape[0]  # LOCAL head count under shard_map
        t = hidden.shape[0]

        def proj(name, xx):
            if heavy is not None and name in heavy:
                return heavy[name].apply_stacked(xx, l_idx)
            return layer[name].apply(xx)

        def has(name):
            return (heavy is not None and name in heavy) or name in layer

        x = rms_norm(hidden, layer["input_norm"], config.rms_norm_eps)

        if has("wq_kva"):
            # Fused [wq_a|w_kv_a] (q-LoRA) or [wq|w_kv_a]: one wide-N GEMM
            # feeds the query path and the latent KV projection
            # (fuse_deepseek_params).
            head = config.q_lora_rank if config.q_lora_rank else nh * (nope + rope_d)
            both = proj("wq_kva", x)
            q_part, kv_a = both[:, :head], both[:, head:]
            if config.q_lora_rank:
                qa = rms_norm(q_part, layer["q_a_norm"], config.rms_norm_eps)
                q = proj("wq_b", qa)
            else:
                q = q_part
        elif config.q_lora_rank:
            qa = rms_norm(proj("wq_a", x), layer["q_a_norm"], config.rms_norm_eps)
            q = proj("wq_b", qa)
        else:
            q = proj("wq", x)
        q = q.reshape(t, nh, nope + rope_d)
        q_nope, q_pe = q[..., :nope], q[..., nope:]
        q_pe = _apply_rope_interleaved(
            q_pe.astype(jnp.float32), cos[:, None, :], sin[:, None, :]
        ).astype(q.dtype)

        if not has("wq_kva"):
            kv_a = proj("w_kv_a", x)  # (T, lora + rope)
        c_kv = rms_norm(kv_a[:, :lora], layer["kv_a_norm"], config.rms_norm_eps)
        k_pe = _apply_rope_interleaved(
            kv_a[:, lora:].astype(jnp.float32), cos, sin
        ).astype(kv_a.dtype)

        # Absorbed query: q_lat[h] = q_nope[h] @ W_uk[h]  -> latent space.
        q_lat = jnp.einsum("thn,hnl->thl", q_nope.astype(jnp.float32),
                           layer["w_uk"].astype(jnp.float32)).astype(q.dtype)
        q_cat = jnp.concatenate(
            [q_lat, q_pe, jnp.zeros((t, nh, packed - lora - rope_d), q.dtype)], axis=-1
        )

        kv_row = jnp.concatenate(
            [c_kv, k_pe, jnp.zeros((t, packed - lora - rope_d), c_kv.dtype)], axis=-1
        )
        quantized = kv_cache.dtype in (jnp.int8, jnp.float8_e4m3fn)
        store_scale = config.kv_cache_scale if quantized else None
        kv_cache = reshape_and_cache_mla(kv_row, kv_cache, slot_mapping, scale=store_scale)

        out_lat = mla_attention(
            q_cat, kv_cache, cu_seqlens_q, max_seqlen_q, seq_lens, block_tables,
            scale=scale, latent=lora,
            kv_scale=config.kv_cache_scale if quantized else 1.0,
        )
        attn = jnp.einsum("thl,hlv->thv", out_lat.astype(jnp.float32),
                          layer["w_uv"].astype(jnp.float32)).astype(hidden.dtype)
        attn_out = proj("wo", attn.reshape(t, nh * v_dim))
        if tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, tp_axis)
        hidden = hidden + attn_out

        mlp_in = rms_norm(hidden, layer["post_attn_norm"], config.rms_norm_eps)
        hidden = hidden + mlp_fn(layer, mlp_in, proj, has)
        return hidden, kv_cache

    return layer_step


def _deepseek_forward(
    params, config, token_ids, positions, cu_seqlens_q, max_seqlen_q, seq_lens,
    block_tables, slot_mapping, kv_caches, tp_axis=None,
):
    """Shared trunk: returns (per-token hidden, updated caches)."""
    hidden = jnp.take(params["embedding"], token_ids, axis=0)

    n_dense = 0
    if params["layers_dense"] is not None:
        n_dense = jax.tree.leaves(params["layers_dense"])[0].shape[0]

    def step(mlp_fn, heavy):
        return _mla_layer_step(
            config, positions, slot_mapping, cu_seqlens_q, max_seqlen_q,
            seq_lens, block_tables, params["rope_cache"], mlp_fn, tp_axis=tp_axis,
            heavy=heavy,
        )

    new_caches = []
    if params["layers_dense"] is not None:
        heavy, light = _split_heavy_ds(params["layers_dense"])
        hidden, dense_caches = jax.lax.scan(
            step(lambda layer, x, proj, has: _dense_mlp(layer, x, tp_axis, proj, has), heavy),
            hidden,
            (light, kv_caches[:n_dense], jnp.arange(n_dense, dtype=jnp.int32)),
        )
        new_caches.append(dense_caches)
    if params["layers_moe"] is not None:
        n_moe = jax.tree.leaves(params["layers_moe"])[0].shape[0]
        heavy, light = _split_heavy_ds(params["layers_moe"])
        hidden, moe_caches = jax.lax.scan(
            step(lambda layer, x, proj, has: _moe_mlp(layer, x, config, tp_axis, proj, has), heavy),
            hidden,
            (light, kv_caches[n_dense:], jnp.arange(n_moe, dtype=jnp.int32)),
        )
        new_caches.append(moe_caches)
    return hidden, jnp.concatenate(new_caches, axis=0)


def deepseek_prefill(
    params, config: DeepseekV2Config, token_ids, positions, cu_seqlens_q,
    max_seqlen_q, seq_lens, block_tables, slot_mapping, k_caches, v_caches,
    tp_axis=None,
):
    """Prefill (chunked ok). ``k_caches`` is the stacked (L, P, ps, packed)
    MLA latent cache; ``v_caches`` is an unused placeholder (the engine's
    two-cache signature) and is returned untouched."""
    hidden, k_caches = _deepseek_forward(
        params, config, token_ids, positions, cu_seqlens_q, max_seqlen_q,
        seq_lens, block_tables, slot_mapping, k_caches, tp_axis=tp_axis,
    )
    last_rows = cu_seqlens_q[1:] - 1
    hidden_last = jnp.take(hidden, last_rows, axis=0)
    hidden_last = rms_norm(hidden_last, params["final_norm"], config.rms_norm_eps)
    logits = params["lm_head"].apply(hidden_last)
    return logits.astype(jnp.float32), k_caches, v_caches


def deepseek_verify_forward(
    params, config: DeepseekV2Config, token_ids, positions, cu_seqlens_q,
    max_seqlen_q, seq_lens, block_tables, slot_mapping, k_caches, v_caches,
    tp_axis=None,
):
    """Speculative verification: logits for EVERY query token."""
    hidden, k_caches = _deepseek_forward(
        params, config, token_ids, positions, cu_seqlens_q, max_seqlen_q,
        seq_lens, block_tables, slot_mapping, k_caches, tp_axis=tp_axis,
    )
    hidden = rms_norm(hidden, params["final_norm"], config.rms_norm_eps)
    logits = params["lm_head"].apply(hidden)
    return logits.astype(jnp.float32), k_caches, v_caches


def deepseek_decode_step(
    params, config: DeepseekV2Config, token_ids, positions, seq_lens,
    block_tables, slot_mapping, k_caches, v_caches, tp_axis=None,
):
    """One decode step: decode is varlen MLA with one query per sequence."""
    batch = token_ids.shape[0]
    cu = jnp.arange(batch + 1, dtype=jnp.int32)
    hidden, k_caches = _deepseek_forward(
        params, config, token_ids, positions, cu, 1, seq_lens, block_tables,
        slot_mapping, k_caches, tp_axis=tp_axis,
    )
    hidden = rms_norm(hidden, params["final_norm"], config.rms_norm_eps)
    logits = params["lm_head"].apply(hidden)
    return logits.astype(jnp.float32), k_caches, v_caches


def init_deepseek_kv_cache(
    config: DeepseekV2Config, num_pages: int, page_size: int, dtype=None
) -> jax.Array:
    return jnp.zeros(
        (config.num_layers, num_pages, page_size, config.kv_packed_dim),
        dtype or config.dtype,
    )


# -- training (dense full-attention forward + GSPMD step) ------------------


def deepseek_dense_forward(
    params: dict, config: DeepseekV2Config, token_ids: jax.Array, remat: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Full-context dense forward over (batch, seq) token ids.

    Attention runs in the NON-absorbed form (per-head K/V reconstructed
    from the latent via the same absorbed W_uk/W_uv parameters:
    ``k_nope = c @ W_uk``, ``v = c @ W_uv``), which is the efficient
    layout for training — every position's K/V is needed anyway, and the
    (B,T,H,d) einsums batch onto the MXU. Returns (logits, aux) where
    ``aux`` is the Switch-style load-balance loss summed over MoE layers.

    ``remat=True`` wraps each layer in ``jax.checkpoint`` (O(1)-layer
    activation memory).
    """
    from conch_tpu.models.moe import load_balance_loss

    b, t = token_ids.shape
    h = config.hidden_size
    nh = config.num_heads
    nope, rope_d = config.qk_nope_head_dim, config.qk_rope_head_dim
    lora = config.kv_lora_rank
    scale = config.attention_scale()
    hidden = jnp.take(params["embedding"], token_ids, axis=0).astype(jnp.float32)
    positions = jnp.arange(t, dtype=jnp.int32)
    cs = jnp.take(params["rope_cache"], positions, axis=0)
    cos, sin = cs[:, : rope_d // 2], cs[:, rope_d // 2 :]

    def norm(x, w):
        ms = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + config.rms_norm_eps)) * w.astype(jnp.float32)

    causal = jnp.tril(jnp.ones((t, t), bool))

    def layer_step(hidden, layer, moe: bool):
        x = norm(hidden, layer["input_norm"]).astype(config.dtype)
        flat = x.reshape(b * t, h)
        if config.q_lora_rank:
            qa = norm(layer["wq_a"].apply(flat), layer["q_a_norm"]).astype(config.dtype)
            q = layer["wq_b"].apply(qa)
        else:
            q = layer["wq"].apply(flat)
        q = q.reshape(b, t, nh, nope + rope_d).astype(jnp.float32)
        q_nope, q_pe = q[..., :nope], q[..., nope:]
        q_pe = _apply_rope_interleaved(q_pe, cos[None, :, None, :], sin[None, :, None, :])

        kv_a = layer["w_kv_a"].apply(flat).reshape(b, t, lora + rope_d).astype(jnp.float32)
        c = norm(kv_a[..., :lora], layer["kv_a_norm"])
        k_pe = _apply_rope_interleaved(kv_a[..., lora:], cos[None], sin[None])

        k_nope = jnp.einsum("btl,hnl->bthn", c, layer["w_uk"].astype(jnp.float32))
        v = jnp.einsum("btl,hlv->bthv", c, layer["w_uv"].astype(jnp.float32))
        k = jnp.concatenate([k_nope, jnp.broadcast_to(k_pe[:, :, None, :], (b, t, nh, rope_d))], -1)
        q_full = jnp.concatenate([q_nope, q_pe], -1)

        s = jnp.einsum("bqhd,bkhd->bhqk", q_full, k) * scale
        s = jnp.where(causal[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b * t, -1).astype(config.dtype)
        hidden = hidden + layer["wo"].apply(attn).reshape(b, t, h).astype(jnp.float32)

        x2 = norm(hidden, layer["post_attn_norm"]).astype(config.dtype).reshape(b * t, h)
        aux = jnp.zeros((), jnp.float32)
        if moe:
            mlp_out = _moe_mlp(layer, x2, config)
            logits_r = x2.astype(jnp.float32) @ layer["router_w"].astype(jnp.float32)
            _, experts = deepseek_route(x2, layer["router_w"], config, bias=layer.get("router_bias"))
            aux = load_balance_loss(logits_r, experts, config.n_routed_experts)
        else:
            mlp_out = _dense_mlp(layer, x2)
        hidden = hidden + mlp_out.reshape(b, t, h).astype(jnp.float32)
        return hidden, aux

    aux_total = jnp.zeros((), jnp.float32)
    for stack, moe in (("layers_dense", False), ("layers_moe", True)):
        if params[stack] is None:
            continue
        step = (lambda hh, layer, m=moe: layer_step(hh, layer, m))
        if remat:
            step = jax.checkpoint(step)
        hidden, auxes = jax.lax.scan(
            lambda hh, layer, s=step: s(hh, layer), hidden, params[stack]
        )
        aux_total = aux_total + jnp.sum(auxes)

    hidden = norm(hidden, params["final_norm"]).astype(config.dtype)
    logits = params["lm_head"].apply(hidden.reshape(b * t, h))
    return logits.reshape(b, t, -1).astype(jnp.float32), aux_total


def make_deepseek_train_step(
    mesh, config: DeepseekV2Config, params_example, learning_rate: float = 1e-3,
    aux_coef: float = 0.01, remat: bool = False,
):
    """GSPMD DeepSeek training step: batch over "data"; heads (W_uk/W_uv,
    q/o projections) and routed experts over "model"; loss = next-token
    CE + aux_coef x load-balance. Returns (train_step, init_opt_state,
    batch_sharding)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from conch_tpu.parallel.sharding import llama_param_shardings

    optimizer = optax.adamw(learning_rate)
    param_shardings = llama_param_shardings(params_example, mesh)
    batch_sharding = NamedSharding(mesh, P("data", None))

    def loss_fn(params, token_ids):
        logits, aux = deepseek_dense_forward(params, config, token_ids, remat=remat)
        targets = token_ids[:, 1:]
        log_probs = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll) + aux_coef * aux

    def init_opt_state(params):
        return optimizer.init(params)

    def train_step(params, opt_state, token_ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, token_ids)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(
        train_step,
        in_shardings=(param_shardings, None, batch_sharding),
        out_shardings=(param_shardings, None, None),
        donate_argnums=(0, 1),
    )
    return jitted, init_opt_state, batch_sharding


def requantize_deepseek_params(
    params: dict, config: DeepseekV2Config, quant_mode: str, group_size: int = 32
) -> dict:
    """Post-training quantization: rebuild every 2-D projection of a
    dense (bf16) DeepSeek param tree in ``quant_mode``, matching the
    layout ``init_deepseek_params(..., quant_mode)`` produces natively.
    The absorbed W_uk/W_uv and expert stacks stay dense (they run as
    batched einsums, not QuantizedLinear matmuls)."""
    kwargs = {"group_size": group_size} if quant_mode in ("int4", "int8") else {}
    proj_names = (
        "wq", "wq_a", "wq_b", "w_kv_a", "wo",
        "w_gate", "w_up", "w_down",
        "shared_gate", "shared_up", "shared_down",
    )

    def requant_stacked(ql: QuantizedLinear) -> QuantizedLinear:
        assert ql.kind == "dense", f"requantize needs dense params, got {ql.kind}"
        w = np.asarray(ql.arrays["w"], dtype=np.float32)  # (L, K, N)
        per_layer = [quantize_linear(w[i], quant_mode, **kwargs) for i in range(w.shape[0])]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

    out = dict(params)
    for stack_name in ("layers_dense", "layers_moe"):
        if params[stack_name] is None:
            continue
        stack = dict(params[stack_name])
        for name in proj_names:
            if name in stack:
                stack[name] = requant_stacked(stack[name])
        out[stack_name] = stack

    head = params["lm_head"]
    assert head.kind == "dense"
    head_mode = quant_mode if quant_mode != "int4" else "bf16"
    head_kwargs = kwargs if head_mode in ("int4", "int8") else {}
    out["lm_head"] = quantize_linear(
        np.asarray(head.arrays["w"], dtype=np.float32), head_mode, **head_kwargs
    )
    return out
