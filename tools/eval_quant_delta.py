# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""End-to-end quantization-quality evaluation (ppl delta per bit-width).

The north star (BASELINE.json) requires "end-to-end perplexity within the
reference delta at the same bit-width (NF4, INT4, INT8)". With no network
egress there are no pretrained checkpoints in this environment, so this
tool builds a model with *real structure* the honest way:

1. train a small Llama on a synthetic order-2 Markov corpus until it has
   learned the transition structure (loss far below uniform),
2. post-training-quantize the trained weights at each bit-width with
   ``requantize_llama_params`` (the same path a user would run on real
   checkpoints),
3. report held-out teacher-forced perplexity per precision, the ppl delta
   vs bf16, and mean per-token KL(bf16 || quant).

Every forward pass goes through the same model graph the serving engine
uses (``QuantizedLinear.apply`` -> mixed-precision dequant-GEMM / nf4
dequant kernels), so the deltas measure the real inference numerics.

Usage: python tools/eval_quant_delta.py [--steps 300] [--json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.models.llama import LlamaConfig, init_llama_params, requantize_llama_params
from conch_tpu.parallel.mesh import create_mesh
from conch_tpu.parallel.train import causal_lm_loss, dense_forward, make_train_step


def make_markov_corpus(rng: np.random.Generator, vocab: int, rows: int, seq: int) -> np.ndarray:
    """Order-1 Markov chain: each token allows 8 successors, Zipf-weighted.

    Per-token entropy ~1.76 nats -> an ideal model reaches ppl ~5.8; a
    model that learned nothing sits at ppl = vocab.
    """
    num_succ = 8
    succ = rng.integers(0, vocab, size=(vocab, num_succ), dtype=np.int32)
    probs = 1.0 / np.arange(1, num_succ + 1)
    probs /= probs.sum()
    out = np.empty((rows, seq), dtype=np.int32)
    out[:, 0] = rng.integers(0, vocab, size=rows)
    for t in range(1, seq):
        choice = rng.choice(num_succ, size=rows, p=probs)
        out[:, t] = succ[out[:, t - 1], choice]
    return out


def eval_ppl_and_kl(params, ref_logits, config, tokens: jax.Array, forward=None) -> tuple[float, float, np.ndarray]:
    """Teacher-forced ppl and mean KL(ref || this) over held-out tokens."""
    forward = forward or dense_forward
    logits = jax.jit(forward, static_argnums=1)(params, config, tokens)
    lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    targets = tokens[:, 1:]
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    ppl = float(jnp.exp(jnp.mean(nll)))
    if ref_logits is None:
        kl = 0.0
    else:
        ref_lp = jax.nn.log_softmax(ref_logits[:, :-1], axis=-1)
        kl = float(jnp.mean(jnp.sum(jnp.exp(ref_lp) * (ref_lp - lp), axis=-1)))
    return ppl, kl, np.asarray(logits)


def eval_ppl_kv_cache(params, config, tokens: jax.Array, cache_dtype) -> float:
    """Teacher-forced ppl through the REAL paged serving path (varlen
    attention over a paged KV cache written by reshape_and_cache), with the
    cache held in ``cache_dtype`` (None = model dtype). This measures the
    serving-precision deltas the dense eval above cannot see."""
    import jax.numpy as jnp

    from conch_tpu.models.llama import init_kv_caches, llama_verify_forward

    batch, seq = tokens.shape
    page_size = 16
    pages_per_seq = -(-seq // page_size)
    block_tables = np.arange(batch * pages_per_seq, dtype=np.int32).reshape(
        batch, pages_per_seq
    )
    positions = np.tile(np.arange(seq, dtype=np.int32), batch)
    pages = block_tables[:, positions[:seq] // page_size]  # (batch, seq)
    slots = (pages * page_size + (np.arange(seq) % page_size)[None, :]).reshape(-1)
    cu = np.arange(batch + 1, dtype=np.int32) * seq
    k, v = init_kv_caches(config, batch * pages_per_seq, page_size, cache_dtype=cache_dtype)
    logits, _, _ = jax.jit(llama_verify_forward, static_argnums=(1, 5))(
        params, config, tokens.reshape(-1), jnp.asarray(positions), jnp.asarray(cu),
        seq, jnp.full((batch,), seq, jnp.int32), jnp.asarray(block_tables),
        jnp.asarray(slots), k, v,
    )
    lp = jax.nn.log_softmax(logits.reshape(batch, seq, -1)[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(lp, tokens[:, 1:][..., None], axis=-1)[..., 0]
    return float(jnp.exp(jnp.mean(nll)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--seq", type=int, default=128)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--seeds", default="0", help="comma-separated training seeds")
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--json", action="store_true", help="one JSON line per precision")
    parser.add_argument(
        "--family", default="llama", choices=["llama", "deepseek"],
        help="model family: llama (GQA) or deepseek (MLA + MoE)",
    )
    args = parser.parse_args()

    seeds = [int(s) for s in args.seeds.split(",")]
    all_runs: list[dict[str, tuple[float, float]]] = []
    for seed in seeds:
        all_runs.append(run_once(args, seed))

    if len(seeds) > 1:
        print(f"# --- aggregate over seeds {seeds} (ppl delta vs same-seed bf16) ---")
        for mode in all_runs[0]:
            if mode == "bf16":
                continue
            deltas = [r[mode][0] - r["bf16"][0] for r in all_runs]
            line = {
                "precision": mode,
                "ppl_delta_mean": round(float(np.mean(deltas)), 4),
                "ppl_delta_min": round(float(np.min(deltas)), 4),
                "ppl_delta_max": round(float(np.max(deltas)), 4),
                "seeds": len(seeds),
            }
            print(json.dumps(line) if args.json else f"  {line}")


def run_once(args, seed: int) -> dict[str, tuple[float, float]]:
    rng = np.random.default_rng(seed)
    if args.family == "deepseek":
        from conch_tpu.models.deepseek import (
            DeepseekV2Config,
            deepseek_dense_forward,
            init_deepseek_params,
            make_deepseek_train_step,
            requantize_deepseek_params,
        )

        config = DeepseekV2Config(
            vocab_size=512, hidden_size=256, num_layers=args.layers, num_heads=4,
            kv_lora_rank=128, qk_nope_head_dim=64, qk_rope_head_dim=32,
            v_head_dim=64, n_routed_experts=4, n_shared_experts=1,
            num_experts_per_tok=2, moe_intermediate_size=256,
            intermediate_size=512, first_k_dense_replace=1,
            max_position=args.seq, moe_capacity_factor=100.0,
        )
        params = init_deepseek_params(seed, config, "bf16")
        mesh = create_mesh(data=1, model=1, devices=jax.devices()[:1])
        train_step, init_opt, _ = make_deepseek_train_step(mesh, config, params, learning_rate=args.lr)
        forward = lambda p, c, toks: deepseek_dense_forward(p, c, toks)[0]
        requantize = requantize_deepseek_params
        group_size = 32
    else:
        config = LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512, num_layers=args.layers,
            num_heads=4, num_kv_heads=2, head_dim=64, max_position=args.seq,
        )
        params = init_llama_params(seed, config, "bf16")
        mesh = create_mesh(data=1, model=1, devices=jax.devices()[:1])
        train_step, init_opt, *_ = make_train_step(mesh, config, params, learning_rate=args.lr)
        forward = dense_forward
        requantize = requantize_llama_params
        group_size = 64
    uniform_ppl = config.vocab_size
    opt_state = init_opt(params)

    t0 = time.time()
    # One chain: train rows and held-out rows share the transition table.
    corpus = make_markov_corpus(rng, config.vocab_size, args.steps * args.batch + 32, args.seq)
    heldout = jnp.asarray(corpus[-32:])
    corpus = corpus[:-32]
    print(f"# corpus: {corpus.shape} in {time.time() - t0:.1f}s; uniform ppl {uniform_ppl}")

    t0 = time.time()
    for step in range(args.steps):
        batch = jnp.asarray(corpus[step * args.batch : (step + 1) * args.batch])
        params, opt_state, loss = train_step(params, opt_state, batch)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"# step {step}: loss {float(loss):.4f} (uniform {np.log(uniform_ppl):.4f})")
    print(f"# trained {args.steps} steps in {time.time() - t0:.1f}s")

    results = {}
    ref_logits = None
    modes = ("bf16", "int8", "w8a8", "int4", "nf4")
    if args.family == "deepseek":
        modes = ("bf16", "int8", "int4", "nf4")  # w8a8 rules not wired for MLA
    for mode in modes:
        qp = params if mode == "bf16" else requantize(params, config, mode, group_size=group_size)
        ppl, kl, logits = eval_ppl_and_kl(qp, ref_logits, config, heldout, forward=forward)
        if mode == "bf16":
            ref_logits = jnp.asarray(logits)
        results[mode] = (ppl, kl)
        line = {
            "precision": mode,
            "ppl": round(ppl, 4),
            "ppl_delta_vs_bf16": round(ppl - results["bf16"][0], 4),
            "mean_kl_vs_bf16": round(kl, 6),
        }
        print(json.dumps(line) if args.json else f"  {line}")

    if args.family == "llama":
        # KV-cache precision rows through the real paged serving path.
        # Baseline is the SAME path with a model-dtype cache, so the delta
        # isolates the cache quantization (not kernel-vs-dense numerics).
        kv_base = eval_ppl_kv_cache(params, config, heldout, None)
        for name, dt in (("kv_int8", jnp.int8), ("kv_fp8_e4m3", jnp.float8_e4m3fn)):
            ppl = eval_ppl_kv_cache(params, config, heldout, dt)
            results[name] = (ppl, 0.0)
            line = {
                "precision": name,
                "ppl": round(ppl, 4),
                "ppl_delta_vs_paged_bf16_cache": round(ppl - kv_base, 4),
                "paged_bf16_cache_ppl": round(kv_base, 4),
            }
            print(json.dumps(line) if args.json else f"  {line}")

    bf16_ppl = results["bf16"][0]
    assert bf16_ppl < uniform_ppl / 4, "training failed to learn structure"
    worst = max(abs(results[m][0] - bf16_ppl) for m in results if m != "bf16")
    print(
        f"# seed {seed}: bf16 ppl {bf16_ppl:.3f} (uniform {uniform_ppl}); "
        f"worst quant ppl delta {worst:.4f}"
    )
    return results


if __name__ == "__main__":
    main()
