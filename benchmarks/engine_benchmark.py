# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Serving-engine step benchmark (beyond the reference: engine-level rows).

Measures the full continuous-batching path — scheduler + jitted decode /
chunked-prefill steps — on a Llama-3-8B-shaped model truncated to
``--num-layers`` (default 4; scale results by layers/4 for the full
model). Wall-clock per engine step, host scheduling included, which is
what a serving deployment actually sees.
"""

import numpy as np

from benchmarks.common import make_parser, run_and_report


def main() -> None:
    parser = make_parser("Serving engine step benchmark")
    parser.add_argument("--num-layers", type=int, default=4)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--context", type=int, default=256)
    parser.add_argument("--quant", default="int4", choices=["int4", "bf16", "tiny"])
    parser.add_argument(
        "--multi-step", type=int, default=8,
        help="decode K tokens per dispatch (greedy; amortizes host RTT). "
        "8 matches the engine's production default; pass 1 for the "
        "per-token-dispatch row",
    )
    args = parser.parse_args()

    import jax.numpy as jnp

    from conch_tpu.models.llama import LlamaConfig, init_llama_params
    from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams

    if args.quant == "tiny":  # CPU smoke: interpret mode is slow
        config = LlamaConfig(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
            max_position=4096, dtype=jnp.bfloat16,
        )
        quant = "bf16"
    else:
        config = LlamaConfig.llama3_8b()
        object.__setattr__(config, "num_layers", args.num_layers)
        quant = args.quant

    params = init_llama_params(0, config, quant)
    page_size = 16
    # Headroom for EVERY timed step: requests must still be generating in
    # the last iteration, or the median measures empty no-op steps.
    decode_budget = (args.warmup + args.iterations + 4) * max(args.multi_step, 1)
    pages_per_seq = -(-(args.context + decode_budget + 1) // page_size)
    ecfg = EngineConfig(
        page_size=page_size,
        num_pages=args.batch * pages_per_seq + 1,
        max_batch_size=args.batch,
        max_pages_per_seq=pages_per_seq,
        max_prefill_tokens=2048,
        enable_prefix_caching=False,
        multi_step_decode=args.multi_step,
    )
    engine = LLMEngine(params, config, ecfg)

    rng = np.random.default_rng(args.seed)
    prompts = [rng.integers(0, config.vocab_size, args.context).tolist() for _ in range(args.batch)]
    for p in prompts:
        engine.add_request(p, SamplingParams(max_tokens=10**9))

    # Prefill all prompts (chunked) before timing steady-state decode.
    import time

    from conch_tpu.serving.engine import RequestState

    prefill_steps = 0
    t0 = time.perf_counter()
    while engine.waiting or any(r.state == RequestState.PREFILLING for r in engine.running):
        engine.step()
        prefill_steps += 1
        if prefill_steps > 1000:
            break
    prefill_s = time.perf_counter() - t0

    def decode_step():
        engine.step()

    decode_step()  # warm the decode jit before timing

    # num_layers MUST be in the tag: r5's ledger held a 32-layer and a
    # default-layer row under one name and flagged a phantom 2.1x
    # inter-window contradiction.
    tag = "engine_decode_step_l%d_b%d_ctx%d" % (args.num_layers, args.batch, args.context)
    if args.multi_step > 1:
        tag += "_k%d" % args.multi_step
    results = run_and_report(args, [(tag, decode_step)])
    med_ms = results[0].median_ms
    assert all(
        r.state == RequestState.RUNNING for r in engine.running
    ) and not engine.waiting, "decode budget exhausted mid-benchmark: timed empty steps"
    toks_per_step = args.batch * args.multi_step
    print(
        f"# prefill (cold engine, INCLUDES per-shape jit compiles): "
        f"{args.batch}x{args.context} tokens in {prefill_s:.3f}s over {prefill_steps} steps"
    )
    print(f"# decode throughput: {toks_per_step / (med_ms / 1e3):.1f} tok/s at {config.num_layers} layers")

    # Steady-state prefill: abort the decode requests and prefill a fresh
    # same-shape batch on the SAME engine, so every chunked-prefill jit is
    # already compiled. The cold number above is compile-dominated — one
    # compile per (chunk shape, batch-bucket) through the remote-compile
    # tunnel (~20-40 s each) — which is a warmup cost, not throughput; a
    # serving deployment pays it once per process (see docs/serving.md).
    for r in list(engine.running):
        engine.abort_request(r.request_id)
    assert not engine.running and not engine.waiting, "abort left requests behind"
    for p in prompts:
        engine.add_request(p, SamplingParams(max_tokens=10**9))
    pf_steps = 0
    t0 = time.perf_counter()
    while engine.waiting or any(r.state == RequestState.PREFILLING for r in engine.running):
        engine.step()
        pf_steps += 1
        if pf_steps > 1000:
            break
    pf_s = time.perf_counter() - t0
    pf_tokens = args.batch * args.context
    print(
        f"# prefill steady-state (jits warm): {pf_tokens} tokens in "
        f"{pf_s:.3f}s over {pf_steps} steps = {pf_tokens / pf_s:.0f} tok/s "
        f"at {config.num_layers} layers"
    )
    for r in list(engine.running):
        engine.abort_request(r.request_id)

    # TTFT: per-request latency from submission to the first output token
    # on an otherwise-idle engine (chunked prefill + first sample) — the
    # north-star serving latency metric (BASELINE.json "p50 TTFT").
    ttft_engine = LLMEngine(params, config, ecfg)
    ttfts = []
    for _ in range(min(args.batch, 8)):
        prompt = rng.integers(0, config.vocab_size, args.context).tolist()
        t0 = time.perf_counter()
        rid = ttft_engine.add_request(prompt, SamplingParams(max_tokens=1))
        while any(
            r.request_id == rid for r in (*ttft_engine.running, *ttft_engine.waiting)
        ):
            ttft_engine.step()
        ttfts.append(time.perf_counter() - t0)
    print(
        f"# TTFT ({args.context}-token prompt): p50 {np.median(ttfts) * 1e3:.1f} ms, "
        f"max {max(ttfts) * 1e3:.1f} ms over {len(ttfts)} requests"
    )


if __name__ == "__main__":
    main()
