# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Serve an int4 weight-only Llama through the continuous-batching engine.

Runs anywhere: on a TPU host it uses the real chip; on CPU the Pallas
kernels run in interpret mode (slow but correct). Swap
``init_llama_params`` for your checkpoint loader + ``requantize_llama_params``
to serve trained weights.

    python examples/serve_llama_int4.py [--full-8b]
"""

import argparse
import time

import numpy as np

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--full-8b", action="store_true", help="full Llama-3-8B (TPU only)")
    parser.add_argument("--max-tokens", type=int, default=32)
    args = parser.parse_args()

    if args.full_8b:
        config = LlamaConfig.llama3_8b()
    else:
        config = LlamaConfig(
            vocab_size=32000, hidden_size=512, intermediate_size=1408, num_layers=4,
            num_heads=8, num_kv_heads=2, head_dim=64, max_position=2048,
        )

    print("initializing int4 params...")
    params = init_llama_params(0, config, quant_mode="int4", group_size=128)
    engine = LLMEngine(
        params, config,
        EngineConfig(
            page_size=64, num_pages=1024, max_batch_size=8, max_pages_per_seq=32,
            max_prefill_tokens=512,
            num_speculative_tokens=4,   # prompt-lookup speculation (greedy-exact)
        ),
    )

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, config.vocab_size, size=n).tolist() for n in (12, 40, 7)]
    t0 = time.time()
    outputs = engine.generate(prompts, SamplingParams(max_tokens=args.max_tokens))
    dt = time.time() - t0
    total = sum(len(o) for o in outputs)
    print(f"generated {total} tokens in {dt:.1f}s ({total / dt:.1f} tok/s incl. compile)")
    print(f"prefix-cache hits: {engine.prefix_cache_hits} tokens; "
          f"speculation: {engine.spec_tokens_accepted}/{engine.spec_tokens_drafted} accepted")
    for i, out in enumerate(outputs):
        print(f"  request {i}: {out[:10]}{'...' if len(out) > 10 else ''}")


if __name__ == "__main__":
    main()
