# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Trustworthy decode-attention shoot-out on the real TPU.

Times N kernel invocations under ONE dispatch (fori_loop with a traced
data dependency) so tunnel RTT and single-dispatch timing artifacts
cannot fake the numbers, and reports achieved GB/s against the
same-window calibrated bandwidth. Any row whose implied bandwidth
exceeds calibration is a measurement bug by construction.
"""

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from conch_tpu.ops.attention import paged_attention, varlen_attention
from conch_tpu.utils.benchmark import calibrate_hbm_bw
from conch_tpu.utils.test_utils import create_paged_fixture


def loop_time_ms(step_fn, operands, n=20, reps=3):
    """Per-iter ms by differencing chained loops of N and 2N iterations.

    ``operands`` are passed as jit arguments (NOT closure constants: the
    tunnel's remote compiler rejects payloads with a GB of embedded cache).
    Differencing cancels dispatch + tunnel round-trip latency; completion
    is forced by fetching the scalar carry to the host.
    """

    def make(m):
        @jax.jit
        def run(eps, *ops):
            def body(i, carry):
                out = step_fn(carry, *ops)
                # Thread a scalar of the output back in: serializes
                # iterations (eps is traced, XLA cannot fold it away).
                return carry + eps * out.astype(jnp.float32).ravel()[0]

            return jax.lax.fori_loop(0, m, body, jnp.zeros((), jnp.float32))

        return run

    run_n, run_2n = make(n), make(2 * n)
    zero = jnp.float32(0.0)
    float(np.asarray(run_n(zero, *operands)))  # compile + true sync
    float(np.asarray(run_2n(zero, *operands)))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(run_n(zero, *operands)))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(run_2n(zero, *operands)))
        t_2n = time.perf_counter() - t0
        diffs.append(max(t_2n - t_n, 1e-9) / n * 1e3)
    diffs.sort()
    return diffs[len(diffs) // 2]  # median: min-of-diffs is biased low


def main():
    batch, qh, kh, d, ps, seq = 32, 32, 8, 128, 32, 8192
    if len(sys.argv) > 1:
        seq = int(sys.argv[1])
    which = sys.argv[2].split(",") if len(sys.argv) > 2 else ["paged", "varlen_decode", "xla_dense"]
    print("devices:", jax.devices(), flush=True)
    cal = calibrate_hbm_bw()
    print(f"calibrated HBM bw this window: {cal/1e9:.1f} GB/s", flush=True)

    rng = np.random.default_rng(0)
    fx = create_paged_fixture(
        rng, batch=batch, num_q_heads=qh, num_kv_heads=kh, head_size=d,
        page_size=ps, seq_lens=[seq] * batch, dtype=jnp.bfloat16,
    )
    scale = 1.0 / math.sqrt(d)
    kv_bytes = 2 * batch * seq * kh * d * 2  # K+V, bf16

    operands = (fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens)
    cu = jnp.arange(batch + 1, dtype=jnp.int32)

    def paged_step(eps_carry, q, kc, vc, bt, sl):
        return paged_attention(q + eps_carry, kc, vc, bt, sl, scale=scale)

    def varlen_step(eps_carry, q, kc, vc, bt, sl):
        return varlen_attention(
            q + eps_carry, kc, vc, cu, 1, sl, seq, bt, causal=True, scale=scale
        )

    def xla_dense_step(eps_carry, q, kc, vc, bt, sl):
        pages_per_seq = bt.shape[1]
        k = kc[bt]
        v = vc[bt]
        b = q.shape[0]
        max_s = pages_per_seq * kc.shape[2]
        k = k.transpose(0, 2, 1, 3, 4).reshape(b, kc.shape[1], max_s, kc.shape[3])
        v = v.transpose(0, 2, 1, 3, 4).reshape(b, kc.shape[1], max_s, kc.shape[3])
        groups = q.shape[1] // kc.shape[1]
        qg = (q + eps_carry).reshape(b, kc.shape[1], groups, q.shape[2]).astype(jnp.float32)
        logits = jnp.einsum("bhgd,bhsd->bhgs", qg, k.astype(jnp.float32)) * scale
        mask = jnp.arange(max_s)[None, None, None, :] < sl[:, None, None, None]
        logits = jnp.where(mask, logits, -jnp.inf)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhgs,bhsd->bhgd", p, v.astype(jnp.float32))
        return out.reshape(b, q.shape[1], q.shape[2]).astype(q.dtype)

    print(f"shape: b{batch} qh{qh} kh{kh} d{d} ps{ps} s{seq}; KV bytes/call = {kv_bytes/1e9:.3f} GB", flush=True)
    steps = {"paged": paged_step, "varlen_decode": varlen_step, "xla_dense": xla_dense_step}
    for name in which:
        step = steps[name]
        t0 = time.perf_counter()
        ms = loop_time_ms(step, operands, n=10)
        cal = max(cal, calibrate_hbm_bw())  # window fluctuates: re-sample after each run
        gbs = kv_bytes / (ms / 1e3) / 1e9
        frac = gbs / (cal / 1e9)
        flag = "  <-- EXCEEDS CALIBRATION (bogus)" if frac > 1.1 else ""
        print(
            f"{name:>14}: {ms:8.3f} ms  {gbs:7.1f} GB/s  {frac*100:5.1f}% of window max bw ({cal/1e9:.0f})"
            f"  (wall incl compile {time.perf_counter()-t0:.0f}s){flag}",
            flush=True,
        )


if __name__ == "__main__":
    main()
