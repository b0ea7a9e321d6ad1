# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""OpenAI-compatible HTTP front-end tests: real sockets, real threads,
the full engine underneath (tiny model). The server must reproduce the
direct engine's greedy outputs exactly — HTTP is a transport, not a
model path."""

import json
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.models.lora import init_lora_adapter, stack_lora_adapters
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams
from conch_tpu.serving.server import EngineWorker, ServerConfig, make_server


class ByteTokenizer:
    def encode(self, s: str) -> list[int]:
        return [b % 128 for b in s.encode()]

    def decode(self, toks: list[int]) -> str:
        return "".join(chr(t) for t in toks)


def _tiny():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        max_position=512, dtype=jnp.float32,
    )
    return cfg, init_llama_params(0, cfg, "bf16")


def _ecfg():
    return EngineConfig(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=64,
    )


@pytest.fixture(scope="module")
def served():
    cfg, params = _tiny()
    adapters = stack_lora_adapters([
        init_lora_adapter(1, cfg, rank=4, alpha=128.0, dtype=jnp.float32),
    ])
    engine = LLMEngine(params, cfg, _ecfg(), lora=adapters)
    worker = EngineWorker(engine)
    httpd = make_server(
        worker,
        ServerConfig(model_name="tiny", adapters={"tiny-lora": 0}, tokenizer=ByteTokenizer()),
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, cfg, params, adapters
    httpd.shutdown()
    worker.shutdown()


def _post(base, path, body, raw=False):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            data = resp.read()
            return resp.status, (data if raw else json.loads(data))
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def _direct_engine_output(cfg, params, prompt, max_tokens=8, lora=None, lora_id=None):
    eng = LLMEngine(params, cfg, _ecfg(), lora=lora)
    rid = eng.add_request(list(prompt), SamplingParams(temperature=0.0, max_tokens=max_tokens), lora_id=lora_id)
    for _ in range(100):
        for r in eng.step():
            if r.request_id == rid:
                return list(r.output_tokens)
    raise AssertionError("request did not finish")


def test_completion_matches_direct_engine(served):
    base, cfg, params, _ = served
    prompt = np.random.default_rng(0).integers(0, 128, size=20).tolist()
    status, resp = _post(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 8, "temperature": 0.0,
    })
    assert status == 200
    assert resp["object"] == "text_completion"
    assert resp["usage"]["prompt_tokens"] == 20
    expect = _direct_engine_output(cfg, params, prompt)
    assert resp["choices"][0]["token_ids"] == expect
    assert resp["choices"][0]["finish_reason"] == "length"


def test_lora_model_selection(served):
    base, cfg, params, adapters = served
    prompt = np.random.default_rng(1).integers(0, 128, size=18).tolist()
    _, base_resp = _post(base, "/v1/completions", {"prompt": prompt, "max_tokens": 8})
    status, lora_resp = _post(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 8, "model": "tiny-lora",
    })
    assert status == 200
    expect = _direct_engine_output(cfg, params, prompt, lora=adapters, lora_id=0)
    assert lora_resp["choices"][0]["token_ids"] == expect
    assert lora_resp["choices"][0]["token_ids"] != base_resp["choices"][0]["token_ids"]

    status, err = _post(base, "/v1/completions", {"prompt": prompt, "model": "nope"})
    assert status == 400 and "unknown model" in err["error"]["message"]


def test_concurrent_requests_batch(served):
    base, cfg, params, _ = served
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (15, 22, 19)]
    results: dict[int, list[int]] = {}

    def hit(i):
        _, resp = _post(base, "/v1/completions", {"prompt": prompts[i], "max_tokens": 8})
        results[i] = resp["choices"][0]["token_ids"]

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, p in enumerate(prompts):
        assert results[i] == _direct_engine_output(cfg, params, p)


def test_streaming_matches_nonstreaming(served):
    base, cfg, params, _ = served
    prompt = np.random.default_rng(3).integers(0, 128, size=17).tolist()
    _, full = _post(base, "/v1/completions", {"prompt": prompt, "max_tokens": 6})

    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({"prompt": prompt, "max_tokens": 6, "stream": True}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    tokens, finish = [], None
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        for line in resp:
            line = line.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            chunk = json.loads(line[6:])
            choice = chunk["choices"][0]
            tokens.extend(choice["token_ids"])
            if choice["finish_reason"]:
                finish = choice["finish_reason"]
    assert tokens == full["choices"][0]["token_ids"]
    assert finish == "length"


def test_parallel_sampling_choices(served):
    base, _, _, _ = served
    prompt = np.random.default_rng(4).integers(0, 128, size=16).tolist()
    status, resp = _post(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 5, "n": 2, "temperature": 0.0,
    })
    assert status == 200
    assert len(resp["choices"]) == 2
    # Greedy siblings are identical (same logits, argmax).
    assert resp["choices"][0]["token_ids"] == resp["choices"][1]["token_ids"]
    assert resp["usage"]["completion_tokens"] == 10


def test_string_prompt_roundtrip(served):
    base, _, _, _ = served
    status, resp = _post(base, "/v1/completions", {"prompt": "hello tpu", "max_tokens": 4})
    assert status == 200
    choice = resp["choices"][0]
    assert choice["text"] == ByteTokenizer().decode(choice["token_ids"])


def test_models_and_health(served):
    base, _, _, _ = served
    status, models = _get(base, "/v1/models")
    assert status == 200
    assert [m["id"] for m in models["data"]] == ["tiny", "tiny-lora"]
    status, health = _get(base, "/health")
    assert status == 200 and health["status"] == "ok"
    assert "free_pages" in health["stats"]


def test_invalid_requests(served):
    base, _, _, _ = served
    status, err = _post(base, "/v1/completions", {"prompt": {"bad": 1}})
    assert status == 400
    status, err = _post(base, "/v1/completions", {"prompt": [1, 2], "stream": True, "n": 2})
    assert status == 400
