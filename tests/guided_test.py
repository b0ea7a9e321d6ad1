# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Guided (structured) decoding tests.

The FSM compiler is property-tested against Python's ``re`` as the
oracle: for every (pattern, candidate string) pair, the token FSM must
accept exactly when ``re.fullmatch`` does. Engine integration is tested
end to end: random-temperature generation through the full paged-KV
serving stack must emit only strings matching the constraint, and JSON
mode must emit parseable schema-conforming JSON.
"""

import json
import re

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams
from conch_tpu.serving.guided import (
    TokenFSM,
    fsm_for_json_schema,
    json_schema_to_regex,
)

# -- character-level vocab helpers -----------------------------------------

VOCAB_SIZE = 128
EOS = 0


def char_vocab() -> list[str]:
    """Token id i decodes to chr(i) for printable ASCII; others (incl. the
    EOS slot) decode to '' so the FSM never allows them."""
    return ["" if i < 32 or i == 127 else chr(i) for i in range(VOCAB_SIZE)]


def encode(s: str) -> list[int]:
    return [ord(c) for c in s]


def decode(tokens: list[int]) -> str:
    return "".join(chr(t) for t in tokens if t != EOS)


# -- FSM vs re.fullmatch oracle ---------------------------------------------

ORACLE_CASES = [
    ("abc", ["abc", "ab", "abcd", ""]),
    ("a*b+c?", ["b", "aab", "aaabbcc", "abc", "ac", "c", "aaabbbc"]),
    ("(ab|cd)*", ["", "ab", "cdab", "abc", "cd", "abab", "ba"]),
    ("[a-c]{2,4}", ["a", "ab", "abca", "abcab", "abd", "cc"]),
    ("x{3}", ["xx", "xxx", "xxxx"]),
    ("x{2,}", ["x", "xx", "xxxxx"]),
    ("-?(0|[1-9][0-9]*)", ["0", "-0", "42", "-137", "007", "", "-"]),
    ("[^ab]c", ["xc", "ac", "bc", "cc", "c"]),
    ('"[^"]*"', ['""', '"hi"', '"a"b"', '"unterminated']),
    ("(a|b)(c|d)e", ["ace", "bde", "abe", "ae"]),
]


@pytest.mark.parametrize(("pattern", "candidates"), ORACLE_CASES)
def test_fsm_matches_re_oracle(pattern, candidates):
    fsm = TokenFSM.from_regex(pattern, char_vocab())
    for s in candidates:
        state = fsm.walk(encode(s))
        fsm_accepts = state >= 0 and bool(fsm.accepting[state])
        assert fsm_accepts == bool(re.fullmatch(pattern, s)), (pattern, s)


def test_fsm_multichar_tokens():
    """Merged tokens advance through several regex characters at once."""
    vocab = ["", "a", "b", "ab", "abc", "c", "x"]
    fsm = TokenFSM.from_regex("(abc)+", vocab)
    s = fsm.start_state
    # "ab" then "c" spells abc: accepted.
    s1 = fsm.advance(fsm.advance(s, 3), 5)
    assert s1 >= 0 and fsm.accepting[s1]
    # "abc" in one token.
    s2 = fsm.advance(s, 4)
    assert s2 >= 0 and fsm.accepting[s2]
    # "x" never legal; empty-string token never legal.
    assert fsm.advance(s, 6) == -1
    assert fsm.advance(s, 0) == -1
    # From the accepting state, another "abc" continues the +.
    assert fsm.accepting[fsm.advance(s2, 4)]


def test_escape_classes():
    fsm = TokenFSM.from_regex(r"\d+\.\d{2}", char_vocab())
    for s, ok in [("3.14", True), ("12.50", True), ("3.1", False), ("a.12", False), ("3.141", False)]:
        state = fsm.walk(encode(s))
        assert (state >= 0 and bool(fsm.accepting[state])) == ok, s


# -- JSON schema -> regex -----------------------------------------------------

SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "score": {"type": "number"},
        "active": {"type": "boolean"},
        "tag": {"enum": ["red", "green"]},
    },
}


def test_json_schema_regex_accepts_conforming_instances():
    rx = json_schema_to_regex(SCHEMA)
    good = '{"name": "bo", "age": 41, "score": -2.5e3, "active": true, "tag": "red"}'
    assert re.fullmatch(rx, good)
    # Canonical minimal whitespace also allowed.
    tight = '{"name":"x","age":0,"score":1,"active":false,"tag":"green"}'
    assert re.fullmatch(rx, tight)
    for bad in [
        '{"name": "bo"}',  # missing keys
        '{"name": bo, "age": 41, "score": 1, "active": true, "tag": "red"}',  # unquoted
        '{"name": "bo", "age": 4.5, "score": 1, "active": true, "tag": "red"}',  # int violated
        '{"name": "bo", "age": 41, "score": 1, "active": true, "tag": "blue"}',  # enum violated
    ]:
        assert not re.fullmatch(rx, bad), bad


def test_json_array_property():
    rx = json_schema_to_regex(
        {"type": "object", "properties": {"xs": {"type": "array", "items": {"type": "integer"}}}}
    )
    assert re.fullmatch(rx, '{"xs": [1, 2, 3]}')
    assert re.fullmatch(rx, '{"xs": []}')
    assert not re.fullmatch(rx, '{"xs": [1, ]}')


# -- engine integration -------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_model():
    cfg = LlamaConfig(
        vocab_size=VOCAB_SIZE, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        max_position=512, dtype=jnp.float32,
    )
    params = init_llama_params(0, cfg, "bf16")
    return cfg, params


def _make_engine(cfg, params, **overrides):
    defaults = dict(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=64, eos_token_id=EOS,
    )
    defaults.update(overrides)
    return LLMEngine(params, cfg, EngineConfig(**defaults))


def test_engine_guided_regex(tiny_model):
    """Every sampled continuation matches the constraint regex, at
    temperature 1.0 (the model itself knows nothing about the pattern)."""
    cfg, params = tiny_model
    engine = _make_engine(cfg, params)
    pattern = "(yes|no|maybe)"
    fsm = TokenFSM.from_regex(pattern, char_vocab())
    prompts = [[10, 20, 30], [40, 50], [60]]
    outs = engine.generate(
        prompts, SamplingParams(temperature=1.0, max_tokens=16, guided=fsm)
    )
    for out in outs:
        assert out[-1] == EOS  # FSM drove the request to completion
        text = decode(out)
        assert re.fullmatch(pattern, text), text


def test_engine_guided_forced_finish_beats_max_tokens(tiny_model):
    """A fixed-length pattern finishes via forced EOS long before
    max_tokens, even when min_tokens tries to suppress EOS."""
    cfg, params = tiny_model
    engine = _make_engine(cfg, params)
    fsm = TokenFSM.from_regex("[ab]{3}", char_vocab())
    out = engine.generate(
        [[5, 6]],
        SamplingParams(temperature=1.0, max_tokens=32, min_tokens=10, guided=fsm),
    )[0]
    text = decode(out)
    assert re.fullmatch("[ab]{3}", text)
    assert out[-1] == EOS
    assert len(out) == 4  # 3 constrained chars + eos


def test_engine_guided_json_mode(tiny_model):
    cfg, params = tiny_model
    engine = _make_engine(cfg, params)
    schema = {
        "type": "object",
        "properties": {"count": {"type": "integer"}, "ok": {"type": "boolean"}},
    }
    fsm = fsm_for_json_schema(schema, char_vocab())
    out = engine.generate(
        [[7, 8, 9]], SamplingParams(temperature=1.0, max_tokens=64, guided=fsm)
    )[0]
    obj = json.loads(decode(out))
    assert isinstance(obj["count"], int)
    assert isinstance(obj["ok"], bool)


def test_engine_guided_survives_preemption(tiny_model):
    """Guided requests stay constraint-correct through preempt-recompute
    (the FSM state cache is derived from output_tokens)."""
    cfg, params = tiny_model
    # Tiny page pool forces preemption under concurrent load.
    engine = _make_engine(cfg, params, num_pages=12, max_batch_size=3, max_pages_per_seq=4)
    pattern = "(abc|xyz){1,4}"
    fsm = TokenFSM.from_regex(pattern, char_vocab())
    prompts = [[11, 12, 13], [14, 15], [16, 17, 18]]
    outs = engine.generate(
        prompts, SamplingParams(temperature=1.0, max_tokens=20, guided=fsm)
    )
    for out in outs:
        text = decode(out)
        assert re.fullmatch(pattern, text), text


def test_engine_guided_and_unguided_mix(tiny_model):
    """Unguided rows in the same batch are untouched by the guided mask."""
    cfg, params = tiny_model
    engine = _make_engine(cfg, params)
    fsm = TokenFSM.from_regex("[xy]{2}", char_vocab())
    rid_g = engine.add_request([3, 4], SamplingParams(temperature=1.0, max_tokens=8, guided=fsm))
    rid_u = engine.add_request([3, 4], SamplingParams(max_tokens=5))
    results = {}
    while engine.waiting or engine.running:
        for req in engine.step():
            results[req.request_id] = req.output_tokens
    assert re.fullmatch("[xy]{2}", decode(results[rid_g]))
    # The greedy unguided request matches a fresh single-request run.
    alone = _make_engine(cfg, params).generate([[3, 4]], SamplingParams(max_tokens=5))[0]
    assert results[rid_u] == alone


def test_guided_requires_eos(tiny_model):
    cfg, params = tiny_model
    engine = _make_engine(cfg, params, eos_token_id=None)
    fsm = TokenFSM.from_regex("a", char_vocab())
    with pytest.raises(ValueError, match="eos_token_id"):
        engine.add_request([1], SamplingParams(guided=fsm))


def test_guided_vocab_mismatch(tiny_model):
    cfg, params = tiny_model
    engine = _make_engine(cfg, params)
    fsm = TokenFSM.from_regex("a", char_vocab()[:64])
    with pytest.raises(ValueError, match="vocab"):
        engine.add_request([1], SamplingParams(guided=fsm))
