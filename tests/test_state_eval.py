"""KV state save/restore, perplexity, grammar-constrained engine path."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

import jax.numpy as jnp

from booster_tpu.eval import perplexity
from booster_tpu.models import load_model
from booster_tpu.sampling import SamplingParams
from booster_tpu.serving import Engine
from booster_tpu.serving.state import load_slot_state, save_slot_state
from tools.make_test_model import make_model

_CACHE = {}


def get_engine(tmp_path_factory, **kw):
    key = tuple(sorted(kw.items()))
    if key not in _CACHE:
        path = str(tmp_path_factory.mktemp("se") / "tiny.gguf")
        make_model(path, vocab_size=512, hidden=128, layers=2)
        _CACHE[key] = Engine(load_model(path), max_batch=2, max_seq=128, **kw)
    return _CACHE[key]


def test_state_roundtrip(tmp_path_factory):
    eng = get_engine(tmp_path_factory)
    eng.init_batch_state()
    ids = eng.tokenizer.encode("hello world")
    eng.reset_slot(0, SamplingParams(temp=0.0), seed=1)
    first = eng.prefill_slots({0: ids})
    toks1, _ = eng.decode_slots({0: first[0]}, n_steps=3)
    history = ids + [first[0]] + toks1[0]

    blob = save_slot_state(eng, 0, history)
    assert len(blob) > 100

    # wipe the slot, restore, and continue: same continuation as uninterrupted
    toks_cont, _ = eng.decode_slots({0: history[-1]}, n_steps=3)

    eng.reset_slot(0, SamplingParams(temp=0.0), seed=1)
    restored = load_slot_state(eng, 0, blob)
    assert restored == history
    toks_restored, _ = eng.decode_slots({0: history[-1]}, n_steps=3)
    assert toks_restored[0] == toks_cont[0]


def test_state_mismatch_rejected(tmp_path_factory):
    eng = get_engine(tmp_path_factory)
    eng.init_batch_state()
    with pytest.raises(ValueError):
        load_slot_state(eng, 0, b"garbage")


def test_perplexity_sane(tmp_path_factory):
    eng = get_engine(tmp_path_factory)
    model = eng.model
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 500, 128).tolist()
    r = perplexity(model, ids, n_ctx=32)
    assert r["tokens"] == 4 * 31
    assert 1.0 < r["ppl"] < 100000.0
    # a model should be (much) better on its own greedy continuations
    gen = eng.generate(eng.tokenizer.encode("the"), SamplingParams(temp=0.0),
                       max_new_tokens=64)
    ids2 = eng.tokenizer.encode("the") + gen.token_ids
    if len(ids2) >= 32:
        r2 = perplexity(model, ids2[:32], n_ctx=32)
        assert r2["ppl"] < r["ppl"]


def test_engine_grammar_generation(tmp_path_factory):
    eng = get_engine(tmp_path_factory)
    ids = eng.tokenizer.encode("the")
    gbnf = 'root ::= " the" (" the")*\n'
    r = eng.generate_grammar(ids, gbnf, SamplingParams(temp=0.0), max_new_tokens=6)
    assert r.n_generated >= 1
    # every generated token decodes into repetitions of " the"
    assert set(r.text.split()) <= {"the"}, r.text
