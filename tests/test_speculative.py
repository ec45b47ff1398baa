"""Speculative decoding: output must equal the target's plain greedy output."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from booster_tpu.models import load_model
from booster_tpu.sampling import SamplingParams
from booster_tpu.serving import Engine
from booster_tpu.serving.speculative import generate_speculative
from tools.make_test_model import make_model


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec")
    tpath = str(d / "target.gguf")
    dpath = str(d / "draft.gguf")
    # sharper weights → decisive argmax (bf16 rounding can't flip near-ties)
    make_model(tpath, vocab_size=512, hidden=128, layers=2, seed=0, weight_scale=0.3)
    # different draft (different weights): exercises the rejection path
    make_model(dpath, vocab_size=512, hidden=64, layers=1, seed=7, weight_scale=0.3)
    target = Engine(load_model(tpath), max_batch=1, max_seq=256)
    draft_same = Engine(load_model(tpath), max_batch=1, max_seq=256)
    draft_diff = Engine(load_model(dpath), max_batch=1, max_seq=256)
    return target, draft_same, draft_diff


def test_perfect_draft_exact_match(engines):
    target, draft_same, _ = engines
    ids = target.tokenizer.encode("hello world")
    plain = target.generate(ids, SamplingParams(temp=0.0), max_new_tokens=24)
    spec = generate_speculative(target, draft_same, ids, max_new_tokens=24, k=4)
    assert spec.token_ids == plain.token_ids
    # identical draft: acceptance limited only by bf16 rounding between the
    # T=1 draft steps and the T=k+1 verify on near-tie random-weight logits
    assert spec.acceptance_rate > 0.2


def test_weak_draft_still_exact(engines):
    target, _, draft_diff = engines
    ids = target.tokenizer.encode("the")
    plain = target.generate(ids, SamplingParams(temp=0.0), max_new_tokens=24)
    spec = generate_speculative(target, draft_diff, ids, max_new_tokens=24, k=4)
    # rejections happen, but the output is still the target's greedy sequence
    assert spec.token_ids == plain.token_ids
    assert 0.0 <= spec.acceptance_rate <= 1.0
