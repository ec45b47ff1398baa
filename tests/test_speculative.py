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
    make_model(tpath, vocab_size=512, hidden=128, layers=2, seed=0, weight_scale=0.5)
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


def test_sampled_acceptance_identical_draft_accepts_all(engines):
    """p == q → accept prob min(1, p/q) = 1: every proposal accepted."""
    target, draft_same, _ = engines
    ids = target.tokenizer.encode("hello world")
    # no hard filters: tiny-model logits are near-flat, so top-k boundary
    # flips between the T=1 draft and T=k+1 verify would dominate otherwise
    sp = SamplingParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0, seed=11)
    spec = generate_speculative(target, draft_same, ids, max_new_tokens=24,
                                k=4, sampling=sp)
    assert spec.n_generated >= 5  # may stop early on a sampled EOG
    # identical distributions: only bf16 T=1-vs-T=k+1 rounding can reject
    assert spec.acceptance_rate > 0.8


def test_sampled_acceptance_weak_draft(engines):
    target, _, draft_diff = engines
    ids = target.tokenizer.encode("the")
    sp = SamplingParams(temp=1.0, top_k=0, top_p=1.0, seed=3)
    spec = generate_speculative(target, draft_diff, ids, max_new_tokens=24,
                                k=4, sampling=sp)
    assert spec.n_generated >= 1
    assert 0.0 <= spec.acceptance_rate <= 1.0
    # deterministic for a fixed seed
    spec2 = generate_speculative(target, draft_diff, ids, max_new_tokens=24,
                                 k=4, sampling=sp)
    assert spec.token_ids == spec2.token_ids


def test_scheduler_routes_speculative(engines):
    """With a draft engine configured, standard jobs run speculatively."""
    import asyncio

    from booster_tpu.serving.config import PromptSpec
    from booster_tpu.serving.scheduler import Scheduler

    target, draft_same, _ = engines

    async def run():
        sched = Scheduler(
            target, prompt_spec=PromptSpec(id="default"),
            default_sampling=SamplingParams(temp=0.0),
            default_max_tokens=8, draft_engine=draft_same,
        )
        sched.start()
        job = sched.place_job(prompt="hello")
        await sched.wait_job(job.id, timeout=120)
        await sched.shutdown(drain=False)
        return job

    job = asyncio.run(run())
    assert job.status == "finished"
    assert job.n_generated >= 1


def test_lookup_decoding_exact_match(engines):
    """Prompt-lookup speculation (free n-gram draft) emits exactly the
    target's greedy sequence; repetitive prompts get real acceptance."""
    from booster_tpu.serving.speculative import generate_lookup

    target, _, _ = engines
    ids = target.tokenizer.encode("the cat sat on the mat, the cat sat")
    plain = target.generate(ids, SamplingParams(temp=0.0), max_new_tokens=24)
    spec = generate_lookup(target, ids, max_new_tokens=24, k=4)
    assert spec.token_ids == plain.token_ids


def test_lookup_propose_semantics():
    from booster_tpu.serving.speculative import _lookup_propose

    #        0  1  2  3  4  5  6  7
    seq = [5, 9, 7, 3, 5, 9, 7]
    # suffix 3-gram [5, 9, 7] recurs at 0 → propose what followed: [3, 5, ...]
    assert _lookup_propose(seq, k=2) == [3, 5]
    assert _lookup_propose(seq, k=4) == [3, 5, 9, 7]
    # no recurrence at any n → no proposal
    assert _lookup_propose([1, 2, 3, 4], k=4) == []
    # n falls back: 2-gram absent but last token recurs
    assert _lookup_propose([4, 8, 2, 9, 8], k=1) == [2]


def test_lookup_cli_flag(tmp_path_factory):
    d = tmp_path_factory.mktemp("lookup_cli")
    p = str(d / "m.gguf")
    make_model(p, vocab_size=512, hidden=128, layers=2, seed=0,
               weight_scale=0.5)
    from booster_tpu.__main__ import main

    rc = main(["--model", p, "--prompt", "one two one two one",
               "--predict", "8", "--lookup-decoding"])
    assert rc == 0


def test_lookup_chained_exact_match(engines):
    """Device-chained lookup rounds == plain greedy, n-gram and oracle."""
    from booster_tpu.serving.speculative import generate_lookup_chained

    target, _, _ = engines
    ids = target.tokenizer.encode("the cat sat on the mat, the cat sat")
    plain = target.generate(ids, SamplingParams(temp=0.0), max_new_tokens=24)
    spec = generate_lookup_chained(target, ids, max_new_tokens=24, k=4,
                                   rounds_per_dispatch=3)
    assert spec.token_ids == plain.token_ids
    orc = generate_lookup_chained(target, ids, max_new_tokens=24, k=4,
                                  rounds_per_dispatch=3,
                                  oracle=plain.token_ids)
    assert orc.token_ids == plain.token_ids
    # the oracle draft accepts (nearly) everything by construction
    assert orc.acceptance_rate > 0.8


def test_eog_token_included_like_plain_generate(engines):
    """engine.generate keeps the trailing EOG token in token_ids; the
    spec/lookup paths must match (r5 review fix — the synthetic model never
    emits EOG naturally, so fake one via the vocab)."""
    from booster_tpu.serving.speculative import generate_lookup_chained

    target, draft_same, _ = engines
    ids = target.tokenizer.encode("hello world")
    plain0 = target.generate(ids, SamplingParams(temp=0.0),
                             max_new_tokens=12)
    assert len(plain0.token_ids) >= 6
    eog_tok = plain0.token_ids[5]
    vocab = target.tokenizer.vocab
    orig = vocab.is_eog
    vocab.is_eog = lambda t, _o=orig: bool(_o(t)) or t == eog_tok
    # the engine's on-device EOG mask is cached — rebuild it
    eng_mask = target._eog_mask
    try:
        import jax.numpy as jnp

        if eng_mask is not None:
            m = np.asarray(eng_mask).copy()
            m[eog_tok] = True
            target._eog_mask = jnp.asarray(m)
        plain = target.generate(ids, SamplingParams(temp=0.0),
                                max_new_tokens=12)
        look = generate_lookup_chained(target, ids, max_new_tokens=12, k=4,
                                       rounds_per_dispatch=2)
        spec = generate_speculative(target, draft_same, ids,
                                    max_new_tokens=12, k=4)
    finally:
        vocab.is_eog = orig
        target._eog_mask = eng_mask
    assert plain.token_ids[-1] == eog_tok
    assert plain.finish_reason == "stop"
    assert look.token_ids == plain.token_ids
    assert look.finish_reason == "stop"
    assert spec.token_ids == plain.token_ids
