"""Paged KV serving mode (Engine(paged=True)): batched generation must
match the dense engine token-for-token, prefix pages must be shared across
jobs without copies, and context shift must keep slots generating."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from booster_tpu.models import load_model
from booster_tpu.sampling import SamplingParams
from booster_tpu.serving import Engine
from tools.make_test_model import make_model

GREEDY = SamplingParams(temp=0.0, penalty_repeat=1.0)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("paged_eng")
    path = str(d / "tiny.gguf")
    make_model(path, vocab_size=512, hidden=128, layers=2, seed=0,
               weight_scale=0.3)
    return path


def _batched_generate(eng, prompts, n_steps=16, sampling=GREEDY):
    eng.init_batch_state()
    for s in prompts:
        eng.reset_slot(s, sampling, seed=s)
    first = eng.prefill_slots(dict(prompts))
    out = {s: [first[s]] for s in prompts}
    last = dict(first)
    for _ in range(n_steps):
        toks, _ = eng.decode_slots(last, n_steps=1)
        for s in prompts:
            out[s].extend(toks[s])
            last[s] = toks[s][-1]
    return out


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_matches_dense(model_path, quantized):
    model = load_model(model_path)
    texts = ["hello world", "one two three"]
    dense = Engine(model, max_batch=2, max_seq=64, kv_quantized=quantized)
    paged = Engine(model, max_batch=2, max_seq=64, kv_quantized=quantized,
                   paged=True, page_size=16)
    prompts = {s: dense.tokenizer.encode(t) for s, t in enumerate(texts)}
    out_d = _batched_generate(dense, prompts, n_steps=10)
    out_p = _batched_generate(paged, prompts, n_steps=10)
    for s in prompts:
        assert out_d[s] == out_p[s], f"slot {s}: paged diverged from dense"


def test_prefix_pages_shared(model_path):
    """Second job with the same prompt maps the published pages instead of
    re-prefilling them (adopt_prefix > 0, allocator reports shared reuse)."""
    model = load_model(model_path)
    eng = Engine(model, max_batch=2, max_seq=128, paged=True, page_size=16)
    eng.init_batch_state()
    # a prompt long enough to fill ≥ 2 full pages (page_size 16)
    ids = eng.tokenizer.encode("the quick brown fox " * 12)
    assert len(ids) >= 33

    eng.reset_slot(0, GREEDY, seed=0)
    first_a = eng.prefill_slots({0: ids})
    eng.publish_slot_prefix(0, ids)
    pages_a = list(eng._slot_pages[0])

    # new job, same prompt, different slot: full pages adopted, not copied
    eng.reset_slot(1, GREEDY, seed=1)
    restored = eng.adopt_prefix(1, ids)
    assert restored >= 2 * 16
    assert eng._slot_pages[1] == pages_a[: restored // 16]
    refs = eng.page_alloc.refcount[eng._slot_pages[1]]
    assert (refs >= 2).all()
    first_b = eng.prefill_slots({1: ids[restored:]})
    # same prompt, same greedy model → same first sampled token
    assert first_b[1] == first_a[0]

    # releasing the adopter must not free the still-referenced pages
    eng.reset_slot(1, GREEDY, seed=2)
    refs = eng.page_alloc.refcount[pages_a[: restored // 16]]
    assert (refs == 1).all()


def test_prefix_survives_release(model_path):
    """Published pages stay resident after their slot is reset (cached
    state) and are revived by the next matching admit."""
    model = load_model(model_path)
    eng = Engine(model, max_batch=1, max_seq=128, paged=True, page_size=16)
    eng.init_batch_state()
    ids = eng.tokenizer.encode("alpha beta gamma delta " * 12)

    eng.reset_slot(0, GREEDY, seed=0)
    eng.prefill_slots({0: ids})
    eng.publish_slot_prefix(0, ids)
    eng.reset_slot(0, GREEDY, seed=1)  # job over: pages released → cached
    restored = eng.adopt_prefix(0, ids)
    assert restored >= 16  # revived from the cached set


def test_paged_context_shift_matches_dense(model_path):
    """In-cache shift through gather→shift→scatter equals the dense shift."""
    model = load_model(model_path)
    texts = ["hello world one two three four"]
    results = []
    for paged in (False, True):
        eng = Engine(model, max_batch=1, max_seq=64, paged=paged,
                     page_size=16)
        prompts = {0: eng.tokenizer.encode(texts[0])}
        eng.init_batch_state()
        eng.reset_slot(0, GREEDY, seed=0)
        first = eng.prefill_slots(dict(prompts))
        out = [first[0]]
        last = first[0]
        for step in range(20):
            if int(eng.slot_lengths[0]) + 1 >= eng.max_seq - 1:
                eng.shift_slot(0, n_keep=2)
            toks, _ = eng.decode_slots({0: last}, n_steps=1)
            out.extend(toks[0])
            last = toks[0][-1]
        assert int(eng.slot_lengths[0]) < eng.max_seq
        results.append(out)
    assert results[0] == results[1], "paged shift diverged from dense shift"


def test_scheduler_paged(model_path):
    """Concurrent jobs through the scheduler on a paged engine finish and
    match the dense engine's outputs; repeated prompts hit shared pages."""
    import asyncio

    from booster_tpu.serving.config import PromptSpec
    from booster_tpu.serving.scheduler import Scheduler

    model = load_model(model_path)
    base = "the quick brown fox jumps over the lazy dog " * 4
    prompts = [base + "one", base + "two", base + "three"]

    def run(paged: bool):
        eng = Engine(model, max_batch=2, max_seq=256, paged=paged,
                     page_size=16)

        async def go():
            sched = Scheduler(
                eng, prompt_spec=PromptSpec(id="default"),
                default_sampling=GREEDY, default_max_tokens=8,
                prefix_cache_bytes=0,
            )
            sched.start()
            jobs = [sched.place_job(prompt=p, full_prompt=p) for p in prompts]
            for j in jobs:
                await sched.wait_job(j.id, timeout=300)
            await sched.shutdown(drain=False)
            return jobs, eng

        return asyncio.run(go())

    paged_jobs, paged_eng = run(True)
    dense_jobs, _ = run(False)
    for jp, jd in zip(paged_jobs, dense_jobs):
        assert jp.status == "finished"
        assert jp.token_ids == jd.token_ids
    stats = paged_eng.page_alloc.stats()
    assert stats["hashed"] > 0  # prefixes were published for dedup


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_stacked_decode_matches_dense(tmp_path_factory, quantized):
    """The stacked paged decode path (whole pool as scan carry, layer via
    scalar prefetch, deferred all-layer append + in-kernel self term —
    ops/pallas_paged_attention.paged_decode_attention_stacked) produces the
    same tokens as the dense stacked path and as the paged XLA path.
    Requires page_size % 128 == 0 and head_dim % 128 == 0, so a 1-head
    model (head_dim 128) with 128-token pages."""
    import os

    import jax

    import booster_tpu.models.llama as llama_mod
    import booster_tpu.ops.pallas_attention as pa
    import booster_tpu.ops.pallas_kv as pk
    import booster_tpu.ops.pallas_paged_attention as ppa

    d = tmp_path_factory.mktemp("paged_stk")
    path = str(d / "stk.gguf")
    make_model(path, vocab_size=512, hidden=128, layers=2, heads=1,
               kv_heads=1, seed=0, weight_scale=0.3)
    model = load_model(path)
    texts = ["hello world", "one two three"]

    def run(paged: bool, interpret: bool):
        pa.INTERPRET = pk.INTERPRET = ppa.INTERPRET = interpret
        jax.clear_caches()  # INTERPRET isn't part of the jit key
        try:
            eng = Engine(model, max_batch=2, max_seq=256,
                         kv_quantized=quantized, paged=paged, page_size=128)
            if paged and interpret:
                # the gate must actually engage for this test to mean much
                assert llama_mod._use_stacked_decode(
                    model.cfg, 1, 256, 128, page_size=128)
            prompts = {s: eng.tokenizer.encode(t)
                       for s, t in enumerate(texts)}
            return _batched_generate(eng, prompts, n_steps=10)
        finally:
            pa.INTERPRET = pk.INTERPRET = ppa.INTERPRET = False
            jax.clear_caches()

    stacked_paged = run(paged=True, interpret=True)
    stacked_dense = run(paged=False, interpret=True)
    xla_paged = run(paged=True, interpret=False)
    for s in (0, 1):
        assert stacked_paged[s] == stacked_dense[s], f"slot {s} vs dense"
        assert stacked_paged[s] == xla_paged[s], f"slot {s} vs XLA paged"
