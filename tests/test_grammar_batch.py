"""Grammar-constrained decoding in the continuous batch.

The reference runs its grammar sampler on every pod concurrently
(/root/reference/cpp/common/sampling.cpp:430 per-pod grammar step;
cpp/bridge.cpp:100-110 — 8 pods).  Round-3 booster-tpu serialized grammar
jobs onto a dedicated path behind a 2-slot semaphore, each with a private
full dense cache; these tests pin the round-4 redesign: grammar jobs ride
the batched slots (host automaton between chunks + batched rewind/masked
redo on violation), token-for-token equal to the dedicated path.
"""

import asyncio
import sys
import uuid

import pytest

sys.path.insert(0, ".")

from booster_tpu.sampling import SamplingParams
from booster_tpu.serving import Engine
from booster_tpu.serving.config import PromptSpec
from booster_tpu.serving.scheduler import Scheduler

from tests.test_server import get_model, run_with_client

GBNF_THE = 'root ::= " the" (" the")*\n'


def _no_dedicated(scheduler):
    """The dedicated/grammar-semaphore paths must never have been taken."""
    assert not hasattr(scheduler, "_dedicated_lock")
    assert not hasattr(scheduler, "_grammar_sem")


async def _await_job(client, jid, tries=900):
    for _ in range(tries):
        body = await (await client.get(f"/jobs/{jid}")).json()
        if body["status"] in ("finished", "stopped"):
            return body
        await asyncio.sleep(0.05)
    raise AssertionError(f"job {jid} never finished: {body}")


def test_grammar_jobs_ride_the_batch(tmp_path_factory):
    """8 concurrent grammar jobs share the continuous batch — no dedicated
    path, no private caches — and every output conforms to the grammar."""
    async def fn(client, scheduler):
        # riding the batch means never touching the dedicated generator
        def boom(*a, **kw):  # pragma: no cover - must not be called
            raise AssertionError("generate_grammar must not run")

        scheduler.engine.generate_grammar = boom
        jids = []
        for i in range(8):
            r = await client.post("/jobs", json={
                "id": str(uuid.uuid4()), "prompt": f"say the thing {i}",
                "grammar": GBNF_THE, "max_tokens": 6,
            })
            assert r.status == 201
            jids.append((await r.json())["id"])
        for jid in jids:
            body = await _await_job(client, jid)
            assert body["status"] == "finished"
            assert body["finish_reason"] in ("stop", "length"), body
            # every generated token decodes into repetitions of " the"
            assert set(body["output"].split()) <= {"the"}, body
            assert body["completion_tokens"] >= 1
        _no_dedicated(scheduler)
        # no private grammar caches: the engine's batch cache is the only one
        assert scheduler.engine.gcache is None

    run_with_client(tmp_path_factory, fn, max_batch=8)


def test_grammar_batch_matches_dedicated_path(tmp_path_factory):
    """temp=0 batched grammar tokens == engine.generate_grammar tokens."""
    model = get_model(tmp_path_factory)

    async def runner():
        engine = Engine(model, max_batch=4, max_seq=128, decode_chunk=4)
        scheduler = Scheduler(
            engine,
            prompt_spec=PromptSpec(id="default"),
            default_sampling=SamplingParams(temp=0.0),
            default_max_tokens=8,
        )
        scheduler.start()
        job = scheduler.place_job(prompt="say the thing",
                                  grammar=GBNF_THE, max_tokens=8)
        await scheduler.wait_job(job.id, timeout=120)
        batched = list(job.token_ids)
        ids = engine.tokenizer.encode(job.full_prompt)
        await scheduler.shutdown(drain=False)
        ref = engine.generate_grammar(
            ids, GBNF_THE, SamplingParams(temp=0.0), max_new_tokens=8
        )
        return batched, ref.token_ids

    batched, ref = asyncio.run(runner())
    assert batched == ref, (batched, ref)


def test_grammar_mixed_with_plain_jobs(tmp_path_factory):
    """Grammar and unconstrained jobs decode in the same batch."""
    async def fn(client, scheduler):
        jids = {}
        for i in range(3):
            r = await client.post("/jobs", json={
                "id": str(uuid.uuid4()), "prompt": f"the grammar one {i}",
                "grammar": GBNF_THE, "max_tokens": 5,
            })
            jids[(await r.json())["id"]] = True
        for i in range(3):
            r = await client.post("/jobs", json={
                "id": str(uuid.uuid4()), "prompt": f"plain one {i}",
                "max_tokens": 5,
            })
            jids[(await r.json())["id"]] = False
        for jid, is_grammar in jids.items():
            body = await _await_job(client, jid)
            assert body["status"] == "finished", body
            if is_grammar:
                words = body["output"].split()
                # a "length" finish may cut mid-word (the dedicated path
                # does the same): the tail may be any prefix of "the"
                assert all(w == "the" for w in words[:-1]), body
                assert not words or "the".startswith(words[-1]), body
        _no_dedicated(scheduler)

    run_with_client(tmp_path_factory, fn, max_batch=8)


def test_grammar_dead_end_finishes_with_error(tmp_path_factory):
    """A grammar no vocab piece can satisfy ends the job as an error (the
    dedicated path's 'no token satisfies the grammar' outcome) instead of
    wedging the slot."""
    async def fn(client, scheduler):
        # é is not in the tiny vocab (and its bytes decode to nothing the
        # automaton can consume), so the grammar is unsatisfiable
        r = await client.post("/jobs", json={
            "id": str(uuid.uuid4()), "prompt": "impossible",
            "grammar": 'root ::= "éé"\n', "max_tokens": 4,
        })
        assert r.status == 201
        jid = (await r.json())["id"]
        body = await _await_job(client, jid)
        assert body["finish_reason"] == "error", body
        # the slot was freed for new work
        assert len(scheduler.free_slots) == scheduler.engine.max_batch
        _no_dedicated(scheduler)

    run_with_client(tmp_path_factory, fn, max_batch=2)


def test_grammar_cancel_frees_slot(tmp_path_factory):
    """Cancelling a batched grammar job releases its slot."""
    async def fn(client, scheduler):
        r = await client.post("/jobs", json={
            "id": str(uuid.uuid4()), "prompt": "say the thing",
            "grammar": GBNF_THE, "max_tokens": 64,
        })
        jid = (await r.json())["id"]
        await asyncio.sleep(0.2)
        r = await client.delete(f"/jobs/{jid}")
        assert r.status in (200, 204)
        body = await _await_job(client, jid)
        assert body["status"] in ("stopped", "finished")
        for _ in range(100):
            if len(scheduler.free_slots) == scheduler.engine.max_batch:
                break
            await asyncio.sleep(0.05)
        assert len(scheduler.free_slots) == scheduler.engine.max_batch

    run_with_client(tmp_path_factory, fn, max_batch=2)


def test_grammar_spec_combo_keeps_dedicated_path(tmp_path_factory):
    """With a draft model configured, grammar jobs keep the exact dedicated
    path (speculative rounds don't compose with the rewind protocol)."""
    model = get_model(tmp_path_factory)

    async def runner():
        engine = Engine(model, max_batch=2, max_seq=128, decode_chunk=4)
        draft = Engine(model, max_batch=2, max_seq=128)
        scheduler = Scheduler(
            engine,
            prompt_spec=PromptSpec(id="default"),
            default_sampling=SamplingParams(temp=0.0),
            default_max_tokens=6,
            draft_engine=draft,
        )
        scheduler.start()
        job = scheduler.place_job(prompt="say the thing",
                                  grammar=GBNF_THE, max_tokens=6)
        await scheduler.wait_job(job.id, timeout=120)
        ok = job.status == "finished" and hasattr(scheduler, "_grammar_sem")
        await scheduler.shutdown(drain=False)
        return ok, job

    ok, job = asyncio.run(runner())
    assert ok, (job.status, job.finish_reason, job.output)


def test_grammar_job_context_shifts(tmp_path_factory):
    """A grammar job that outgrows max_seq keeps generating via in-cache
    shifts (reference infinite generation, bridge.cpp:487-507) — r4 finished
    these with 'length' at the context edge.  The rewind protocol must keep
    working after the shift: cache positions drift by the discarded rows
    (Job._g_disc) while the PDA stays token-history-only."""
    model = get_model(tmp_path_factory)

    async def runner():
        engine = Engine(model, max_batch=2, max_seq=64, decode_chunk=4)
        scheduler = Scheduler(
            engine,
            prompt_spec=PromptSpec(id="default"),
            default_sampling=SamplingParams(temp=0.8, top_k=20, seed=3),
            default_max_tokens=120,  # far beyond max_seq=64
        )
        scheduler.start()
        # can't complete before ~50 reps — forces decoding past max_seq
        job = scheduler.place_job(prompt="say the thing",
                                  grammar='root ::= " the"{50,}\n',
                                  max_tokens=150)
        await scheduler.wait_job(job.id, timeout=240)
        await scheduler.shutdown(drain=False)
        return job

    job = asyncio.run(runner())
    assert job.status == "finished"
    # crossed the context edge (shift happened) and kept generating
    assert job.n_generated + job.n_prompt_tokens > 64
    assert job._g_disc > 0  # at least one shift touched this grammar job
    assert job.finish_reason in ("stop", "length")
    # every token still conforms to the grammar after the shift
    assert set(job.output.split()) <= {"the"}, job.output
