"""Batched classifier-free guidance + grammar concurrency bound.

The reference applies CFG per pod, concurrently (ctx_guidance,
llama_sample_apply_guidance_impl /root/reference/cpp/src/llama-sampling.cpp:484);
r2 routed any cfg_scale != 1 job through a lock-serialized dedicated path.
These tests pin the r3 behavior: CFG jobs ride the continuous batch with a
per-slot guidance cache, matching the dedicated path token-for-token at
temp=0, and concurrent grammar jobs are bounded by a semaphore instead of
allocating unbounded private caches.
"""

import asyncio
import sys
import uuid

import numpy as np
import pytest

sys.path.insert(0, ".")

from booster_tpu.models import load_model
from booster_tpu.sampling import SamplingParams
from booster_tpu.serving import Engine
from tools.make_test_model import make_model

from tests.test_server import run_with_client


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cfgm") / "tiny.gguf")
    make_model(path, vocab_size=512, hidden=128, layers=2)
    return load_model(path)


def _batched_tokens(eng, ids, sp, n):
    """Generate n tokens for one slot through the batched slot API."""
    eng.init_batch_state()
    eng.cache = eng._new_cache()
    eng.reset_slot(0, sp, seed=0, max_predict=n)
    if sp.cfg_scale != 1.0:
        neg = (eng.tokenizer.encode(sp.cfg_negative_prompt)
               if sp.cfg_negative_prompt else list(ids))
        eng.prefill_guidance(0, neg)
    first = eng.prefill_slots({0: list(ids)})
    toks = [first[0]]
    while len(toks) < n:
        out, _hit = eng.decode_slots({0: toks[-1]},
                                     n_steps=min(4, n - len(toks)))
        toks.extend(out[0])
    return toks[:n]


def test_batched_cfg_matches_dedicated_greedy(model):
    eng = Engine(model, max_batch=2, max_seq=128)
    ids = eng.tokenizer.encode("hello world")
    sp = SamplingParams(temp=0.0, cfg_scale=1.5)
    ref = eng.generate(ids, sp, max_new_tokens=8).token_ids
    got = _batched_tokens(eng, ids, sp, len(ref))
    assert got == ref


def test_batched_cfg_differs_from_uncond(model):
    """cfg_scale != 1 must actually change sampling on the batched path."""
    eng = Engine(model, max_batch=2, max_seq=128)
    ids = eng.tokenizer.encode("the quick")
    base = _batched_tokens(eng, ids, SamplingParams(temp=0.0), 8)
    # negative prompt = a different context → guided logits shift
    sp = SamplingParams(temp=0.0, cfg_scale=3.0,
                        cfg_negative_prompt="completely different words")
    guided = _batched_tokens(eng, ids, sp, 8)
    assert base != guided


def test_concurrent_cfg_jobs_share_batch(tmp_path_factory):
    """4 concurrent CFG jobs + a plain job run batched — no dedicated lock,
    and at most ONE extra guidance cache exists (not one per job)."""
    async def fn(client, scheduler):
        jids = []
        for i in range(4):
            r = await client.post("/jobs", json={
                "id": str(uuid.uuid4()), "prompt": f"hello {i}",
                "sampling": {"cfg_scale": 1.5,
                             "cfg_negative_prompt": "bad words"},
                "max_tokens": 5,
            })
            assert r.status == 201
            jids.append((await r.json())["id"])
        r = await client.post("/jobs", json={
            "id": str(uuid.uuid4()), "prompt": "plain", "max_tokens": 5,
        })
        jids.append((await r.json())["id"])
        for jid in jids:
            for _ in range(600):
                body = await (await client.get(f"/jobs/{jid}")).json()
                if body["status"] in ("finished", "stopped"):
                    break
                await asyncio.sleep(0.05)
            assert body["status"] == "finished", body
            assert body["completion_tokens"] >= 1
        assert not hasattr(scheduler, "_dedicated_lock")
        # one shared guidance cache, freed once no slot runs CFG
        assert scheduler.engine.gcache is not None or \
            not scheduler.engine._slot_cfg.any()

    run_with_client(tmp_path_factory, fn, max_batch=8)


def test_grammar_needs_no_private_caches(tmp_path_factory, monkeypatch):
    """Grammar jobs ride the continuous batch (round 4): the dedicated
    generate_grammar path — with its private full [B, max_seq] cache per
    job — is never taken for plain grammar jobs (tests/test_grammar_batch.py
    covers the batched semantics; this pins the resource claim)."""
    monkeypatch.setenv("BT_GRAMMAR_CONCURRENCY", "2")
    peak = {"live": 0, "max": 0}

    async def fn(client, scheduler):
        eng = scheduler.engine
        orig = eng.generate_grammar

        def tracked(*a, **kw):
            peak["live"] += 1
            peak["max"] = max(peak["max"], peak["live"])
            try:
                return orig(*a, **kw)
            finally:
                peak["live"] -= 1

        eng.generate_grammar = tracked
        gbnf = 'root ::= "a" "b" "c"'
        jids = []
        for i in range(5):
            r = await client.post("/jobs", json={
                "id": str(uuid.uuid4()), "prompt": f"letters {i}",
                "grammar": gbnf, "max_tokens": 6,
            })
            assert r.status == 201
            jids.append((await r.json())["id"])
        for jid in jids:
            for _ in range(900):
                body = await (await client.get(f"/jobs/{jid}")).json()
                if body["status"] in ("finished", "stopped"):
                    break
                await asyncio.sleep(0.05)
            assert body["status"] in ("finished", "stopped"), body
        assert peak["max"] == 0, peak

    run_with_client(tmp_path_factory, fn, max_batch=4)
