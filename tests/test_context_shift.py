"""In-cache context shift (batched path): exactness vs re-prefill, and the
scheduler's infinite-generation behavior when a slot outgrows its cache.

Reference behavior: bridge.cpp:487-507 (seq_rm + seq_add position shift),
llama.cpp:13771 (K-shift graph applying rope deltas in place).
"""

import asyncio

import numpy as np
import pytest

import jax.numpy as jnp

from booster_tpu.models import load_model
from booster_tpu.models.llama import forward
from booster_tpu.ops.kv_cache import KVCache, shift_slot_cache
from booster_tpu.sampling import SamplingParams
from booster_tpu.serving import Engine
from booster_tpu.serving.config import PromptSpec
from booster_tpu.serving.scheduler import Scheduler
from tools.make_test_model import make_model

_MODEL = {}


def get_model(tmp_path_factory):
    if "m" not in _MODEL:
        path = str(tmp_path_factory.mktemp("cs") / "tiny.gguf")
        make_model(path, vocab_size=256, hidden=128, layers=2)
        _MODEL["m"] = load_model(path)
    return _MODEL["m"]


@pytest.mark.parametrize("quantized", [False, True])
def test_shift_matches_reprefill(tmp_path_factory, quantized):
    m = get_model(tmp_path_factory)
    S = 64
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 250, 40).astype(np.int32)
    n_keep, n_discard = 4, 10

    def new_cache():
        return KVCache.create(m.cfg.n_layers, 1, S, m.cfg.n_kv_heads,
                              m.cfg.head_dim, quantized=quantized)

    # full prefill then in-cache shift
    cache = new_cache()
    _, cache = forward(m.params, m.cfg, jnp.asarray(ids[None, :]), cache,
                       last_only=True)
    cache = shift_slot_cache(
        cache, jnp.int32(0), jnp.int32(n_keep), jnp.int32(n_discard),
        m.params["rope"]["inv_freq"], m.cfg.rope_style,
    )
    assert int(cache.lengths[0]) == 40 - n_discard

    # reference: fresh prefill of the compacted sequence.  NOTE: deeper
    # layers legitimately differ (their inputs attended to the dropped
    # tokens — the reference's in-cache shift keeps those too); layer 0's
    # K/V depend only on token embeddings + positions, so the gather and
    # the rope delta rotation must reproduce them exactly.
    kept = np.concatenate([ids[:n_keep], ids[n_keep + n_discard:]])
    ref_cache = new_cache()
    _, ref_cache = forward(m.params, m.cfg, jnp.asarray(kept[None, :]),
                           ref_cache, last_only=True)

    L = int(cache.lengths[0])
    k0 = np.asarray(cache.k[0, 0, :, :L], np.float32)
    v0 = np.asarray(cache.v[0, 0, :, :L], np.float32)
    if quantized:
        k0 = k0 * np.asarray(cache.k_scale[0, 0, :, :L], np.float32)
        v0 = v0 * np.asarray(cache.v_scale[0, 0, :, :L], np.float32)
    rk0 = np.asarray(ref_cache.k[0, 0, :, :L], np.float32)
    rv0 = np.asarray(ref_cache.v[0, 0, :, :L], np.float32)
    if quantized:
        rk0 = rk0 * np.asarray(ref_cache.k_scale[0, 0, :, :L], np.float32)
        rv0 = rv0 * np.asarray(ref_cache.v_scale[0, 0, :, :L], np.float32)
    atol = 0.1 if quantized else 0.02  # int8 requant of rotated K adds noise
    np.testing.assert_allclose(k0, rk0, atol=atol)
    np.testing.assert_allclose(v0, rv0, atol=atol)

    # and generation continues: one decode step yields finite logits
    nxt = jnp.asarray([[7]], jnp.int32)
    lg_shift, _ = forward(m.params, m.cfg, nxt, cache, last_only=True)
    assert np.isfinite(np.asarray(lg_shift)).all()


def test_session_swap_restores_kv(tmp_path_factory, tmp_path):
    """Second job of a session restores the saved KV prefix instead of
    re-prefilling the whole history (the reference's broken swap feature,
    bridge.cpp:224-263, fixed and shipped)."""
    m = get_model(tmp_path_factory)
    swap = str(tmp_path / "swap")

    async def run():
        engine = Engine(m, max_batch=2, max_seq=96, decode_chunk=4)
        sched = Scheduler(
            engine, prompt_spec=PromptSpec(id="default"),
            default_sampling=SamplingParams(temp=0.0),
            default_max_tokens=6, swap_dir=swap,
        )
        sched.start()
        j1 = sched.place_job(prompt="hello there", session_id="sess1")
        await sched.wait_job(j1.id, timeout=60)
        import os
        assert os.path.exists(os.path.join(swap, "sess1.state"))
        # second round in the same session: prompt extends the saved history
        restores = []
        orig = sched._try_restore_session
        def spy(slot, job, ids):
            r = orig(slot, job, ids)
            restores.append(r)
            return r
        sched._try_restore_session = spy
        j2 = sched.place_job(prompt="and again", session_id="sess1")
        await sched.wait_job(j2.id, timeout=60)
        await sched.shutdown(drain=False)
        return j1, j2, restores

    j1, j2, restores = asyncio.run(run())
    assert j1.status == "finished" and j2.status == "finished"
    assert restores and restores[0] > 0  # KV prefix actually restored
    assert j2.n_generated >= 1


def test_prefix_cache_reuse(tmp_path_factory):
    """Jobs sharing a long prompt prefix reuse the cached KV (only the
    suffix is prefilled) and produce the same greedy output as without
    the cache."""
    m = get_model(tmp_path_factory)
    system = "you are a helpful assistant " * 4

    async def run(prefix_bytes):
        engine = Engine(m, max_batch=2, max_seq=256, decode_chunk=4)
        sched = Scheduler(
            engine, prompt_spec=PromptSpec(id="default"),
            default_sampling=SamplingParams(temp=0.0),
            default_max_tokens=8, prefix_cache_bytes=prefix_bytes,
        )
        sched.start()
        j1 = sched.place_job(prompt=system + "first question")
        await sched.wait_job(j1.id, timeout=60)
        restores = []
        if sched.prefix_cache is not None:
            from booster_tpu.serving import prefix_cache as pc
            orig = pc.restore_slot_prefix
            def spy(engine, slot, entry, n):
                r = orig(engine, slot, entry, n)
                restores.append(r)
                return r
            pc.restore_slot_prefix = spy
        try:
            j2 = sched.place_job(prompt=system + "second question")
            await sched.wait_job(j2.id, timeout=60)
        finally:
            if sched.prefix_cache is not None:
                from booster_tpu.serving import prefix_cache as pc
                pc.restore_slot_prefix = orig
        await sched.shutdown(drain=False)
        return j1, j2, restores

    j1, j2, restores = asyncio.run(run(64 * 1024 * 1024))
    assert j1.status == j2.status == "finished"
    assert restores and restores[0] >= 16  # prefix actually reused

    # equivalence: same second job without the cache → same greedy tokens
    j1n, j2n, _ = asyncio.run(run(0))
    assert j2n.token_ids == j2.token_ids


def test_scheduler_infinite_generation(tmp_path_factory):
    """A batched slot that outgrows max_seq keeps generating via in-place
    shifts — no 'length' bail-out before max_tokens."""
    m = get_model(tmp_path_factory)

    async def run():
        engine = Engine(m, max_batch=2, max_seq=64, decode_chunk=4)
        sched = Scheduler(
            engine, prompt_spec=PromptSpec(id="default"),
            default_sampling=SamplingParams(temp=0.8, top_k=20, seed=1),
            default_max_tokens=120,  # far beyond max_seq=64
        )
        sched.start()
        job = sched.place_job(prompt="hello world")
        await sched.wait_job(job.id, timeout=120)
        await sched.shutdown(drain=False)
        return job

    job = asyncio.run(run())
    assert job.status == "finished"
    # generated more tokens than the cache can hold at once
    assert job.n_generated + job.n_prompt_tokens > 64
    assert job.finish_reason in ("stop", "length")
    if job.finish_reason == "length":
        assert job.n_generated >= 120
