"""Mamba (SSM) parity vs HF transformers + recurrent-state consistency.

Reference: build_mamba (/root/reference/cpp/src/llama.cpp:12016).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from booster_tpu.convert import convert_hf_model
from booster_tpu.gguf import GGMLType
from booster_tpu.models import load_model
from booster_tpu.models.mamba import MambaState, forward


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = transformers.MambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        state_size=16, conv_kernel=4, num_hidden_layers=2,
        time_step_rank=4, use_conv_bias=True, use_bias=False,
    )
    torch.manual_seed(0)
    hf = transformers.MambaForCausalLM(cfg).eval()
    path = str(tmp_path_factory.mktemp("mamba") / "mamba.gguf")
    convert_hf_model(hf, out_path=path, quant_type=GGMLType.F32)
    return hf, load_model(path)


def test_mamba_logits_parity(model):
    hf, loaded = model
    assert loaded.cfg.arch == "mamba"
    assert loaded.cfg.ssm_d_inner == 128
    ids = np.array([[3, 17, 42, 99, 7]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(ids.astype(np.int64))).logits.float().numpy()
    state = MambaState.create(loaded.cfg, 1)
    got, _ = forward(loaded.params, loaded.cfg, jnp.asarray(ids), state)
    got = np.asarray(got)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_mamba_recurrent_state_consistency(model):
    """Token-by-token decode with carried state equals one-shot prefill."""
    _, loaded = model
    ids = np.array([[3, 17, 42, 99, 7, 12, 56]], np.int32)
    state = MambaState.create(loaded.cfg, 1)
    full, _ = forward(loaded.params, loaded.cfg, jnp.asarray(ids), state)

    state = MambaState.create(loaded.cfg, 1)
    per_tok = []
    for t in ids[0]:
        lg, state = forward(loaded.params, loaded.cfg,
                            jnp.asarray([[t]], jnp.int32), state)
        per_tok.append(np.asarray(lg)[0, 0])
    np.testing.assert_allclose(
        np.stack(per_tok), np.asarray(full)[0], atol=0.02, rtol=0.02
    )


def test_mamba_generate(model):
    _, loaded = model
    from booster_tpu.models.mamba import generate_mamba

    out = generate_mamba(loaded, [3, 17, 42], max_new_tokens=8)
    assert len(out) <= 8
    assert all(0 <= t < 256 for t in out)


def test_mamba_batched_serving_parity(model):
    """Engine prefill_slots/decode_slots (the scheduler path) on a recurrent
    model matches single-stream greedy decode with carried MambaState —
    reference analog: recurrent llama_kv_cache slots (llama.cpp:2711)."""
    _, loaded = model
    from booster_tpu.sampling import SamplingParams
    from booster_tpu.serving import Engine

    prompts = {0: [3, 17, 42, 99, 7], 1: [11, 5, 8]}
    n_new = 6

    # single-stream greedy truth per prompt
    want = {}
    for s, ids in prompts.items():
        state = MambaState.create(loaded.cfg, 1)
        lg, state = forward(loaded.params, loaded.cfg,
                            jnp.asarray([ids], jnp.int32), state)
        toks = [int(np.asarray(lg)[0, -1].argmax())]
        for _ in range(n_new - 1):
            lg, state = forward(loaded.params, loaded.cfg,
                                jnp.asarray([[toks[-1]]], jnp.int32), state)
            toks.append(int(np.asarray(lg)[0, 0].argmax()))
        want[s] = toks

    eng = Engine(loaded, max_batch=2, max_seq=64)
    eng.init_batch_state()
    for s in prompts:
        eng.reset_slot(s, SamplingParams(temp=0.0), seed=0)
    first = eng.prefill_slots(prompts)
    out, _ = eng.decode_slots({s: t for s, t in first.items()},
                              n_steps=n_new - 1)
    got = {s: [first[s]] + out[s] for s in prompts}
    assert got == want


def test_mamba_slot_reset_isolation(model):
    """Re-claiming a slot zeroes its recurrent state: a fresh run in a
    previously-used slot reproduces the fresh-engine result."""
    _, loaded = model
    from booster_tpu.sampling import SamplingParams
    from booster_tpu.serving import Engine

    eng = Engine(loaded, max_batch=2, max_seq=64)
    eng.init_batch_state()
    for s in (0, 1):
        eng.reset_slot(s, SamplingParams(temp=0.0), seed=0)
    first = eng.prefill_slots({0: [3, 17, 42], 1: [9, 9, 9, 9]})
    out1, _ = eng.decode_slots({0: first[0], 1: first[1]}, n_steps=3)

    eng.reset_slot(0, SamplingParams(temp=0.0), seed=0)
    first2 = eng.prefill_slots({0: [3, 17, 42]})
    out2, _ = eng.decode_slots({0: first2[0]}, n_steps=3)
    assert first2[0] == first[0]
    assert out2[0] == out1[0]


def test_mamba_scheduler_end_to_end(model, tmp_path_factory):
    """Full Scheduler loop on a recurrent model: jobs finish, the run task
    survives (regression: the shared-prefix KV snapshot used to crash on
    MambaCache after a job finished), and repeated prompts work with the
    prefix cache disabled."""
    import asyncio

    from booster_tpu.sampling import SamplingParams
    from booster_tpu.serving import Engine
    from booster_tpu.serving.scheduler import Scheduler
    from tools.make_test_model import build_vocab

    hf, _ = model
    tokens, scores, types = build_vocab(256)
    vocab = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.token_type": types,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_bos_token": True,
    }
    path = str(tmp_path_factory.mktemp("mamba_srv") / "mamba_v.gguf")
    convert_hf_model(hf, tokenizer_vocab=vocab, out_path=path,
                     quant_type=GGMLType.F32)
    loaded = load_model(path)
    eng = Engine(loaded, max_batch=2, max_seq=64)

    async def runner():
        sched = Scheduler(eng, default_sampling=SamplingParams(temp=0.0))
        assert sched.prefix_cache is None  # no per-position KV to snapshot
        task = sched.start()
        jobs = [sched.place_job(prompt="hello world", max_tokens=6),
                sched.place_job(prompt="hello world", max_tokens=6)]
        for j in jobs:
            await asyncio.wait_for(sched.wait_job(j.id, timeout=60),
                                   timeout=70)
            assert j.finish_reason in ("length", "eog")
            assert j.n_generated >= 1
        assert not task.done()  # run loop survived job completion
        assert jobs[0].output == jobs[1].output  # greedy determinism
        await sched.shutdown()

    asyncio.run(runner())
