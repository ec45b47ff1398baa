"""End-to-end generation engine tests on a tiny synthetic GGUF model."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, ".")

from booster_tpu.models import load_model
from booster_tpu.sampling import SamplingParams
from booster_tpu.serving import Engine
from tools.make_test_model import make_model


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_model(path, vocab_size=512, hidden=128, layers=2)
    model = load_model(path)
    return Engine(model, max_batch=1, max_seq=256)


def test_greedy_generation_deterministic(engine):
    ids = engine.tokenizer.encode("hello world")
    r1 = engine.generate(ids, SamplingParams(temp=0.0), max_new_tokens=8)
    r2 = engine.generate(ids, SamplingParams(temp=0.0), max_new_tokens=8)
    assert r1.token_ids == r2.token_ids
    assert r1.n_generated <= 8
    assert r1.finish_reason in ("stop", "length")
    assert r1.gen_ms_per_token > 0


def test_seeded_sampling_deterministic(engine):
    ids = engine.tokenizer.encode("the")
    sp = SamplingParams(temp=0.9, top_k=40, seed=7)
    r1 = engine.generate(ids, sp, max_new_tokens=8)
    r2 = engine.generate(ids, sp, max_new_tokens=8)
    assert r1.token_ids == r2.token_ids


def test_janus_generation(engine):
    ids = engine.tokenizer.encode("hello")
    sp = SamplingParams(janus=1, seed=3)
    r = engine.generate(ids, sp, max_new_tokens=8)
    assert 1 <= r.n_generated <= 8
    assert all(0 <= t < 512 for t in r.token_ids)


def test_cancel(engine):
    ids = engine.tokenizer.encode("hello")
    calls = {"n": 0}

    def stop_check():
        calls["n"] += 1
        return calls["n"] > 2

    r = engine.generate(ids, SamplingParams(temp=0.0), max_new_tokens=64,
                        stop_check=stop_check)
    assert r.finish_reason == "cancelled"
    assert r.n_generated < 64


def test_streaming_callback(engine):
    ids = engine.tokenizer.encode("the")
    seen = []
    r = engine.generate(ids, SamplingParams(temp=0.0), max_new_tokens=5,
                        on_token=seen.append)
    assert seen == r.token_ids


def test_prompt_too_long(engine):
    with pytest.raises(ValueError):
        engine.generate(list(range(300)), SamplingParams(), max_new_tokens=1)


def test_context_shift(tmp_path):
    """Generation beyond max_seq triggers the context-shift re-prefill."""
    path = str(tmp_path / "shift.gguf")
    make_model(path, vocab_size=512, hidden=64, layers=1)
    model = load_model(path)
    eng = Engine(model, max_batch=1, max_seq=32)
    ids = eng.tokenizer.encode("the")
    r = eng.generate(ids, SamplingParams(temp=0.8, top_k=0, top_p=1.0, seed=5),
                     max_new_tokens=60)
    # survived past the 32-token context without error
    assert r.n_generated == 60 or r.finish_reason == "stop"


def test_kv_quantized_generation(tmp_path):
    """int8 KV cache: generation runs and greedy output stays close to bf16."""
    path = str(tmp_path / "kvq.gguf")
    # weight_scale 0.5: sharper logit margins so the int8-KV rounding does
    # not flip near-tied argmaxes (0.3 sat within one bf16 ulp of a tie —
    # the greedy prefix flipped whenever unrelated rounding points moved)
    make_model(path, vocab_size=512, hidden=128, layers=2, weight_scale=0.5)
    model = load_model(path)
    base = Engine(model, max_batch=1, max_seq=128)
    quant = Engine(model, max_batch=1, max_seq=128, kv_quantized=True)
    ids = base.tokenizer.encode("hello world")
    r_base = base.generate(ids, SamplingParams(temp=0.0), max_new_tokens=10)
    r_quant = quant.generate(ids, SamplingParams(temp=0.0), max_new_tokens=10)
    assert r_quant.n_generated >= 1
    # int8 KV rounds attention inputs; early tokens should still agree
    assert r_base.token_ids[:3] == r_quant.token_ids[:3]


@pytest.mark.parametrize("kv_quant", [False, True])
def test_batched_decode_stacked_deferred_matches_xla(tmp_path, kv_quant):
    """Scheduler-path equivalence for the stacked/deferred decode: a batched
    decode chunk with a MIX of active and inactive slots produces the same
    tokens via the fused stacked+deferred path (INTERPRET kernels on CPU) as
    via the plain XLA path, and inactive slots stay untouched."""
    import os

    import jax

    import booster_tpu.ops.pallas_attention as pa
    import booster_tpu.ops.pallas_kv as pk
    from booster_tpu.models.llama import _use_stacked_decode

    path = str(tmp_path / "stk.gguf")
    # heads=2/kv_heads=2 → head_dim 64 (lane-padded to 128 in storage)
    make_model(path, vocab_size=512, hidden=128, layers=2, heads=2,
               kv_heads=2, weight_scale=0.3)
    model = load_model(path)

    def run(fused: bool):
        pa.INTERPRET = pk.INTERPRET = fused
        if not fused:
            os.environ["BT_STACKED"] = "0"
        else:
            assert _use_stacked_decode(model.cfg, 1, 128, 128)
        jax.clear_caches()  # INTERPRET/env aren't in the jit key
        try:
            eng = Engine(model, max_batch=4, max_seq=128,
                         kv_quantized=kv_quant, decode_chunk=8)
            eng.init_batch_state()
            prompts = {}
            for s in (0, 2):  # slots 1 and 3 stay inactive
                eng.reset_slot(s, SamplingParams(temp=0.0), seed=s)
                prompts[s] = eng.tokenizer.encode(f"slot {s} prompt text")
            first = eng.prefill_slots(prompts)
            toks, _ = eng.decode_slots(first, n_steps=8)
            lengths = np.asarray(eng.cache.lengths)
            return toks, lengths
        finally:
            pa.INTERPRET = pk.INTERPRET = False
            os.environ.pop("BT_STACKED", None)
            jax.clear_caches()

    fused_toks, fused_len = run(True)
    xla_toks, xla_len = run(False)
    assert fused_toks.keys() == xla_toks.keys()
    for s in fused_toks:
        assert fused_toks[s] == xla_toks[s], f"slot {s} diverged"
    np.testing.assert_array_equal(fused_len, xla_len)
    assert fused_len[1] == 0 and fused_len[3] == 0  # inactive slots untouched


def test_fused_prefill_model_integration_matches_xla(tmp_path):
    """Model-level parity for the T>1 fused-prefill flash kernel over a
    quantized cache (models/llama.py fused_prefill gate): a multi-chunk
    prefill + short decode through Engine produces the same tokens with the
    fused kernel (INTERPRET on CPU) as via the plain XLA attention path
    (BT_FUSED_PREFILL=0) — exercising pos0=offsets wiring, chunk offsets,
    and Dv slicing in _layer, not just the kernel unit test."""
    import os

    import jax

    import booster_tpu.ops.pallas_attention as pa
    import booster_tpu.ops.pallas_kv as pk

    path = str(tmp_path / "fp.gguf")
    make_model(path, vocab_size=512, hidden=128, layers=2, heads=2,
               kv_heads=2, weight_scale=0.3)
    model = load_model(path)
    # a prompt long enough to cross several 16-token prefill chunks
    prompt = list(np.random.default_rng(7).integers(3, 500, size=41))

    def run(fused: bool):
        pa.INTERPRET = pk.INTERPRET = True  # decode path identical in both
        if not fused:
            os.environ["BT_FUSED_PREFILL"] = "0"
        jax.clear_caches()  # env/INTERPRET aren't in the jit key
        try:
            eng = Engine(model, max_batch=2, max_seq=128,
                         kv_quantized=True, decode_chunk=4)
            eng.init_batch_state()
            eng.reset_slot(0, SamplingParams(temp=0.0), seed=0)
            first = eng.prefill_slots({0: prompt}, chunk=16)
            toks, _ = eng.decode_slots(first, n_steps=4)
            return first[0], toks[0]
        finally:
            pa.INTERPRET = pk.INTERPRET = False
            os.environ.pop("BT_FUSED_PREFILL", None)
            jax.clear_caches()

    f_first, f_toks = run(True)
    x_first, x_toks = run(False)
    assert f_first == x_first
    assert f_toks == x_toks


def test_fused_gateup_model_integration_matches_unfused(tmp_path):
    """Model-level parity for the fused gate-up-act epilogue kernel
    (pallas_qmm.qmm_gateup, models/llama.py mlp branch): prefill + decode
    through Engine produce identical tokens with BT_FUSED_GATEUP on and
    off (the kernel is bit-exact by construction), on a native-q8 K-major
    model where the fused path actually engages."""
    import os

    import jax

    import booster_tpu.ops.pallas_attention as pa
    import booster_tpu.ops.pallas_kv as pk
    import booster_tpu.ops.pallas_qmm as pq
    from booster_tpu.gguf import GGMLType

    path = str(tmp_path / "gu.gguf")
    make_model(path, vocab_size=512, hidden=512, layers=2, heads=4,
               kv_heads=2, ff=256, quant=GGMLType.Q8_0, weight_scale=0.3)
    model = load_model(path, weights="native")
    # the fused path must actually engage on this shape
    gu = model.params["layers"]["w_gateup"]
    import dataclasses as _dc

    pq.INTERPRET = True
    try:
        probe = pq.qmm_gateup(
            jnp.ones((1, 512), jnp.bfloat16), _dc.replace(gu, layer=0),
            "silu")
    finally:
        pq.INTERPRET = False
    assert probe is not None, "fused gateup did not engage; test is vacuous"

    def run(fused: bool):
        pa.INTERPRET = pk.INTERPRET = pq.INTERPRET = True
        if not fused:
            os.environ["BT_FUSED_GATEUP"] = "0"
        jax.clear_caches()
        try:
            eng = Engine(model, max_batch=2, max_seq=128, decode_chunk=4)
            eng.init_batch_state()
            eng.reset_slot(0, SamplingParams(temp=0.0), seed=0)
            first = eng.prefill_slots({0: eng.tokenizer.encode("hello world test")})
            toks, _ = eng.decode_slots(first, n_steps=6)
            return first[0], toks[0]
        finally:
            pa.INTERPRET = pk.INTERPRET = pq.INTERPRET = False
            os.environ.pop("BT_FUSED_GATEUP", None)
            jax.clear_caches()

    f_first, f_toks = run(True)
    x_first, x_toks = run(False)
    assert (f_first, f_toks) == (x_first, x_toks)


def test_fused_mlp_model_integration_matches_unfused(tmp_path):
    """Model-level parity for the whole-MLP kernel (pallas_qmm.qmm_mlp):
    prefill + decode through Engine produce identical tokens with
    BT_FUSED_MLP on and off, on a native-q8 K-major model whose shape the
    fused path actually engages (ff % 512 == 0, (K/G) % 16 == 0)."""
    import os

    import jax

    import booster_tpu.ops.pallas_attention as pa
    import booster_tpu.ops.pallas_kv as pk
    import booster_tpu.ops.pallas_qmm as pq
    from booster_tpu.gguf import GGMLType

    path = str(tmp_path / "mlp.gguf")
    make_model(path, vocab_size=512, hidden=512, layers=2, heads=4,
               kv_heads=2, ff=512, quant=GGMLType.Q8_0, weight_scale=0.3)
    model = load_model(path, weights="native")
    import dataclasses as _dc

    gu = model.params["layers"]["w_gateup"]
    dn = model.params["layers"]["w_down"]
    pq.INTERPRET = True
    try:
        probe = pq.qmm_mlp(
            jnp.ones((1, 512), jnp.bfloat16), _dc.replace(gu, layer=0),
            _dc.replace(dn, layer=0), "silu")
    finally:
        pq.INTERPRET = False
    assert probe is not None, "fused MLP did not engage; test is vacuous"

    def run(fused: bool):
        pa.INTERPRET = pk.INTERPRET = pq.INTERPRET = True
        if not fused:
            os.environ["BT_FUSED_MLP"] = "0"
        jax.clear_caches()
        try:
            eng = Engine(model, max_batch=2, max_seq=128, decode_chunk=4)
            eng.init_batch_state()
            eng.reset_slot(0, SamplingParams(temp=0.0), seed=0)
            first = eng.prefill_slots({0: eng.tokenizer.encode("hello world test")})
            toks, _ = eng.decode_slots(first, n_steps=6)
            return first[0], toks[0]
        finally:
            pa.INTERPRET = pk.INTERPRET = pq.INTERPRET = False
            os.environ.pop("BT_FUSED_MLP", None)
            jax.clear_caches()

    f_first, f_toks = run(True)
    x_first, x_toks = run(False)
    assert f_toks  # non-empty
    assert (f_first, f_toks) == (x_first, x_toks)
