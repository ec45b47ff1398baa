"""Per-channel int8 weight mode ("--weights i8c") — the TPU mmq analog.

Covers: channel_quantize round-trip error bound, the Pallas integer-dot
kernel's parity with the XLA fallback (interpret mode), dispatch through
qlinear, and the end-to-end logit delta vs the exact dequantized model
(the quantization loss this mode trades for speed — quantified the same
way int8 KV was)."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import booster_tpu.ops.pallas_qmm as pq
from booster_tpu.gguf import GGMLType
from booster_tpu.ops.linear import qlinear, set_use_pallas
from booster_tpu.quant import repack_gguf_tensor
from booster_tpu.quant.formats import quantize
from booster_tpu.quant.qtensor import (
    QTensor,
    channel_quantize,
    dequantize_qtensor,
    dequantize_qtensor_np,
    prepare_kernel_scales,
    repack_weights,
)


def _source(N=256, K=512, seed=0, gt=GGMLType.Q8_0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(N, K)).astype(np.float32) * 0.05
    raw = quantize(w, gt)
    return prepare_kernel_scales(repack_gguf_tensor(raw, gt, (N, K)))


def test_channel_quantize_error_bound():
    qt = _source()
    wref = dequantize_qtensor_np(qt)
    c = channel_quantize(qt)
    assert c.kind == "i8c" and c.qw.shape == (512, 256)
    assert c.scales.shape == (1, 256)
    wq = dequantize_qtensor_np(c)
    # symmetric per-channel int8: error <= scale/2 per element
    bound = np.asarray(c.scales).T / 2 + 1e-7  # [N, 1]
    assert (np.abs(wq - wref) <= bound).all()
    # relative RMS error small for well-conditioned rows
    rel = np.linalg.norm(wq - wref) / np.linalg.norm(wref)
    assert rel < 0.01


def test_i8c_kernel_matches_fallback():
    pq.INTERPRET = True
    set_use_pallas(True)
    try:
        qt = channel_quantize(_source())
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32))
        got = np.asarray(qlinear(x, qt))
        wd = dequantize_qtensor(qt, dtype=jnp.bfloat16)
        want = np.asarray(
            jax.lax.dot_general(x.astype(jnp.bfloat16), wd,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    finally:
        pq.INTERPRET = False
        set_use_pallas(None)


def test_i8c_unsupported_shape_falls_back():
    pq.INTERPRET = True
    set_use_pallas(True)
    try:
        # K=128 violates the K%256 kernel gate → XLA fallback, same numbers
        rng = np.random.default_rng(3)
        w = rng.normal(size=(128, 128)).astype(np.float32) * 0.1
        raw = quantize(w, GGMLType.Q8_0)
        qt = channel_quantize(
            prepare_kernel_scales(repack_gguf_tensor(raw, GGMLType.Q8_0,
                                                     (128, 128))))
        x = jnp.asarray(rng.normal(size=(2, 128)).astype(np.float32))
        got = np.asarray(qlinear(x, qt))
        want = x.astype(jnp.bfloat16) @ dequantize_qtensor(qt).T
        np.testing.assert_allclose(got, np.asarray(want, np.float32),
                                   rtol=3e-2, atol=3e-2)
    finally:
        pq.INTERPRET = False
        set_use_pallas(None)


def test_repack_weights_i8c_mode():
    qt = _source(gt=GGMLType.Q4_0)
    c = repack_weights(qt, "i8c")
    assert c.kind == "i8c" and c.transposed


def test_i8c_model_logit_delta(tmp_path):
    """End-to-end: --weights i8c logits stay close to the exact model
    (the quantization loss this mode trades for speed)."""
    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward
    from booster_tpu.ops.kv_cache import KVCache
    from tools.make_test_model import make_model

    p = str(tmp_path / "t.gguf")
    make_model(p, vocab_size=512, hidden=512, layers=2, heads=8, kv_heads=4,
               ff=1024)

    def run(mode):
        m = load_model(p, weights=mode)
        cache = KVCache.create(m.cfg.n_layers, 1, 32, m.cfg.n_kv_heads,
                               m.cfg.head_dim)
        ids = jnp.asarray([[1, 9, 23, 77]], jnp.int32)
        lg, _ = forward(m.params, m.cfg, ids, cache, last_only=True)
        return np.asarray(lg[0, -1], np.float32)

    exact = run("native")
    i8c = run("i8c")
    # same top token and small logit delta on a synthetic model
    assert int(np.argmax(exact)) == int(np.argmax(i8c))
    denom = np.abs(exact).mean()
    assert np.abs(i8c - exact).mean() / denom < 0.05


def test_i8c_cli_requires_lossy_ack(tmp_path):
    """--weights i8c without --allow-lossy is refused with an explanation
    (VERDICT r4: lossy modes must be flag-acknowledged); with the flag the
    run proceeds."""
    from booster_tpu.__main__ import main
    from tools.make_test_model import make_model

    p = str(tmp_path / "t.gguf")
    make_model(p, vocab_size=512, hidden=128, layers=2)
    rc = main(["--model", p, "--prompt", "hi", "--weights", "i8c",
               "--silent", "--predict", "2"])
    assert rc == 2
    rc = main(["--model", p, "--prompt", "hi", "--weights", "i8c",
               "--allow-lossy", "--silent", "--predict", "2"])
    assert rc == 0


def test_quant_quality_real_checkpoint_mode(tmp_path, capsys):
    """tools/quant_quality.py --model: requantize a real (here: tiny F16)
    GGUF to q8_0/q4_K/q4_0 and report ppl deltas on a text corpus — the
    BASELINE metric-3 pipeline, runnable the moment a checkpoint exists."""
    import json as _json
    import sys as _sys

    from tools.make_test_model import make_model
    from tools.quant_quality import main as qq_main
    from booster_tpu.gguf import GGMLType

    src = str(tmp_path / "f16.gguf")
    make_model(src, vocab_size=512, hidden=128, layers=2,
               quant=GGMLType.F16, seed=0)
    text = str(tmp_path / "corpus.txt")
    with open(text, "w") as f:
        f.write("the hello world and to of in " * 40)
    for n in ("q8_0", "q4_k", "q4_0"):
        p = f"/tmp/qq_real_{n}.gguf"
        if os.path.exists(p):
            os.remove(p)
    argv = _sys.argv
    _sys.argv = ["qq", "--model", src, "--text", text,
                 "--ctx", "32", "--tokens", "256"]
    try:
        qq_main()
    finally:
        _sys.argv = argv
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "real"
    assert {"q8_0", "q8_0+i8c", "q4_k", "q4_0"} <= set(out["deltas"])
    assert out["f16_ppl"] > 1.0
