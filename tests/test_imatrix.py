"""Importance-matrix quantization: bit-exactness vs the reference's own
quantize_q4_0(quant_weights) and end-to-end collection on a tiny model.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from booster_tpu.gguf.constants import GGMLType
from booster_tpu.quant.imatrix import (
    collect_imatrix,
    load_imatrix,
    quantize_q4_0_imatrix,
    save_imatrix,
)

REF = "/root/reference/cpp/ggml"
HARNESS_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        pytest.skip("no C compiler")
    out = str(tmp_path_factory.mktemp("goldq") / "harness_imatrix")
    cmd = [
        gcc, "-O2", f"-I{REF}/include", f"-I{REF}/src",
        os.path.join(HARNESS_DIR, "harness_imatrix.c"),
        os.path.join(HARNESS_DIR, "stubs.c"),
        f"{REF}/src/ggml-quants.c", "-o", out, "-lm",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    if r.returncode != 0:
        pytest.skip(f"harness build failed: {r.stderr[-300:]}")
    return out


def test_q4_0_imatrix_bit_exact(harness):
    rng = np.random.default_rng(0)
    N, K = 8, 256
    x = (rng.standard_normal((N, K)) * 0.5).astype(np.float32)
    qw = (rng.random(K) + 0.1).astype(np.float32)

    header = f"{N} {K}\n".encode()
    payload = x.tobytes() + qw.tobytes()
    r = subprocess.run([harness], input=header + payload,
                       capture_output=True, timeout=60)
    assert r.returncode == 0
    want = np.frombuffer(r.stdout, np.uint8)

    got = np.frombuffer(quantize_q4_0_imatrix(x, qw), np.uint8)
    np.testing.assert_array_equal(got, want)


def test_collect_and_roundtrip(tmp_path):
    from booster_tpu.models import load_model
    from tools.make_test_model import make_model

    path = str(tmp_path / "tiny.gguf")
    make_model(path, vocab_size=256, hidden=128, layers=2)
    m = load_model(path)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, 128).astype(np.int32)
    im = collect_imatrix(m, ids, n_ctx=64)
    assert any(k.endswith("attn_output.weight") for k in im)
    for k, v in im.items():
        assert np.isfinite(v).all() and (v >= 0).all(), k

    f = str(tmp_path / "im.npz")
    save_imatrix(f, im)
    back = load_imatrix(f)
    assert set(back) == set(im)

    # imatrix-weighted quantization reduces weighted error vs plain Q4_0
    from booster_tpu.quant import dequantize, quantize

    w = (rng.standard_normal((64, 128)) * 0.3).astype(np.float32)
    qw = np.concatenate([np.full(64, 10.0), np.full(64, 0.1)]).astype(np.float32)
    plain = dequantize(quantize(w, GGMLType.Q4_0), GGMLType.Q4_0, shape=(64, 128))
    wtd = dequantize(quantize_q4_0_imatrix(w, qw), GGMLType.Q4_0, shape=(64, 128))
    err_plain = (qw * (plain - w) ** 2).sum()
    err_wtd = (qw * (wtd - w) ** 2).sum()
    assert err_wtd <= err_plain * 1.001
