"""Bit-exact decode parity against the reference ggml-quants.c.

Builds a tiny harness (tests/golden/harness.c) linking the *reference's own*
dequantization code and compares float-for-float with our numpy decoders —
for every supported format, on random bit patterns.  Skips when the reference
checkout or a C compiler is unavailable (the repo stays standalone).
"""

import os
import shutil
import struct
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from booster_tpu.gguf.constants import GGMLType, TYPE_TRAITS
from booster_tpu.quant import dequantize

REF = "/root/reference/cpp/ggml"
HARNESS_DIR = os.path.join(os.path.dirname(__file__), "golden")

FORMATS = [
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0,
    GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
    GGMLType.IQ4_NL, GGMLType.IQ4_XS,
]


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        pytest.skip("no C compiler")
    out = str(tmp_path_factory.mktemp("gold") / "harness")
    cmd = [
        gcc, "-O2", f"-I{REF}/include", f"-I{REF}/src",
        os.path.join(HARNESS_DIR, "harness.c"),
        os.path.join(HARNESS_DIR, "stubs.c"),
        f"{REF}/src/ggml-quants.c", "-o", out, "-lm",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    if r.returncode != 0:
        pytest.skip(f"harness build failed: {r.stderr[-300:]}")
    return out


def golden_dequant(harness_bin, fmt: GGMLType, raw: bytes, n_elem: int) -> np.ndarray:
    header = f"{int(fmt)} {len(raw)} {n_elem}\n".encode()
    r = subprocess.run([harness_bin], input=header + raw,
                       capture_output=True, timeout=60)
    assert r.returncode == 0, f"harness rc={r.returncode}"
    return np.frombuffer(r.stdout, np.float32, n_elem)


def make_blocks(fmt: GGMLType, n_blocks: int, rng) -> bytes:
    """Random bit patterns with f16 scale fields forced finite/small."""
    tr = TYPE_TRAITS[fmt]
    raw = rng.integers(0, 256, n_blocks * tr.type_size, dtype=np.uint8)
    blocks = raw.reshape(n_blocks, tr.type_size)
    # f16 scale fields at known offsets per format → overwrite with sane f16
    f16_offsets = {
        GGMLType.Q4_0: [0], GGMLType.Q4_1: [0, 2], GGMLType.Q5_0: [0],
        GGMLType.Q5_1: [0, 2], GGMLType.Q8_0: [0],
        GGMLType.Q2_K: [80, 82], GGMLType.Q3_K: [108],
        GGMLType.Q4_K: [0, 2], GGMLType.Q5_K: [0, 2], GGMLType.Q6_K: [208],
        GGMLType.IQ2_XXS: [0], GGMLType.IQ2_XS: [0], GGMLType.IQ2_S: [0],
        GGMLType.IQ3_XXS: [0], GGMLType.IQ3_S: [0], GGMLType.IQ1_S: [0],
        GGMLType.IQ1_M: [],  # scattered fp16 scale; random nibbles are fine
        GGMLType.IQ4_NL: [0], GGMLType.IQ4_XS: [0],
    }[fmt]
    for off in f16_offsets:
        vals = (rng.random(n_blocks, np.float32) * 2 - 1).astype("<f2")
        blocks[:, off : off + 2] = vals.view(np.uint8).reshape(n_blocks, 2)
    return blocks.tobytes()


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda f: f.name)
def test_decode_bit_exact_vs_reference(harness, fmt):
    rng = np.random.default_rng(int(fmt) * 7 + 1)
    tr = TYPE_TRAITS[fmt]
    n_blocks = 16
    raw = make_blocks(fmt, n_blocks, rng)
    n_elem = n_blocks * tr.block_size
    want = golden_dequant(harness, fmt, raw, n_elem)
    got = dequantize(raw, fmt)
    np.testing.assert_array_equal(got, want, err_msg=fmt.name)
