"""Native C++ repack must produce bit-identical QTensors to the numpy path."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from booster_tpu.gguf.constants import GGMLType
from booster_tpu.quant import quantize
from booster_tpu.quant import native
from booster_tpu.quant.qtensor import _REPACK

FORMATS = [GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K]


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native repack library unavailable (no compiler?)")
    return lib


@pytest.mark.parametrize("fmt", FORMATS)
def test_native_matches_numpy(lib, fmt, monkeypatch):
    rng = np.random.default_rng(int(fmt))
    out_f, in_f = 8, 512
    raw = np.frombuffer(
        quantize(rng.standard_normal((out_f, in_f)).astype(np.float32), fmt),
        np.uint8,
    )
    with_native = _REPACK[fmt](raw, out_f, in_f)

    monkeypatch.setenv("BT_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    numpy_only = _REPACK[fmt](raw, out_f, in_f)
    monkeypatch.setattr(native, "_TRIED", False)

    assert with_native.kind == numpy_only.kind
    assert with_native.zero == numpy_only.zero
    np.testing.assert_array_equal(np.asarray(with_native.qw), np.asarray(numpy_only.qw))
    np.testing.assert_array_equal(
        np.asarray(with_native.scales), np.asarray(numpy_only.scales)
    )
    if numpy_only.mins is not None:
        np.testing.assert_array_equal(
            np.asarray(with_native.mins), np.asarray(numpy_only.mins)
        )
    else:
        assert with_native.mins is None
