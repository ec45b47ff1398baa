"""GGUF reader/writer round-trip tests."""

import numpy as np
import pytest

from booster_tpu.gguf import GGMLType, GGUFReader, GGUFWriter
from booster_tpu.quant import quantize


def test_kv_roundtrip(tmp_path):
    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add("llama.block_count", 2)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("tokenizer.ggml.tokens", ["<unk>", "<s>", "hello"])
    w.add("tokenizer.ggml.scores", np.array([0.0, -1.0, -2.0], dtype=np.float32))
    w.add("tokenizer.ggml.token_type", np.array([2, 3, 1], dtype=np.int32))
    w.add("general.some_bool", True)
    w.add("general.big", 1 << 40)
    path = str(tmp_path / "kv.gguf")
    w.write(path)

    with GGUFReader(path) as r:
        assert r.version == 3
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["llama.block_count"] == 2
        assert abs(r.metadata["llama.rope.freq_base"] - 10000.0) < 1e-6
        assert r.metadata["tokenizer.ggml.tokens"] == ["<unk>", "<s>", "hello"]
        np.testing.assert_allclose(
            r.metadata["tokenizer.ggml.scores"], [0.0, -1.0, -2.0]
        )
        assert list(r.metadata["tokenizer.ggml.token_type"]) == [2, 3, 1]
        assert r.metadata["general.some_bool"] is True
        assert r.metadata["general.big"] == 1 << 40
        assert r.architecture == "llama"
        assert r.field("{arch}.block_count") == 2


def test_tensor_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    f32 = rng.standard_normal((16, 64)).astype(np.float32)
    f16 = rng.standard_normal((8, 32)).astype(np.float16)
    q = rng.standard_normal((4, 256)).astype(np.float32)
    qbytes = quantize(q, GGMLType.Q4_0)

    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add_tensor("a.weight", f32, (16, 64), GGMLType.F32)
    w.add_tensor("b.weight", f16, (8, 32), GGMLType.F16)
    w.add_tensor("c.weight", qbytes, (4, 256), GGMLType.Q4_0)
    path = str(tmp_path / "t.gguf")
    w.write(path)

    with GGUFReader(path) as r:
        assert r.tensor_order == ["a.weight", "b.weight", "c.weight"]
        ia = r.tensors["a.weight"]
        assert ia.shape == (16, 64)
        assert ia.ggml_type == GGMLType.F32
        np.testing.assert_array_equal(
            r.tensor_bytes(ia).view(np.float32).reshape(16, 64), f32
        )
        ib = r.tensors["b.weight"]
        np.testing.assert_array_equal(
            r.tensor_bytes(ib).view(np.float16).reshape(8, 32), f16
        )
        ic = r.tensors["c.weight"]
        assert bytes(r.tensor_bytes(ic)) == qbytes
        # offsets are 32-byte aligned
        for info in r:
            assert info.offset % 32 == 0


def test_bad_magic(tmp_path):
    path = tmp_path / "bad.gguf"
    path.write_bytes(b"NOPE" + b"\x00" * 100)
    with pytest.raises(ValueError):
        GGUFReader(str(path))


def test_truncated(tmp_path):
    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add_tensor("x", np.zeros((4, 4), np.float32), (4, 4), GGMLType.F32)
    path = str(tmp_path / "full.gguf")
    w.write(path)
    data = open(path, "rb").read()
    trunc = tmp_path / "trunc.gguf"
    trunc.write_bytes(data[: len(data) - 32])
    with pytest.raises(ValueError):
        GGUFReader(str(trunc))


def test_gguf_v2_reads(tmp_path):
    """GGUF v2 files (same layout, older version id) parse identically."""
    import struct

    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add_tensor("x", np.arange(16, dtype=np.float32), (16,), GGMLType.F32)
    path = str(tmp_path / "v2.gguf")
    w.write(path)
    data = bytearray(open(path, "rb").read())
    data[4:8] = struct.pack("<I", 2)  # rewrite version field
    v2 = tmp_path / "real_v2.gguf"
    v2.write_bytes(bytes(data))
    with GGUFReader(str(v2)) as r:
        assert r.version == 2
        np.testing.assert_array_equal(
            r.tensor_bytes("x").view(np.float32), np.arange(16, dtype=np.float32)
        )
