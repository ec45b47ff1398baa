"""BERT encoder parity vs HF transformers (embedding models).

Reference: build_bert (/root/reference/cpp/src/llama.cpp:9746) + pooling.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from booster_tpu.convert import convert_hf_model
from booster_tpu.gguf import GGMLType
from booster_tpu.models import load_model
from booster_tpu.models.bert import POOL_MEAN, POOL_NONE, encode


def test_bert_hidden_states_parity(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()
    path = str(tmp_path / "bert.gguf")
    convert_hf_model(hf, out_path=path, quant_type=GGMLType.F32)
    loaded = load_model(path)
    assert loaded.cfg.arch == "bert"

    ids = np.array([[3, 17, 42, 99, 7, 12]], np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(ids)).last_hidden_state.float().numpy()
    got = np.asarray(encode(loaded.params, loaded.cfg, jnp.asarray(ids),
                            pooling=POOL_NONE))
    np.testing.assert_allclose(got, want, atol=0.03, rtol=0.05)


def test_embeddings_endpoint(tmp_path):
    """OpenAI-style /v1/embeddings over a bert model."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer
    from tools.make_test_model import build_vocab

    from booster_tpu.serving import Engine
    from booster_tpu.serving.scheduler import Scheduler
    from booster_tpu.serving.server import make_app

    cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()
    tokens, scores, types = build_vocab(256)
    path = str(tmp_path / "bert_srv.gguf")
    convert_hf_model(hf, out_path=path, quant_type=GGMLType.F32,
                     tokenizer_vocab={
                         "tokenizer.ggml.model": "llama",
                         "tokenizer.ggml.tokens": tokens,
                         "tokenizer.ggml.scores": scores,
                         "tokenizer.ggml.token_type": types,
                         "tokenizer.ggml.bos_token_id": 1,
                         "tokenizer.ggml.eos_token_id": 2,
                         "tokenizer.ggml.unknown_token_id": 0,
                         "tokenizer.ggml.add_bos_token": False,
                     })
    model = load_model(path)
    assert model.tokenizer is not None

    async def run():
        engine = Engine(model, max_batch=1, max_seq=64)
        sched = Scheduler(engine)
        app = make_app(sched, model_name="bert-test")
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/v1/embeddings",
                                  json={"input": ["hello world", "the test"]})
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "list"
            assert len(body["data"]) == 2
            assert len(body["data"][0]["embedding"]) == 64
            r2 = await client.post("/v1/embeddings", json={})
            assert r2.status == 400
        finally:
            await client.close()

    asyncio.run(run())


def test_bert_mean_pooling_masks_padding(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64,
    )
    torch.manual_seed(1)
    hf = transformers.BertModel(cfg).eval()
    path = str(tmp_path / "bert2.gguf")
    convert_hf_model(hf, out_path=path, quant_type=GGMLType.F32)
    loaded = load_model(path)

    # same content, one padded: pooled embeddings must match
    ids_a = np.array([[5, 9, 23]], np.int32)
    ids_b = np.array([[5, 9, 23, 0, 0, 0]], np.int32)
    ea = np.asarray(encode(loaded.params, loaded.cfg, jnp.asarray(ids_a),
                           jnp.asarray([3]), POOL_MEAN))
    eb = np.asarray(encode(loaded.params, loaded.cfg, jnp.asarray(ids_b),
                           jnp.asarray([3]), POOL_MEAN))
    np.testing.assert_allclose(ea, eb, atol=1e-2)
