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
