"""Self-Extend group attention: compressed rope positions past the window."""

import sys

import numpy as np

sys.path.insert(0, ".")

from booster_tpu.models import load_model
from booster_tpu.sampling import SamplingParams
from booster_tpu.serving import Engine
from tools.make_test_model import make_model


def test_self_extend_runs_and_matches_within_window(tmp_path):
    path = str(tmp_path / "se.gguf")
    make_model(path, vocab_size=512, hidden=128, layers=2, weight_scale=0.3)
    model = load_model(path)
    eng = Engine(model, max_batch=1, max_seq=256, decode_chunk=4)
    ids = eng.tokenizer.encode("hello world")
    plain = eng.generate(ids, SamplingParams(temp=0.0), max_new_tokens=12)
    # window larger than everything → identical to plain rope
    se_wide = eng.generate(ids, SamplingParams(temp=0.0), max_new_tokens=12,
                           self_extend_group=4, self_extend_window=128)
    assert se_wide.token_ids == plain.token_ids
    # tight window → positions compress; generation still sane
    se_tight = eng.generate(ids, SamplingParams(temp=0.0), max_new_tokens=12,
                            self_extend_group=4, self_extend_window=8)
    assert se_tight.n_generated >= 1
    assert all(0 <= t < 512 for t in se_tight.token_ids)
    assert se_tight.token_ids != plain.token_ids  # compression changed rope
