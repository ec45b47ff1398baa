"""Multi-process distributed execution: 2 real jax.distributed processes
(CPU backend) run the sharded dp=2×tp=4 decode and must reproduce the
single-process greedy token stream exactly.

Reference analog: the RPC offload backend (/root/reference/cpp/ggml/src/
ggml-rpc.cpp) — replaced by GSPMD collectives over a multi-process mesh.
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_decode_parity(tmp_path):
    from tools.make_test_model import make_model

    model = str(tmp_path / "tiny.gguf")
    make_model(model, vocab_size=512, hidden=128, layers=2)
    out = str(tmp_path / "tokens.json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # tool sets its own device count
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "distributed_check.py"),
         "--model", model, "--nprocs", "2", "--tp", "4", "--dp", "2",
         "--port", "9923", "--out", out],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    result = json.loads(r.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["nprocs"] == 2
