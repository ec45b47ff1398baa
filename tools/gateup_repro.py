#!/usr/bin/env python
"""Minimal on-chip repro for the qmm_gateup Mosaic verification error."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from booster_tpu.gguf import GGMLType
from booster_tpu.ops.pallas_qmm import qmm_gateup
from booster_tpu.quant.formats import quantize
from booster_tpu.quant import repack_gguf_tensor
from booster_tpu.quant.qtensor import (compact_scales, prepare_kernel_scales,
                                       transpose_qtensor)

rng = np.random.default_rng(0)
N2, K = int(os.environ.get("RN2", "2048")), int(os.environ.get("RK", "1024"))
M = int(os.environ.get("RM", "64"))
w = rng.normal(size=(N2, K)).astype(np.float32) * 0.05
raw = quantize(w, GGMLType.Q8_0)
qt = compact_scales(transpose_qtensor(
    prepare_kernel_scales(repack_gguf_tensor(raw, GGMLType.Q8_0, (N2, K)))))
qt = qt.astype_device()
x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
print("backend:", jax.default_backend(), "kind:", qt.kind, flush=True)
y = qmm_gateup(x, qt, "silu")
print("result:", None if y is None else np.asarray(y).shape, flush=True)

# whole-MLP kernel repro (same shapes; down [C, ff] with ff = N2 // 2)
from booster_tpu.ops.pallas_qmm import qmm_mlp
ff = N2 // 2
C = int(os.environ.get("RC", str(K)))
wd = rng.normal(size=(C, ff)).astype(np.float32) * 0.05
raw_d = quantize(wd, GGMLType.Q8_0)
qt_d = compact_scales(transpose_qtensor(
    prepare_kernel_scales(repack_gguf_tensor(raw_d, GGMLType.Q8_0, (C, ff)))))
qt_d = qt_d.astype_device()
y2 = qmm_mlp(x, qt, qt_d, "silu")
print("mlp result:", None if y2 is None else np.asarray(y2).shape, flush=True)
