"""Quantized linear layers: y = x @ W^T with W a QTensor.

Two execution paths:
  - XLA path (default off-TPU / correctness baseline): dequantize the weight
    tile-wise via jnp and let XLA fuse into the matmul.
  - Pallas path (TPU): fused block-dequant matmul kernels in
    booster_tpu.ops.pallas_qmm — weights stream from HBM at 4/8 bits per
    value.  Enabled when running on TPU and shapes are tile-aligned.

Reference analog: the quantized mat-mul kernels (ggml-quants.c vec_dot /
mmq.cu) — redesigned: planar payload + f32 group scales instead of
interleaved block structs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from booster_tpu.quant.qtensor import QTensor, dequantize_qtensor

_USE_PALLAS = None  # resolved lazily; tests can override via set_use_pallas


def set_use_pallas(value: Optional[bool]) -> None:
    global _USE_PALLAS
    _USE_PALLAS = value


def use_pallas() -> bool:
    global _USE_PALLAS
    if _USE_PALLAS is None:
        try:
            _USE_PALLAS = jax.default_backend() == "tpu"
        except Exception:
            _USE_PALLAS = False
    return _USE_PALLAS


def qlinear(x: jnp.ndarray, w: QTensor, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x [..., in] @ w[out, in]^T → [..., out].

    Computation in bf16 (MXU) with f32 accumulation, output in x.dtype.
    """
    if w.kind == "dense":
        y = jax.lax.dot_general(
            x,
            jnp.asarray(w.qw).astype(x.dtype),
            ((( x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    elif use_pallas():
        from booster_tpu.ops.pallas_qmm import qmm

        y = qmm(x, w)
    else:
        wd = dequantize_qtensor(w, dtype=jnp.bfloat16)
        y = jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            wd,
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)
