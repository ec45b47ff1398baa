"""Compute ops: rope, norms, attention, quantized linear, KV cache."""

from booster_tpu.ops.rope import rope_inv_freq, yarn_params, apply_rope
from booster_tpu.ops.linear import qlinear
from booster_tpu.ops.kv_cache import KVCache
from booster_tpu.ops.attention import attention

__all__ = ["rope_inv_freq", "yarn_params", "apply_rope", "qlinear", "KVCache", "attention"]
