"""Model configs, weight loading, and functional decoder forward passes."""

from booster_tpu.models.config import ModelConfig
from booster_tpu.models.loader import load_model
from booster_tpu.models.llama import forward, prefill_or_decode

__all__ = ["ModelConfig", "load_model", "forward", "prefill_or_decode"]
