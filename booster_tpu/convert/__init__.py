"""Model conversion utilities (HuggingFace → GGUF)."""

from booster_tpu.convert.hf import convert_hf_model, convert_state_dict

__all__ = ["convert_hf_model", "convert_state_dict"]
