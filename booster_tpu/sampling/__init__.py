"""On-device sampling: the standard suite + Janus, all vectorized jnp.

Reference semantics:
  - /root/reference/cpp/src/llama-sampling.cpp (top-k/p, min-p, tail-free,
    typical, dynatemp, penalties, mirostat v1/v2)
  - /root/reference/cpp/common/sampling.cpp (sampler chain order)
  - /root/reference/cpp/janus.cpp (Janus sampling; tables precomputed at load)
"""

from booster_tpu.sampling.params import SamplingParams
from booster_tpu.sampling.samplers import (SamplerState, sample,
                                            make_sampler_state,
                                            make_seeded_state)
from booster_tpu.sampling.janus import JanusTables, janus_sample

__all__ = [
    "SamplingParams",
    "SamplerState",
    "sample",
    "make_sampler_state",
    "make_seeded_state",
    "JanusTables",
    "janus_sample",
]
