"""Sampling parameters (static / hashable — used as jit static args).

Field set mirrors llama_sampling_params (/root/reference/cpp/common/sampling.h)
plus janus_params (/root/reference/cpp/janus.h:13-19).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SamplingParams:
    temp: float = 0.8
    top_k: int = 40  # <= 0 → disabled
    top_p: float = 0.95  # >= 1 → disabled
    min_p: float = 0.05  # <= 0 → disabled
    tfs_z: float = 1.0  # tail-free; >= 1 → disabled
    typical_p: float = 1.0  # >= 1 → disabled
    # dynatemp (entropy-scaled temperature); range 0 → disabled
    dynatemp_range: float = 0.0
    dynatemp_exponent: float = 1.0
    # repetition penalties over the last penalty_last_n tokens
    penalty_last_n: int = 64
    penalty_repeat: float = 1.0  # 1.0 → disabled
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    penalize_nl: bool = True
    # mirostat: 0 off, 1 v1, 2 v2
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    # classifier-free guidance (llama_sample_apply_guidance_impl); 1.0 → off
    cfg_scale: float = 1.0
    cfg_negative_prompt: str = ""
    # janus: 0 off, 1 on (replaces the whole chain, like the reference does)
    janus: int = 0
    janus_depth: int = 200
    janus_scale: float = 0.97
    janus_hi: float = 0.99
    janus_lo: float = 0.96
    # sampler chain order (subset of "kfytpm" — top_K, tFs, tYpical, Top_p,
    # Min_p, Temp); penalties always run first, as in the reference default
    samplers_sequence: str = "kfypmt"
    seed: int = -1  # < 0 → nondeterministic (engine picks)

    def normalized(self) -> "SamplingParams":
        """Clamp janus params into valid ranges (initJanus safe defaults)."""
        import dataclasses

        updates = {}
        if self.janus_depth <= 0:
            updates["janus_depth"] = 200
        if not (0.0 < self.janus_scale <= 1.0):
            updates["janus_scale"] = 0.97
        if not (0.0 < self.janus_hi <= 1.0):
            updates["janus_hi"] = 0.99
        if not (0.0 < self.janus_lo <= 1.0):
            updates["janus_lo"] = 0.96
        return dataclasses.replace(self, **updates) if updates else self
