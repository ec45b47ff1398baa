"""Per-slot vectorized sampling: every parameter is a traced [B] array, so
one compiled decode step serves a continuous batch of heterogeneous requests
(different temp/top-k/top-p/min-p/penalties per slot) with zero recompiles.

The filters reproduce llama-sampling.cpp semantics like samplers.py, but with
runtime parameters: the per-row top-k cutoff comes from the descending sort
(kth largest via gather), top-p from the cumulative softmax over that same
sort — one sort feeds every filter.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from booster_tpu.sampling.params import SamplingParams
from booster_tpu.sampling.samplers import SamplerState

NEG_INF = -jnp.inf


@dataclass
class VectorSampling:
    """Pytree of per-slot sampling knobs [B]."""

    temp: jnp.ndarray  # f32; <= 0 → greedy
    top_k: jnp.ndarray  # i32; <= 0 → disabled
    top_p: jnp.ndarray  # f32; >= 1 → disabled
    min_p: jnp.ndarray  # f32; <= 0 → disabled
    penalty_repeat: jnp.ndarray  # f32; 1.0 → disabled
    penalty_freq: jnp.ndarray
    penalty_present: jnp.ndarray

    @classmethod
    def from_params(cls, plist: list[SamplingParams]) -> "VectorSampling":
        def arr(f, dt=np.float32):
            return jnp.asarray(np.array([f(p) for p in plist], dt))

        return cls(
            temp=arr(lambda p: p.temp),
            top_k=arr(lambda p: p.top_k, np.int32),
            top_p=arr(lambda p: p.top_p),
            min_p=arr(lambda p: p.min_p),
            penalty_repeat=arr(lambda p: p.penalty_repeat),
            penalty_freq=arr(lambda p: p.penalty_freq),
            penalty_present=arr(lambda p: p.penalty_present),
        )

    def set_slot(self, slot: int, p: SamplingParams) -> "VectorSampling":
        return VectorSampling(
            temp=self.temp.at[slot].set(p.temp),
            top_k=self.top_k.at[slot].set(p.top_k),
            top_p=self.top_p.at[slot].set(p.top_p),
            min_p=self.min_p.at[slot].set(p.min_p),
            penalty_repeat=self.penalty_repeat.at[slot].set(p.penalty_repeat),
            penalty_freq=self.penalty_freq.at[slot].set(p.penalty_freq),
            penalty_present=self.penalty_present.at[slot].set(p.penalty_present),
        )


def _vs_flatten(v: VectorSampling):
    return (
        v.temp, v.top_k, v.top_p, v.min_p,
        v.penalty_repeat, v.penalty_freq, v.penalty_present,
    ), None


jax.tree_util.register_pytree_node(
    VectorSampling, _vs_flatten, lambda aux, c: VectorSampling(*c)
)


def sample_vectorized(
    logits: jnp.ndarray,  # [B, V]
    state: SamplerState,
    vp: VectorSampling,
    mask=None,  # [B] bool: rows to actually sample/advance (None = all)
) -> tuple[jnp.ndarray, SamplerState]:
    B, V = logits.shape
    lg = logits.astype(jnp.float32)

    # penalties (traced per-row scalars)
    valid = state.prev_tokens >= 0
    tok = jnp.where(valid, state.prev_tokens, 0)
    counts = jnp.zeros((B, V), jnp.float32).at[
        jnp.arange(B)[:, None], tok
    ].add(valid.astype(jnp.float32))
    seen = counts > 0
    pr = vp.penalty_repeat[:, None]
    scaled = jnp.where(lg <= 0, lg * pr, lg / pr)
    lg = jnp.where(seen, scaled, lg)
    lg = lg - counts * vp.penalty_freq[:, None] - seen * vp.penalty_present[:, None]

    greedy_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)

    # top-K shortlist instead of a full-vocab sort (64×V sorts dominated the
    # batched decode step).  Exact for top_k ≤ K; top-p/min-p operate on the
    # shortlist — exact whenever the shortlist carries ≥ p of the mass, which
    # holds for every practical temperature.
    K = min(256, V)
    sorted_lg, _ = jax.lax.top_k(lg, K)  # [B, K] descending
    probs = jax.nn.softmax(sorted_lg, axis=-1)  # shortlist-renormalized
    cum = jnp.cumsum(probs, axis=-1)

    # top-k cutoff: kth largest logit (disabled → K)
    k = jnp.where(vp.top_k <= 0, K, jnp.minimum(vp.top_k, K))
    k_cut = jnp.take_along_axis(sorted_lg, (k - 1)[:, None], axis=-1)

    # top-p: smallest prefix with mass >= p (tokens whose preceding mass < p)
    keep_sorted = (cum - probs) < vp.top_p[:, None]
    n_keep = jnp.maximum(keep_sorted.sum(axis=-1), 1)
    p_cut = jnp.take_along_axis(sorted_lg, (n_keep - 1)[:, None], axis=-1)

    # min-p relative threshold
    m_cut = sorted_lg[:, :1] + jnp.log(jnp.maximum(vp.min_p[:, None], 1e-20))
    m_cut = jnp.where(vp.min_p[:, None] <= 0, -jnp.inf, m_cut)

    cutoff = jnp.maximum(jnp.maximum(k_cut, p_cut), m_cut)
    filtered = jnp.where(lg < cutoff, NEG_INF, lg)

    t = jnp.maximum(vp.temp, 1e-6)[:, None]
    keys = jax.vmap(jax.random.split, in_axes=(0, None))(state.key, 2)
    step_key, next_key = keys[:, 0], keys[:, 1]
    sampled = jax.vmap(lambda kk, l: jax.random.categorical(kk, l))(
        step_key, filtered / t
    ).astype(jnp.int32)
    tokens = jnp.where(vp.temp <= 0, greedy_tok, sampled)

    # push into history ring (masked rows keep their state untouched)
    N = state.prev_tokens.shape[1]
    idx = state.prev_pos % N
    write = tokens if mask is None else jnp.where(
        mask, tokens, state.prev_tokens[jnp.arange(B), idx]
    )
    prev = state.prev_tokens.at[jnp.arange(B), idx].set(write)
    pos = state.prev_pos + (1 if mask is None else mask.astype(jnp.int32))
    key_out = next_key if mask is None else jnp.where(mask[:, None], next_key, state.key)
    new_state = SamplerState(prev, pos, state.mirostat_mu, key_out)
    return tokens, new_state
