"""Per-slot vectorized sampling: every parameter is a traced [B] array, so
one compiled decode step serves a continuous batch of heterogeneous requests
(different temp/top-k/top-p/min-p/penalties/mirostat/janus per slot) with a
tiny, static set of compile variants.

The filters reproduce llama-sampling.cpp semantics like samplers.py, but with
runtime parameters: the per-row top-k cutoff comes from the descending sort
(kth largest via gather), top-p from the cumulative softmax over that same
sort — one sort feeds every filter.

Janus and mirostat ride the same [B, V] step (the reference runs Janus on
*every* request concurrently, cpp/bridge.cpp:586-599; here per-row selects
pick between the standard chain, mirostat v1/v2, and Janus).  The `features`
tuple is a static jit arg: batches with no janus/mirostat rows compile and
run none of that code.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from booster_tpu.sampling.params import SamplingParams
from booster_tpu.sampling.samplers import (
    SamplerState,
    _mirostat_v1,
    _mirostat_v2,
    history_window_mask,
)

NEG_INF = -jnp.inf

import os as _os

_APPROX_TOPK = _os.environ.get("BT_APPROX_TOPK", "1") != "0"


def topk_shortlist(lg: jnp.ndarray, K: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-K shortlist (descending values + indices), computed fast.

    `jax.lax.top_k` over [64, 32k] costs ~1.12 ms on a v5e while
    `approx_max_k` at recall 0.95 costs ~0.15 ms (tools/step_breakdown.py).
    This takes the approx result and *verifies* it is the exact set: with
    vmin the shortlist's smallest value, the set is exact (up to value-ties
    at vmin, which are interchangeable) iff the number of strictly-greater
    logits equals the shortlist slots not holding vmin.  On the rare miss,
    fall back to the exact sort for the whole batch.  BT_APPROX_TOPK=0
    reverts to plain top_k."""
    if not _APPROX_TOPK or lg.shape[-1] <= K:
        return jax.lax.top_k(lg, K)
    # rt=0.95 misses ~1% of the set → the all-rows check fails nearly every
    # step and the exact fallback always runs (paying both); at 0.99 the
    # measured set-recall is 1.0 at [64, 32k] so the fallback is rare
    av, ai = jax.lax.approx_max_k(lg, K, recall_target=0.99)
    vmin = av[:, -1:]
    n_greater = jnp.sum(lg > vmin, axis=-1)
    n_ties = jnp.sum(av == vmin, axis=-1)
    ok = jnp.all(n_greater <= K - n_ties)
    return jax.lax.cond(
        ok, lambda: (av, ai), lambda: tuple(jax.lax.top_k(lg, K))
    )


@dataclass
class VectorSampling:
    """Pytree of per-slot sampling knobs [B]."""

    temp: jnp.ndarray  # f32; <= 0 → greedy
    top_k: jnp.ndarray  # i32; <= 0 → disabled
    top_p: jnp.ndarray  # f32; >= 1 → disabled
    min_p: jnp.ndarray  # f32; <= 0 → disabled
    tfs_z: jnp.ndarray  # f32; >= 1 → disabled
    typical_p: jnp.ndarray  # f32; >= 1 → disabled
    dynatemp_range: jnp.ndarray  # f32; <= 0 → disabled
    dynatemp_exponent: jnp.ndarray  # f32
    penalty_repeat: jnp.ndarray  # f32; 1.0 → disabled
    penalty_freq: jnp.ndarray
    penalty_present: jnp.ndarray
    penalty_last_n: jnp.ndarray  # i32; window over the history ring (-1 → all)
    penalize_nl: jnp.ndarray  # bool; False → NL logit restored post-penalty
    mirostat: jnp.ndarray  # i32; 0 off, 1 v1, 2 v2
    mirostat_tau: jnp.ndarray  # f32
    mirostat_eta: jnp.ndarray  # f32
    janus: jnp.ndarray  # bool; True → Janus replaces the whole chain
    janus_depth: jnp.ndarray  # i32
    janus_hi: jnp.ndarray  # f32
    janus_lo: jnp.ndarray  # f32
    janus_scale: jnp.ndarray  # f32
    cfg_scale: jnp.ndarray  # f32; 1.0 → guidance disabled for the row
    max_predict: jnp.ndarray  # f32; per-slot predict limit (Janus EOS boost)

    _FIELDS = (
        "temp", "top_k", "top_p", "min_p",
        "tfs_z", "typical_p", "dynatemp_range", "dynatemp_exponent",
        "penalty_repeat", "penalty_freq", "penalty_present",
        "penalty_last_n", "penalize_nl",
        "mirostat", "mirostat_tau", "mirostat_eta",
        "janus", "janus_depth", "janus_hi", "janus_lo", "janus_scale",
        "cfg_scale", "max_predict",
    )

    @classmethod
    def from_params(
        cls, plist: list[SamplingParams], max_predict: int = 1024
    ) -> "VectorSampling":
        def arr(f, dt=np.float32):
            return jnp.asarray(np.array([f(p) for p in plist], dt))

        return cls(
            temp=arr(lambda p: p.temp),
            top_k=arr(lambda p: p.top_k, np.int32),
            top_p=arr(lambda p: p.top_p),
            min_p=arr(lambda p: p.min_p),
            tfs_z=arr(lambda p: p.tfs_z),
            typical_p=arr(lambda p: p.typical_p),
            dynatemp_range=arr(lambda p: p.dynatemp_range),
            dynatemp_exponent=arr(lambda p: p.dynatemp_exponent),
            penalty_repeat=arr(lambda p: p.penalty_repeat),
            penalty_freq=arr(lambda p: p.penalty_freq),
            penalty_present=arr(lambda p: p.penalty_present),
            penalty_last_n=arr(lambda p: p.penalty_last_n, np.int32),
            penalize_nl=arr(lambda p: p.penalize_nl, bool),
            mirostat=arr(lambda p: p.mirostat, np.int32),
            mirostat_tau=arr(lambda p: p.mirostat_tau),
            mirostat_eta=arr(lambda p: p.mirostat_eta),
            janus=arr(lambda p: bool(p.janus), bool),
            janus_depth=arr(lambda p: p.janus_depth, np.int32),
            janus_hi=arr(lambda p: p.janus_hi),
            janus_lo=arr(lambda p: p.janus_lo),
            janus_scale=arr(lambda p: p.janus_scale),
            cfg_scale=arr(lambda p: p.cfg_scale),
            max_predict=jnp.full(len(plist), float(max_predict), jnp.float32),
        )

    def set_slot(
        self, slot: int, p: SamplingParams, max_predict: int | None = None
    ) -> "VectorSampling":
        p = p.normalized()
        updates = dict(
            temp=p.temp, top_k=p.top_k, top_p=p.top_p, min_p=p.min_p,
            tfs_z=p.tfs_z, typical_p=p.typical_p,
            dynatemp_range=p.dynatemp_range,
            dynatemp_exponent=p.dynatemp_exponent,
            penalty_repeat=p.penalty_repeat, penalty_freq=p.penalty_freq,
            penalty_present=p.penalty_present, penalty_last_n=p.penalty_last_n,
            penalize_nl=p.penalize_nl,
            mirostat=p.mirostat, mirostat_tau=p.mirostat_tau,
            mirostat_eta=p.mirostat_eta,
            janus=bool(p.janus), janus_depth=p.janus_depth,
            janus_hi=p.janus_hi, janus_lo=p.janus_lo,
            janus_scale=p.janus_scale,
            cfg_scale=p.cfg_scale,
        )
        if max_predict is not None:
            updates["max_predict"] = float(max_predict)
        return VectorSampling(**{
            name: (getattr(self, name).at[slot].set(updates[name])
                   if name in updates else getattr(self, name))
            for name in self._FIELDS
        })


def _vs_flatten(v: VectorSampling):
    return tuple(getattr(v, n) for n in VectorSampling._FIELDS), None


jax.tree_util.register_pytree_node(
    VectorSampling, _vs_flatten, lambda aux, c: VectorSampling(*c)
)


def chain_cutoff(lg: jnp.ndarray, vp: VectorSampling) -> jnp.ndarray:
    """Per-row logit cutoff [B, 1] combining top-k/top-p/min-p over a top-K
    shortlist (shared by the decode sampler and the speculative-acceptance
    distributions).  Disabled filters contribute a -inf cutoff."""
    B, V = lg.shape
    K = min(256, V)
    sorted_lg, _ = topk_shortlist(lg, K)  # [B, K] descending
    probs = jax.nn.softmax(sorted_lg, axis=-1)  # shortlist-renormalized
    cum = jnp.cumsum(probs, axis=-1)

    # top-k cutoff: kth largest logit (disabled → no cutoff)
    k = jnp.clip(jnp.minimum(vp.top_k, K), 1, K)
    k_cut = jnp.take_along_axis(sorted_lg, (k - 1)[:, None], axis=-1)
    k_cut = jnp.where(vp.top_k[:, None] <= 0, -jnp.inf, k_cut)

    # top-p: smallest prefix with mass >= p (tokens whose preceding mass < p)
    keep_sorted = (cum - probs) < vp.top_p[:, None]
    n_keep = jnp.maximum(keep_sorted.sum(axis=-1), 1)
    p_cut = jnp.take_along_axis(sorted_lg, (n_keep - 1)[:, None], axis=-1)
    p_cut = jnp.where(vp.top_p[:, None] >= 1.0, -jnp.inf, p_cut)

    # min-p relative threshold
    m_cut = sorted_lg[:, :1] + jnp.log(jnp.maximum(vp.min_p[:, None], 1e-20))
    m_cut = jnp.where(vp.min_p[:, None] <= 0, -jnp.inf, m_cut)

    return jnp.maximum(jnp.maximum(k_cut, p_cut), m_cut)


def _chain_keep(
    sorted_lg: jnp.ndarray, vp: VectorSampling, features: tuple = ()
) -> jnp.ndarray:
    """[B, K] survivor mask of the default-order sampler queue
    k → tfs → typical → top-p → min-p over the descending shortlist,
    sequentially renormalized per filter like the single-sequence chain
    (sampler_queue, /root/reference/cpp/common/sampling.cpp:430; each
    llama_sample_* impl re-softmaxes over the surviving candidates).
    Every filter only removes candidates and re-sorting keeps
    prob-descending order, so a boolean mask over the shortlist's sorted
    coordinates represents the shrinking candidate array exactly.  tfs and
    typical compile only when "exttail" is in features (static)."""
    B, K = sorted_lg.shape
    pos = jnp.arange(K)[None, :]
    keep = jnp.ones((B, K), bool)

    def renorm(keep):
        return jax.nn.softmax(jnp.where(keep, sorted_lg, NEG_INF), axis=-1)

    # top-k: survivors are the leading prefix at this point
    k = jnp.where(vp.top_k <= 0, K, jnp.clip(jnp.minimum(vp.top_k, K), 1, K))
    keep &= pos < k[:, None]

    if "exttail" in features:
        # tail-free (llama_sample_tail_free_impl, llama-sampling.cpp:235):
        # normalized |second derivative| of the sorted prob curve
        p = renorm(keep)
        d2 = jnp.abs(p[:, :-2] - 2.0 * p[:, 1:-1] + p[:, 2:])
        norm = jnp.sum(d2, axis=-1, keepdims=True)
        d2 = jnp.where(norm > 0, d2 / jnp.maximum(norm, 1e-20), 1.0 / (K - 2))
        cum = jnp.cumsum(d2, axis=-1)
        # last position defaults to kept when cumulative d2 mass never
        # reaches tfs_z (llama_sample_tail_free keeps all candidates then:
        # last_idx defaults to size)
        keep_f = jnp.concatenate(
            [jnp.ones((B, 1), bool), cum < vp.tfs_z[:, None],
             cum[:, -1:] < vp.tfs_z[:, None]], axis=-1)
        keep &= keep_f | (vp.tfs_z >= 1.0)[:, None]

        # typical (llama_sample_typical_impl, :294): order by distance from
        # the typical surprise, keep until mass >= p
        p = renorm(keep)
        lp = jnp.log(jnp.maximum(p, 1e-38))
        ent = -jnp.sum(jnp.where(keep, p * lp, 0.0), axis=-1, keepdims=True)
        shifted = jnp.where(keep, jnp.abs(-lp - ent), jnp.inf)
        order = jnp.argsort(shifted, axis=-1)  # most typical first
        p_srt = jnp.take_along_axis(p, order, axis=-1)
        cum = jnp.cumsum(p_srt, axis=-1)
        keep_srt = (cum - p_srt) < jnp.maximum(vp.typical_p, 1e-9)[:, None]
        keep_y = jnp.zeros_like(keep).at[
            jnp.arange(B)[:, None], order].set(keep_srt)
        keep &= keep_y | (vp.typical_p >= 1.0)[:, None]

    # top-p over the renormalized survivors; the first survivor has
    # preceding mass 0 < top_p, so min_keep=1 holds implicitly
    p = renorm(keep)
    cum = jnp.cumsum(p, axis=-1)
    keep_p = (cum - p) < jnp.maximum(vp.top_p, 1e-9)[:, None]
    keep &= keep_p | (vp.top_p >= 1.0)[:, None]

    # min-p relative to the surviving max (ratios are renorm-invariant)
    p = renorm(keep)
    pmax = jnp.max(p, axis=-1, keepdims=True)
    keep_m = (p >= vp.min_p[:, None] * pmax) | (p == pmax)
    keep &= keep_m | (vp.min_p <= 0.0)[:, None]
    return keep


def _any_subset(vp: VectorSampling) -> jnp.ndarray:
    """[B] bool: the row has at least one subset filter enabled (its
    sampling support then fits the shortlist)."""
    return ((vp.top_k > 0) | (vp.top_p < 1.0) | (vp.min_p > 0.0)
            | (vp.tfs_z < 1.0) | (vp.typical_p < 1.0))


def chain_filter(
    logits: jnp.ndarray, vp: VectorSampling, features: tuple = ()
) -> jnp.ndarray:
    """[B, V] logits masked to -inf outside the survivors of the filter
    queue (_chain_keep over one top-K shortlist).  Rows with all subset
    filters disabled keep the full vocabulary."""
    lg = logits
    B, V = lg.shape
    K = min(256, V)
    sorted_lg, sorted_idx = topk_shortlist(lg, K)
    keep = _chain_keep(sorted_lg, vp, features)
    keep_v = jnp.zeros((B, V), bool).at[
        jnp.arange(B)[:, None], sorted_idx].set(keep)
    keep_v = keep_v | ~_any_subset(vp)[:, None]
    return jnp.where(keep_v, lg, NEG_INF)


def effective_temp(
    filtered: jnp.ndarray, vp: VectorSampling, features: tuple = ()
) -> jnp.ndarray:
    """[B, 1] sampling temperature: dynatemp entropy scaling
    (llama_sample_entropy_impl, llama-sampling.cpp:358) when a row enables
    it, else the plain per-row temp."""
    t = jnp.maximum(vp.temp, 1e-6)[:, None]
    if "exttail" not in features:
        return t
    lp = jax.nn.log_softmax(filtered, axis=-1)
    probs = jnp.exp(lp)
    ent = -jnp.sum(jnp.where(probs > 0, probs * lp, 0.0), axis=-1,
                   keepdims=True)
    n_valid = jnp.sum(jnp.isfinite(filtered), axis=-1, keepdims=True)
    max_ent = jnp.log(jnp.maximum(n_valid.astype(jnp.float32), 2.0))
    norm_ent = jnp.clip(ent / jnp.maximum(max_ent, 1e-9), 0.0, 1.0)
    t_min = jnp.maximum(0.0, vp.temp - vp.dynatemp_range)[:, None]
    t_max = (vp.temp + vp.dynatemp_range)[:, None]
    dyn_t = t_min + (t_max - t_min) * norm_ent ** vp.dynatemp_exponent[:, None]
    return jnp.where((vp.dynatemp_range > 0)[:, None],
                     jnp.maximum(dyn_t, 1e-9), t)


def filtered_probs_vectorized(
    logits: jnp.ndarray, vp: VectorSampling
) -> jnp.ndarray:
    """Per-slot filtered sampling distributions [B, V]: the standard
    temp/top-k/top-p/min-p chain as explicit probabilities.  temp<=0 rows
    return a one-hot at the argmax, so residual speculative acceptance
    (serving/spec_batch.py) degenerates to exact greedy verification for
    greedy rows.  Penalties/mirostat/janus are not applied on this path
    (matches the single-sequence speculative chain, speculative.py:16)."""
    lg = logits.astype(jnp.float32)
    cutoff = chain_cutoff(lg, vp)
    filtered = jnp.where(lg < cutoff, NEG_INF, lg)
    t = jnp.maximum(vp.temp, 1e-6)[:, None]
    probs = jax.nn.softmax(filtered / t, axis=-1)
    onehot = jax.nn.one_hot(
        jnp.argmax(lg, axis=-1), lg.shape[-1], dtype=jnp.float32
    )
    return jnp.where((vp.temp <= 0)[:, None], onehot, probs)


def sample_vectorized(
    logits: jnp.ndarray,  # [B, V]
    state: SamplerState,
    vp: VectorSampling,
    mask=None,  # [B] bool: rows to actually sample/advance (None = all)
    features: tuple = (),  # static: subset of ("janus", "mirostat")
    janus_tables=None,  # (scales, types, pedantic, factors [V], eos_id) when janus
    nl_token: int = -1,
) -> tuple[jnp.ndarray, SamplerState]:
    B, V = logits.shape
    raw = logits.astype(jnp.float32)
    lg = raw

    # penalties (traced per-row scalars, windowed by penalty_last_n);
    # compiled out entirely when no active slot uses them ("penalties" not
    # in the engine's static feature set — the [B, V] scatter is the most
    # expensive sampler op at high batch)
    if "nopenalties" not in features:  # engine opts out when no slot uses them
        window = history_window_mask(state.prev_tokens, state.prev_pos,
                                     vp.penalty_last_n)
        tok = jnp.where(window, state.prev_tokens, 0)
        counts = jnp.zeros((B, V), jnp.float32).at[
            jnp.arange(B)[:, None], tok
        ].add(window.astype(jnp.float32))
        seen = counts > 0
        pr = vp.penalty_repeat[:, None]
        scaled = jnp.where(lg <= 0, lg * pr, lg / pr)
        lg = jnp.where(seen, scaled, lg)
        lg = lg - counts * vp.penalty_freq[:, None] - seen * vp.penalty_present[:, None]
        if nl_token >= 0:  # restore NL logit for rows with penalize_nl=False
            lg = lg.at[:, nl_token].set(
                jnp.where(vp.penalize_nl, lg[:, nl_token], raw[:, nl_token])
            )

    greedy_tok = None  # derived from the shortlist below when possible

    # sequential filter queue on a top-K shortlist instead of full-vocab
    # sorts (64×V sorts dominated the batched decode step).  Exact for
    # top_k ≤ K; the tail filters operate on the shortlist — exact whenever
    # it carries the surviving mass, which holds for every practical
    # temperature.
    keys = jax.vmap(jax.random.split, in_axes=(0, None))(state.key, 2)
    step_key, next_key = keys[:, 0], keys[:, 1]
    if "fullv" in features:
        # some slot samples from the FULL vocabulary (no subset filter):
        # scatter the survivor mask back to [B, V] and sample there
        filtered = chain_filter(lg, vp, features)
        t = effective_temp(filtered, vp, features)
        sampled = jax.vmap(lambda kk, l: jax.random.categorical(kk, l))(
            step_key, filtered / t
        ).astype(jnp.int32)
        greedy_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
    else:
        # every slot's support fits the shortlist: sample in shortlist
        # space — no [B, V] scatter, no [B, V] categorical (the sampler was
        # ~2.4 ms/step at B=64 V=32k, tools/step_breakdown.py)
        K = min(256, lg.shape[-1])
        sorted_lg, sorted_idx = topk_shortlist(lg, K)
        keep = _chain_keep(sorted_lg, vp, features)
        slg = jnp.where(keep, sorted_lg, NEG_INF)
        t = effective_temp(slg, vp, features)
        pos = jax.vmap(lambda kk, l: jax.random.categorical(kk, l))(
            step_key, slg / t)
        sampled = jnp.take_along_axis(
            sorted_idx, pos[:, None], axis=1)[:, 0].astype(jnp.int32)
        # greedy from the (exact, verified) shortlist: one less full-vocab
        # pass; argmax tie-break = smallest vocab index among value-ties.
        # Degenerate rows (all-NaN logits: is_top all-false) fall back to
        # the shortlist head instead of min's out-of-range fill value.
        is_top = sorted_lg == sorted_lg[:, :1]
        min_tie = jnp.min(
            jnp.where(is_top, sorted_idx, lg.shape[-1]), axis=-1
        ).astype(jnp.int32)
        greedy_tok = jnp.where(jnp.any(is_top, axis=-1), min_tie,
                               sorted_idx[:, 0].astype(jnp.int32))
    tokens = jnp.where(vp.temp <= 0, greedy_tok, sampled)
    mu = state.mirostat_mu

    if "mirostat" in features:
        tok1, mu1 = _mirostat_v1(lg / t[:, :1], mu, vp.mirostat_tau,
                                 vp.mirostat_eta, step_key)
        tok2, mu2 = _mirostat_v2(lg / t[:, :1], mu, vp.mirostat_tau,
                                 vp.mirostat_eta, step_key)
        is_m1 = vp.mirostat == 1
        is_m2 = vp.mirostat == 2
        use_mir = (is_m1 | is_m2) & (vp.temp > 0)
        tokens = jnp.where(use_mir, jnp.where(is_m2, tok2, tok1), tokens)
        mu = jnp.where(use_mir, jnp.where(is_m2, mu2, mu1), mu)

    if "janus" in features:
        from booster_tpu.sampling.janus import janus_sample

        scales, types, pedantic, factors, eos_id = janus_tables
        j_tok = janus_sample(
            raw, state.prev_tokens, state.prev_pos, state.prompt_len,
            vp.max_predict, scales, types, pedantic, eos_id,
            SamplingParams(), step_key,
            depth=vp.janus_depth, hi=vp.janus_hi, lo=vp.janus_lo,
            scale=vp.janus_scale, tables_factors=factors,
        )
        tokens = jnp.where(vp.janus, j_tok, tokens)

    # push into history ring (masked rows keep their state untouched)
    N = state.prev_tokens.shape[1]
    idx = state.prev_pos % N
    write = tokens if mask is None else jnp.where(
        mask, tokens, state.prev_tokens[jnp.arange(B), idx]
    )
    prev = state.prev_tokens.at[jnp.arange(B), idx].set(write)
    pos = state.prev_pos + (1 if mask is None else mask.astype(jnp.int32))
    key_out = next_key if mask is None else jnp.where(mask[:, None], next_key, state.key)
    if mask is not None:
        mu = jnp.where(mask, mu, state.mirostat_mu)
    new_state = SamplerState(prev, pos, mu, key_out, state.prompt_len)
    return tokens, new_state
