"""Host-side (numpy) sampler chain for paths that live on the host anyway
(grammar-constrained decoding runs its automaton between device steps).

Mirrors llama_sampling_sample_impl (/root/reference/cpp/common/sampling.cpp:
430 flow): penalties over the last penalty_last_n accepted tokens, then the
samplers_sequence filters, then temperature — returning shaped logits with
filtered-out entries at -inf, ready for categorical sampling or grammar
masking.
"""

from __future__ import annotations

import numpy as np

from booster_tpu.sampling.params import SamplingParams

NEG_INF = -np.inf


def host_filter_chain(
    row: np.ndarray,  # [V] raw logits
    params: SamplingParams,
    history: list[int],  # accepted tokens, prompt first (oldest → newest)
    nl_token: int = -1,
) -> np.ndarray:
    """Returns [V] f32: temperature-scaled logits, non-survivors at -inf."""
    lg = row.astype(np.float64).copy()
    V = lg.shape[0]

    # penalties over the window (llama_sample_repetition_penalties_impl)
    if (params.penalty_repeat != 1.0 or params.penalty_freq != 0.0
            or params.penalty_present != 0.0) and history:
        window = history[-params.penalty_last_n:] if params.penalty_last_n > 0 else history
        nl_saved = lg[nl_token] if (not params.penalize_nl and 0 <= nl_token < V) else None
        counts = np.bincount(np.asarray(window), minlength=V)[:V]
        seen = counts > 0
        if params.penalty_repeat != 1.0:
            scaled = np.where(lg <= 0, lg * params.penalty_repeat,
                              lg / params.penalty_repeat)
            lg = np.where(seen, scaled, lg)
        lg -= counts * params.penalty_freq + seen * params.penalty_present
        if nl_saved is not None:
            lg[nl_token] = nl_saved

    def softmax(x):
        e = np.exp(x - np.max(x))
        return e / e.sum()

    for ch in params.samplers_sequence:
        if ch == "k" and 0 < params.top_k < V:
            kth = np.partition(lg, -params.top_k)[-params.top_k]
            lg[lg < kth] = NEG_INF
        elif ch == "p" and params.top_p < 1.0:
            order = np.argsort(lg)[::-1]
            probs = softmax(lg[order])
            cum = np.cumsum(probs)
            keep = (cum - probs) < params.top_p
            keep[0] = True
            cutoff = lg[order[np.sum(keep) - 1]]
            lg[lg < cutoff] = NEG_INF
        elif ch == "m" and params.min_p > 0.0:
            thresh = np.max(lg) + np.log(params.min_p)
            best = np.argmax(lg)
            mask = lg < thresh
            mask[best] = False
            lg[mask] = NEG_INF
        elif ch == "f" and params.tfs_z < 1.0:
            order = np.argsort(lg)[::-1]
            probs = softmax(lg[order])
            if len(probs) >= 3:
                d2 = np.abs(np.diff(probs, n=2))
                s = d2.sum()
                d2 = d2 / s if s > 0 else np.full_like(d2, 1.0 / len(d2))
                cum = np.cumsum(d2)
                keep_n = max(1, int(np.sum(cum < params.tfs_z)) + 1)
                cutoff = lg[order[keep_n - 1]]
                lg[lg < cutoff] = NEG_INF
        elif ch == "y" and params.typical_p < 1.0:
            finite = np.isfinite(lg)
            p = softmax(np.where(finite, lg, -1e30))
            with np.errstate(divide="ignore"):
                logp = np.log(p)
            ent = -np.sum(np.where(p > 0, p * logp, 0.0))
            shifted = np.abs(-logp - ent)
            order = np.argsort(shifted)
            ps = p[order]
            cum = np.cumsum(ps)
            keep = (cum - ps) < params.typical_p
            keep[0] = True
            drop = np.ones(V, bool)
            drop[order[: np.sum(keep)]] = False
            lg[drop] = NEG_INF
        elif ch == "t":
            t = max(params.temp, 1e-6)
            lg = lg / t

    if "t" not in params.samplers_sequence:
        lg = lg / max(params.temp, 1e-6)
    return lg.astype(np.float32)
