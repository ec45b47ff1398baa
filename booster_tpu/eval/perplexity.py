"""Perplexity over a token stream (llama-perplexity analog; the upstream tool
is named in /root/reference/cpp/Makefile:5-40 but not vendored there)."""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from booster_tpu.models.llama import forward
from booster_tpu.ops.kv_cache import KVCache


@partial(jax.jit, static_argnames=("cfg",))
def _chunk_nll(params, cfg, tokens, cache):
    """Sum NLL of tokens[1:] given tokens[:-1] plus count."""
    logits, _ = forward(params, cfg, tokens, cache, last_only=False)
    lp = jax.nn.log_softmax(logits[:, :-1, :].astype(jnp.float32), axis=-1)
    targets = tokens[:, 1:]
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    return nll.sum(), targets.size


def perplexity(
    model,
    token_ids: list[int] | np.ndarray,
    n_ctx: int = 512,
    progress: Optional[callable] = None,
) -> dict:
    """Sliding non-overlapping chunks of n_ctx; returns {'ppl', 'nll', 'tokens'}."""
    cfg = model.cfg
    ids = np.asarray(token_ids, np.int32)
    n_chunks = len(ids) // n_ctx
    if n_chunks == 0:
        raise ValueError(f"need at least {n_ctx} tokens, got {len(ids)}")
    total_nll = 0.0
    total_tok = 0
    for i in range(n_chunks):
        chunk = ids[i * n_ctx : (i + 1) * n_ctx][None, :]
        cache = KVCache.create(
            cfg.n_layers, 1, n_ctx, cfg.n_kv_heads, cfg.head_dim
        )
        nll, count = _chunk_nll(model.params, cfg, jnp.asarray(chunk), cache)
        total_nll += float(nll)
        total_tok += int(count)
        if progress:
            progress(i + 1, n_chunks, float(np.exp(total_nll / total_tok)))
    return {
        "ppl": float(np.exp(total_nll / total_tok)),
        "nll": total_nll / total_tok,
        "tokens": total_tok,
    }
