"""Speculative decoding: a small draft model proposes K tokens, the target
verifies them in one batched forward (batching the verify is nearly free on
TPU — the M=1 matvec is MXU-feed-bound, so M=K+1 costs the same).

The reference ships only a vestigial lookup-decoding cache
(/root/reference/cpp/common/ngram-cache.cpp, not linked); this is the
full draft-model scheme.  Greedy verification: accept the longest prefix
where the target's argmax equals the draft token — output is exactly the
target's greedy sequence, draft quality only affects speed.
"""

from __future__ import annotations

import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from booster_tpu.models.llama import forward
from booster_tpu.sampling import SamplingParams
from booster_tpu.sampling.samplers import make_sampler_state
from booster_tpu.serving.engine import Engine, GenerationResult, _decode_chunk

_GREEDY = SamplingParams(temp=0.0, penalty_repeat=1.0)


def _rewind(engine: Engine, cache, n: int):
    """Set slot-0 length to n (stale KV beyond n is overwritten later)."""
    import dataclasses

    return dataclasses.replace(cache, lengths=cache.lengths.at[0].set(n))


def generate_speculative(
    target: Engine,
    draft: Engine,
    prompt_ids: list[int],
    max_new_tokens: int = 128,
    k: int = 8,
    stop_check=None,
    on_token=None,
) -> GenerationResult:
    """Greedy speculative decoding on slot 0 of both engines."""
    if target.tokenizer is None:
        raise ValueError("speculative decoding needs a tokenizer")
    tcfg, dcfg = target.cfg, draft.cfg
    vocab = target.tokenizer.vocab

    t_cache = target._new_cache()
    d_cache = draft._new_cache()
    tb, db = target.max_batch, draft.max_batch

    t_ids = np.zeros((tb, len(prompt_ids)), np.int32)
    t_ids[0] = prompt_ids
    d_ids = np.zeros((db, len(prompt_ids)), np.int32)
    d_ids[0] = prompt_ids

    t0 = time.perf_counter()
    t_logits, t_cache = forward(target.params, tcfg, jnp.asarray(t_ids), t_cache, last_only=True)
    _, d_cache = forward(draft.params, dcfg, jnp.asarray(d_ids), d_cache, last_only=True)
    first = int(np.asarray(t_logits)[0, -1].argmax())
    t_prompt = time.perf_counter() - t0

    generated = [first]
    d_state = make_sampler_state(db, 8, seed=0)
    d_eog = jnp.zeros(dcfg.n_vocab, bool)
    if on_token:
        on_token(first)
    finish = "length"
    n_accepted_total = 0
    n_rounds = 0

    t1 = time.perf_counter()
    base = len(prompt_ids)  # tokens in both caches (excluding pending)
    while len(generated) < max_new_tokens and not (vocab.is_eog(generated[-1])):
        if stop_check and stop_check():
            finish = "cancelled"
            break
        if base + k + 2 >= min(target.max_seq, draft.max_seq):
            finish = "length"
            break
        # 1. draft proposes k greedy tokens in ONE device dispatch
        cur = np.zeros((db, 1), np.int32)
        cur[0, 0] = generated[-1]
        d_cache = _rewind(draft, d_cache, base)
        d_toks, _, d_cache, d_state = _decode_chunk(
            draft.params, dcfg, d_cache, jnp.asarray(cur), d_state,
            _GREEDY, jnp.float32(k), k, d_eog,
        )
        prop_np = [int(t) for t in np.asarray(d_toks)[0]]

        # 2. target verifies [last, p1..pk] in one forward
        ver = np.zeros((tb, k + 1), np.int32)
        ver[0] = [generated[-1]] + prop_np
        t_cache = _rewind(target, t_cache, base)
        v_logits, t_cache = forward(
            target.params, tcfg, jnp.asarray(ver), t_cache, last_only=False
        )
        greedy = np.asarray(v_logits)[0].argmax(-1)  # [k+1]

        # 3. accept longest matching prefix + the target's correction token
        accepted = []
        for i in range(k):
            if greedy[i] == prop_np[i]:
                accepted.append(prop_np[i])
            else:
                break
        correction = int(greedy[len(accepted)])
        new_tokens = accepted + [correction]
        base += 1 + len(accepted)  # last + accepted now final in both caches
        n_accepted_total += len(accepted)
        n_rounds += 1

        for t in new_tokens:
            if len(generated) >= max_new_tokens:
                break
            generated.append(t)
            if on_token:
                on_token(t)
            if vocab.is_eog(t):
                finish = "stop"
                break
        if finish == "stop":
            break
    if generated and vocab.is_eog(generated[-1]):
        finish = "stop"
        generated.pop()
    t_gen = time.perf_counter() - t1

    result = GenerationResult(
        token_ids=generated,
        text=target.tokenizer.decode(generated),
        n_prompt=len(prompt_ids),
        n_generated=len(generated),
        prompt_ms_per_token=1000.0 * t_prompt / max(len(prompt_ids), 1),
        gen_ms_per_token=1000.0 * t_gen / max(len(generated), 1),
        finish_reason=finish,
    )
    result.acceptance_rate = n_accepted_total / max(n_rounds * k, 1)
    return result
