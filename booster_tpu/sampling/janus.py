"""Janus Sampling — language/typography-aware logit shaping, on device.

Reference: sample_janus_token + initJanus (/root/reference/cpp/janus.cpp:191,
:410).  Redesigned for TPU: the per-vocab scales[]/types[]/pedantic[] tables
are precomputed once on host at model load (JanusTables.build); the per-token
step is pure vectorized jnp — occurrence counts replace the reference's
per-position loop (a token appearing c times in the depth window is scaled by
factor^c, exactly like c sequential multiplications), and the full-vocab sort
is replaced by threshold masking against the top logit (identical shortlist).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from booster_tpu.sampling.params import SamplingParams
from booster_tpu.tokenizer.core import Tokenizer

# language classes (janus.h:28-36)
LANG_ZERO = 0
LANG_EN = 2
LANG_RU = 3
LANG_OTHER = 4
SPACE_EN = 20
SPACE_RU = 30
SPACE_OTHER = 40

_NUMBER_RE = re.compile(rb"^[ \t\n\v\f\r]*[+-]?[0-9]+$")
_PEDANTIC_LITERALS = {
    b" *", b" =", b" -", b" +",
    b"{", b"}", b"[", b"]",
    b" {", b" }", b" [", b" ]",
    b"<|end_of_text|>", b"```",
}


def tok_type(piece: bytes) -> int:
    """UTF-8 byte-level language classifier (janus.cpp tokType :723-823)."""
    en = ru = other = 0
    space = len(piece) > 0 and piece[0] == 0x20
    i = 0
    n = len(piece)
    while i < n:
        b = piece[i]
        if (0x41 <= b <= 0x5A) or (0x61 <= b <= 0x7A):
            en += 1
            i += 1
            continue
        if b < 0x80:
            i += 1
            continue
        if b == 0xD0 and i + 1 < n:
            b2 = piece[i + 1]
            if (0x90 <= b2 <= 0xBF) or b2 == 0x81:
                ru += 1
            else:
                other += 1
            i += 2
            continue
        if b == 0xD1 and i + 1 < n:
            b2 = piece[i + 1]
            if (0x80 <= b2 <= 0x8F) or b2 == 0x91:
                ru += 1
            else:
                other += 1
            i += 2
            continue
        if 0xC3 <= b < 0xE3:
            other += 1
            i += 2
            continue
        if 0xE3 <= b < 0xF0:
            other += 1
            i += 3
            continue
        if b >= 0xF0:
            i += 4
            continue
        i += 1
    if space:
        if other:
            return SPACE_OTHER
        if en:
            return SPACE_EN
        if ru:
            return SPACE_RU
    if other:
        return LANG_OTHER
    if en:
        return LANG_EN
    if ru:
        return LANG_RU
    return LANG_ZERO


def is_lower(piece: bytes) -> bool:
    """janus.cpp isLower :826-856 (EN + RU only)."""
    if not piece:
        return False
    b0 = piece[0]
    if 0x61 <= b0 <= 0x7A:
        return True
    if b0 == 0xD0 and len(piece) >= 2 and 0xB0 <= piece[1] <= 0xBF:
        return True
    if b0 == 0xD1 and len(piece) >= 2 and (0x80 <= piece[1] <= 0x8F or piece[1] == 0x91):
        return True
    return False


def is_pedantic(piece: bytes) -> bool:
    """janus.cpp isPedantic :381-404 (numbers, math ops, JSON, code fences)."""
    if len(piece) == 0:  # strtol("") consumes nothing; *endptr == 0 → pedantic
        return True
    if _NUMBER_RE.match(piece):
        return True
    return piece in _PEDANTIC_LITERALS


# probes table (janus.cpp:474-478): word-length-indexed partial penalties
_PROBES = np.array(
    [0.20, 0.22, 0.25, 0.28, 0.30, 0.32, 0.33, 0.35, 0.36, 0.38,
     0.40, 0.42, 0.44, 0.45, 0.46, 0.48, 0.50, 0.52, 0.53, 0.55],
    dtype=np.float32,
)


@dataclass(frozen=True)
class JanusTables:
    """Per-vocab precomputed tables (host numpy; moved to device once).

    `factors` is the scale-independent penalty-strength table: every entry of
    `scales` has the form 1 − (1 − janus_scale)·factor (initJanus only ever
    assigns that shape, janus.cpp:537-701), so a *per-request* janus_scale
    (the reference passes scale per pod, bridge.cpp:734,759) needs no table
    rebuild — the sampler recomputes scales on device as an affine function
    of the row's scale."""

    scales: np.ndarray  # [V] f32 (at the default build scale)
    types: np.ndarray  # [V] int32
    pedantic: np.ndarray  # [V] bool
    eos_id: int
    factors: np.ndarray = None  # [V] f32 scale-independent strengths

    @classmethod
    def build(cls, tokenizer: Tokenizer, params: SamplingParams | None = None) -> "JanusTables":
        params = (params or SamplingParams()).normalized()
        scale = params.janus_scale
        vocab = tokenizer.vocab
        V = vocab.n_tokens

        pieces = [tokenizer.piece_bytes(i, special=True) for i in range(V)]
        types = np.array([tok_type(p) for p in pieces], np.int32)
        pedantic = np.array([is_pedantic(p) for p in pieces], bool)
        lowers = np.array([is_lower(p) for p in pieces], bool)
        lens = np.array([len(p) for p in pieces], np.int32)

        # scale-independent strengths: scales = 1 - (1 - scale) * factors
        factors = np.ones(V, np.float32)
        # pedantic tokens: light touch
        factors[pedantic] = 0.20
        # lowercase RU: length-dependent partial penalty (len/2 UTF-8 chars)
        ru_lower = (types == LANG_RU) & lowers & ~pedantic
        idx = np.clip(lens[ru_lower] // 2, 0, len(_PROBES) - 1)
        factors[ru_lower] = _PROBES[idx]
        # lowercase EN
        en_lower = (types == LANG_EN) & lowers & ~pedantic
        idx = np.clip(lens[en_lower], 0, len(_PROBES) - 1)
        factors[en_lower] = _PROBES[idx]

        # vocab-position heuristics (janus.cpp llama-3 branch, generalized to
        # relative vocab position so llama-2-sized vocabs behave equivalently)
        def set_piece(text: bytes, factor: float):
            for i, p in enumerate(pieces):
                if p == text:
                    factors[i] = factor

        set_piece(b"\n", 0.10)
        set_piece(b"\n\n", 0.10)
        set_piece(b"  ", 0.20)
        set_piece(b"    ", 0.20)
        set_piece(b" ", 0.10)
        set_piece(b",", 0.10)
        set_piece(b".", 0.10)
        for t in (b" \xe2\x80\x94", b"-", b":", b";", b" (", b").", b" )", b")", b"("):
            set_piece(t, 0.30)

        # popular sentence-starting tokens: earlier vocab ids = more frequent
        bands = [(0.0, 0.156, 0.30), (0.156, 0.273, 0.40), (0.273, 0.39, 0.50)]
        rel = np.arange(V, dtype=np.float64) / max(V, 1)
        for lo, hi, factor in bands:
            in_band = (rel >= lo) & (rel < hi) & (types == SPACE_RU)
            factors[in_band] = factor
        en_bands = [(0, 500, 0.30), (500, 800, 0.40), (800, 1100, 0.50)]
        ids = np.arange(V)
        for lo, hi, factor in en_bands:
            in_band = (ids >= lo) & (ids < hi) & (types == SPACE_EN)
            factors[in_band] = factor

        factors[0] = 0.0
        eos = vocab.eos_id if vocab.eos_id >= 0 else 0
        factors[eos] = 1.0
        if vocab.eot_id >= 0:
            factors[vocab.eot_id] = 1.0
        scales = (1.0 - (1.0 - scale) * factors).astype(np.float32)
        return cls(scales=scales, types=types, pedantic=pedantic, eos_id=eos,
                   factors=factors)


def janus_sample(
    logits: jnp.ndarray,  # [B, V]
    last_tokens: jnp.ndarray,  # [B, N] ring of accepted tokens (-1 = empty)
    prev_pos: jnp.ndarray,  # [B] total accepted tokens (ring idx = pos % N)
    prompt_len: jnp.ndarray,  # [B] accepted tokens that came from the prompt
    max_predict,  # scalar or [B] (static or traced): predict limit, EOS boost
    tables_scales: jnp.ndarray,  # [V]
    tables_types: jnp.ndarray,  # [V]
    tables_pedantic: jnp.ndarray,  # [V] bool
    eos_id: int,
    params: SamplingParams,
    key: jnp.ndarray,  # [B, 2] per-slot keys
    depth=None,  # [B] i32 per-row override of params.janus_depth
    hi=None,  # [B] f32 per-row override of params.janus_hi
    lo=None,  # [B] f32 per-row override of params.janus_lo
    scale=None,  # [B] f32 per-row janus_scale (needs tables_factors)
    tables_factors=None,  # [V] scale-independent strengths (JanusTables.factors)
) -> jnp.ndarray:
    """Vectorized sample_janus_token (janus.cpp:191-331).

    The repeat-pessimization window covers *generated* tokens only
    (depth = min(depth, pos − promptLen), janus.cpp:239) while lastToken is
    the most recent accepted token — at the first sample that is the last
    prompt token, exactly like the reference's full-context ring."""
    p = params.normalized()
    B, V = logits.shape
    logits = logits.astype(jnp.float32)
    n_generated = prev_pos - prompt_len

    valid = last_tokens >= 0
    tok = jnp.where(valid, last_tokens, 0)

    # most recent accepted token lives at ring slot (prev_pos - 1) mod N
    N = last_tokens.shape[1]
    has_any = prev_pos > 0
    last_idx = jnp.mod(prev_pos - 1, N)
    last_tok = jnp.where(has_any, tok[jnp.arange(B), last_idx], 0)
    last_type = tables_types[last_tok]
    last_is_ru = (last_type == SPACE_RU) | (last_type == LANG_RU)

    # 1. EOS boost toward the predict limit
    max_p = jnp.asarray(max_predict, jnp.float32)
    boost = 1.0 + jnp.log1p(n_generated.astype(jnp.float32) / max_p) * 0.05
    logits = logits.at[:, eos_id].multiply(jnp.reshape(boost, (B,)))

    # 2. depth-limited repeat pessimization: factor^count per token
    d = p.janus_depth if depth is None else depth
    eff_depth = jnp.minimum(d, n_generated)  # [B]
    recency = jnp.mod(prev_pos[:, None] - 1 - jnp.arange(N)[None, :], N)  # 0 = newest
    in_window = valid & (recency < eff_depth[:, None]) & (recency < prev_pos[:, None])
    counts = jnp.zeros((B, V), jnp.float32).at[
        jnp.arange(B)[:, None], tok
    ].add(in_window.astype(jnp.float32))

    if scale is not None and tables_factors is not None:
        # per-row janus_scale: the table is affine in scale (see
        # JanusTables.factors), so per-request scale (bridge.cpp:734,759)
        # is one [B, V] outer product on device, no host table rebuild
        scales_v = 1.0 - (1.0 - jnp.reshape(scale, (B, 1))) * tables_factors[None, :]
    else:
        scales_v = tables_scales[None, :]  # [1, V]
    ru_cont = last_is_ru[:, None] & (tables_types[None, :] == LANG_RU)
    factor = jnp.where(ru_cont, 1.0 - (1.0 - scales_v) * 0.20, scales_v)
    logits = logits * jnp.power(factor, counts)

    # 3. cross-language incompatibility ×0.5
    incompat = last_is_ru[:, None] & (
        (tables_types[None, :] == LANG_EN) | (tables_types[None, :] == LANG_OTHER)
    )
    logits = jnp.where(incompat, logits * 0.5, logits)

    # 4. relative-logit cutoff: hi for pedantic/EN/RU top token, else lo
    top_idx = jnp.argmax(logits, axis=-1)
    top_logit = logits[jnp.arange(B), top_idx]
    top_type = tables_types[top_idx]
    use_hi = (
        tables_pedantic[top_idx] | (top_type == LANG_RU) | (top_type == LANG_EN)
    )
    hi_v = p.janus_hi if hi is None else hi
    lo_v = p.janus_lo if lo is None else lo
    cutoff = jnp.where(use_hi, hi_v, lo_v)
    # reference truncates the desc-sorted list at the first logit/top < cutoff.
    # The elementwise ratio test is equivalent in every sign case: top > 0 →
    # identical thresholds; top < 0 → every ratio ≥ 1 ≥ cutoff so neither
    # truncates; mixed signs → both drop exactly the negative tail
    # (property-tested against a sort-based reimplementation in
    # tests/test_sampling.py).
    keep = (logits / top_logit[:, None] >= cutoff[:, None]) | (
        jnp.arange(V)[None, :] == top_idx[:, None]
    )
    shortlist = jnp.where(keep, logits, -jnp.inf)

    # 5. sample ∝ softmax over the shortlist (llama_sample_token)
    return jax.vmap(lambda k, lg: jax.random.categorical(k, lg))(key, shortlist).astype(
        jnp.int32
    )
