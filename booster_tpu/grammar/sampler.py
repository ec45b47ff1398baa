"""Grammar-constrained token sampling.

Host-side automaton over UTF-8 codepoints (llama-grammar.cpp semantics):
for each candidate token, its piece text must be consumable by the grammar.
Token feasibility is evaluated lazily against the sampler's top candidates —
the reference applies the grammar to all candidates and resamples on
violation (common/sampling.cpp:430); we instead pick the best feasible token
from a descending-probability candidate list, which is equivalent for
greedy/top-k style sampling and avoids the full-vocab scan in the hot path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from booster_tpu.grammar.gbnf import (
    Grammar,
    advance_stacks,
    stacks_done,
)
from booster_tpu.tokenizer.core import Tokenizer


class GrammarSampler:
    """Per-sequence grammar state; call filter/accept around the sampler."""

    def __init__(self, grammar: Grammar, tokenizer: Tokenizer):
        self.grammar = grammar
        self.tokenizer = tokenizer
        self.stacks = grammar.start_stacks()
        # piece text per token id (decoded bytes → str, control tokens empty)
        self._pieces: list[Optional[str]] = [None] * tokenizer.vocab.n_tokens

    def _piece(self, token_id: int) -> str:
        p = self._pieces[token_id]
        if p is None:
            p = self.tokenizer.piece_bytes(token_id).decode("utf-8", errors="ignore")
            self._pieces[token_id] = p
        return p

    def _try_piece(self, text: str) -> Optional[list]:
        stacks = self.stacks
        for ch in text:
            stacks = advance_stacks(stacks, ord(ch), self.grammar.rules)
            if not stacks:
                return None
        return stacks

    def token_allowed(self, token_id: int) -> bool:
        if self.tokenizer.vocab.is_eog(token_id):
            return stacks_done(self.stacks)
        text = self._piece(token_id)
        if not text:
            return False
        return self._try_piece(text) is not None

    def pick(self, logits: np.ndarray, max_candidates: int = 512) -> int:
        """Highest-logit token whose piece the grammar accepts (desc scan)."""
        order = np.argsort(logits)[::-1]
        for token_id in order[:max_candidates]:
            if self.token_allowed(int(token_id)):
                return int(token_id)
        # fall back to full scan before giving up
        for token_id in order[max_candidates:]:
            if self.token_allowed(int(token_id)):
                return int(token_id)
        raise RuntimeError("no token satisfies the grammar")

    def mask(self, n_tokens: int) -> np.ndarray:
        """Boolean feasibility mask over the whole vocab (for on-device use).
        Memoized by automaton state: repeated grammar positions (e.g. JSON
        structure loops) reuse the scan."""
        key = repr(self.stacks)
        cached = getattr(self, "_mask_cache", None)
        if cached is None:
            cached = self._mask_cache = {}
        m = cached.get(key)
        if m is None or len(m) != n_tokens:
            m = np.fromiter(
                (self.token_allowed(t) for t in range(n_tokens)), bool, n_tokens
            )
            cached[key] = m
        return m

    def accept(self, token_id: int) -> None:
        """Advance the automaton past a sampled token."""
        if self.tokenizer.vocab.is_eog(token_id):
            return
        stacks = self._try_piece(self._piece(token_id))
        if stacks is None:
            raise ValueError(f"token {token_id} violates the grammar")
        self.stacks = stacks

    @property
    def can_stop(self) -> bool:
        return stacks_done(self.stacks)
