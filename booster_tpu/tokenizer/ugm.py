"""UGM (Unigram, T5-family) tokenizer: Viterbi over vocab log-probs.

Behavior parity: llm_tokenizer_ugm (/root/reference/cpp/src/llama-vocab.cpp:744)
minus the precompiled_charsmap normalization (that blob, when present in the
GGUF, encodes sentencepiece's NFKC-ish normalizer; we apply NFKC + the
space→▁ replacement, which matches it for the common cases).  Unknown
codepoints take the UNK path with the same escaped-token penalty structure.
"""

from __future__ import annotations

import unicodedata

from booster_tpu.tokenizer.vocab import SPM_SPACE, Vocab


class UGMTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self._max_len = max((len(t) for t in vocab.tokens), default=1)
        # unknown-token penalty: below every real token score
        scores = vocab.scores
        finite = scores[scores > -1e20]
        self._min_score = float(finite.min()) if finite.size else -20.0
        self._unk_penalty = self._min_score - 10.0

    def encode(self, text: str) -> list[int]:
        v = self.vocab
        if not text:
            return []
        norm = unicodedata.normalize("NFKC", text)
        if v.add_space_prefix and not norm.startswith(" "):
            norm = " " + norm
        s = norm.replace(" ", SPM_SPACE)
        n = len(s)

        # Viterbi: best[i] = (score, token_id, prev_index) ending at char i
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: list[tuple[int, int]] = [(-1, -1)] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == NEG:
                continue
            for j in range(i + 1, min(n, i + self._max_len) + 1):
                tid = v.token_to_id.get(s[i:j])
                if tid is not None:
                    sc = best[i] + float(v.scores[tid])
                    if sc > best[j]:
                        best[j] = sc
                        back[j] = (i, tid)
            # unk fallback: single char with penalty
            sc = best[i] + self._unk_penalty
            if sc > best[i + 1]:
                best[i + 1] = sc
                back[i + 1] = (i, v.unk_id)

        out: list[int] = []
        i = n
        while i > 0:
            prev, tid = back[i]
            out.append(tid if tid >= 0 else v.unk_id)
            i = prev
        out.reverse()
        # merge adjacent UNKs (sentencepiece behavior)
        merged: list[int] = []
        for t in out:
            if merged and t == v.unk_id and merged[-1] == v.unk_id:
                continue
            merged.append(t)
        return merged

    def piece_to_text(self, token_id: int) -> bytes:
        return self.vocab.tokens[token_id].replace(SPM_SPACE, " ").encode("utf-8")
