"""WPM (WordPiece, BERT-family) tokenizer.

Behavior parity: llm_tokenizer_wpm (/root/reference/cpp/src/llama-vocab.cpp:632):
NFD-normalize + lowercase, split on whitespace / punctuation / CJK chars,
then greedy longest-match against the vocab with a phantom '▁' prefix per
word; unmatched words become UNK.
"""

from __future__ import annotations

import unicodedata

from booster_tpu.tokenizer.vocab import SPM_SPACE, Vocab


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B920 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


class WPMTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self._max_len = max((len(t) for t in vocab.tokens), default=1)

    def _preprocess(self, text: str) -> list[str]:
        words: list[str] = [""]
        for ch in unicodedata.normalize("NFD", text):
            cat = unicodedata.category(ch)
            if ch.isspace():
                if words[-1]:
                    words.append("")
                continue
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or cat.startswith("C"):
                continue
            low = ch.lower()
            is_punct = cat.startswith("P")
            is_sym = cp < 0x7F and cat.startswith("S")
            if is_punct or is_sym or _is_cjk(cp):
                if words[-1]:
                    words.append("")
                words[-1] = low
                words.append("")
            else:
                words[-1] += low
        return words

    def encode(self, text: str) -> list[int]:
        v = self.vocab
        out: list[int] = []
        for word in self._preprocess(text):
            if not word:
                continue
            word1 = SPM_SPACE + word
            n = len(word1)
            start_len = len(out)
            i = 0
            failed = False
            while i < n:
                match = False
                for j in range(min(n, i + self._max_len + 1), i, -1):
                    tid = v.token_to_id.get(word1[i:j])
                    if tid is not None:
                        out.append(tid)
                        i = j
                        match = True
                        break
                if not match:
                    del out[start_len:]
                    failed = True
                    break
            if failed or len(out) == start_len:
                if v.unk_id >= 0:
                    out.append(v.unk_id)
        return out

    def piece_to_text(self, token_id: int) -> bytes:
        return self.vocab.tokens[token_id].replace(SPM_SPACE, " ").encode("utf-8")
