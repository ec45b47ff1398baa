"""Byte-level BPE tokenizer (GPT-2 family, LLaMA-3, Qwen-2, Falcon, ...).

Behavior parity: llm_tokenizer_bpe (/root/reference/cpp/src/llama-vocab.cpp:340):
pretokenizer regex split (per-model regex set keyed by ``tokenizer.ggml.pre``),
GPT-2 byte→unicode mapping, then rank-based pair merging from
``tokenizer.ggml.merges``.  The regex sets are the models' public
tokenizer.json pretokenizers.
"""

from __future__ import annotations

import regex

from booster_tpu.tokenizer.vocab import BYTE_ENCODER, Vocab

# Pretokenizer regex sets, keyed by canonical pre name.  Python `regex`
# supports \p{...}, (?i:) and lookahead, so the original tokenizer.json
# expressions are used directly.
_LLAMA3 = r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
_GPT2 = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
_QWEN2 = r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"

PRETOKENIZERS: dict[str, list[str]] = {
    "default": [
        r"[\p{P}\$\+<=>\^~\|]+",
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)",
        r"\p{N}+",
        r"[0-9][0-9][0-9]",
    ],
    "llama3": [_LLAMA3],
    "llama-bpe": [_LLAMA3],
    "dbrx": [_LLAMA3],
    "smaug-bpe": [_LLAMA3],
    "chatglm-bpe": [_LLAMA3],
    "gpt-2": [_GPT2],
    "gpt2": [_GPT2],
    "phi-2": [_GPT2],
    "mpt": [_GPT2],
    "olmo": [_GPT2],
    "jais": [_GPT2],
    "qwen2": [_QWEN2],
    "stablelm2": [_QWEN2],
    "falcon": [
        r"[\p{P}\$\+<=>\^~\|`]+",
        r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)",
        r"[0-9][0-9][0-9]",
    ],
    "starcoder": [r"\p{N}", _GPT2],
    "refact": [r"\p{N}", _GPT2],
    "command-r": [r"\p{N}", _GPT2],
    "smollm": [r"\p{N}", _GPT2],
    "codeshell": [r"\p{N}", _GPT2],
    "deepseek-coder": [r"[\r\n]", r"\s?\p{L}+", r"\s?\p{P}+", r"[一-龥ࠀ-一가-퟿]+", r"\p{N}"],
    "poro-chat": [r" ?[^(\s|.,!?…。，、।۔،)]+"],
    "viking": [r" ?[^(\s|.,!?…。，、।۔،)]+", r"\p{N}"],
    "tekken": [
        r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+"
    ],
}


def _split_cascade(text: str, patterns: list[regex.Pattern]) -> list[str]:
    """Apply regex split sets in sequence: each pattern further splits the
    fragments produced by the previous one; matched spans become atomic."""
    frags = [(text, False)]  # (fragment, is_final)
    for pat in patterns:
        out: list[tuple[str, bool]] = []
        for frag, final in frags:
            if final:
                out.append((frag, True))
                continue
            pos = 0
            for m in pat.finditer(frag):
                if m.start() > pos:
                    out.append((frag[pos : m.start()], False))
                if m.group():
                    out.append((m.group(), True))
                pos = m.end()
            if pos < len(frag):
                out.append((frag[pos:], False))
        frags = out
    return [f for f, _ in frags]


class BPETokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        names = PRETOKENIZERS.get(vocab.pre, PRETOKENIZERS["default"])
        self._patterns = [regex.compile(p) for p in names]
        self._ranks: dict[tuple[str, str], int] = {}
        for rank, merge in enumerate(vocab.merges):
            a, sep, b = merge.partition(" ")
            if sep:
                self._ranks[(a, b)] = rank

    def _bpe_word(self, word: str) -> list[str]:
        parts = list(word)
        if len(parts) < 2:
            return parts
        while True:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self._ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_i < 0:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return parts

    def encode(self, text: str) -> list[int]:
        v = self.vocab
        out: list[int] = []
        for frag in _split_cascade(text, self._patterns):
            mapped = "".join(BYTE_ENCODER[b] for b in frag.encode("utf-8"))
            if v.ignore_merges:
                # LLaMA-3: whole-word vocab hit short-circuits the merge loop
                tid = v.token_to_id.get(mapped)
                if tid is not None:
                    out.append(tid)
                    continue
            for piece in self._bpe_word(mapped):
                tid = v.token_to_id.get(piece)
                if tid is not None:
                    out.append(tid)
                else:
                    # unknown piece: emit per-char ids (byte-level vocabs
                    # always contain all 256 single-byte tokens)
                    for ch in piece:
                        ctid = v.token_to_id.get(ch)
                        if ctid is not None:
                            out.append(ctid)
                        elif v.unk_id >= 0:
                            out.append(v.unk_id)
        return out

    def piece_to_text(self, token_id: int) -> bytes:
        from booster_tpu.tokenizer.vocab import BYTE_DECODER

        t = self.vocab.tokens[token_id]
        try:
            return bytes(BYTE_DECODER[c] for c in t)
        except KeyError:
            return t.encode("utf-8")
