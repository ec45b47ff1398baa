"""SentencePiece-style (SPM) tokenizer: score-driven greedy bigram merging.

Behavior parity: llm_tokenizer_spm (/root/reference/cpp/src/llama-vocab.cpp:190):
start from UTF-8 characters, repeatedly merge the adjacent pair whose
concatenation exists in the vocab with the highest score (ties broken by the
leftmost position), then emit token ids with `<0xXX>` byte fallback.
"""

from __future__ import annotations

import heapq

from booster_tpu.tokenizer.vocab import SPM_SPACE, Vocab


class SPMTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab

    def encode(self, text: str) -> list[int]:
        v = self.vocab
        if not text:
            return []
        text = text.replace(" ", SPM_SPACE)

        # doubly-linked list of symbols over the text
        chars = list(text)
        n = len(chars)
        sym_text = chars[:]  # symbol strings (None when merged away)
        prev = list(range(-1, n - 1))
        nxt = [i + 1 if i + 1 < n else -1 for i in range(n)]
        alive = [True] * n

        # heap of candidate merges: (-score, left_index, merged_text)
        heap: list[tuple[float, int, str]] = []

        def try_add(left: int) -> None:
            right = nxt[left]
            if right == -1:
                return
            merged = sym_text[left] + sym_text[right]
            tid = v.token_to_id.get(merged)
            if tid is not None:
                heapq.heappush(heap, (-float(v.scores[tid]), left, merged))

        for i in range(n - 1):
            try_add(i)

        while heap:
            _, left, merged = heapq.heappop(heap)
            if not alive[left]:
                continue
            right = nxt[left]
            # stale entry: symbols changed since this candidate was pushed
            if right == -1 or not alive[right] or sym_text[left] + sym_text[right] != merged:
                continue
            sym_text[left] = merged
            alive[right] = False
            nxt[left] = nxt[right]
            if nxt[right] != -1:
                prev[nxt[right]] = left
            try_add(left)
            if prev[left] != -1:
                try_add(prev[left])

        out: list[int] = []
        i = 0
        while i != -1:
            if alive[i]:
                piece = sym_text[i]
                tid = v.token_to_id.get(piece)
                if tid is not None:
                    out.append(tid)
                else:
                    # byte fallback, one token per UTF-8 byte
                    for b in piece.encode("utf-8"):
                        out.append(v.byte_token(b))
            i = nxt[i]
        return out

    def piece_to_text(self, token_id: int) -> bytes:
        """Token → raw bytes (decoding handles '▁'→' ' and `<0xXX>`)."""
        v = self.vocab
        t = v.tokens[token_id]
        from booster_tpu.tokenizer.vocab import TokenType

        ttype = v.token_types[token_id]
        if ttype == TokenType.BYTE:
            try:
                return bytes([int(t[1:-1], 16)])
            except ValueError:
                return t.encode("utf-8")
        return t.replace(SPM_SPACE, " ").encode("utf-8")
