"""Vocabulary: token table, scores, types, special ids — from GGUF metadata."""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional

import numpy as np


class TokenType(enum.IntEnum):
    """Token attribute classes (interface parity: llama.h llama_token_type)."""

    UNDEFINED = 0
    NORMAL = 1
    UNKNOWN = 2
    CONTROL = 3
    USER_DEFINED = 4
    UNUSED = 5
    BYTE = 6


SPM_SPACE = "▁"  # '▁'


def gpt2_byte_encoder() -> dict[int, str]:
    """GPT-2 byte→unicode-char map (public algorithm from openai/gpt-2)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAD))
        + list(range(0xAE, 0x100))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


BYTE_ENCODER = gpt2_byte_encoder()
BYTE_DECODER = {v: k for k, v in BYTE_ENCODER.items()}


@dataclass
class Vocab:
    """Token table plus the metadata the tokenizers need."""

    model: str  # "llama" (SPM) | "gpt2" (BPE) | "bert" (WPM) | "t5" (UGM)
    pre: str  # pretokenizer id for BPE ("default", "llama3", ...)
    tokens: list[str]
    scores: np.ndarray  # float32 [n]
    token_types: np.ndarray  # int32 [n] of TokenType
    merges: list[str] = field(default_factory=list)  # "a b" pairs for BPE

    bos_id: int = -1
    eos_id: int = -1
    unk_id: int = -1
    sep_id: int = -1
    pad_id: int = -1
    eot_id: int = -1
    eom_id: int = -1

    add_bos: bool = True
    add_eos: bool = False
    add_space_prefix: bool = True
    ignore_merges: bool = False

    token_to_id: dict[str, int] = field(default_factory=dict)
    eog_ids: frozenset[int] = frozenset()

    def __post_init__(self):
        if not self.token_to_id:
            self.token_to_id = {t: i for i, t in enumerate(self.tokens)}
        eog = {i for i in (self.eos_id, self.eot_id, self.eom_id) if i >= 0}
        # any control token whose text ends a turn counts as end-of-generation
        for name in ("<|eot_id|>", "<|im_end|>", "<|end|>", "<end_of_turn>", "<|endoftext|>"):
            i = self.token_to_id.get(name)
            if i is not None and self.token_types[i] in (TokenType.CONTROL, TokenType.USER_DEFINED):
                eog.add(i)
        self.eog_ids = frozenset(eog)

    @property
    def n_tokens(self) -> int:
        return len(self.tokens)

    def is_eog(self, token_id: int) -> bool:
        """End-of-generation check (parity: llama_token_is_eog, llama.cpp)."""
        return token_id in self.eog_ids

    def is_control(self, token_id: int) -> bool:
        return self.token_types[token_id] == TokenType.CONTROL

    def byte_token(self, byte: int) -> int:
        """Byte-fallback token id for SPM vocabs (`<0xXX>` entries)."""
        tid = self.token_to_id.get(f"<0x{byte:02X}>")
        if tid is None:
            return self.unk_id
        return tid

    # -- construction --------------------------------------------------------

    @classmethod
    def from_gguf_metadata(cls, md: Mapping[str, Any]) -> "Vocab":
        tokens = list(md["tokenizer.ggml.tokens"])
        n = len(tokens)
        scores = np.asarray(
            md.get("tokenizer.ggml.scores", np.zeros(n, np.float32)), dtype=np.float32
        )
        types = np.asarray(
            md.get("tokenizer.ggml.token_type", np.full(n, TokenType.NORMAL, np.int32)),
            dtype=np.int32,
        )
        model = str(md.get("tokenizer.ggml.model", "llama"))
        # SPM and BPE defaults mirror llm_load_vocab (llama.cpp:6025-6230)
        is_spm = model == "llama"
        v = cls(
            model=model,
            pre=str(md.get("tokenizer.ggml.pre", "default")),
            tokens=tokens,
            scores=scores,
            token_types=types,
            merges=list(md.get("tokenizer.ggml.merges", [])),
            bos_id=int(md.get("tokenizer.ggml.bos_token_id", 1 if is_spm else 11)),
            eos_id=int(md.get("tokenizer.ggml.eos_token_id", 2 if is_spm else 11)),
            unk_id=int(md.get("tokenizer.ggml.unknown_token_id", 0 if is_spm else -1)),
            sep_id=int(md.get("tokenizer.ggml.seperator_token_id", -1)),
            pad_id=int(md.get("tokenizer.ggml.padding_token_id", -1)),
            eot_id=int(md.get("tokenizer.ggml.eot_token_id", -1)),
            eom_id=int(md.get("tokenizer.ggml.eom_token_id", -1)),
            add_bos=bool(md.get("tokenizer.ggml.add_bos_token", is_spm)),
            add_eos=bool(md.get("tokenizer.ggml.add_eos_token", False)),
            add_space_prefix=bool(md.get("tokenizer.ggml.add_space_prefix", is_spm)),
            ignore_merges=str(md.get("tokenizer.ggml.pre", "")) in ("llama3", "llama-bpe"),
        )
        return v

    def special_tokens(self) -> list[tuple[str, int]]:
        """Special (control / user-defined) tokens, longest-first, for the
        text partition pass (parity: tokenizer_st_partition, llama-vocab.cpp)."""
        out = [
            (t, i)
            for i, t in enumerate(self.tokens)
            if self.token_types[i] in (TokenType.CONTROL, TokenType.USER_DEFINED)
            and len(t) > 0
        ]
        out.sort(key=lambda p: -len(p[0]))
        return out
