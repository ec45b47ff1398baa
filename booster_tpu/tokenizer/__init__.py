"""Tokenizers constructed from GGUF vocab metadata.

Supported models (``tokenizer.ggml.model``):
  - ``llama``  — SentencePiece-style score-driven BPE (SPM) with byte fallback
  - ``gpt2``   — byte-level BPE with pretokenizer regex sets keyed by
                 ``tokenizer.ggml.pre`` (llama3, qwen2, falcon, gpt2, ...)

Reference behavior: /root/reference/cpp/src/llama-vocab.cpp
(llm_tokenizer_spm :190, llm_tokenizer_bpe :340, special-token partition
 tokenizer_st_partition).
"""

from booster_tpu.tokenizer.vocab import TokenType, Vocab
from booster_tpu.tokenizer.core import Tokenizer, StreamDetokenizer

__all__ = ["TokenType", "Vocab", "Tokenizer", "StreamDetokenizer"]
