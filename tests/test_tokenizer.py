"""Tokenizer tests: hand-built SPM vocab, BPE vs HuggingFace golden, streaming."""

import numpy as np
import pytest

from booster_tpu.tokenizer import StreamDetokenizer, Tokenizer, TokenType, Vocab
from booster_tpu.tokenizer.vocab import BYTE_ENCODER


def make_spm_vocab():
    # base symbols + merge chain for "▁hello" / "▁world"
    toks = ["<unk>", "<s>", "</s>"]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL]
    scores = [0.0, 0.0, 0.0]

    base = list("▁helowrd!")
    merges = ["he", "ll", "hell", "hello", "▁hello", "or", "wor", "ld", "world", "▁world"]
    for t in base:
        toks.append(t)
        types.append(TokenType.NORMAL)
        scores.append(-100.0)  # single chars: low score
    for i, t in enumerate(merges):
        toks.append(t)
        types.append(TokenType.NORMAL)
        scores.append(-50.0 + i)  # longer merges progressively better
    # byte fallback tokens
    for b in range(256):
        toks.append(f"<0x{b:02X}>")
        types.append(TokenType.BYTE)
        scores.append(0.0)
    return Vocab(
        model="llama",
        pre="default",
        tokens=toks,
        scores=np.array(scores, np.float32),
        token_types=np.array(types, np.int32),
        bos_id=1,
        eos_id=2,
        unk_id=0,
        add_bos=True,
        add_eos=False,
        add_space_prefix=True,
    )


def test_spm_merge_chain():
    tok = Tokenizer(make_spm_vocab())
    ids = tok.encode("hello world")
    # bos, ▁hello, ▁world
    texts = [tok.vocab.tokens[i] for i in ids]
    assert texts == ["<s>", "▁hello", "▁world"]
    assert tok.decode(ids) == "hello world"


def test_spm_byte_fallback():
    tok = Tokenizer(make_spm_vocab())
    ids = tok.encode("é", add_bos=False)  # not in vocab → 2 UTF-8 bytes
    # leading "▁" prefix token plus two byte tokens
    pieces = [tok.vocab.tokens[i] for i in ids]
    assert pieces[0] == "▁"
    assert pieces[1:] == ["<0xC3>", "<0xA9>"]
    assert tok.decode(ids) == "é"


def test_spm_special_token_partition():
    v = make_spm_vocab()
    tok = Tokenizer(v)
    ids = tok.encode("hello</s>world", add_bos=False)
    texts = [tok.vocab.tokens[i] for i in ids]
    assert "</s>" in texts
    # control token renders empty on decode unless special=True
    assert "</s>" not in tok.decode(ids)
    assert "</s>" in tok.decode(ids, special=True)


def test_spm_streaming_utf8():
    tok = Tokenizer(make_spm_vocab())
    stream = tok.stream()
    # push the two bytes of 'é' separately: no torn output
    b1 = tok.vocab.token_to_id["<0xC3>"]
    b2 = tok.vocab.token_to_id["<0xA9>"]
    out1 = stream.push(b1)
    out2 = stream.push(b2)
    assert out1 == ""
    assert out2 == "é"
    assert stream.flush() == ""


def make_bpe_pair():
    """Build identical vocab/merges for our BPE and HuggingFace tokenizers."""
    words = ["hello", "world", "the", "quick", "brown", "fox", " hello", " world"]
    # vocab: all byte-encoder chars + some merges
    vocab = {}
    for ch in BYTE_ENCODER.values():
        vocab.setdefault(ch, len(vocab))
    merge_list = [
        ("h", "e"),
        ("l", "l"),
        ("he", "ll"),
        ("hell", "o"),
        ("w", "o"),
        ("r", "l"),
        ("wo", "rl"),
        ("worl", "d"),
        ("Ġ", "hello"),
        ("Ġ", "world"),
        ("t", "h"),
        ("th", "e"),
    ]
    for a, b in merge_list:
        vocab.setdefault(a + b, len(vocab))
    merges = [f"{a} {b}" for a, b in merge_list]
    toks = [None] * len(vocab)
    for t, i in vocab.items():
        toks[i] = t
    n = len(toks)
    v = Vocab(
        model="gpt2",
        pre="gpt-2",
        tokens=toks,
        scores=np.zeros(n, np.float32),
        token_types=np.full(n, TokenType.NORMAL, np.int32),
        merges=merges,
        bos_id=-1,
        eos_id=-1,
        unk_id=-1,
        add_bos=False,
        add_eos=False,
        add_space_prefix=False,
    )
    return Tokenizer(v), vocab, merge_list


def test_bpe_vs_huggingface():
    tokenizers = pytest.importorskip("tokenizers")
    ours, vocab, merge_list = make_bpe_pair()
    hf = tokenizers.Tokenizer(tokenizers.models.BPE(vocab, merge_list))
    hf.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(
        add_prefix_space=False, use_regex=True
    )
    for text in [
        "hello world",
        "the quick brown fox",
        "hello   world!!",
        "it's the thing",
        "123 hello",
        "héllo wörld",
    ]:
        got = ours.encode(text)
        want = hf.encode(text).ids
        assert got == want, f"{text!r}: ours={got} hf={want}"


def test_bpe_decode_roundtrip():
    ours, _, _ = make_bpe_pair()
    for text in ["hello world", "the the the", "héllo"]:
        assert ours.decode(ours.encode(text)) == text


def test_llama3_pretokenizer_numbers():
    """llama3 splits digit runs into groups of ≤3."""
    ours, vocab, merge_list = make_bpe_pair()
    v = ours.vocab
    v.pre = "llama3"
    v.ignore_merges = True
    t2 = Tokenizer(v)
    ids = t2.encode("12345")
    pieces = [v.tokens[i] for i in ids]
    assert pieces == ["1", "2", "3", "4", "5"]  # no digit merges in vocab
    # regex grouping is 123|45 — verify via the pattern directly
    from booster_tpu.tokenizer.bpe import PRETOKENIZERS, _split_cascade
    import regex as re

    pats = [re.compile(p) for p in PRETOKENIZERS["llama3"]]
    assert _split_cascade("12345", pats) == ["123", "45"]


def test_vocab_from_gguf_metadata():
    md = {
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": ["<unk>", "<s>", "</s>", "a"],
        "tokenizer.ggml.scores": np.array([0, 0, 0, -1], np.float32),
        "tokenizer.ggml.token_type": np.array([2, 3, 3, 1], np.int32),
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
        "tokenizer.ggml.add_bos_token": True,
    }
    v = Vocab.from_gguf_metadata(md)
    assert v.bos_id == 1 and v.eos_id == 2
    assert v.is_eog(2)
    assert not v.is_eog(3)


def test_wpm_tokenizer():
    """BERT-style WordPiece: greedy longest match with ▁-prefixed words."""
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]",
            "▁hello", "▁wor", "ld", "▁!", "▁,", "▁the"]
    n = len(toks)
    v = Vocab(
        model="bert", pre="default", tokens=toks,
        scores=np.zeros(n, np.float32),
        token_types=np.array([TokenType.CONTROL]*4 + [TokenType.NORMAL]*(n-4), np.int32),
        bos_id=2, eos_id=3, unk_id=1, add_bos=False, add_eos=False,
        add_space_prefix=False,
    )
    tok = Tokenizer(v)
    ids = tok.encode("Hello world!", add_bos=False)
    pieces = [toks[i] for i in ids]
    assert pieces == ["▁hello", "▁wor", "ld", "▁!"]
    # lowercasing + punctuation splitting + unknown word → [UNK]
    ids2 = tok.encode("HELLO zzz", add_bos=False)
    assert toks[ids2[0]] == "▁hello"
    assert ids2[1] == 1  # UNK


def test_ugm_tokenizer():
    """T5-style unigram: Viterbi picks the max-score segmentation."""
    toks = ["<unk>", "<s>", "</s>", "▁", "h", "e", "l", "o",
            "▁hello", "▁hell", "lo", "▁he", "llo"]
    scores = np.array([0, 0, 0, -5, -6, -6, -6, -6,
                       -2.0, -4.0, -3.0, -3.5, -3.2], np.float32)
    n = len(toks)
    v = Vocab(
        model="t5", pre="default", tokens=toks, scores=scores,
        token_types=np.array([2, 3, 3] + [1]*(n-3), np.int32),
        bos_id=-1, eos_id=2, unk_id=0, add_bos=False, add_eos=False,
        add_space_prefix=True,
    )
    tok = Tokenizer(v)
    ids = tok.encode("hello", add_bos=False)
    # "▁hello" (-2.0) beats "▁hell"+"o" (-10) and "▁he"+"llo" (-6.7)
    assert [toks[i] for i in ids] == ["▁hello"]
    # unknown chars collapse into UNK
    ids2 = tok.encode("hexx", add_bos=False)
    assert 0 in ids2
