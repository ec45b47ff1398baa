"""GBNF parser, automaton, JSON-schema conversion, grammar sampling."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from booster_tpu.grammar import (
    GrammarSampler,
    json_schema_to_gbnf,
    parse_gbnf,
)
from booster_tpu.grammar.gbnf import advance_stacks, stacks_done


def accepts(grammar, text: str, complete: bool = True) -> bool:
    stacks = grammar.start_stacks()
    for ch in text:
        stacks = advance_stacks(stacks, ord(ch), grammar.rules)
        if not stacks:
            return False
    return stacks_done(stacks) if complete else True


def test_literal_and_alternates():
    g = parse_gbnf('root ::= "yes" | "no"\n')
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe")
    assert not accepts(g, "ye")  # incomplete


def test_char_classes_and_repetition():
    g = parse_gbnf("root ::= [a-z]+ [0-9]*\n")
    assert accepts(g, "abc")
    assert accepts(g, "abc123")
    assert not accepts(g, "123")
    assert not accepts(g, "ABC")


def test_nested_groups_and_optional():
    g = parse_gbnf('root ::= ("a" | "b")? "c"\n')
    assert accepts(g, "c")
    assert accepts(g, "ac")
    assert accepts(g, "bc")
    assert not accepts(g, "abc")


def test_rule_refs_and_recursion():
    g = parse_gbnf('root ::= expr\nexpr ::= "(" expr ")" | "x"\n')
    assert accepts(g, "x")
    assert accepts(g, "((x))")
    assert not accepts(g, "((x)")


def test_bounded_repetition():
    g = parse_gbnf("root ::= [0-9]{2,4}\n")
    assert not accepts(g, "1")
    assert accepts(g, "12")
    assert accepts(g, "1234")
    assert not accepts(g, "12345")


def test_negated_class_and_any():
    g = parse_gbnf('root ::= [^"]+ | "\\"" . "\\""\n')
    assert accepts(g, "plain")
    assert accepts(g, '"x"')


def test_escapes():
    g = parse_gbnf('root ::= "\\n" [\\x41-\\x5A]\n')
    assert accepts(g, "\nZ")
    assert not accepts(g, "\nz")


def test_undefined_rule_rejected():
    with pytest.raises(ValueError):
        parse_gbnf("root ::= missing\n")
    with pytest.raises(ValueError):
        parse_gbnf('top ::= "x"\n')  # no root


JSON_GBNF = r"""
root ::= object
value ::= object | array | string | number | ("true" | "false" | "null")
object ::= "{" ws ( string ":" ws value ( "," ws string ":" ws value )* )? "}" ws
array ::= "[" ws ( value ( "," ws value )* )? "]" ws
string ::= "\"" ( [^"\\] | "\\" ["\\bfnrt] )* "\"" ws
number ::= "-"? [0-9]+ ( "." [0-9]+ )? ws
ws ::= [ \t\n]*
"""


def test_json_grammar():
    g = parse_gbnf(JSON_GBNF)
    assert accepts(g, '{"a": 1, "b": [true, "x"]}')
    assert not accepts(g, '{"a": }')
    assert not accepts(g, "[1,2]")  # root is object


def test_json_schema_conversion():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["name", "age", "tags"],
    }
    gbnf = json_schema_to_gbnf(schema)
    g = parse_gbnf(gbnf)
    ok = json.dumps({"name": "bob", "age": 3, "tags": ["x", "y"]})
    assert accepts(g, ok), gbnf
    assert not accepts(g, json.dumps({"name": "bob"}))
    assert not accepts(g, '{"name": 5, "age": 3, "tags": []}')


def test_json_schema_enum_and_anyof():
    gbnf = json_schema_to_gbnf({"enum": ["red", "green"]})
    g = parse_gbnf(gbnf)
    assert accepts(g, '"red"')
    assert not accepts(g, '"blue"')

    gbnf = json_schema_to_gbnf({"anyOf": [{"type": "integer"}, {"type": "null"}]})
    g = parse_gbnf(gbnf)
    assert accepts(g, "42")
    assert accepts(g, "null")
    assert not accepts(g, '"x"')


def test_grammar_sampler_end_to_end():
    import tests.test_tokenizer as tt

    from booster_tpu.tokenizer import Tokenizer

    tok = Tokenizer(tt.make_spm_vocab())
    g = parse_gbnf('root ::= " hello" " world"\n')  # SPM pieces carry spaces
    gs = GrammarSampler(g, tok)

    V = tok.vocab.n_tokens
    rng = np.random.default_rng(0)
    hello = tok.vocab.token_to_id["▁hello"]
    world = tok.vocab.token_to_id["▁world"]

    logits = rng.normal(size=V).astype(np.float32)
    logits[world] = 10.0  # grammar must reject world-first despite top logit
    # drive greedy grammar-constrained picks to completion
    picked = []
    for _ in range(32):
        t = gs.pick(logits)
        if tok.vocab.is_eog(t):
            break
        picked.append(t)
        gs.accept(t)
        if gs.can_stop:
            break
    assert tok.decode(picked, special=False).lstrip() == "hello world"
    assert gs.can_stop
    # after completion EOG is allowed
    assert gs.token_allowed(tok.vocab.eos_id)
