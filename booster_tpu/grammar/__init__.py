"""GBNF grammar-constrained generation.

Reference components: /root/reference/cpp/common/grammar-parser.cpp (GBNF
text → rule arrays), /root/reference/cpp/src/llama-grammar.cpp (pushdown
automaton over UTF-8 codepoints constraining sampling), and
/root/reference/cpp/common/json-schema-to-grammar.cpp.
"""

from booster_tpu.grammar.gbnf import Grammar, parse_gbnf
from booster_tpu.grammar.sampler import GrammarSampler
from booster_tpu.grammar.json_schema import json_schema_to_gbnf

__all__ = ["Grammar", "parse_gbnf", "GrammarSampler", "json_schema_to_gbnf"]
