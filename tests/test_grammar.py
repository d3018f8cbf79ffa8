"""GBNF grammar engine tests (test-grammar-parser / test-grammar-integration
/ test-json-schema-to-grammar analogues)."""
import json

import numpy as np
import pytest

from tpullm.grammar import Grammar, json_schema_to_gbnf, parse_gbnf


def test_parse_simple():
    rules, root = parse_gbnf('root ::= "ab" | "c"\n')
    assert isinstance(root, int)
    assert len(rules) >= 1


def test_literal_match():
    g = Grammar('root ::= "hello"')
    assert g.matches("hello")
    assert not g.matches("hell")
    assert not g.matches("hellox")
    assert not g.matches("world")


def test_alternates_and_classes():
    g = Grammar('root ::= [a-c]+ | "zz"')
    for ok in ("a", "abc", "cab", "zz"):
        assert g.matches(ok), ok
    for bad in ("z", "abd", "", "zzz"):
        assert not g.matches(bad), bad


def test_star_and_optional():
    g = Grammar('root ::= "a"* "b"?')
    for ok in ("", "a", "aaa", "b", "aab"):
        assert g.matches(ok), ok
    assert not g.matches("ba")
    assert not g.matches("abb")


def test_nested_rules_balanced():
    g = Grammar('root ::= expr\nexpr ::= "(" expr ")" | "x"')
    for ok in ("x", "(x)", "((x))"):
        assert g.matches(ok), ok
    for bad in ("(x", "x)", "()"):
        assert not g.matches(bad), bad


def test_negated_class_and_any():
    g = Grammar('root ::= [^ab] .')
    assert g.matches("cd")
    assert g.matches("xy")
    assert not g.matches("ad")
    assert not g.matches("c")


def test_bounded_repetition():
    g = Grammar('root ::= [0-9]{2,4}')
    assert not g.matches("1")
    for ok in ("12", "123", "1234"):
        assert g.matches(ok)
    assert not g.matches("12345")


def test_incremental_accept():
    g = Grammar('root ::= "foo" [0-9]+')
    assert g.accept("foo1") == 4
    assert g.done  # one digit suffices
    assert g.accept("23") == 2
    assert g.accept("x") == 0  # rejected, state unchanged
    assert not g.dead


def test_json_grammar_end_to_end():
    gbnf = json_schema_to_gbnf({
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name", "age"],
    })
    g = Grammar(gbnf)
    good = '{ "name" : "bob" , "age" : 41 }'
    assert g.matches(good), gbnf[:400]
    assert not g.matches('{ "name" : "bob" }')
    assert not g.matches('{ "name" : 3 , "age" : 41 }')


def test_json_schema_enum_array():
    gbnf = json_schema_to_gbnf({
        "type": "array",
        "items": {"enum": ["a", "b"]},
        "minItems": 1, "maxItems": 2,
    })
    g = Grammar(gbnf)
    assert g.matches('[ "a" ]')
    assert g.matches('[ "a" , "b" ]')
    assert not g.matches("[ ]")
    assert not g.matches('[ "c" ]')
    assert not g.matches('[ "a" , "b" , "a" ]')


def test_filter_pieces():
    g = Grammar('root ::= "yes" | "no"')
    mask = g.filter_pieces(["y", "n", "x", "yes", "noo"])
    assert mask.tolist() == [1, 1, 0, 1, 0]


def test_grammar_constraint_with_vocab(tmp_path):
    from tpullm.gguf.constants import GGMLType
    from tpullm.grammar import GrammarConstraint
    from tpullm.runtime.loader import load_model
    from tpullm.tokenizer import Tokenizer
    from tpullm.utils.synth import build_llama_gguf

    p = str(tmp_path / "g.gguf")
    build_llama_gguf(p, vocab_size=256, n_embd=64, n_layer=1, n_head=2,
                     n_head_kv=2, n_ff=64, qtype=GGMLType.Q8_0, with_vocab=True)
    _, _, gg = load_model(p)
    tok = Tokenizer.from_gguf(gg)
    gc = GrammarConstraint('root ::= [a-z]+', tok.vocab)
    # char pieces 'a'..'z' should be allowed, digits not
    ids_ok = [tok.vocab.token_to_id["a"], tok.vocab.token_to_id["z"]]
    ids_bad = [tok.vocab.token_to_id["0"]]
    mask = gc.filter_candidates(np.asarray(ids_ok + ids_bad))
    assert mask.tolist() == [1, 1, 0]
    gc.accept_token(ids_ok[0])
    assert gc.g.done
