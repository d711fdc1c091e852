"""Constrained decoding tests (reference `constrained_decoding` CI category
+ `json_constrained_kit`): regex engine units, JSON-schema->regex, and
end-to-end constrained generation through the scheduler."""

import json
import re as pyre
import uuid

import numpy as np
import pytest

from sglang_tpu.constrained.json_schema import schema_to_regex
from sglang_tpu.constrained.regex_engine import compile_regex

# ---------------------------------------------------------------- regex DFA


@pytest.mark.parametrize(
    "pattern,accepts,rejects",
    [
        (r"abc", ["abc"], ["ab", "abcd", "abd"]),
        (r"a*b+", ["b", "aab", "abbb"], ["a", "", "ba"]),
        (r"(foo|bar)+", ["foo", "barfoo"], ["fo", "foobaz"]),
        (r"[a-c]{2,3}", ["ab", "abc"], ["a", "abca", "ad"]),
        (r"-?\d+(\.\d+)?", ["3", "-42", "3.14"], ["3.", ".5", "-"]),
        (r"a.c", ["abc", "azc", "a c"], ["ac", "a\nc"]),
        (r"[^xyz]+", ["abc"], ["axb", ""]),
        (r"a{3}", ["aaa"], ["aa", "aaaa"]),
        (r"(ab)?c", ["c", "abc"], ["ac", "abbc"]),
        (r"\w+@\w+\.com", ["a@b.com"], ["a@b", "@b.com"]),
    ],
)
def test_regex_dfa(pattern, accepts, rejects):
    dfa = compile_regex(pattern)
    for s in accepts:
        st = dfa.step_string(0, s)
        assert st >= 0 and dfa.accepting[st], f"{pattern} should accept {s!r}"
    for s in rejects:
        st = dfa.step_string(0, s)
        assert st < 0 or not dfa.accepting[st], f"{pattern} should reject {s!r}"


def test_dfa_against_python_re():
    rng = np.random.default_rng(0)
    pattern = r"(ab|a)*c[0-9]{1,2}(x|yz)?"
    dfa = compile_regex(pattern)
    cre = pyre.compile(pattern)
    alphabet = "abcxyz0123456789"
    for _ in range(500):
        n = rng.integers(0, 8)
        s = "".join(rng.choice(list(alphabet), size=n))
        st = dfa.step_string(0, s)
        ours = st >= 0 and dfa.accepting[st]
        theirs = cre.fullmatch(s) is not None
        assert ours == theirs, s


# ------------------------------------------------------------- JSON schema


def _assert_schema_matches(schema, good, bad):
    regex = schema_to_regex(json.dumps(schema))
    dfa = compile_regex(regex)
    for s in good:
        st = dfa.step_string(0, s)
        assert st >= 0 and dfa.accepting[st], f"should accept {s}"
    for s in bad:
        st = dfa.step_string(0, s)
        assert st < 0 or not dfa.accepting[st], f"should reject {s}"


def test_schema_object():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    _assert_schema_matches(
        schema,
        ['{"name": "bob", "age": 3}', '{"name":"x","age":-1}'],
        ['{"name": "bob"}', '{"age": 3, "name": "bob"}', "{}"],
    )


def test_schema_enum_and_array():
    schema = {
        "type": "object",
        "properties": {
            "color": {"enum": ["red", "green"]},
            "nums": {"type": "array", "items": {"type": "integer"}, "maxItems": 3},
        },
        "required": ["color", "nums"],
    }
    _assert_schema_matches(
        schema,
        ['{"color": "red", "nums": [1, 2]}', '{"color": "green", "nums": []}'],
        ['{"color": "blue", "nums": []}', '{"color": "red", "nums": [1,2,3,4]}'],
    )


def test_schema_nested_and_bool():
    schema = {
        "type": "object",
        "properties": {
            "ok": {"type": "boolean"},
            "inner": {
                "type": "object",
                "properties": {"v": {"type": "number"}},
                "required": ["v"],
            },
        },
        "required": ["ok", "inner"],
    }
    _assert_schema_matches(
        schema,
        ['{"ok": true, "inner": {"v": 1.5}}'],
        ['{"ok": yes, "inner": {"v": 1}}', '{"ok": true, "inner": {}}'],
    )


# ----------------------------------------------------------- end-to-end


@pytest.fixture(scope="module")
def word_engine(tmp_path_factory):
    """Engine whose tokenizer covers digits/letters char-by-char."""
    torch = pytest.importorskip("torch")
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    path = tmp_path_factory.mktemp("grammar_model")
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789{}[]:,.\"- _")
    vocab = {c: i for i, c in enumerate(chars)}
    base = len(vocab)
    for i, w in enumerate(["true", "false", "null", "red", "green", "name", "age"]):
        vocab[w] = base + i
    vocab.update({"<unk>": 250, "<s>": 251, "</s>": 252})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>", eos_token="</s>"
    )
    fast.save_pretrained(path)
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=512, tie_word_embeddings=True,
        bos_token_id=251, eos_token_id=252,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).eval().save_pretrained(path)
    from sglang_tpu import Engine

    return Engine(
        model_path=str(path), device="cpu", page_size=16, max_total_tokens=4096,
        context_length=512, decode_bs_buckets=[4, 8], prefill_token_buckets=[64, 128],
        max_running_requests=8, random_seed=0, log_level="warning",
    )


def test_regex_constrained_generation(word_engine):
    out = word_engine.generate(
        input_ids=[5, 6, 7],
        sampling_params={
            "max_new_tokens": 12,
            "temperature": 0.8,
            "regex": r"[0-9]{3}-[0-9]{2}",
        },
    )
    tok = word_engine.tokenizer
    text = tok.decode(out["output_ids"], skip_special_tokens=True).replace(" ", "")
    assert pyre.fullmatch(r"[0-9]{3}-[0-9]{2}", text), text


def test_json_constrained_generation(word_engine):
    schema = {
        "type": "object",
        "properties": {"age": {"type": "integer"}},
        "required": ["age"],
    }
    out = word_engine.generate(
        input_ids=[9, 10],
        sampling_params={
            "max_new_tokens": 40,
            "temperature": 0.7,
            "json_schema": json.dumps(schema),
        },
    )
    tok = word_engine.tokenizer
    text = tok.decode(out["output_ids"], skip_special_tokens=True).replace(" ", "")
    parsed = json.loads(text)
    assert isinstance(parsed["age"], int)


# ------------------------------------------------------------------- EBNF


def _ebnf_accepts(dfa, s):
    st = dfa.step_string(0, s)
    return st >= 0 and dfa.accepting[st]


def test_ebnf_basic():
    from sglang_tpu.constrained.ebnf import compile_ebnf

    dfa = compile_ebnf(
        """
        # yes/no with optional emphasis
        root ::= answer "!"*
        answer ::= "yes" | "no"
        """
    )
    for good in ["yes", "no", "yes!!", "no!"]:
        assert _ebnf_accepts(dfa, good), good
    for bad in ["maybe", "yesno", "!", ""]:
        assert not _ebnf_accepts(dfa, bad), bad


def test_ebnf_classes_quantifiers_refs():
    from sglang_tpu.constrained.ebnf import compile_ebnf

    dfa = compile_ebnf(
        r"""
        root  ::= word (" " word){0,2}
        word  ::= [a-z] [a-z0-9\-]*
        """
    )
    for good in ["a", "hello world", "x1 y-2 z"]:
        assert _ebnf_accepts(dfa, good), good
    for bad in ["1a", "a  b", "a b c d", "A"]:
        assert not _ebnf_accepts(dfa, bad), bad


def test_ebnf_recursive_bounded():
    """Recursive rules expand to the depth bound: balanced parens nest up
    to the bound, never beyond (conservative approximation)."""
    from sglang_tpu.constrained.ebnf import compile_ebnf

    dfa = compile_ebnf('root ::= "x" | "(" root ")"', max_depth=6)
    assert _ebnf_accepts(dfa, "x")
    assert _ebnf_accepts(dfa, "(((x)))")
    assert not _ebnf_accepts(dfa, "((x")
    assert not _ebnf_accepts(dfa, "(" * 50 + "x" + ")" * 50)  # beyond bound


def test_ebnf_escapes_and_multidef():
    from sglang_tpu.constrained.ebnf import compile_ebnf

    dfa = compile_ebnf(
        'root ::= "a\\"b"\nroot ::= "tab\\there"\n'
    )
    assert _ebnf_accepts(dfa, 'a"b')
    assert _ebnf_accepts(dfa, "tab\there")
    assert not _ebnf_accepts(dfa, "ab")


def test_ebnf_errors():
    from sglang_tpu.constrained.ebnf import compile_ebnf

    with pytest.raises(ValueError, match="root"):
        compile_ebnf('start ::= "x"')
    with pytest.raises(ValueError, match="undefined"):
        compile_ebnf("root ::= missing")
    with pytest.raises(ValueError, match="matches nothing"):
        compile_ebnf('root ::= "(" root ")"')  # no base case


def test_ebnf_constrained_generation(word_engine):
    out = word_engine.generate(
        input_ids=[5, 6, 7],
        sampling_params={
            "max_new_tokens": 16,
            "temperature": 0.8,
            "ebnf": 'root ::= color ("," color)*\ncolor ::= "red" | "green"',
        },
    )
    tok = word_engine.tokenizer
    text = tok.decode(out["output_ids"], skip_special_tokens=True).replace(" ", "")
    assert pyre.fullmatch(r"(red|green)(,(red|green))*", text), text


# --------------------------------------------------------- structural tags


def _tag_dfa(structures):
    from sglang_tpu.constrained.structural_tag import compile_structural_tag

    return compile_structural_tag(
        json.dumps({"type": "structural_tag", "structures": structures})
    )


def _accepts(dfa, s):
    st = dfa.step_string(0, s)
    return st >= 0 and dfa.accepting[st]


def _alive(dfa, s):
    return dfa.step_string(0, s) >= 0


def test_structural_tag_free_and_triggered():
    dfa = _tag_dfa(
        [{"begin": "[fn]", "schema": {"type": "integer"}, "end": "[end]"}]
    )
    # pure free text accepts, including partial begin prefixes
    for s in ["", "hello world", "brackets ] ok [ too", "[f", "[fn"]:
        assert _accepts(dfa, s), s
    # once [fn] is emitted the schema+end is FORCED
    assert not _accepts(dfa, "x[fn]")          # mid-structure: EOS illegal
    assert not _accepts(dfa, "x[fn]12")        # end missing
    assert not _alive(dfa, "x[fn]ab")          # schema violated -> dead
    assert _accepts(dfa, "x[fn]42[end]")       # complete structure
    assert _accepts(dfa, "x[fn]42[end] more text")   # free text resumes
    assert _accepts(dfa, "[fn]1[end][fn]2[end]")     # repeatable


def test_structural_tag_multiple_structures():
    dfa = _tag_dfa(
        [
            {"begin": "[a]", "schema": {"type": "integer"}, "end": "[/a]"},
            {"begin": "[b]", "schema": {"type": "boolean"}, "end": "[/b]"},
        ]
    )
    assert _accepts(dfa, "t [a]7[/a] u [b]true[/b] v")
    assert not _alive(dfa, "[a]true")   # wrong schema for this tag
    assert not _accepts(dfa, "[b]true") # end required


def test_structural_tag_constrained_generation(word_engine):
    """End-to-end: whatever the model emits, any [fn] region obeys the
    schema and closes with [end]."""
    spec = json.dumps(
        {
            "type": "structural_tag",
            "structures": [
                {"begin": "[9]", "schema": {"type": "integer"}, "end": "[0]"}
            ],
        }
    )
    out = word_engine.generate(
        input_ids=[5, 6, 7],
        sampling_params={
            "max_new_tokens": 20,
            "temperature": 1.2,
            "structural_tag": spec,
        },
    )
    tok = word_engine.tokenizer
    text = tok.decode(out["output_ids"], skip_special_tokens=True).replace(" ", "")
    # verify with the same DFA: emitted text must be a live (accepted or
    # extendable) string of the grammar
    dfa = _tag_dfa([{"begin": "[9]", "schema": {"type": "integer"}, "end": "[0]"}])
    assert dfa.step_string(0, text) >= 0, text
