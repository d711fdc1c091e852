"""Frontend DSL tests (reference `lang/` test coverage): programs with
gen/select/roles/fork against the in-process Engine backend, and
Engine.score sanity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    path = tmp_path_factory.mktemp("dsl_model")
    vocab = {f"w{i}": i for i in range(250)}
    vocab.update({"<unk>": 250, "<s>": 251, "</s>": 252})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>", eos_token="</s>",
        chat_template=(
            "{% for m in messages %}{{ m['role'] }} : {{ m['content'] }} "
            "{% endfor %}{% if add_generation_prompt %}assistant :{% endif %}"
        ),
    ).save_pretrained(path)
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
        model_path=str(path), device="cpu", dtype="float32", page_size=16,
        max_total_tokens=4096, context_length=512, decode_bs_buckets=[4, 8],
        prefill_token_buckets=[64, 128], max_running_requests=8,
        random_seed=0, log_level="warning",
    )


def test_score_prefers_greedy_continuation(engine):
    base = engine.generate(
        "w1 w2 w3", sampling_params={"max_new_tokens": 2, "temperature": 0.0,
                                     "ignore_eos": True}
    )
    greedy_cont = " " + base["text"].strip()
    scores = engine.score("w1 w2 w3", [greedy_cont, " w249 w248"])
    assert scores[0] > scores[1]


def test_dsl_gen_and_capture(engine):
    import sglang_tpu.lang as sgl

    @sgl.function
    def prog(s, start):
        s += start + " "
        s += sgl.gen("first", max_tokens=4, ignore_eos=True)
        s += " middle "
        s += sgl.gen("second", max_tokens=3, ignore_eos=True)

    state = prog.run(start="w1 w2", backend=sgl.EngineBackend(engine))
    assert len(state["first"].split()) == 4
    # the tiny model may emit special tokens that decode to ""; the capture
    # must exist and the program must have advanced past the literal
    assert "second" in state.captures
    assert state.text.startswith("w1 w2 ")
    assert "middle" in state.text


def test_dsl_select(engine):
    import sglang_tpu.lang as sgl

    base = engine.generate(
        "w5 w6", sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                                  "ignore_eos": True}
    )
    good = " " + base["text"].strip()

    @sgl.function
    def prog(s):
        s += "w5 w6"
        s += sgl.select("pick", choices=[good, " w240 w241 w242"])

    state = prog.run(backend=sgl.EngineBackend(engine))
    assert state["pick"] == good


def test_dsl_chat_roles(engine):
    import sglang_tpu.lang as sgl

    @sgl.function
    def chat(s, q):
        s += sgl.system("w10 w11")
        s += sgl.user(q)
        s += sgl.assistant(sgl.gen("answer", max_tokens=5, ignore_eos=True))

    state = chat.run(q="w12 w13", backend=sgl.EngineBackend(engine))
    assert "answer" in state.captures  # tiny model may decode to ""
    assert state.messages[0]["role"] == "system"
    assert state.messages[-1]["role"] == "assistant"
    assert state.messages[-1]["content"] == state["answer"]


def test_dsl_fork(engine):
    import sglang_tpu.lang as sgl

    @sgl.function
    def prog(s):
        s += "w20 w21 "
        forks = s.fork(2)
        outs = []
        for i, f in enumerate(forks):
            f += sgl.gen(max_tokens=2, temperature=0.0, ignore_eos=True)
            outs.append(f.text)
        s.captures["forks"] = "|".join(outs)

    state = prog.run(backend=sgl.EngineBackend(engine))
    a, b = state["forks"].split("|")
    assert a == b  # greedy forks from the same prefix agree
