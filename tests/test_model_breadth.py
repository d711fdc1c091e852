"""HF logit-parity tests for the round-2 model families: Phi-3, GLM-4,
OLMo-2, Starcoder2, Gemma-3 text (reference `srt/models/{phi3,glm4,olmo2,
starcoder2,gemma3_causal}.py`; HFRunner/SRTRunner parity pattern)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _parity(hf_model, path, prompt_len=13, atol=5e-3, seed=0):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=path, load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(seed)
    prompt = rng.integers(3, mc.vocab_size - 1, size=prompt_len).astype(np.int32)
    with torch.no_grad():
        want = (
            hf_model(torch.tensor(prompt[None].astype(np.int64)))
            .logits[0]
            .numpy()
        )
    ps = runner.page_size
    n_pages = -(-len(prompt) // ps)
    pages = list(range(1, 1 + n_pages))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))],
        dtype=np.int32,
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    got = runner.forward_extend_logits(
        prompt,
        np.arange(len(prompt)),
        out_loc,
        pt,
        np.array([len(prompt)]),
        np.array([len(prompt)]),
    )
    np.testing.assert_allclose(got, want, atol=atol, rtol=atol)


def _save(model, tmp_path_factory, name):
    path = tmp_path_factory.mktemp(name)
    model.save_pretrained(path)
    return str(path)


def test_phi3_parity(tmp_path_factory):
    from transformers import Phi3Config, Phi3ForCausalLM

    cfg = Phi3Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = Phi3ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_phi3"))


def test_phi3_longrope_parity(tmp_path_factory):
    from transformers import Phi3Config, Phi3ForCausalLM

    cfg = Phi3Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256,
        original_max_position_embeddings=256,
        rope_theta=10000.0,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0 + 0.05 * i for i in range(8)],
            "long_factor": [1.5 + 0.1 * i for i in range(8)],
        },
        tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(1)
    hf = Phi3ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_phi3_lr"), seed=1)


def test_glm4_parity(tmp_path_factory):
    from transformers import Glm4Config, Glm4ForCausalLM

    cfg = Glm4Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=128,
        vocab_size=256, max_position_embeddings=256,
        partial_rotary_factor=0.5, attention_bias=True,
        rope_theta=10000.0, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(2)
    hf = Glm4ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_glm4"), seed=2)


def test_olmo2_parity(tmp_path_factory):
    from transformers import Olmo2Config, Olmo2ForCausalLM

    cfg = Olmo2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(3)
    hf = Olmo2ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_olmo2"), seed=3)


def test_starcoder2_parity(tmp_path_factory):
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    cfg = Starcoder2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        use_bias=True, sliding_window=None, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(4)
    hf = Starcoder2ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_sc2"), seed=4)


def test_gemma3_text_parity(tmp_path_factory):
    from transformers import Gemma3TextConfig
    from transformers.models.gemma3 import Gemma3ForCausalLM

    cfg = Gemma3TextConfig(
        hidden_size=64, num_hidden_layers=6, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=128,
        vocab_size=256, max_position_embeddings=256,
        sliding_window=16, sliding_window_pattern=3,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        query_pre_attn_scalar=16,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(5)
    hf = Gemma3ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_gemma3"), prompt_len=29, seed=5)


def test_generation_smoke_all_new_families(tmp_path_factory):
    """One greedy generation through the scheduler for each new family
    (dummy weights; proves registry + pool geometry + decode paths)."""
    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from tests.test_utils import tiny_runner, tiny_server_args

    families = [
        dict(architectures=["Phi3ForCausalLM"], model_type="phi3"),
        dict(architectures=["Glm4ForCausalLM"], model_type="glm4", head_dim=16),
        dict(architectures=["Olmo2ForCausalLM"], model_type="olmo2"),
        dict(architectures=["Starcoder2ForCausalLM"], model_type="starcoder2"),
        dict(
            architectures=["Gemma3TextForCausalLM"],
            model_type="gemma3_text",
            head_dim=16,
            sliding_window=16,
            sliding_window_pattern=2,
            query_pre_attn_scalar=16,
            rope_local_base_freq=10000.0,
        ),
    ]
    for over in families:
        sa = tiny_server_args()
        sched = Scheduler(sa, tiny_runner(sa, hf_over=over))
        sched.add_request(
            TokenizedGenerateReqInput(
                rid="r",
                input_ids=[5, 6, 7, 8, 9],
                sampling_params=SamplingParams(
                    max_new_tokens=5, temperature=0.0, ignore_eos=True
                ),
            )
        )
        done = False
        steps = 0
        while sched.has_work():
            for o in sched.step():
                done = done or o.finished
            steps += 1
            assert steps < 100
        assert done, over
