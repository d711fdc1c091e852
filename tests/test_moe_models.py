"""MoE model family tests: fused_moe math, Mixtral HF logit parity, and
Qwen3-MoE engine smoke (reference `test/registered/moe` category +
HFRunner/SRTRunner parity pattern)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sglang_tpu.layers.moe import fused_moe


def test_fused_moe_matches_dense_loop():
    rng = np.random.default_rng(0)
    t, h, m, e, k = 12, 16, 32, 4, 2
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    router = jnp.asarray(rng.standard_normal((h, e)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((e, h, 2 * m)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, m, h)) * 0.1, jnp.float32)

    out = np.asarray(fused_moe(x, router, w1, w2, top_k=k, norm_topk_prob=True))

    # dense reference: run every expert on every token, weight by routing
    logits = np.asarray(x) @ np.asarray(router)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    top_ids = np.argsort(-probs, axis=-1)[:, :k]
    ref = np.zeros((t, h), dtype=np.float32)
    for ti in range(t):
        ws = probs[ti, top_ids[ti]]
        ws = ws / ws.sum()
        for w, ei in zip(ws, top_ids[ti]):
            gate_up = np.asarray(x)[ti] @ np.asarray(w1)[ei]
            gate, up = gate_up[:m], gate_up[m:]
            act = gate / (1 + np.exp(-gate)) * up
            ref[ti] += w * (act @ np.asarray(w2)[ei])
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.fixture(scope="module")
def tiny_mixtral(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    path = tmp_path_factory.mktemp("tiny_mixtral")
    cfg = MixtralConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        num_local_experts=4,
        num_experts_per_tok=2,
        vocab_size=256,
        max_position_embeddings=256,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    model = MixtralForCausalLM(cfg).eval()
    model.save_pretrained(path)
    return str(path), model


def test_mixtral_logits_match_hf(tiny_mixtral):
    torch = pytest.importorskip("torch")
    path, hf_model = tiny_mixtral
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=path, load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=11).astype(np.int32)
    with torch.no_grad():
        hf_logits = (
            hf_model(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
        )
    ps = runner.page_size
    n_pages = -(-len(prompt) // ps)
    pages = list(range(1, 1 + n_pages))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))], dtype=np.int32
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    logits = runner.forward_extend_logits(
        prompt,
        np.arange(len(prompt)),
        out_loc,
        pt,
        np.array([len(prompt)]),
        np.array([len(prompt)]),
    )
    np.testing.assert_allclose(logits, hf_logits, atol=5e-3, rtol=5e-3)


def test_qwen3_moe_engine_smoke():
    """Dummy-weight Qwen3-MoE end-to-end through the scheduler."""
    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from tests.test_utils import tiny_runner, tiny_server_args

    sa = tiny_server_args()
    runner = tiny_runner(
        sa,
        hf_over=dict(
            architectures=["Qwen3MoeForCausalLM"],
            model_type="qwen3_moe",
            num_experts=4,
            num_experts_per_tok=2,
            moe_intermediate_size=48,
            norm_topk_prob=True,
        ),
    )
    sched = Scheduler(sa, runner)
    sched.add_request(
        TokenizedGenerateReqInput(
            rid="q3moe",
            input_ids=[5, 6, 7, 8],
            sampling_params=SamplingParams(
                max_new_tokens=5, temperature=0.0, ignore_eos=True
            ),
        )
    )
    out = None
    while sched.has_work():
        for o in sched.step():
            out = o
    assert out is not None and len(out.output_ids) == 5
